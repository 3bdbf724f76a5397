"""The ship-shape contract: the pipeline runs under real ``spark-submit
--py-files`` with NO repo checkout visible to the process — the package
resolves from dist/gdal_spark.zip alone (BASELINE.json north rule:
"ships as spark-submit --py-files modules only").

Launches actual spark-submit subprocesses (two JVMs), so this file is the
slowest in the suite; it is also the only end-to-end evidence that the
deploy artifact is self-contained.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _run_job(zip_path: str, out_dir: str, tmp: str, extra: list[str]) -> dict:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [_spark_submit(), "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "tile_pipeline_job.py"),
         "--n-images", "40", "--out", out_dir,
         "--shuffle-partitions", "8", *extra],
        capture_output=True, text=True, timeout=300,
        cwd=tmp, env=env,  # cwd OUTSIDE the repo: the zip is the only source
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith('{"job"')][-1]
    return json.loads(line)


def test_submit_py_files_end_to_end_and_resume(tmp_path):
    # deterministic artifact: building twice yields identical bytes
    from scripts.package_pyfiles import build

    zip1 = build(str(tmp_path / "a" / "gdal_spark.zip"))
    zip2 = build(str(tmp_path / "b" / "gdal_spark.zip"))
    with open(zip1, "rb") as f1, open(zip2, "rb") as f2:
        assert f1.read() == f2.read()

    out = str(tmp_path / "tiles")
    run1 = _run_job(zip1, out, str(tmp_path), [])
    assert run1["images"] == 40
    assert run1["tiles_written"] > 0
    files = sorted(glob.glob(os.path.join(out, "*", "*", "*.png")))
    assert len(files) == run1["tiles_written"]
    # lineage manifests + summary landed next to the tiles
    summary = json.load(open(os.path.join(out, "_lineage", "_summary.json")))
    assert summary["n_tiles"] == run1["tiles_written"]

    # resume: delete 3 tiles, rerun --resume; only the holes re-render
    for fn in files[:3]:
        os.remove(fn)
    run2 = _run_job(zip1, out, str(tmp_path), ["--resume"])
    assert run2["tiles_written"] == 3
    assert run2["tiles_skipped_resume"] == run1["tiles_written"] - 3
    assert sorted(glob.glob(os.path.join(out, "*", "*", "*.png"))) == files


def test_corpus_clean_job_ship_shape(tmp_path):
    """The text-pipeline job under real spark-submit --py-files: stage
    counts monotone, output parquet readable, resume appends nothing on
    a no-op re-run."""
    from scripts.package_pyfiles import build

    zip1 = build(str(tmp_path / "z" / "gdal_spark.zip"))
    out = str(tmp_path / "clean")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    def run(extra):
        proc = subprocess.run(
            [_spark_submit(), "--master", "local[4]",
             "--conf", "spark.sql.shuffle.partitions=8",
             "--conf", "spark.ui.enabled=false",
             "--py-files", zip1,
             os.path.join(REPO, "jobs", "corpus_clean_job.py"),
             "--input", "/root/testdata/sf0.001/documents.parquet",
             "--out", out, "--sentenceize",
             "--gopher-min-stop-hits", "1",
             "--shuffle-partitions", "8", *extra],
            capture_output=True, text=True, timeout=300,
            cwd=str(tmp_path), env=env,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith('{"job"')][-1]
        return json.loads(line)

    r1 = run([])
    assert r1["n_in"] == 500
    # each stage only removes documents
    assert (r1["n_in"] >= r1["n_gopher_pass"] >= r1["n_c4_pass"]
            >= r1["n_exact_unique"] >= r1["n_out"] > 0)
    assert r1["n_written"] == r1["n_out"]
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert files

    # resume: nothing new to write, sink untouched
    r2 = run(["--resume"])
    assert r2["n_resume_skipped"] == r1["n_out"]
    assert r2["n_written"] == 0
    assert sorted(glob.glob(os.path.join(out, "*.parquet"))) == sorted(files)
