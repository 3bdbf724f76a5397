"""Structured Streaming incremental tiling + resume semantics."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "src": str(tmp_path / "src"),
        "sink": str(tmp_path / "sink"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["src"])
    return d


def _write_batch(spark, src, n, start):
    from gdal_spark.fixtures.images import generate_images_pdf

    pdf = generate_images_pdf(n, start=start)
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)


def test_incremental_tiles_availablenow(spark, dirs):
    from gdal_spark.streaming.incremental import incremental_tiles

    _write_batch(spark, dirs["src"], 6, 0)
    incremental_tiles(spark, dirs["src"], dirs["sink"], dirs["ckpt"])
    first = spark.read.parquet(dirs["sink"]).select("image_id", "z", "x", "y").toPandas()
    assert len(first) > 0
    n_first = len(first)

    # new files arrive; re-run processes ONLY them (checkpointed progress)
    _write_batch(spark, dirs["src"], 4, 100)
    incremental_tiles(spark, dirs["src"], dirs["sink"], dirs["ckpt"])
    second = spark.read.parquet(dirs["sink"]).select("image_id", "z", "x", "y").toPandas()
    new_ids = {i for i in second["image_id"]} - {i for i in first["image_id"]}
    assert new_ids == {f"img{100+i:08d}" for i in range(4)}
    # no duplicates for the original images (exactly-once)
    assert len(second[second["image_id"].isin(first["image_id"])]) == n_first


def test_resume_tiles_anti_join(spark, dirs):
    from gdal_spark.fixtures.images import generate_images_pdf
    from gdal_spark.operators.tiling import render_base_tiles
    from gdal_spark.streaming.incremental import resume_tiles

    imgs = spark.createDataFrame(generate_images_pdf(8))
    # first run: nothing exists -> everything rendered
    t1 = resume_tiles(spark, imgs, dirs["sink"])
    t1.write.partitionBy("z").mode("append").parquet(dirs["sink"])
    n1 = spark.read.parquet(dirs["sink"]).count()
    assert n1 == render_base_tiles(imgs).count()
    # second run: all keys exist -> zero work
    t2 = resume_tiles(spark, imgs, dirs["sink"])
    assert t2.count() == 0


def test_windowed_event_counts_stream_matches_batch(spark, dirs, tmp_path):
    from gdal_spark.streaming.incremental import windowed_event_counts

    src = str(tmp_path / "events_src")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.coalesce(1).write.parquet(src)
    sink = str(tmp_path / "events_sink")
    ckpt = str(tmp_path / "events_ckpt")
    windowed_event_counts(spark, src, ckpt, sink)
    got = spark.read.parquet(sink).toPandas()
    from pyspark.sql import functions as F

    exp = (
        events.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
        .toPandas()
    )
    m = got.merge(exp, on=["win_start", "event_type"], suffixes=("_s", "_b"))
    # append mode withholds windows not yet past the watermark when the
    # stream drains — every emitted row matches batch, and only trailing
    # windows (within watermark of the stream end) may be missing
    assert len(m) == len(got)
    np.testing.assert_array_equal(m["n_s"].to_numpy(), m["n_b"].to_numpy())
    missing = exp.merge(
        got[["win_start", "event_type"]], on=["win_start", "event_type"],
        how="left", indicator=True,
    )
    missing = missing[missing["_merge"] == "left_only"]
    if len(missing):
        horizon = exp["win_start"].max() - pd.Timedelta(minutes=15)
        assert (missing["win_start"] >= horizon).all()


def test_sessionize_events_stateful(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): per-user session
    windows with event-time gap timeout. Two bursts for user 1 separated by
    > gap must land in separate sessions."""
    import pandas as pd

    from gdal_spark.streaming.incremental import sessionize_events

    t0 = pd.Timestamp("2026-01-01 00:00:00")
    rows = []
    # user 1: burst A (3 events), 30-minute silence, burst B (2 events)
    for i in range(3):
        rows.append((i, t0 + pd.Timedelta(minutes=i), 1, "c", 1.0, "{}"))
    for i in range(2):
        rows.append((10 + i, t0 + pd.Timedelta(minutes=30 + i), 1, "c", 2.0, "{}"))
    # user 2: one burst
    rows.append((20, t0 + pd.Timedelta(minutes=1), 2, "c", 5.0, "{}"))
    # a late "clock" event pushes the watermark far past every gap
    rows.append((99, t0 + pd.Timedelta(hours=3), 3, "c", 0.0, "{}"))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value",
                       "props"],
    )
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
    sink = str(tmp_path / "sess_sink")
    ckpt = str(tmp_path / "sess_ckpt")
    sessionize_events(spark, src, ckpt, sink, gap_minutes=10,
                      watermark="1 minute")
    got = (
        spark.read.parquet(sink).toPandas()
        .sort_values(["user_id", "session_start"], ignore_index=True)
    )
    u1 = got[got.user_id == 1]
    assert len(u1) == 2  # two separate sessions
    a, b = u1.iloc[0], u1.iloc[1]
    assert a["n_events"] == 3 and a["sum_value"] == 3.0
    assert a["session_start"] == t0 and a["session_end"] == t0 + pd.Timedelta(minutes=2)
    assert b["n_events"] == 2 and b["sum_value"] == 4.0
    u2 = got[got.user_id == 2]
    assert len(u2) == 1 and u2.iloc[0]["n_events"] == 1


class TestStreamingNearDup:
    def _write_docs(self, spark, path, rows):
        import pandas as pd

        spark.createDataFrame(
            pd.DataFrame(rows),
            schema="doc_id long, text string, lang string, source string, "
                   "n_chars long",
        ).coalesce(1).write.mode("append").parquet(path)

    def test_filter_drops_signature_equal_docs(self, spark, tmp_path):
        from gdal_spark.streaming.incremental import streaming_near_dup_filter

        src = str(tmp_path / "src")
        base = "the quick brown fox jumps over the lazy dog " * 8
        rows = [
            {"doc_id": 1, "text": base, "lang": "en", "source": "a",
             "n_chars": len(base)},
            {"doc_id": 2, "text": base, "lang": "en", "source": "b",
             "n_chars": len(base)},  # identical -> same signature
            {"doc_id": 3, "text": "completely different content here " * 9,
             "lang": "en", "source": "c", "n_chars": 99},
        ]
        self._write_docs(spark, src, rows)
        streaming_near_dup_filter(
            spark, src, str(tmp_path / "ck"), str(tmp_path / "out"))
        got = spark.read.parquet(str(tmp_path / "out")).toPandas()
        kept = set(got["doc_id"])
        assert 3 in kept
        assert len(kept & {1, 2}) == 1  # one representative survives

    def test_incremental_pairs_across_batches(self, spark, tmp_path):
        """A near-duplicate arriving in a LATER batch pairs with its
        original from the accumulated corpus — the cross-batch case the
        batch operator cannot see."""
        from gdal_spark.streaming.incremental import incremental_near_dup_pairs

        base = ("sphinx of black quartz judge my vow and pack my box "
                "with five dozen liquor jugs ") * 6
        near = base.replace("five dozen", "six dozen")
        other = "unrelated text that shares nothing with the base " * 8

        src1 = str(tmp_path / "s1")
        self._write_docs(spark, src1, [
            {"doc_id": 10, "text": base, "lang": "en", "source": "a",
             "n_chars": len(base)},
            {"doc_id": 11, "text": other, "lang": "en", "source": "a",
             "n_chars": len(other)},
        ])
        kw = dict(checkpoint_dir=str(tmp_path / "ck"),
                  corpus_dir=str(tmp_path / "corpus"),
                  bands_dir=str(tmp_path / "bands"),
                  pairs_dir=str(tmp_path / "pairs"))
        incremental_near_dup_pairs(spark, src1, **kw)
        # batch 2: the near-duplicate of doc 10 arrives
        self._write_docs(spark, src1, [
            {"doc_id": 12, "text": near, "lang": "en", "source": "b",
             "n_chars": len(near)},
        ])
        incremental_near_dup_pairs(spark, src1, **kw)
        pairs = spark.read.parquet(str(tmp_path / "pairs")).toPandas()
        pairs = pairs.drop_duplicates(["id_a", "id_b"])
        assert {(int(r.id_a), int(r.id_b)) for r in
                pairs.itertuples(index=False)} >= {(10, 12)}
        j = pairs.set_index(["id_a", "id_b"]).loc[(10, 12), "jaccard"]
        assert 0.5 <= float(j) < 1.0
        corpus = spark.read.parquet(str(tmp_path / "corpus")).toPandas()
        assert set(corpus["doc_id"]) == {10, 11, 12}
