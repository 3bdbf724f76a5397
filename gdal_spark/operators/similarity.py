"""Similarity search over embedding columns (`array<float>`).

* brute-force cosine top-k: exact baseline — one JVM-side map (zip_with dot
  product) + TakeOrdered; no shuffle beyond the final top-k gather.
* IVF-style bucketed ANN: coarse quantizer (random projections to nprobe-able
  sign buckets) restricts the exact rescore to colliding buckets — the scale
  path when the corpus doesn't fit a single top-k pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _dot_with_literal(vec_col, query: np.ndarray):
    q = F.array(*[F.lit(float(v)) for v in query])
    return F.aggregate(
        F.zip_with(vec_col, q, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )


def _norm(vec_col):
    return F.sqrt(
        F.aggregate(F.transform(vec_col, lambda x: x * x), F.lit(0.0),
                    lambda a, x: a + x)
    )


def cosine_topk(df: DataFrame, query: np.ndarray, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id"
                ) -> DataFrame:
    """Exact cosine top-k against one query vector. Catalyst plans
    TakeOrderedAndProject — no full sort, no wide shuffle."""
    qn = float(np.linalg.norm(query))
    scored = df.select(
        F.col(id_col),
        (_dot_with_literal(F.col(vec_col), query) / (_norm(F.col(vec_col)) * qn)
         ).alias("cosine"),
    )
    return (
        scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round("cosine", 6).alias("cosine"))
    )


def lsh_topk(df: DataFrame, query: np.ndarray, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             planes: int = 12, max_hamming: int = 2, seed: int = 42
             ) -> DataFrame:
    """ANN top-k: random-hyperplane signature prefilter (keep candidates
    whose sign-signature is within ``max_hamming`` of the query's), exact
    cosine rescore of survivors. Recall/speed dial = planes & max_hamming."""
    rng = np.random.default_rng(seed)
    dim = len(query)
    hp = rng.normal(size=(planes, dim))
    qsig = 0
    for p in range(planes):
        if float(hp[p] @ query) >= 0:
            qsig |= 1 << p

    bits = [
        F.when(_dot_with_literal(F.col(vec_col), hp[p]) >= 0, F.lit(1 << p))
        .otherwise(F.lit(0))
        for p in range(planes)
    ]
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b

    qn = float(np.linalg.norm(query))
    return (
        df.select(F.col(id_col), F.col(vec_col), sig.alias("sig"))
        .where(F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= max_hamming)
        .select(
            F.col(id_col),
            (
                _dot_with_literal(F.col(vec_col), query)
                / (_norm(F.col(vec_col)) * qn)
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round("cosine", 6).alias("cosine"))
    )


def embedding_pca(df: DataFrame, k: int = 8, vec_col: str = "embedding",
                  id_col: str = "vec_id", whiten: bool = False):
    """Distributed PCA over an `array<float>` column — the embedding
    dimensionality-reduction step of a training-data pipeline (beyond the
    reference's surface, per the engine's training-data mandate).

    Execution shape: mean and covariance via per-partition Arrow-batched
    numpy PARTIALS (sum vector + Gram matrix per batch) merged with one
    tiny driver reduce — the d x d Gram never exceeds a few KB regardless
    of row count, so the only full-data pass is map-side. Eigendecomposition
    runs on the driver (d x d); the projection back over the rows is a
    second map-only pass.

    Returns (projected_df with `components` array<double>[k], explained
    variance ratios as a list).
    """
    from pyspark.sql.types import ArrayType, DoubleType

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame({
                "n": [m.shape[0]],
                "s": [m.sum(axis=0).tolist()],
                "g": [(m.T @ m).ravel().tolist()],
            })

    part = df.select(vec_col).mapInPandas(
        partials, schema="n long, s array<double>, g array<double>"
    ).toPandas()
    if len(part) == 0:
        raise ValueError("embedding_pca: empty input")
    n = int(part["n"].sum())
    s = np.sum(np.vstack(part["s"].to_numpy()), axis=0)
    # dim inferred from the collected partials (no separate driver probe)
    dim = s.shape[0]
    gram = np.sum(np.vstack(part["g"].to_numpy()), axis=0).reshape(dim, dim)
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    evals = np.maximum(evals[order], 0.0)
    basis = evecs[:, order]  # (d, k)
    if whiten:
        basis = basis / np.sqrt(np.maximum(evals, 1e-12))[None, :]
    explained = (evals / max(np.trace(cov), 1e-30)).tolist()

    @F.pandas_udf(ArrayType(DoubleType()))
    def project(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy()).astype(np.float64) - mean[None, :]
        proj = m @ basis
        return pd.Series(list(proj))

    out = df.select(F.col(id_col), project(F.col(vec_col)).alias("components"))
    return out, explained


def ivf_build(df: DataFrame, nlist: int = 16, sample: int = 2048,
              iters: int = 10, seed: int = 7, vec_col: str = "embedding",
              id_col: str = "vec_id"):
    """IVF coarse quantizer (the FAISS IndexIVFFlat shape): k-means
    centroids trained on a bounded driver-side SAMPLE (nlist x dim floats
    — tiny), then ONE map-side Arrow pass assigns every vector to its
    nearest centroid by cosine.  Returns (assigned_df with ``list_id``,
    centroids).  At store scale the assigned table is written
    ``partitionBy('list_id')`` so probes prune whole partitions — the
    companion of the LSH path for recall-critical workloads."""
    pdf = df.select(vec_col).limit(sample).toPandas()
    X = np.stack(pdf[vec_col].to_numpy())
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = Xn[rng.choice(len(Xn), size=min(nlist, len(Xn)), replace=False)]
    for _ in range(iters):
        assign = (Xn @ cent.T).argmax(axis=1)
        for c in range(cent.shape[0]):
            m = assign == c
            if m.any():
                v = Xn[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    C = cent.copy()

    def assign_lists(batches):
        for b in batches:
            V = np.stack(b[vec_col].to_numpy())
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                                1e-12)
            lid = (Vn @ C.T).argmax(axis=1)
            out = b[[id_col, vec_col]].copy()
            out["list_id"] = lid.astype(np.int32)
            yield out

    from pyspark.sql.types import IntegerType, StructField

    schema = df.select(id_col, vec_col).schema.add(
        StructField("list_id", IntegerType()))
    assigned = df.select(id_col, vec_col).mapInPandas(
        assign_lists, schema=schema)
    return assigned, C


def ivf_topk(assigned: DataFrame, centroids: np.ndarray, query: np.ndarray,
             k: int = 10, nprobe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """IVF probe: rank centroids by cosine to the query, restrict the
    exact rescore to the ``nprobe`` nearest inverted lists (a partition
    filter on a list_id-partitioned store), TakeOrdered the survivors.
    Recall dial = nprobe/nlist; nprobe = nlist degenerates to exact."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    order = (centroids @ qn).argsort()[::-1][:nprobe]
    probe = [int(x) for x in order]
    qnorm = float(np.linalg.norm(query))
    return (
        assigned.where(F.col("list_id").isin(probe))
        .select(
            F.col(id_col),
            (
                _dot_with_literal(F.col(vec_col), query)
                / (_norm(F.col(vec_col)) * qnorm)
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round("cosine", 6).alias("cosine"))
    )


def ivf_write_store(assigned: DataFrame, centroids: np.ndarray,
                    path: str) -> None:
    """Persist the IVF index as a ``list_id``-partitioned parquet store
    plus a ``_ivf_meta.json`` centroid sidecar — the FAISS-IVFFlat
    on-object-store shape: each inverted list is a partition directory,
    so an ``nprobe`` probe becomes a partition predicate and a corpus
    scan touches only ~nprobe/nlist of the bytes regardless of corpus
    size.  Centroids are nlist x dim floats — metadata, not data."""
    import json
    import os

    assigned.write.mode("overwrite").partitionBy("list_id").parquet(path)
    meta = {
        "nlist": int(centroids.shape[0]),
        "dim": int(centroids.shape[1]),
        "centroids": [[float(x) for x in row] for row in centroids],
    }
    with open(os.path.join(path, "_ivf_meta.json"), "w") as fh:
        json.dump(meta, fh)


def ivf_open_store(spark, path: str):
    """Open a store written by ivf_write_store: returns (assigned_df,
    centroids).  ``list_id`` comes back as a partition column, so
    ivf_topk's ``isin(probe)`` filter prunes whole directories
    (PartitionFilters in the scan plan — asserted in tests)."""
    import json
    import os

    with open(os.path.join(path, "_ivf_meta.json")) as fh:
        meta = json.load(fh)
    df = spark.read.parquet(path)
    return df, np.asarray(meta["centroids"], dtype=np.float64)


def pq_train(df: DataFrame, m: int = 8, ksub: int = 256, sample: int = 4096,
             iters: int = 10, seed: int = 7, vec_col: str = "embedding"
             ) -> np.ndarray:
    """Product-quantization codebooks (Jegou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011 — the FAISS IndexPQ shape):
    split the (L2-normalized) vector into ``m`` subspaces and k-means each
    on a bounded driver-side sample.  Returns (m, ksub, dim/m) float64 —
    kilobytes of metadata; the corpus itself never leaves the executors.
    Vectors are normalized so ADC's L2 ranking is cosine ranking
    (||a-b||^2 = 2 - 2 cos on the unit sphere)."""
    pdf = df.select(vec_col).limit(sample).toPandas()
    X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n, dim = X.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, min(ksub, n), dsub))
    for j in range(m):
        S = X[:, j * dsub:(j + 1) * dsub]
        cent = S[rng.choice(n, size=min(ksub, n), replace=False)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(cent.shape[0]):
                mask = a == c
                if mask.any():
                    cent[c] = S[mask].mean(axis=0)
        books[j] = cent
    return books


def pq_encode(df: DataFrame, codebooks: np.ndarray,
              vec_col: str = "embedding", id_col: str = "vec_id"
              ) -> DataFrame:
    """One map-side Arrow pass: vector -> ``m`` uint8 codes (emitted as
    array<smallint>).  At 768-dim float32 and m=8 this is a 384x
    compression — the representation that makes ANN over a 100 TB
    embedding corpus memory-feasible."""
    B = codebooks
    m, ksub, dsub = B.shape

    def enc(batches):
        for b in batches:
            V = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(V), m), dtype=np.int16)
            for j in range(m):
                S = V[:, j * dsub:(j + 1) * dsub]
                d2 = ((S[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
            out = b[[id_col]].copy()
            out["codes"] = list(codes)
            yield out

    return df.select(id_col, vec_col).mapInPandas(
        enc, schema=f"{id_col} {dict(df.dtypes)[id_col]}, "
                    "codes array<smallint>")


def pq_topk(codes_df: DataFrame, codebooks: np.ndarray, query: np.ndarray,
            k: int = 10, id_col: str = "vec_id",
            refine_df: DataFrame | None = None,
            refine_factor: int = 4, vec_col: str = "embedding") -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the query builds an (m, ksub)
    distance table driver-side; each executor scores a row with m table
    gathers — no vector math, no decompression.  Output column ``cosine``
    is the ADC estimate 1 - d2/2 (exact on the codebook centroids).

    ``refine_df`` re-ranks the top ``refine_factor * k`` ADC candidates
    with exact cosine against the original vectors (the FAISS refine
    stage) — a semi-join of ~k rows, not a corpus scan."""
    B = codebooks
    m, ksub, dsub = B.shape
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    table = np.stack([
        ((q[j * dsub:(j + 1) * dsub][None, :] - B[j]) ** 2).sum(axis=1)
        for j in range(m)
    ])  # (m, ksub)

    def score(batches):
        for b in batches:
            C = np.stack(b["codes"].to_numpy()).astype(np.int64)
            d2 = table[np.arange(m)[None, :], C].sum(axis=1)
            out = b[[id_col]].copy()
            out["cosine"] = 1.0 - d2 / 2.0
            yield out

    scored = codes_df.mapInPandas(
        score, schema=f"{id_col} {dict(codes_df.dtypes)[id_col]}, "
                      "cosine double")
    n_cand = (refine_factor * k) if refine_df is not None else k
    top = (scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc())
           .limit(n_cand))
    if refine_df is None:
        return top.select(id_col, F.round("cosine", 6).alias("cosine"))
    qnorm = float(np.linalg.norm(query))
    exact = (
        refine_df.join(top.select(id_col), id_col, "left_semi")
        .select(
            F.col(id_col),
            (_dot_with_literal(F.col(vec_col), query)
             / (_norm(F.col(vec_col)) * qnorm)).alias("cosine"),
        )
    )
    return (exact.orderBy(F.col("cosine").desc(), F.col(id_col).asc())
            .limit(k)
            .select(id_col, F.round("cosine", 6).alias("cosine")))


def ivfpq_topk(assigned: DataFrame, centroids: np.ndarray,
               codebooks: np.ndarray, query: np.ndarray, k: int = 10,
               nprobe: int = 4, id_col: str = "vec_id",
               vec_col: str = "embedding",
               refine: bool = True, refine_factor: int = 4) -> DataFrame:
    """IVF + PQ composition (the FAISS IndexIVFPQ shape): the coarse
    quantizer prunes to ``nprobe`` inverted lists (a partition filter on
    a list_id-partitioned store), then ADC scores only the surviving
    rows' codes — at 100 TB the scan touches ~nprobe/nlist of the
    partitions and reads m-byte codes, with the optional exact refine
    touching ~refine_factor*k full vectors.  ``assigned`` must carry the
    codes column from pq_encode joined onto ivf_build's output (or be
    the opened store with both)."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    order = (centroids @ qn).argsort()[::-1][:nprobe]
    probe = [int(x) for x in order]
    pruned = assigned.where(F.col("list_id").isin(probe))
    codes_df = pruned.select(id_col, "codes")
    refine_df = (pruned.select(id_col, vec_col)
                 if refine and vec_col in assigned.columns else None)
    return pq_topk(codes_df, codebooks, query, k=k, id_col=id_col,
                   refine_df=refine_df, refine_factor=refine_factor,
                   vec_col=vec_col)
