"""Similarity search over embedding columns (`array<float>`).

* brute-force cosine top-k: exact baseline — one JVM-side map (zip_with dot
  product) + TakeOrdered; no shuffle beyond the final top-k gather.
* IVF-style bucketed ANN: coarse quantizer (random projections to nprobe-able
  sign buckets) restricts the exact rescore to colliding buckets — the scale
  path when the corpus doesn't fit a single top-k pass.
"""

from __future__ import annotations

import numpy as np
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
