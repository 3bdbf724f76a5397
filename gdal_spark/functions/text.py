"""Text-analysis column functions for training-data pipelines.

All JVM-side column expressions (split/regexp/array ops — no Python in the
hot path): language-ID by stopword scoring + CJK detection, quality scoring
from length/punct/stopword ratios, token counting, and document
fingerprinting. These extend the engine beyond the reference's surface (GDAL
has no text ops) per the training-data mandate; the SQL-dialect precedent is
the reference's scalar function registry
(/root/reference/ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import ArrayType, LongType

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "sich"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "dans", "que"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que", "por", "con"],
}


def tokens(col) -> Column:
    """Whitespace tokenization (empty input -> empty array)."""
    t = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(col) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col) -> Column:
    """Sub-word-ish token estimate: count word pieces + digits + punctuation
    runs (a BPE-flavored regex split), the cheap proxy used for budget
    accounting in data pipelines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.filter(
            F.split(c, r"(?=[A-Z])|[\s]+|(?<=[a-z])(?=[0-9])|(?=[^\w\s])"),
            lambda x: x != "",
        )
    )


def stopword_hits(col, lang: str) -> Column:
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    return F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in STOPWORDS[lang]]),
        )
    )


def cjk_char_count(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, r"[一-鿿]", ""))


def lang_id(col) -> Column:
    """Best-scoring language among en/de/fr/es/zh (n-gram/stopword heuristic).
    CJK characters dominate when present; otherwise max stopword hits, ties
    broken by fixed language order; 'und' (undetermined) when no signal."""
    scores = F.array(
        *[
            F.struct(stopword_hits(col, lg).alias("s"), F.lit(lg).alias("lg"))
            for lg in ("en", "de", "fr", "es")
        ]
    )
    best = F.array_max(scores)
    return (
        F.when(cjk_char_count(col) > 0, F.lit("zh"))
        .when(best["s"] > 0, best["lg"])
        .otherwise(F.lit("und"))
    )


def punct_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return punct / F.greatest(F.length(c), F.lit(1))


def upper_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    upper = F.length(c) - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    return upper / F.greatest(F.length(c), F.lit(1))


def mean_token_len(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, r"\s+", "")) / F.greatest(
        token_count(col), F.lit(1)
    )


def quality_score(col) -> Column:
    """[0,1] heuristic quality: enough tokens, sane word lengths, sane
    punctuation — the standard cheap pre-filter for web-scale corpora."""
    ntok = token_count(col)
    mtl = mean_token_len(col)
    pr = punct_ratio(col)
    return F.round(
        F.least(ntok / F.lit(20.0), F.lit(1.0)) * 0.4
        + F.when((mtl >= 3) & (mtl <= 12), 0.4).otherwise(0.0)
        + F.when(pr <= 0.2, 0.2).otherwise(0.0),
        4,
    )


def fingerprint(col) -> Column:
    """64-bit document fingerprint over whitespace-normalized lowercase text
    (the exact-dedup key; xxhash64 = JVM-side, zero Python)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))


def shingles(col, n: int = 5) -> Column:
    """Character n-gram shingle array (distinct), JVM-side via
    sequence+substring — the MinHash input. NOTE: prefer
    :func:`shingle_hashes` in hot paths — this JVM expression costs tens of
    seconds per call on this Spark build (substr/array_distinct overhead);
    kept for tests needing the actual shingle strings."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1))),
            lambda i: norm.substr(i, F.lit(n)),
        )
    )


def shingle_hashes(col, n: int = 5) -> Column:
    """Distinct 63-bit hashes of the character n-gram shingles, computed as
    a vectorized numpy rolling hash inside an Arrow batch (O(len) per doc).
    Used by the MinHash/Jaccard pipeline — shingle identity via 63-bit hash
    (collision odds negligible, and consistent across all consumers)."""
    @F.pandas_udf(ArrayType(LongType()))
    def _udf(s: pd.Series) -> pd.Series:
        out = []
        mult = np.uint64(0x9E3779B97F4A7C15)
        with np.errstate(over="ignore"):
            for text in s:
                if text is None:
                    out.append([])
                    continue
                norm = " ".join(str(text).split()).lower().encode("utf-8")
                if not norm:
                    # empty/whitespace-only doc -> empty shingle set (NOT a
                    # padded space-shingle: all such docs would share it and
                    # melt into one quadratic LSH bucket; exact dedup owns them)
                    out.append([])
                    continue
                if len(norm) < n:
                    norm = norm + b" " * (n - len(norm))
                a = np.frombuffer(norm, dtype=np.uint8).astype(np.uint64)
                win = np.lib.stride_tricks.sliding_window_view(a, n)
                weights = mult ** np.arange(n, dtype=np.uint64)
                h = (win * weights[None, :]).sum(axis=1)
                h = (h ^ (h >> np.uint64(31))) * np.uint64(0xBF58476D1CE4E5B9)
                h = (h >> np.uint64(1)).astype(np.int64)  # non-negative
                out.append(np.unique(h))
        return pd.Series(out)

    return _udf(F.col(col) if isinstance(col, str) else col)
