"""Text analysis, dedup families, and similarity search."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb_pdf():
    import duckdb

    con = duckdb.connect()
    return con.sql(f"SELECT * FROM read_parquet('{SF}/embeddings.parquet')").df()


class TestTextFunctions:
    def test_token_count_matches_python(self, spark, docs):
        from gdal_spark.functions.text import token_count

        got = docs.select("doc_id", token_count("text").alias("n")).toPandas()
        texts = docs.select("doc_id", "text").toPandas()
        merged = got.merge(texts, on="doc_id")
        exp = merged["text"].str.split().str.len()
        np.testing.assert_array_equal(merged["n"].to_numpy(), exp.to_numpy())

    def test_quality_score_range(self, spark, docs):
        from gdal_spark.functions.text import quality_score

        q = docs.select(quality_score("text").alias("q")).toPandas()["q"]
        assert (q >= 0).all() and (q <= 1).all()
        assert q.nunique() > 1

    def test_lang_id_crafted(self, spark):
        from gdal_spark.functions.text import lang_id

        samples = pd.DataFrame(
            {
                "text": [
                    "the cat sat on the mat and it was happy",
                    "der Hund ist nicht mit der Katze auf dem Sofa",
                    "le chat est dans la maison et les enfants",
                    "el perro es un animal que vive con las personas",
                    "这是 一个 中文 句子",
                    "zzz qqq xxx",
                ]
            }
        )
        got = spark.createDataFrame(samples).select(lang_id("text").alias("lg")).toPandas()
        assert got["lg"].tolist() == ["en", "de", "fr", "es", "zh", "und"]

    def test_fingerprint_normalization(self, spark):
        from gdal_spark.functions.text import fingerprint

        pdf = pd.DataFrame({"text": ["Hello   World", "hello world", "other"]})
        got = spark.createDataFrame(pdf).select(fingerprint("text").alias("fp")).toPandas()
        assert got["fp"][0] == got["fp"][1]
        assert got["fp"][0] != got["fp"][2]


class TestGopherRules:
    """Gopher quality filters (arXiv:2112.11446 §A1.1) on crafted docs with
    Python-computed expectations."""

    def _metrics(self, spark, texts):
        from gdal_spark.functions.text import (
            gopher_keep, gopher_metrics, token_count, top_bigram_frac)

        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
        gm = gopher_metrics("text")
        m = docs.select(
            "doc_id", token_count("text").cast("long").alias("n_tokens"),
            *[v.alias(k) for k, v in gm.items()])
        out = (m.join(top_bigram_frac(docs), "doc_id", "left")
                .fillna({"top_bigram_frac_u": 0})
                .withColumn("gopher_keep", gopher_keep(F.col("n_tokens"))))
        return out.toPandas().set_index("doc_id").sort_index()

    def test_duplicate_lines(self, spark):
        text = "aaa\nbbb\naaa\n\n  \nccc"
        got = self._metrics(spark, [text]).loc[0]
        # 4 non-blank lines, one duplicate beyond first (aaa)
        assert got["n_lines"] == 4
        assert got["dup_line_frac_u"] == round(1 / 4 * 1e6)
        # chars in repeats beyond first = 3 of 12 line chars
        assert got["dup_line_char_frac_u"] == round(3 / 12 * 1e6)

    def test_bullet_and_ellipsis_lines(self, spark):
        text = "- item one\n* item two\nplain\ntrails off...\nand more…"
        got = self._metrics(spark, [text]).loc[0]
        assert got["bullet_line_frac_u"] == round(2 / 5 * 1e6)
        assert got["ellipsis_line_frac_u"] == round(2 / 5 * 1e6)

    def test_symbol_ratio_and_alpha(self, spark):
        text = "alpha ## beta ... 123 …"
        got = self._metrics(spark, [text]).loc[0]
        # symbols: 2 hashes + 1 '...' + 1 '…' over 6 words
        assert got["symbol_word_ratio_u"] == round(4 / 6 * 1e6)
        # words with an alphabetic char: alpha, beta = 2 of 6
        assert got["alpha_word_frac_u"] == round(2 / 6 * 1e6)

    def test_top_bigram_tie_break(self, spark):
        # "the cat" and "cat the" both occur twice; tie -> lexicographically
        # largest bigram ("the cat")
        text = "the cat the cat the"
        got = self._metrics(spark, [text]).loc[0]
        word_chars = 3 * 5  # 15 chars over 5 words
        assert got["top_bigram_frac_u"] == round(2 * 6 / word_chars * 1e6)

    def test_keep_flag(self, spark):
        good = " ".join(
            ["the quick brown fox jumps over that lazy dog with gusto"] * 6)
        too_short = "the cat sat"
        gibberish = " ".join(["zxqv"] * 80)  # no stopwords
        spammy = "\n".join(["buy now..."] * 60) + " " + good
        got = self._metrics(spark, [good, too_short, gibberish, spammy])
        assert got.loc[0, "gopher_keep"] == 1
        assert got.loc[1, "gopher_keep"] == 0  # < 50 words
        assert got.loc[2, "gopher_keep"] == 0  # no stopwords, top-bigram dup
        assert got.loc[3, "gopher_keep"] == 0  # ellipsis lines + dup lines

    def test_empty_and_single_word(self, spark):
        got = self._metrics(spark, ["", "   ", "word"])
        assert (got["n_lines"] == [0, 0, 1]).all()
        assert (got["top_bigram_frac_u"] == 0).all()
        assert (got["gopher_keep"] == 0).all()


class TestGopherDupNgrams:
    def test_planted_repetition(self, spark):
        from gdal_spark.functions.text import gopher_dup_ngram_fracs

        rep = "a b c d e f a b c d e f x"   # dup 5/6-grams, none longer
        clean = "the quick brown fox jumps over a lazy dog near town"
        pdf = pd.DataFrame({"doc_id": [1, 2], "text": [rep, clean]})
        fr = gopher_dup_ngram_fracs("text")
        got = (spark.createDataFrame(pdf)
               .select("doc_id", *[fr[i].alias(f"n{n}")
                                   for i, n in enumerate((5, 6, 7, 8, 9, 10))])
               .toPandas().set_index("doc_id").sort_index())
        # words 0..11 duplicated via 5-grams, minus the uncovered gap space
        # between the two halves: 22 of 25 chars
        assert got.loc[1, "n5"] == round(22 / 25 * 1e6)
        # the full 6-gram "a b c d e f" repeats at words 0 and 6: the two
        # 11-char spans again exclude the gap space -> 22 of 25 chars
        assert got.loc[1, "n6"] == round(22 / 25 * 1e6)
        assert got.loc[1, "n7"] == 0
        assert (got.loc[2] == 0).all()

    def test_short_and_empty(self, spark):
        from gdal_spark.functions.text import gopher_dup_ngram_fracs

        pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["", "one two"]})
        fr = gopher_dup_ngram_fracs("text")
        got = (spark.createDataFrame(pdf)
               .select(*[fr[i].alias(f"n{n}")
                         for i, n in enumerate((5, 6, 7, 8, 9, 10))])
               .toPandas())
        assert (got.to_numpy() == 0).all()


class TestC4Clean:
    def test_line_rules(self, spark):
        from gdal_spark.functions.text import c4_line_clean

        text = "\n".join([
            "This sentence has enough words and ends well.",   # kept
            "Too short line.",                                  # < 5 words
            "This line has plenty of words but no terminal punct",  # no punct
            "Enable javascript to view this content please.",   # javascript
            "Another perfectly fine sentence sits right here!", # kept
        ])
        lc = c4_line_clean("text")
        got = (spark.createDataFrame(pd.DataFrame({"text": [text]}))
               .select(*[v.alias(k) for k, v in lc.items()]).toPandas().iloc[0])
        assert got["n_kept_lines"] == 2
        lines = got["text_clean"].split("\n")
        assert lines[0].startswith("This sentence") and lines[1].startswith("Another")

    def test_page_rules(self, spark):
        from gdal_spark.functions.text import c4_line_clean

        good = ("One good sentence is sitting here. Another good sentence "
                "is also here. A third keeps the page alive.")
        lorem = good + " And now some lorem ipsum filler text appears."
        brace = good + " Code tokens like { break pages."
        short = "Only one proper sentence lives on this page."
        pdf = pd.DataFrame({"doc_id": range(4),
                            "text": [good, lorem, brace, short]})
        lc = c4_line_clean("text")
        got = (spark.createDataFrame(pdf)
               .select("doc_id", *[v.alias(k) for k, v in lc.items()])
               .toPandas().set_index("doc_id").sort_index())
        assert got["page_ok"].tolist() == [1, 0, 0, 0]

    def test_span_dedup_cross_doc(self, spark):
        from gdal_spark.operators.dedup import c4_span_dedup

        dup = ("The quick brown fox jumps. A lazy dog sleeps nearby. "
               "Rivers flow to the sea.")
        doc_a = dup + " Mountains rise in the west."
        doc_b = "Fresh opening line here. " + dup
        doc_c = "Totally unrelated one. Totally unrelated two. Unrelated three."
        pdf = pd.DataFrame({"doc_id": [1, 2, 3],
                            "text": [doc_a, doc_b, doc_c]})
        got = (c4_span_dedup(spark.createDataFrame(pdf))
               .toPandas().set_index("doc_id").sort_index())
        # doc 1 holds the first occurrence -> untouched
        assert got.loc[1, "n_removed_sentences"] == 0
        # doc 2 loses exactly the 3 duplicated sentences
        assert got.loc[2, "n_removed_sentences"] == 3
        assert got.loc[2, "text_dedup"] == "Fresh opening line here."
        assert got.loc[3, "n_removed_sentences"] == 0
        assert got.loc[3, "n_sentences"] == 3

    def test_span_dedup_normalized_match(self, spark):
        from gdal_spark.operators.dedup import c4_span_dedup

        base = "Alpha one ends. Beta two ends. Gamma three ends."
        shouty = "ALPHA ONE ENDS. BETA   TWO ENDS. GAMMA THREE ENDS."
        pdf = pd.DataFrame({"doc_id": [1, 2], "text": [base, shouty]})
        got = (c4_span_dedup(spark.createDataFrame(pdf))
               .toPandas().set_index("doc_id").sort_index())
        # case/whitespace-normalized hash: doc 2 is a duplicate of doc 1
        assert got.loc[1, "n_removed_sentences"] == 0
        assert got.loc[2, "n_removed_sentences"] == 3
        assert got.loc[2, "text_dedup"] == ""


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    """Real doc texts + crafted near/exact duplicates."""
    base = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .limit(40)
        .toPandas()
    )
    rows = list(base.itertuples(index=False))
    extra = []
    for i in range(5):
        src = rows[i]
        extra.append((1000 + i, src.text))  # exact dup
        words = src.text.split()
        words[len(words) // 2] = "CHANGED"
        extra.append((2000 + i, " ".join(words)))  # near dup
    pdf = pd.concat(
        [base, pd.DataFrame(extra, columns=["doc_id", "text"])], ignore_index=True
    )
    return spark.createDataFrame(pdf)


class TestDedup:
    def test_exact_dedup(self, spark, near_dup_docs):
        from gdal_spark.operators.dedup import exact_dedup

        groups = exact_dedup(near_dup_docs).toPandas()
        assert groups["n_dups"].sum() == 5
        assert (groups[groups.n_dups > 0]["keep_id"] < 1000).all()

    def test_minhash_lsh_recovers_near_dups(self, spark, near_dup_docs):
        from gdal_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

        lsh = minhash_lsh_pairs(near_dup_docs, jaccard_threshold=0.6).toPandas()
        exact = ngram_jaccard_pairs(
            near_dup_docs, shingle_n=5, threshold=0.6
        ).toPandas()
        lsh_pairs = set(zip(lsh.id_a, lsh.id_b))
        exact_pairs = set(zip(exact.id_a, exact.id_b))
        # every planted pair recovered by both paths
        for i in range(5):
            assert (i, 1000 + i) in exact_pairs
            assert (i, 1000 + i) in lsh_pairs
            assert (i, 2000 + i) in exact_pairs
            assert (i, 2000 + i) in lsh_pairs
        # LSH never invents pairs below threshold (refined by exact jaccard)
        assert lsh_pairs <= exact_pairs

    def test_lsh_jaccard_equals_exact(self, spark, near_dup_docs):
        from gdal_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

        lsh = minhash_lsh_pairs(near_dup_docs, jaccard_threshold=0.6).toPandas()
        exact = ngram_jaccard_pairs(near_dup_docs, shingle_n=5, threshold=0.6).toPandas()
        m = lsh.merge(exact, on=["id_a", "id_b"], suffixes=("_l", "_e"))
        np.testing.assert_allclose(m["jaccard_l"], m["jaccard_e"], atol=1e-6)

    def test_simhash_near_pairs(self, spark, near_dup_docs):
        from gdal_spark.operators.dedup import simhash_near_pairs

        got = simhash_near_pairs(near_dup_docs, max_hamming=8).toPandas()
        pairs = set(zip(got.id_a, got.id_b))
        for i in range(5):
            assert (i, 1000 + i) in pairs  # exact dups at hamming 0
        assert (got[got.id_b >= 1000]["hamming"] <= 8).all()

    def test_embedding_near_pairs(self, spark, emb_pdf):
        from gdal_spark.operators.dedup import embedding_near_pairs

        # plant near-dups: jitter 5 vectors slightly
        base = emb_pdf.copy()
        extra = base.head(5).copy()
        extra["vec_id"] = extra["vec_id"] + 10000
        extra["embedding"] = extra["embedding"].apply(
            lambda v: (np.asarray(v) + np.random.default_rng(1).normal(0, 0.01, len(v))).tolist()
        )
        pdf = pd.concat([base, extra], ignore_index=True)
        pdf["embedding"] = pdf["embedding"].apply(lambda v: [float(x) for x in v])
        df = spark.createDataFrame(pdf[["vec_id", "embedding"]])
        got = embedding_near_pairs(df, threshold=0.95).toPandas()
        pairs = set(zip(got.id_a, got.id_b))
        found = sum((i, i + 10000) in pairs for i in base.head(5)["vec_id"])
        assert found >= 4  # multi-table LSH recall

        # no false positives: every reported cosine really >= threshold (numpy)
        vecs = {r.vec_id: np.asarray(r.embedding) for r in pdf.itertuples(index=False)}
        for r in got.itertuples(index=False):
            a, b = vecs[r.id_a], vecs[r.id_b]
            cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
            assert cos >= 0.95 - 1e-6


class TestSimilarity:
    def test_cosine_topk_matches_numpy(self, spark, emb_pdf):
        from gdal_spark.operators.similarity import cosine_topk

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": emb_pdf["vec_id"],
                    "embedding": emb_pdf["embedding"].apply(
                        lambda v: [float(x) for x in v]
                    ),
                }
            )
        )
        q = np.asarray(emb_pdf.iloc[7]["embedding"], dtype=np.float64)
        got = cosine_topk(df, q, k=10).toPandas()
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb_pdf["embedding"]])
        cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
        order = np.lexsort((emb_pdf["vec_id"].to_numpy(), -cos))[:10]
        np.testing.assert_array_equal(
            got["vec_id"].to_numpy(), emb_pdf["vec_id"].to_numpy()[order]
        )
        assert got["vec_id"].iloc[0] == emb_pdf["vec_id"].iloc[7]  # self first

    def test_lsh_topk_subset_and_scores(self, spark, emb_pdf):
        from gdal_spark.operators.similarity import cosine_topk, lsh_topk

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": emb_pdf["vec_id"],
                    "embedding": emb_pdf["embedding"].apply(
                        lambda v: [float(x) for x in v]
                    ),
                }
            )
        )
        q = np.asarray(emb_pdf.iloc[3]["embedding"], dtype=np.float64)
        ann = lsh_topk(df, q, k=5).toPandas()
        assert len(ann) > 0
        # the query's own vector survives the prefilter (hamming 0)
        assert ann["vec_id"].iloc[0] == emb_pdf["vec_id"].iloc[3]
        exact = cosine_topk(df, q, k=500).toPandas().set_index("vec_id")["cosine"]
        for r in ann.itertuples(index=False):
            assert abs(exact.loc[r.vec_id] - r.cosine) < 1e-5
    def test_ivf_topk_recall_and_full_probe_exact(self, spark, emb_pdf):
        """IVF probe: nprobe=nlist degenerates to the exact top-k; at
        nprobe=6/16 the query's own list is always probed (its centroid is
        the nearest by construction) so the self-match and its planted
        near-duplicates are recovered."""
        from gdal_spark.operators.similarity import (
            cosine_topk, ivf_build, ivf_topk)

        rng = np.random.default_rng(11)
        q = np.asarray(emb_pdf.iloc[5]["embedding"], dtype=np.float64)
        rows = [
            {"vec_id": int(v), "embedding": [float(x) for x in e]}
            for v, e in zip(emb_pdf["vec_id"], emb_pdf["embedding"])
        ]
        planted = []
        for j in range(4):
            nb = q + rng.normal(0, 0.02 * np.abs(q).mean(), q.shape)
            planted.append(20_000 + j)
            rows.append({"vec_id": 20_000 + j,
                         "embedding": [float(x) for x in nb]})
        df = spark.createDataFrame(pd.DataFrame(rows))
        assigned, cent = ivf_build(df, nlist=16, sample=10_000)
        # full probe == exact
        full = ivf_topk(assigned, cent, q, k=8, nprobe=16).toPandas()
        exact = cosine_topk(df, q, k=8).toPandas()
        np.testing.assert_array_equal(full["vec_id"].to_numpy(),
                                      exact["vec_id"].to_numpy())
        # partial probe recovers self + planted near-dups
        ann = ivf_topk(assigned, cent, q, k=5, nprobe=6).toPandas()
        assert ann["vec_id"].iloc[0] == emb_pdf["vec_id"].iloc[5]
        found = len(set(ann["vec_id"]) & set(planted))
        assert found >= 3, f"recovered {found}/4 planted near-duplicates"

    def test_lsh_topk_recall_on_planted_neighbors(self, spark, emb_pdf):
        """Recall assertion (round-1 review): the signature prefilter must
        recover PLANTED near-duplicates (cosine ~0.99) — the workload the
        ANN path exists for. (On near-orthogonal vectors low recall is
        inherent to sign-LSH: a 75° pair disagrees on ~5 of 12 planes.)"""
        from gdal_spark.operators.similarity import lsh_topk

        rng = np.random.default_rng(3)
        q = np.asarray(emb_pdf.iloc[3]["embedding"], dtype=np.float64)
        rows = [
            {"vec_id": int(v), "embedding": [float(x) for x in e]}
            for v, e in zip(emb_pdf["vec_id"], emb_pdf["embedding"])
        ]
        planted = []
        for j in range(5):
            nb = q + rng.normal(0, 0.02 * np.abs(q).mean(), q.shape)
            planted.append(10_000 + j)
            rows.append({"vec_id": 10_000 + j,
                         "embedding": [float(x) for x in nb]})
        df = spark.createDataFrame(pd.DataFrame(rows))
        ann = lsh_topk(df, q, k=6).toPandas()
        found = len(set(ann["vec_id"]) & set(planted))
        assert found >= 4, f"recovered {found}/5 planted near-duplicates"


class TestIvfStore:
    def test_ivf_store_probe_prunes_partitions(self, spark, emb_pdf,
                                               tmp_path):
        """The 100 TB shape: the assigned table written
        partitionBy('list_id'), a probe's isin(list_id) filter reaches the
        scan as a PARTITION filter (whole directories pruned before any
        file I/O), and the store round-trips the same top-k as the
        in-memory path."""
        import contextlib
        import io
        import re

        import pandas as pd

        from gdal_spark.operators.similarity import (
            ivf_build, ivf_open_store, ivf_topk, ivf_write_store)

        rows = [
            {"vec_id": int(v), "embedding": [float(x) for x in e]}
            for v, e in zip(emb_pdf["vec_id"], emb_pdf["embedding"])
        ]
        df = spark.createDataFrame(pd.DataFrame(rows))
        assigned, cent = ivf_build(df, nlist=8, sample=10_000)
        path = str(tmp_path / "ivf_store")
        ivf_write_store(assigned, cent, path)
        back, cent2 = ivf_open_store(spark, path)
        np.testing.assert_allclose(cent2, cent)

        q = np.asarray(emb_pdf.iloc[7]["embedding"], dtype=np.float64)
        got = ivf_topk(back, cent2, q, k=5, nprobe=3)
        mem = ivf_topk(assigned, cent, q, k=5, nprobe=3).toPandas()
        got_pdf = got.toPandas()
        np.testing.assert_array_equal(got_pdf["vec_id"].to_numpy(),
                                      mem["vec_id"].to_numpy())

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            got.explain()
        pf = re.search(r"PartitionFilters: \[[^\]]*\]", buf.getvalue())
        assert pf and "list_id" in pf.group(0), buf.getvalue()[:2000]


class TestProductQuantization:
    def _df(self, spark, emb_pdf, extra_rows=()):
        import pandas as pd

        rows = [
            {"vec_id": int(v), "embedding": [float(x) for x in e]}
            for v, e in zip(emb_pdf["vec_id"], emb_pdf["embedding"])
        ] + list(extra_rows)
        return spark.createDataFrame(pd.DataFrame(rows))

    def test_codes_shape_and_determinism(self, spark, emb_pdf):
        from gdal_spark.operators.similarity import pq_encode, pq_train

        df = self._df(spark, emb_pdf)
        b1 = pq_train(df, m=8, ksub=32, sample=512)
        b2 = pq_train(df, m=8, ksub=32, sample=512)
        np.testing.assert_array_equal(b1, b2)  # seeded -> reproducible
        assert b1.shape == (8, 32, 8)          # dim 64 / m 8
        codes = pq_encode(df.limit(20), b1).toPandas()
        assert all(len(c) == 8 for c in codes["codes"])
        assert all(0 <= v < 32 for c in codes["codes"] for v in c)

    def test_adc_recall_and_refine(self, spark, emb_pdf):
        """ADC top-k recovers planted near-duplicates; the refine stage
        makes the scores exact and the ranking match brute force."""
        from gdal_spark.operators.similarity import (
            cosine_topk, pq_encode, pq_topk, pq_train)

        rng = np.random.default_rng(3)
        q = np.asarray(emb_pdf.iloc[9]["embedding"], dtype=np.float64)
        planted = []
        extra = []
        for j in range(4):
            nb = q + rng.normal(0, 0.02 * np.abs(q).mean(), q.shape)
            planted.append(30_000 + j)
            extra.append({"vec_id": 30_000 + j,
                          "embedding": [float(x) for x in nb]})
        df = self._df(spark, emb_pdf, extra)
        books = pq_train(df, m=8, ksub=64, sample=4096)
        codes = pq_encode(df, books)
        ann = pq_topk(codes, books, q, k=6).toPandas()
        found = len(set(ann["vec_id"]) & (set(planted) |
                                          {int(emb_pdf["vec_id"].iloc[9])}))
        assert found >= 4, f"ADC recovered {found}/5 planted+self"
        # refine: exact rescore of 4k ADC candidates == brute-force top-k
        ref = pq_topk(codes, books, q, k=5, refine_df=df).toPandas()
        exact = cosine_topk(df, q, k=5).toPandas()
        np.testing.assert_array_equal(ref["vec_id"].to_numpy(),
                                      exact["vec_id"].to_numpy())
        np.testing.assert_allclose(ref["cosine"], exact["cosine"], atol=1e-6)


class TestIVFPQ:
    def test_composition_recovers_planted(self, spark, emb_pdf):
        import pandas as pd

        from gdal_spark.operators.similarity import (
            cosine_topk, ivf_build, ivfpq_topk, pq_encode, pq_train)

        rng = np.random.default_rng(5)
        q = np.asarray(emb_pdf.iloc[4]["embedding"], dtype=np.float64)
        rows = [
            {"vec_id": int(v), "embedding": [float(x) for x in e]}
            for v, e in zip(emb_pdf["vec_id"], emb_pdf["embedding"])
        ]
        planted = []
        for j in range(3):
            nb = q + rng.normal(0, 0.02 * np.abs(q).mean(), q.shape)
            planted.append(40_000 + j)
            rows.append({"vec_id": 40_000 + j,
                         "embedding": [float(x) for x in nb]})
        df = spark.createDataFrame(pd.DataFrame(rows))
        assigned, cent = ivf_build(df, nlist=16, sample=10_000)
        books = pq_train(df, m=8, ksub=64)
        codes = pq_encode(df, books)
        store = assigned.join(codes, "vec_id")
        ann = ivfpq_topk(store, cent, books, q, k=5, nprobe=6).toPandas()
        got = set(ann["vec_id"])
        assert int(emb_pdf["vec_id"].iloc[4]) in got
        assert len(got & set(planted)) >= 2
        # full probe + refine == exact brute force
        full = ivfpq_topk(store, cent, books, q, k=5, nprobe=16).toPandas()
        exact = cosine_topk(df, q, k=5).toPandas()
        np.testing.assert_array_equal(full["vec_id"].to_numpy(),
                                      exact["vec_id"].to_numpy())


class TestPairComponents:
    def test_chains_stars_and_keep_list(self, spark):
        import pandas as pd

        from gdal_spark.operators.dedup import dedup_keep_list, pair_components

        pairs = spark.createDataFrame(pd.DataFrame({
            # chain 1-2-3-4, star 10-(11,12,13), isolated pair 20-21
            "id_a": [1, 2, 3, 10, 10, 10, 20],
            "id_b": [2, 3, 4, 11, 12, 13, 21],
        }))
        comps = {r["node"]: r["component"]
                 for r in pair_components(pairs).collect()}
        assert comps[1] == comps[2] == comps[3] == comps[4] == 1
        assert comps[10] == comps[11] == comps[12] == comps[13] == 10
        assert comps[20] == comps[21] == 20
        keep = dedup_keep_list(pairs).toPandas()
        kept = set(keep[keep.keep]["node"])
        assert kept == {1, 10, 20}
        assert len(keep) == 10  # every node appears exactly once


class TestContamination:
    def test_planted_overlap(self, spark):
        import pandas as pd

        from gdal_spark.operators.dedup import ngram_contamination

        leak = ("the quick brown fox jumps over the lazy dog while the "
                "band plays on through the night")
        corpus = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2],
            "text": ["totally unrelated training text about mountains "
                     "and rivers flowing to the endless sea " * 3,
                     f"some prefix here {leak} and some suffix there"],
        }))
        evals = spark.createDataFrame(pd.DataFrame({
            "doc_id": [100, 101],
            "text": [f"benchmark question: {leak} answer below",
                     "a clean evaluation document with no overlap "
                     "whatsoever in any thirteen gram window at all "
                     "because its words differ entirely"],
        }))
        got = ngram_contamination(corpus, evals, shingle_n=13
                                  ).toPandas().set_index("doc_id")
        assert bool(got.loc[100, "contaminated"])
        assert got.loc[100, "n_hits"] >= 1
        assert not bool(got.loc[101, "contaminated"])
        assert got.loc[101, "n_hits"] == 0
        assert (got["n_grams"] > 0).all()


class TestVocabStats:
    def test_matches_duckdb_replay(self, spark, docs):
        import duckdb

        from gdal_spark.functions.text import vocab_stats

        got = (vocab_stats(docs).toPandas()
               .sort_values("token", ignore_index=True))
        exp = duckdb.sql(r"""
            WITH toks AS (
              SELECT doc_id, unnest(string_split_regex(trim(text), '\s+'))
                     AS token
              FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
              WHERE trim(text) <> ''
            )
            SELECT lower(token) AS token,
                   COUNT(*) AS tf,
                   COUNT(DISTINCT doc_id) AS df
            FROM toks GROUP BY 1 ORDER BY 1
        """).df()
        assert got["token"].tolist() == exp["token"].tolist()
        assert got["tf"].tolist() == exp["tf"].tolist()
        assert got["df"].tolist() == exp["df"].tolist()

    def test_topk_is_take_ordered(self, spark, docs):
        from gdal_spark.functions.text import vocab_stats

        top = vocab_stats(docs, top_k=5)
        plan = top._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        pdf = top.toPandas()
        assert len(pdf) == 5
        assert pdf["tf"].is_monotonic_decreasing


class TestBM25:
    def test_matches_duckdb_replay(self, spark, docs):
        import duckdb

        from gdal_spark.functions.text import bm25_search

        terms = ["spark", "merge", "window"]
        got = bm25_search(docs, terms, top_k=15).toPandas()
        exp = duckdb.sql(r"""
            WITH base AS (
              SELECT doc_id,
                     list_transform(string_split_regex(trim(text), '\s+'),
                                    x -> lower(x)) AS toks
              FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
              WHERE trim(text) <> ''
            ),
            lens AS (SELECT doc_id, len(toks) AS dl FROM base),
            stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM lens),
            ex AS (
              SELECT doc_id, unnest(toks) AS token FROM base
            ),
            tf AS (
              SELECT doc_id, token, COUNT(*) AS tf FROM ex
              WHERE token IN ('spark', 'merge', 'window')
              GROUP BY 1, 2
            ),
            dfq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1)
            SELECT tf.doc_id,
                   ROUND(SUM(ln(1 + (stats.n - dfq.df + 0.5)
                                   / (dfq.df + 0.5))
                             * tf.tf * 2.2
                             / (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl
                                               / stats.avgdl))), 9) AS score,
                   COUNT(*) AS n_terms_hit
            FROM tf
            JOIN dfq USING (token)
            JOIN lens USING (doc_id)
            CROSS JOIN stats
            GROUP BY 1
            ORDER BY score DESC, doc_id
            LIMIT 15
        """).df()
        assert got["doc_id"].tolist() == exp["doc_id"].tolist()
        import numpy as np
        np.testing.assert_allclose(got["score"], exp["score"],
                                   rtol=0, atol=1e-7)

    def test_ranking_sanity(self, spark):
        from gdal_spark.functions.text import bm25_search

        pdf = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["rare gem here", "common words only common words",
                     "rare rare gem gem rare"]})
        got = (bm25_search(spark.createDataFrame(pdf), ["rare", "gem"],
                           top_k=3).toPandas())
        # doc 3 has the most query-term mass; doc 2 has none
        assert got["doc_id"].tolist()[0] == 3
        assert 2 not in got["doc_id"].tolist()
