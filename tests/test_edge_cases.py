"""Edge-case hardening: empty inputs, all-NULL columns, single rows —
the shapes that break vectorized batch kernels (empty reduceat, empty
concatenate) and distributed operators (empty sides of joins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

import lsh_spark.functions as F_lsh


def _empty_docs(spark):
    schema = StructType([
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
    ])
    return spark.createDataFrame([], schema)


def test_lsh_udfs_on_empty_dataframe(spark):
    df = _empty_docs(spark)
    out = df.select(
        F_lsh.lsh_min("text", 2, 3, 2, 123).alias("a"),
        F_lsh.lsh_min32("text", 2, 3, 2, 123).alias("b"),
        F_lsh.lsh_jaccard("text", "text", 2).alias("c"),
    )
    assert out.count() == 0


def test_lsh_udfs_on_all_null_column(spark):
    schema = StructType([StructField("text", StringType(), True)])
    df = spark.createDataFrame([(None,), (None,)], schema)
    rows = df.select(F_lsh.lsh_min("text", 2, 3, 2, 123).alias("h")).collect()
    assert [r.h for r in rows] == [None, None]


def test_euclidean_on_empty_and_null(spark):
    schema = StructType([StructField("v", ArrayType(DoubleType()), True)])
    empty = spark.createDataFrame([], schema)
    assert empty.select(
        F_lsh.lsh_euclidean("v", 0.5, 2, 2, 1).alias("h")).count() == 0
    nulls = spark.createDataFrame([(None,), (None,)], schema)
    rows = nulls.select(
        F_lsh.lsh_euclidean("v", 0.5, 2, 2, 1).alias("h")).collect()
    assert [r.h for r in rows] == [None, None]


def test_similarity_join_empty_side(spark):
    from lsh_spark.operators.similarity_join import (
        lsh_self_dedup_pairs,
        lsh_similarity_join,
    )

    docs = spark.createDataFrame(
        [(1, "hello world text"), (2, "hello world text")],
        ["doc_id", "text"])
    empty = _empty_docs(spark)
    out = lsh_similarity_join(
        empty, docs, "text", "text", left_id="doc_id", right_id="doc_id",
        ngram_width=3, band_count=2, band_size=2, seed=1, threshold=0.5)
    assert out.count() == 0
    assert lsh_self_dedup_pairs(
        empty, "text", id_col="doc_id", ngram_width=3, band_count=2,
        band_size=2, seed=1, threshold=0.5).count() == 0


def test_similarity_join_single_row(spark):
    from lsh_spark.operators.similarity_join import lsh_self_dedup_pairs

    docs = spark.createDataFrame([(1, "only one document here")],
                                 ["doc_id", "text"])
    assert lsh_self_dedup_pairs(
        docs, "text", id_col="doc_id", ngram_width=3, band_count=2,
        band_size=2, seed=1, threshold=0.5).count() == 0


def test_simhash_empty_and_whitespace(spark):
    from lsh_spark.operators.dedup import simhash64

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "x")], ["id", "text"])
    rows = {r.id: r.s for r in
            df.select("id", simhash64("text").alias("s")).collect()}
    # empty token lists → signature 0 (all bit-votes are <= 0)
    assert rows[1] == 0 and rows[2] == 0
    assert rows[3] is not None


def test_word_shingle_set_edges(spark):
    """Word-shingle sets: NULL → NULL, empty/whitespace/single-word →
    empty set (no bigram exists), and the hash matches the string-hash
    path the shingle-overload goldens pin."""
    from lsh_spark._core.batch import hash_strings_batch
    from lsh_spark.functions.lsh import word_shingle_set_col

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "solo"), (5, "two words"),
         (6, "a  b\tc")],  # runs of mixed whitespace collapse
        ["id", "text"])
    rows = {r.id: r.s for r in
            df.select("id", word_shingle_set_col("text").alias("s"))
            .collect()}
    assert rows[1] is None
    assert rows[2] == [] and rows[3] == [] and rows[4] == []
    import numpy as np

    want5 = np.unique(
        hash_strings_batch(["two words"]).astype(np.uint32).view(np.int32))
    assert rows[5] == want5.tolist()
    want6 = np.unique(
        hash_strings_batch(["a b", "b c"]).astype(np.uint32).view(np.int32))
    assert sorted(rows[6]) == sorted(want6.tolist())


def test_word_tokenizer_contract_three_paths(spark):
    """The three word-shingle paths (Python kernel, JVM bigram expression,
    DuckDB oracle) must tokenize identically on whitespace edge cases:
    leading tab, NBSP, vertical tab, trailing newline (ADVICE r3 — the
    paths previously disagreed on leading separators / Unicode spaces).
    Contract: split on ASCII [ \\t\\n\\x0b\\f\\r]+ runs, drop empties;
    NBSP is NOT a separator."""
    import duckdb
    import numpy as np

    from lsh_spark._core.batch import hash_strings_batch
    from lsh_spark.functions.lsh import word_shingle_set_col
    from lsh_spark.operators.lsh_queries import _with_word_bigrams
    from lsh_spark.oracles.duckdb_lsh import bigram_shingles_cte

    texts = ["\tlead tab text", "a\xa0b cd ef", "v\x0bw x", "end nl\n",
             " \t ", "one", "two  words\tthree"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])

    def as_u32(vals):
        return set(np.asarray(vals, dtype=np.int32)
                   .view(np.uint32).tolist())

    py = {r.doc_id: as_u32(r.s) for r in df.select(
        "doc_id", word_shingle_set_col("text").alias("s")).collect()}

    jvm = {}
    for r in _with_word_bigrams(df).select("doc_id", "__bigrams").collect():
        bgs = list(r["__bigrams"])
        h = (hash_strings_batch(bgs).astype(np.uint32)
             if bgs else np.empty(0, dtype=np.uint32))
        jvm[r.doc_id] = set(h.tolist())

    con = duckdb.connect()
    con.register("documents", df.toPandas())
    sql = (f"WITH {bigram_shingles_cte()} "
           "SELECT id, list(sh) AS hs FROM sh GROUP BY id")
    ora = {i: {int(v) & 0xFFFFFFFF for v in (hs or [])}
           for i, hs in con.execute(sql).fetchall()}
    con.close()

    for i, t in enumerate(texts):
        assert py[i] == jvm[i], (i, t)
        assert py[i] == ora.get(i, set()), (i, t)
    # NBSP text keeps the NBSP inside one token → 3 tokens, 2 bigrams
    assert len(py[1]) == 2
    # leading tab must not create an empty token → 2 bigrams, not 3
    assert len(py[0]) == 2


def test_ann_with_single_query(spark):
    from lsh_spark.operators import ann
    from lsh_spark.sources.io import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = ann.cosine_topk(emb, emb.where("vec_id = 0"), k=3).collect()
    assert len(out) == 3
    assert all(r.query_id == 0 for r in out)


def test_text_functions_on_empty_string(spark):
    from lsh_spark.functions import text as T

    df = spark.createDataFrame([("",), ("   ",)], ["text"])
    rows = df.select(
        T.token_count("text").alias("tc"),
        T.word_token_count("text").alias("wc"),
        F.round(T.stopword_ratio("text"), 6).alias("sr"),
        T.lang_guess("text").alias("lg"),
    ).collect()
    for r in rows:
        assert r.tc == 0 and r.wc == 0 and r.sr == 0.0 and r.lg == "en"


def test_allpairs_kernel_rejects_ragged_vectors(spark):
    """The tile kernel enforces the reference's same-length-array rule
    (src/euclidean_hash.rs:31-45) with a clear error instead of numpy's
    opaque stack failure."""
    import pytest

    from lsh_spark.operators.dedup import embedding_allpairs_cosine

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="share one length"):
        embedding_allpairs_cosine(df, threshold=0.1, block_count=1).collect()


def test_allpairs_kernel_zero_and_single_rows(spark):
    from lsh_spark.operators.dedup import embedding_allpairs_cosine

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert embedding_allpairs_cosine(empty, threshold=0.5).count() == 0
    one = spark.createDataFrame([(7, [1.0, 0.0])],
                                "vec_id long, embedding array<double>")
    assert embedding_allpairs_cosine(one, threshold=0.5).count() == 0


def test_round8_operators_degenerate_inputs(spark):
    """Empty/degenerate inputs return empty (or all-zero) frames with
    the contract schema — no exceptions, no NULL-poisoned columns."""
    from pyspark.sql import functions as F

    from lsh_spark.operators.dedup import duplicate_substring_spans_df
    from lsh_spark.operators.merge import snapshot_diff
    from lsh_spark.operators.retrieval import bm25_topk, hybrid_topk_rrf
    from lsh_spark.operators.training_ops import mixture_sample_df

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, "")],
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>")
    no_q = spark.createDataFrame([], "query_id long, query_text string")
    no_docs = spark.createDataFrame([], "doc_id long, text string")

    # BM25: empty queries -> empty; empty corpus -> empty; a query with
    # no matching terms -> no rows for it (never NULL scores)
    assert bm25_topk(docs, no_q, k=5).count() == 0
    q = spark.createDataFrame([(0, "alpha"), (1, "zzz-missing")],
                              "query_id long, query_text string")
    assert bm25_topk(no_docs, q, k=5).count() == 0
    rows = bm25_topk(docs, q, k=5).collect()
    assert {r.query_id for r in rows} == {0}
    assert all(r.score is not None for r in rows)

    # spans: all docs shorter than the window -> empty
    assert duplicate_substring_spans_df(docs, window=64,
                                        stride=16).count() == 0

    # mixture: empty weights drop everything; NULL-source rows drop too
    src = docs.withColumn("source", F.when(F.col("doc_id") == 1,
                                           "a").otherwise(F.lit(None)))
    assert mixture_sample_df(src, {}).count() == 0
    assert {r.doc_id for r in
            mixture_sample_df(src, {"a": 1.0}).collect()} == {1}

    # hybrid: a query with neither channel output yields nothing;
    # channels surviving alone still rank
    qz = spark.createDataFrame([(9, "zzz-missing")],
                               "query_id long, query_text string")
    vz = emb.where(F.col("vec_id") < 0)
    assert hybrid_topk_rrf(docs, emb, qz, vz, k=5).count() == 0

    # snapshot_diff of a frame against itself: all unchanged
    st = {r.status for r in snapshot_diff(docs, docs, key="doc_id").collect()}
    assert st == {"unchanged"}


def test_round9_operators_degenerate_inputs(spark):
    """Round-9 operator edges: phrase search with absent/oversized
    phrases and NULL/empty text, PQ search with empty query sets, and
    the Zipf fit's NULL-slope contract on a degenerate (single-type)
    vocabulary — both engines yield NULL on the 0-denominator double
    division, so the gate stays hash-stable."""
    from pyspark.sql import functions as F

    from lsh_spark.operators import ann
    from lsh_spark.operators.retrieval import phrase_search

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None), (3, ""), (4, "alpha")],
        "doc_id long, text string")

    # phrase not present / longer than every doc / empty phrase set
    qs = spark.createDataFrame(
        [(0, "zzz missing"), (1, "alpha beta gamma delta epsilon")],
        "query_id long, phrase string")
    assert phrase_search(docs, qs).count() == 0
    no_q = spark.createDataFrame([], "query_id long, phrase string")
    assert phrase_search(docs, no_q).count() == 0
    # single-token phrase degenerates to term lookup (anchors = hits)
    one = spark.createDataFrame([(0, "alpha")],
                                "query_id long, phrase string")
    got = {(r.doc_id, r.n_occurrences, r.first_pos)
           for r in phrase_search(docs, one).collect()}
    assert got == {(1, 1, 0), (4, 1, 0)}

    # PQ: empty query set -> empty result, encode/train still fine
    emb = spark.createDataFrame(
        [(i, [0.5 * ((i + d) % 3) for d in range(4)]) for i in range(10)],
        "vec_id long, embedding array<double>")
    no_v = emb.where(F.col("vec_id") < 0)
    assert ann.pq_topk(emb, no_v, k=3, m=2, n_codes=2, n_iters=1,
                       dim=4).count() == 0

    # Zipf on a single-type corpus: the fit denominator is 0 — Spark 4
    # ANSI mode RAISES on double x/0, so the operator must guard and
    # yield NULL (DuckDB's CASE twin yields NULL too)
    import tempfile

    from lsh_spark.operators.pipeline_queries import zipf_fit_stats

    tmp = tempfile.mkdtemp()
    spark.createDataFrame([(1, "same same same")],
                          "doc_id long, text string") \
        .coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    row = zipf_fit_stats(spark, tmp).first()
    assert row.n_types == 1
    assert row.zipf_slope is None and row.zipf_intercept is None
