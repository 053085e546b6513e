"""Round-13 operator units: proximity-weighted BM25 ranking (k-term
NEAR fused into the lexical score, on-the-fly and positional-index
forms)."""

from __future__ import annotations

import pytest


def _docs(spark):
    return spark.createDataFrame(
        [(1, "sort merge join runs fast"),          # tight cluster
         (2, "sort x x x x x x x x x merge x x x x x x x x x join"),
         (3, "sort merge only here"),               # 2 of 3 terms
         (4, "nothing relevant at all"),
         (5, "join sort merge")],                   # tight, reordered
        "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame([(0, "sort merge join")],
                                 "query_id long, query_text string")


def test_proximity_rank_rewards_tight_clusters(spark):
    """Docs 1/2/5 match all three terms with similar tf/dl-class BM25;
    the proximity term must rank the tight clusters (1, 5 — every pair
    gap ≤ 2) above the scattered doc 2 (gaps 9-19, no qualifying pair
    at window 6), and doc 2 above the two-term doc 3 only if its bag
    score carries it — exact assertions on the pair-term arithmetic."""
    from lsh_spark.operators.retrieval import proximity_rank

    got = {r.doc_id: (r.rank, r.score)
           for r in proximity_rank(_docs(spark), _queries(spark),
                                   window=6, k=10).collect()}
    assert 4 not in got  # no matched term, no row
    # tight docs beat the scattered full-match doc
    assert got[1][0] < got[2][0] and got[5][0] < got[2][0]
    # doc 5 ("join sort merge", dl=3) outranks doc 1 (dl=5): same
    # proximity pairs, higher tf-normalized bag score
    assert got[5][0] == 1 and got[1][0] == 2


def test_proximity_rank_pair_term_exact(spark):
    """Pin the proximity arithmetic itself: single two-term query over
    one doc — score = round(bm25 + 1/(min_gap+1), 6) with min_gap the
    closest qualifying occurrence pair."""
    from lsh_spark.operators.retrieval import proximity_rank

    docs = spark.createDataFrame(
        [(1, "a x b x x a")], "doc_id long, text string")
    q = spark.createDataFrame([(0, "a b")],
                              "query_id long, query_text string")
    with_prox = proximity_rank(docs, q, window=8, k=5).collect()[0]
    without = proximity_rank(docs, q, window=8, k=5,
                             prox_weight=0.0).collect()[0]
    # min gap over pairs (0,2),(5,2) is 2 -> contribution 1/3
    assert with_prox.score == pytest.approx(without.score + 1.0 / 3.0,
                                            abs=2e-6)


def test_proximity_rank_indexed_matches_on_the_fly(spark):
    """The positional-index form must reproduce the on-the-fly result
    exactly (the proximity_search_indexed contract, extended to the
    fused score)."""
    from lsh_spark.operators.pipeline_queries import (
        _PROXRANK_K, _PROXRANK_QUERIES, _PROXRANK_WINDOW,
        proximity_rank_docs)
    from lsh_spark.operators.retrieval import proximity_rank
    from lsh_spark.sources.io import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    qt = F.array(*[F.lit(t) for _i, t in _PROXRANK_QUERIES])
    queries = spark.range(len(_PROXRANK_QUERIES)).select(
        F.col("id").alias("query_id"),
        F.element_at(qt, (F.col("id") + 1).cast("int"))
        .alias("query_text"))
    fly = {(r.query_id, r.doc_id): (r.score, r.rank)
           for r in proximity_rank(load_table(spark, sf, "documents"),
                                   queries, window=_PROXRANK_WINDOW,
                                   k=_PROXRANK_K).collect()}
    idx = {(r.query_id, r.doc_id): (r.score, r.rank)
           for r in proximity_rank_docs(spark, sf).collect()}
    assert fly and fly == idx


def test_proximity_rank_requires_positional_index(spark, tmp_path):
    """A non-positional text index is rejected with a clear error."""
    from lsh_spark.operators.retrieval import (build_text_index,
                                               proximity_rank_indexed)

    docs = _docs(spark)
    build_text_index(docs, "t13_nonpos_idx", positional=False)
    with pytest.raises(ValueError, match="positional"):
        proximity_rank_indexed(spark, "t13_nonpos_idx", _queries(spark))
