"""MLlib capability-analog tests: same questions, MLlib engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_mllib_minhash_join_finds_near_dups(spark):
    from lsh_spark.operators.mllib_compat import minhash_similarity_join_mllib
    from lsh_spark.operators.similarity_join import lsh_self_dedup_pairs
    from lsh_spark.sources.io import load_table

    docs = load_table(spark, SF_DIR, "documents").where(F.col("doc_id") < 150)
    mllib_pairs = minhash_similarity_join_mllib(
        docs, ngram_width=3, num_hash_tables=8, jaccard_max_distance=0.4)
    got = {(r.id_a, r.id_b) for r in mllib_pairs.collect()}
    assert got, "mllib join found nothing"

    exact_pairs = lsh_self_dedup_pairs(
        docs, "text", id_col="doc_id", ngram_width=3, band_count=8,
        band_size=2, seed=123, threshold=0.6, broadcast_sets=True)
    want = {(r.id_a, r.id_b) for r in exact_pairs.collect()}
    # the two engines use different hash families/token spaces; require
    # substantial overlap, not equality
    assert want
    overlap = len(got & want) / len(want)
    assert overlap > 0.5, f"engines disagree too much: {overlap:.2f}"


def test_mllib_euclidean_ann_quality(spark):
    from lsh_spark.operators import ann
    from lsh_spark.operators.mllib_compat import euclidean_ann_mllib
    from lsh_spark.sources.io import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    got = euclidean_ann_mllib(emb, queries, k=5, bucket_length=2.0,
                              num_hash_tables=4)
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, nbrs in by_q.items():
        assert len(nbrs) == 5
        dists = [r.l2_distance for r in sorted(nbrs, key=lambda x: x.dist_rank)]
        assert dists == sorted(dists)
