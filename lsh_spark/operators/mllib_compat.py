"""Spark MLlib capability analogs (SURVEY.md §2.1 'capability analog'
column): ``MinHashLSH`` and ``BucketedRandomProjectionLSH`` wired to the
same table shapes as the bit-exact operators.

These are NOT bit-compatible with the reference (different hash families)
— they exist because MLlib's implementations come with battle-tested
distributed ``approxSimilarityJoin`` / ``approxNearestNeighbors`` physical
plans, giving users a second engine for the same questions.  Use the
bit-exact operators when reference parity matters; use these when raw
throughput on huge corpora matters and any LSH family will do.
"""

from __future__ import annotations

from pyspark.ml.feature import (
    BucketedRandomProjectionLSH,
    CountVectorizer,
    MinHashLSH,
    NGram,
    RegexTokenizer,
)
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minhash_similarity_join_mllib(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_width: int = 3,
    num_hash_tables: int = 8,
    jaccard_max_distance: float = 0.4,
    min_df: float = 1.0,
    seed: int = 123,
) -> DataFrame:
    """Self similarity join via MLlib MinHashLSH over char-ngram count
    vectors.  Returns (id_a, id_b, jaccard_distance) with id_a < id_b.

    Pipeline: chars → ngrams → binarized CountVectorizer space →
    MinHashLSH.approxSimilarityJoin (distance = 1 − Jaccard).
    """
    # char-level tokens (each char its own token), then char ngrams
    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__chars", pattern=".",
        gaps=False, toLowercase=False)
    chars = tok.transform(docs)
    ng = NGram(n=ngram_width, inputCol="__chars", outputCol="__ngrams")
    grams = ng.transform(chars)
    cv = CountVectorizer(
        inputCol="__ngrams", outputCol="__features", binary=True,
        minDF=min_df)
    model_cv = cv.fit(grams)
    feats = model_cv.transform(grams).where(
        # MinHashLSH requires ≥1 non-zero entry
        F.expr("aggregate(transform(__ngrams, x -> 1), 0, (a, b) -> a + b) > 0"))
    mh = MinHashLSH(inputCol="__features", outputCol="__hashes",
                    numHashTables=num_hash_tables, seed=seed)
    model = mh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, jaccard_max_distance, distCol="jaccard_distance")
    return (
        joined.where(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_distance", 6).alias("jaccard_distance"),
        )
    )


def euclidean_ann_mllib(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    seed: int = 123,
) -> DataFrame:
    """ANN via MLlib BucketedRandomProjectionLSH (p-stable Euclidean LSH —
    the same scheme family as the reference's lsh_euclidean).

    Returns (query_id, neighbor_id, dist_rank, l2_distance)."""
    prep = lambda df: df.select(
        F.col(id_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__vec"))
    c = prep(corpus)
    q = prep(queries)
    brp = BucketedRandomProjectionLSH(
        inputCol="__vec", outputCol="__hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed)
    model = brp.fit(c)
    # batch ANN stays distributed: approxSimilarityJoin (bucket-blocked)
    # then per-query top-k — never a per-query driver loop
    from pyspark.sql.window import Window

    joined = model.approxSimilarityJoin(
        q, c, float("inf"), distCol="l2")
    scored = (
        joined.where(F.col(f"datasetA.{id_col}") != F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("query_id"),
            F.col(f"datasetB.{id_col}").alias("neighbor_id"),
            F.round("l2", 6).alias("l2_distance"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("l2_distance").asc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("dist_rank", F.row_number().over(w))
        .where(F.col("dist_rank") <= k)
        .select("query_id", "neighbor_id", "dist_rank", "l2_distance")
    )
