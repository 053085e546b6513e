"""Skew-handling utilities: salted joins for hot keys.

AQE's skew-join splitting (on by default in ``plans.session``) handles most
cases at runtime, but it only splits *sort-merge* join partitions.  When a
key's rows must all meet a large non-broadcastable build side (e.g. a
power-law band bucket joining a big table), explicit salting is the
reliable fix: replicate the small side R ways, scatter the big side across
the R replicas, join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted across ``salt_buckets`` replicas
    of the small side.  Output columns = big ∪ small minus join keys'
    duplicates (same contract as ``big.join(small, on, how)``).

    The small side is replicated ``salt_buckets``× — use only when it is
    orders of magnitude smaller than the big side but too large or too
    skew-prone to broadcast."""
    salt = (F.abs(F.hash(*[F.col(c) for c in big.columns])) % salt_buckets)
    big_salted = big.withColumn("__salt", salt)
    small_salted = small.crossJoin(
        F.broadcast(
            small.sparkSession.range(salt_buckets)
            .select(F.col("id").cast("int").alias("__salt"))))
    out = big_salted.join(small_salted, on=[*on, "__salt"], how=how)
    return out.drop("__salt")


def top_hot_keys(df: DataFrame, key_cols: list[str], n: int = 20) -> DataFrame:
    """Diagnostic: the n heaviest keys and their share — run this before
    deciding between broadcast, salting, or AQE-only."""
    total = df.count()
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(float(total)), 6))
        .orderBy(F.col("n_rows").desc())
        .limit(n)
    )
