"""Range (interval) join — Spark's other missing join type, composed
scalably from built-ins.

A naive ``a JOIN b ON a.key = b.key AND b.ts BETWEEN a.ts - w AND
a.ts + w`` plans as a nested-loop per key group; at scale the right
pattern is *time bucketing*: quantize both sides to ``w``-sized buckets,
equi-join each left bucket against its {-1, 0, +1} neighbors, then apply
the exact range predicate.  Every candidate pair is within 2 buckets of
true, so the equi-join carries ≤3× the matching rows — a hash join, never
a cartesian expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_seconds(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    left_ts: str,
    right_ts: str,
    window_seconds: float,
) -> DataFrame:
    """All (left, right) pairs with the same ``by`` key and
    ``|left_ts - right_ts| <= window_seconds``.  Returns left columns +
    right columns (right ts column renamed ``{right_ts}_right`` if names
    collide)."""
    w = float(window_seconds)
    l_sec = F.col(left_ts).cast("double")
    r_ts_out = f"{right_ts}_right" if right_ts == left_ts else right_ts
    r = right
    if right_ts == left_ts:
        r = right.withColumnRenamed(right_ts, r_ts_out)
    r_sec = F.col(r_ts_out).cast("double")

    l_b = left.withColumn("__bucket", F.floor(l_sec / w).cast("long"))
    r_b = r.withColumn("__rbucket", F.floor(r_sec / w).cast("long"))

    # left bucket joins its {-1, 0, +1} neighborhood
    shifts = left.sparkSession.range(-1, 2).select(
        F.col("id").cast("long").alias("__shift"))
    l_expanded = l_b.crossJoin(F.broadcast(shifts)).withColumn(
        "__rbucket", F.col("__bucket") + F.col("__shift")
    ).drop("__shift")

    joined = l_expanded.join(r_b, on=[by, "__rbucket"], how="inner")
    out = joined.where(
        F.abs(F.col(left_ts).cast("double") - F.col(r_ts_out).cast("double"))
        <= w
    )
    return out.drop("__bucket", "__rbucket")
