"""AS-OF join — an operator Spark SQL lacks natively (DuckDB ships one),
composed from built-in DataFrame ops per SURVEY's custom-operator rule
("a composition of existing DataFrame ops if semantics allow").

``asof_join(left, right, by, on)``: for every left row, attach the most
recent right row with ``right.on <= left.on`` within the same ``by`` key
(ties on equal timestamps: the right row counts — the standard backward
as-of).

Implementation is the scalable union-sort trick, NOT a range join:
  * tag and union both sides (one shuffle on ``by``),
  * one pass of ``last(value, ignoreNulls) OVER (PARTITION BY by
    ORDER BY on, side)`` carries the latest right payload forward,
  * keep the left rows.

Cost: a single hash-partition + sort per ``by`` key — linear in rows,
independent of match distances, no range-explosion.  This is the plan an
interval join would want and Spark's optimizer cannot produce from a
``BETWEEN`` predicate (that becomes a broadcast-nested-loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    on: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join.  Returns all left columns plus
    ``{col}{suffix}`` for each of ``right_cols`` (NULL when no earlier
    right row exists for the key)."""
    l_tag = left.withColumn("__side", F.lit(1))
    r_proj = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    for c in left.columns:
        if c not in (by, on):
            r_proj = r_proj.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    for c in right_cols:
        l_tag = l_tag.withColumn(f"__r_{c}",
                                 F.lit(None).cast(right.schema[c].dataType))

    unioned = l_tag.select(r_proj.columns).unionByName(
        r_proj.select(r_proj.columns))
    # right rows (side 0) sort before left rows at equal timestamps →
    # an exactly-simultaneous right row is visible to the left row
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned
    for c in right_cols:
        carried = carried.withColumn(
            f"__c_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))
    out = carried.where(F.col("__side") == 1)
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        *[F.col(f"__c_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    on: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """FORWARD as-of join: for every left row, the EARLIEST right row
    with ``right.on >= left.on`` within the same ``by`` key (ties: a
    simultaneous right row counts) — the attribution/"time to next
    event" direction the backward join can't express.  Same union-sort
    plan (one shuffle + sort per ``by``), with the carrying window
    flipped to ``first(value, ignoreNulls) OVER (... ROWS BETWEEN
    CURRENT ROW AND UNBOUNDED FOLLOWING)`` and left rows sorting BEFORE
    right rows at equal timestamps so the simultaneous match stays in
    frame."""
    l_tag = left.withColumn("__side", F.lit(0))
    r_proj = right.select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    for c in left.columns:
        if c not in (by, on):
            r_proj = r_proj.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType))
    for c in right_cols:
        l_tag = l_tag.withColumn(f"__r_{c}",
                                 F.lit(None).cast(right.schema[c].dataType))

    unioned = l_tag.select(r_proj.columns).unionByName(
        r_proj.select(r_proj.columns))
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned
    for c in right_cols:
        carried = carried.withColumn(
            f"__c_{c}", F.first(f"__r_{c}", ignorenulls=True).over(w))
    out = carried.where(F.col("__side") == 0)
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        *[F.col(f"__c_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
