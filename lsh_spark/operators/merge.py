"""MERGE-style mutation operators for a lake without a transactional
table format: upsert (delete-and-insert) and SCD2 history tracking,
emulated with anti-join + union + window — the standard composition when
``MERGE INTO`` is unavailable (no Delta/Iceberg in the runtime).

These are the incremental-corpus primitives: a training-data lake
receives document revisions and new documents; ``upsert`` produces the
current snapshot, ``scd2_apply`` produces the full revision history with
validity intervals (so any past corpus state can be reconstructed —
provenance for "what did the model train on").

Scale shape: both operators are one anti-join (keyed on the merge key,
broadcast when the delta is small — the common case: daily deltas are
orders of magnitude smaller than the corpus) plus a union, which Spark
executes without any extra shuffle beyond the join itself.  SCD2's
window runs only over the DELTA's keys (``partitionBy(key)``), never the
full history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert(target: DataFrame, updates: DataFrame, key: str,
           *, broadcast_updates: bool = True) -> DataFrame:
    """Delete-and-insert merge: rows of ``target`` whose ``key`` appears
    in ``updates`` are replaced by the update row; unmatched update rows
    are inserted.  Equivalent to ``MERGE INTO ... WHEN MATCHED THEN
    UPDATE WHEN NOT MATCHED THEN INSERT`` for whole-row updates.

    The anti-join probes the (typically tiny) delta; broadcast it unless
    the caller says otherwise."""
    probe = updates.select(key).distinct()
    if broadcast_updates:
        probe = F.broadcast(probe)
    kept = target.join(probe, on=key, how="left_anti")
    return kept.unionByName(updates)


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    *,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
    broadcast_updates: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension type 2: ``history`` rows carry
    (``valid_from``, ``valid_to``, ``current_flag``); ``updates`` carry
    the natural columns plus ``ts_col`` (revision time, may contain
    several revisions per key).  Returns the new history:

    * untouched keys pass through;
    * each touched key's OPEN row closes at the key's earliest update
      timestamp;
    * updates become versioned rows chained by ``lead`` over the delta,
      the latest staying open (``valid_to`` NULL, current).

    The window partitions by key over the UPDATES only — the full
    history is never sorted or shuffled beyond the one anti-join.

    ``broadcast_updates`` (default True — daily deltas are tiny next to
    the history) forces a broadcast of the delta's key/first-ts tables;
    pass False for a delta too large to collect to the driver and the
    joins take the regular shuffle path (AQE may still pick broadcast
    from runtime stats)."""
    upd_keys = updates.select(key).distinct()
    first_ts = updates.groupBy(key).agg(F.min(ts_col).alias("__first_ts"))
    if broadcast_updates:
        upd_keys = F.broadcast(upd_keys)
        first_ts = F.broadcast(first_ts)

    untouched = history.join(upd_keys, on=key, how="left_anti")
    closed = (
        history.join(upd_keys, on=key, how="left_semi")
        .join(first_ts, on=key)
        .withColumn(
            valid_to,
            F.when(F.col(current_flag), F.col("__first_ts"))
            .otherwise(F.col(valid_to)))
        .withColumn(
            current_flag,
            F.when(F.col(current_flag), F.lit(False))
            .otherwise(F.col(current_flag)))
        .drop("__first_ts")
    )
    w = Window.partitionBy(key).orderBy(ts_col)
    versioned = (
        updates.withColumn(valid_from, F.col(ts_col))
        .withColumn(valid_to, F.lead(ts_col).over(w))
        .withColumn(current_flag, F.col(valid_to).isNull())
        .drop(ts_col)
    )
    return untouched.unionByName(closed).unionByName(versioned)


def unpivot(df: DataFrame, id_cols: list[str], value_cols: list[str],
            *, var_name: str = "variable",
            value_name: str = "value") -> DataFrame:
    """Melt wide columns into (variable, value) rows via the built-in
    ``stack`` table generator — one narrow projection, zero shuffle.

    Column names are escaped into the generated expression (backticks
    doubled inside identifiers, quotes escaped inside the label
    literals), so arbitrary names cannot break or inject into it."""

    def lit(c: str) -> str:
        return "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"

    def ident(c: str) -> str:
        return "`" + c.replace("`", "``") + "`"

    pairs = ", ".join(f"{lit(c)}, {ident(c)}" for c in value_cols)
    expr = (f"stack({len(value_cols)}, {pairs}) "
            f"as ({ident(var_name)}, {ident(value_name)})")
    return df.selectExpr(*[ident(c) for c in id_cols], expr)


def snapshot_diff(old: DataFrame, new: DataFrame, *, key: str,
                  compare_cols: "list[str] | None" = None) -> DataFrame:
    """Diff two corpus snapshots by key: one row per key present in
    either side with status ``added`` / ``removed`` / ``changed`` /
    ``unchanged`` — the data-ops audit between crawl refreshes that
    upsert/SCD2 pipelines are validated against.

    Change detection compares an md5 digest over ``compare_cols``
    (default: every non-key column both sides share, in sorted-name
    order) so wide rows never cross the join as payloads: each side
    reduces to (key, digest) map-side, the FULL OUTER join ships ~24
    bytes per row, and the statuses fall out of null-ness + digest
    inequality.  Deterministic, no collect, one join."""
    from pyspark.sql import functions as F

    if compare_cols is None:
        compare_cols = sorted(
            c for c in old.columns if c != key and c in new.columns)

    def digest(df: DataFrame, alias: str) -> DataFrame:
        return df.select(
            F.col(key),
            F.md5(F.concat_ws(
                "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                          for c in compare_cols])).alias(alias))

    o = digest(old, "__ho")
    n = digest(new, "__hn")
    status = (
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("removed"))
        .when(F.col("__ho") != F.col("__hn"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        o.join(n, key, "full_outer")
        .select(F.col(key), status.alias("status"))
    )
