"""Storage-layout operators: small-file compaction and Z-order
clustering — the file-level hygiene a 100 TB parquet lake needs.

* ``compact_parquet``: the small-files problem (thousands of KB-sized
  files from streaming sinks / over-parallel writes) turns scans into
  metadata storms.  Rewrite a directory to ~``target_mb`` files, sized
  from the directory's ACTUAL bytes (parquet footers via the file
  listing, no Spark job), preserving schema.
* ``zorder_by``: multi-column data skipping.  Parquet row-group pruning
  works per column on min/max ranges; sorting by (a, b) only clusters
  ``a``.  Interleaving the bits of rank-normalized columns (Morton
  order) clusters BOTH, so predicates on either column prune row
  groups.  The interleave is pure JVM bit arithmetic (shiftleft/|),
  and the sort is Spark's regular range-partitioned sort — no UDFs.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def dir_parquet_bytes(path: str) -> int:
    """Total bytes of the parquet files under ``path`` (driver-side file
    listing — no Spark job).  LOCAL-filesystem paths only: object-store
    URIs (s3://, hdfs://) need a listing through the store's client; on
    such a deployment, size via the FileSystem API instead."""
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f))
                     for f in files if f.endswith(".parquet"))
    return total


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    *,
    target_mb: int = 512,
) -> int:
    """Rewrite the parquet directory at ``path`` into ``out_path`` with
    ~``target_mb``-sized files; returns the output file count.

    File count derives from actual input bytes (footer-inclusive, local
    FS only — see ``dir_parquet_bytes``), so no count/sample job runs
    before the single rewrite job.  ``coalesce`` (not ``repartition``)
    keeps the rewrite shuffle-free when shrinking."""
    if os.path.realpath(out_path) == os.path.realpath(path):
        raise ValueError(
            "compact_parquet out_path must differ from path: an "
            "overwrite-in-place would truncate the input mid-scan")
    n_files = max(1, -(-dir_parquet_bytes(path) // (target_mb << 20)))
    df = spark.read.parquet(path)
    part = df.rdd.getNumPartitions()
    out = df.coalesce(n_files) if n_files < part \
        else df.repartition(n_files)
    out.write.mode("overwrite").parquet(out_path)
    return n_files


_ZBITS = 16


def _rank_bits(c: Column, lo: Column, hi: Column) -> Column:
    """Scale a column into [0, 2^_ZBITS) using broadcast min/max — a
    rank proxy that is monotone per column (exact ranks would need a
    global sort; min/max scaling skips that and prunes nearly as well
    on roughly uniform keys)."""
    span = (hi - lo).cast("double")
    unit = F.when(span > 0, (c - lo).cast("double") / span).otherwise(
        F.lit(0.0))
    v = F.least(F.floor(unit * ((1 << _ZBITS) - 1)), F.lit((1 << _ZBITS) - 1))
    return v.cast("long")


def zorder_key(cols: list[Column]) -> Column:
    """Morton interleave of pre-scaled ``_ZBITS``-bit codes (pure JVM
    shift/or expressions — whole-stage-codegen friendly)."""
    key = F.lit(0).cast("long")
    for bit in range(_ZBITS - 1, -1, -1):
        for c in cols:
            key = F.shiftleft(key, 1).bitwiseOR(
                F.shiftright(c, bit).bitwiseAND(F.lit(1)))
    return key


def zorder_by(df: DataFrame, columns: list[str]) -> DataFrame:
    """Return ``df`` sorted in Z-order over ``columns`` (numeric).

    Writing the result gives row groups whose min/max ranges are tight
    on EVERY listed column, so single-column predicates prune files/row
    groups regardless of which column they hit.  The min/max scan is one
    tiny agg joined back as a broadcast scalar row — the sort itself is
    the only shuffle."""
    if len(columns) * _ZBITS > 63:
        raise ValueError(
            f"at most {63 // _ZBITS} z-order columns fit a signed 64-bit "
            f"key at {_ZBITS} bits per column")
    aggs = []
    for col in columns:
        aggs += [F.min(col).alias(f"__lo_{col}"),
                 F.max(col).alias(f"__hi_{col}")]
    bounds = F.broadcast(df.agg(*aggs))
    with_bounds = df.crossJoin(bounds)
    codes = [
        _rank_bits(F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"))
        for c in columns
    ]
    keyed = with_bounds.withColumn("__zkey", zorder_key(codes))
    return (
        keyed.repartitionByRange(
            df.sparkSession.sparkContext.defaultParallelism, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *[f"__lo_{c}" for c in columns],
              *[f"__hi_{c}" for c in columns])
    )
