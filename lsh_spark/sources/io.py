"""Table sources: the testdata star schema as DataFrames.

The reference has no storage layer (tables are host-DuckDB temp tables;
SURVEY.md §2.4) — here the host engine is Spark, and the canonical source
is parquet.  ``load_table``/``load_tables`` read with schema inference from
parquet footers (column pruning and predicate pushdown reach the scan
automatically via the DataSource V2 parquet reader).

``register_views`` exposes every table as a temp view so ``spark.sql``
queries mirror the DuckDB oracle setup.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# dimension tables small enough to broadcast at any realistic scale factor
BROADCAST_TABLES = {"region", "nation", "supplier"}


def _ensure_session_confs(spark: SparkSession) -> None:
    """Runtime-settable configs every query depends on — applied here so
    the operators work on ANY caller-provided session (the driver passes
    its own), not just ones built by ``plans.get_spark``."""
    for key, value in (
        # Harmless no-op on Spark 4.1 (probe-verified; kept for older
        # Sparks where parquet TIMESTAMP(NANOS) needs the long fallback)
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # non-settable on this session → builder must provide it
    # Timestamp rendering must be timezone-stable vs the DuckDB oracle and
    # the NTZ->timestamp reinterpretation in load_table assumes UTC: a
    # silent failure here would skew every events timestamp, so fail loud.
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# inferred parquet schemas per (path): schema inference launches a
# footer-read Spark job on EVERY spark.read.parquet call — caching it makes
# repeat plan construction job-free (asserted by tests/test_plans.py)
_SCHEMA_CACHE: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    cached = _SCHEMA_CACHE.get(path)
    if cached is not None:
        df = spark.read.schema(cached).parquet(path)
    else:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS,false).  On Spark 4.1 the parquet
        # reader yields TIMESTAMP_NTZ truncated to micros regardless of
        # spark.sql.legacy.parquet.nanosAsLong (probe-verified: the conf
        # no-ops even as a builder conf here; tests/test_sources.py pins
        # the loaded dtype).  The LongType branch is defensive for older
        # Sparks where nanosAsLong DOES apply — and because a forced-long
        # read can surface either nanos (3.x nanosAsLong) or micros
        # (4.x explicit-schema probe), the unit is detected per row by
        # magnitude: epoch nanos for any date past 2006 exceed 2^60,
        # epoch micros won't until the year 38000.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.when(F.abs(F.col("ts")) > F.lit(1 << 60),
                           F.expr("ts div 1000"))  # integer div: ns values
                    # ~1.7e18 exceed double's 2^53 mantissa, so float
                    # `/ 1000` would round the microsecond off by ±1
                    .otherwise(F.col("ts"))))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            # Session tz is UTC (enforced above), so reinterpreting NTZ as
            # an instant is lossless.  Explicit TimestampType: a plain
            # cast("timestamp") resolves via spark.sql.timestampType and
            # would silently no-op on a TIMESTAMP_NTZ-default session.
            df = df.withColumn("ts", F.col("ts").cast(TimestampType()))
    return df


def fanout_scan(df: DataFrame) -> DataFrame:
    """Spread a narrow scan across the cluster when the source has fewer
    partitions than cores — single-file / single-row-group parquet arrives
    as ONE task, serializing any CPU-heavy (UDF) pass that follows.  Only
    ever increases partition count: on a real multi-file 100 TB layout the
    scan already has thousands of splits and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
