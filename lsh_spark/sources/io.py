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
        # events.ts is parquet TIMESTAMP(NANOS); the vectorized reader
        # rejects it unless read as long
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        # timestamp rendering must be timezone-stable vs the DuckDB oracle
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # non-settable on this session → builder must provide it


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS,false): with
        # spark.sql.legacy.parquet.nanosAsLong it arrives as int64 nanos;
        # the source data is microsecond-granular so the micros cast is
        # lossless
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))  # integer div:
        # ns values ~1.7e18 exceed double's 2^53 mantissa, so the
        # float division `/ 1000` rounds the microsecond off by ±1
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            # Session built WITHOUT nanosAsLong (the conf is builder-only in
            # Spark 4.x; a runtime conf.set silently no-ops): the parquet
            # reader yields TIMESTAMP_NTZ truncated to micros.  Session tz
            # is UTC, so reinterpreting NTZ as an instant matches the
            # timestamp_micros path bit-for-bit.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
