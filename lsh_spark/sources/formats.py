"""Format connectors beyond parquet: CSV / JSON(L) readers with explicit
schemas, and partitioned writers.

The reference has no storage layer at all (SURVEY.md §2.4 — its tests use
host-engine temp tables), so this module is pure host-engine surface: thin,
declarative wrappers that keep Catalyst's pushdown/pruning intact (always
explicit schemas — schema inference reads the data twice and types drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet sink.  ``partition_by`` should be low-cardinality
    columns (e.g. date, lang) — at 100 TB, partition-pruned reads are the
    difference between scanning a shard and scanning the lake.
    ``max_records_per_file`` caps file sizes without an extra repartition
    shuffle."""
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    *,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles once at write time so future
    equi-joins/aggregations on ``bucket_by`` skip their exchange entirely —
    the standard way to amortize a hot join key across many queries."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table_name, format="parquet")


def write_orc(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (columnar alternative where the lake standardizes on ORC;
    same pushdown/pruning properties as parquet in Spark's reader)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str,
             schema: StructType | None = None) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    *,
    path_glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Raw-media ingest via Spark's built-in ``binaryFile`` source:
    one row per file with ``(path, modificationTime, length, content
    BINARY)`` — the front door for the multimodal pipeline
    (``multimodal.media.extract_features`` consumes the ``content``
    blobs).  The source never splits a file, so partitioning follows
    file boundaries; keep individual media files under the executor
    memory budget and let ``spark.sql.files.maxPartitionBytes`` pack
    small files into shared tasks."""
    r = spark.read.format("binaryFile")
    if path_glob:
        r = r.option("pathGlobFilter", path_glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    return r.load(path)


def read_avro(spark: SparkSession, path: str,
              schema: StructType | None = None) -> DataFrame:
    """Avro reader, gated: the pip ``pyspark`` distribution ships Avro's
    core jars but NOT the ``spark-avro`` datasource module, so this
    raises a clear error here unless the deployment adds
    ``org.apache.spark:spark-avro`` to ``spark.jars.packages``."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    try:
        return r.format("avro").load(path)
    except Exception as exc:  # AnalysisException: failed to find source
        raise RuntimeError(
            "the spark-avro datasource module is not on the classpath; "
            "add org.apache.spark:spark-avro_2.13 to spark.jars.packages"
        ) from exc


def read_text(spark: SparkSession, path: str, *,
              whole_file: bool = False) -> DataFrame:
    """Raw-text corpus ingest: one row per line (``value`` string), or one
    row per file with ``wholetext`` — the front door for document
    pipelines whose corpus arrives as plain text files."""
    return spark.read.text(path, wholetext=whole_file)
