"""Structured Streaming over the embeddings table: a vector stream
probed against the PERSISTED IVF index per micro-batch — the vector
twin of ``streaming/documents.py``'s LSH index probe, and the
production shape for streaming similarity search at 100 TB: the
corpus-wide work (Lloyd training + the bucketed-by-cell write) happens
once at index-build time; each micro-batch computes only its own cell
assignments and reads the matching corpus buckets with no corpus-side
exchange.

``foreachBatch`` + ``search_ivf_index`` keeps batch/stream parity by
construction (the operator is pytest-pinned to return exactly
``ivf_lloyd_topk``'s results for matching parameters), so the gate
query reuses the batch IVF oracle verbatim: the union of micro-batch
outputs must hash-match the one-shot SQL replay of training + assign +
probe + rerank.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.formats import index_meta
from .documents import _write_batch_idempotent


def ensure_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """Session-amortized build of the gate's persisted IVF index over
    the embeddings table (the ``ann_ivf_topk`` parameters); returns the
    index name.  Build once per session, keyed on the meta-pinned
    parameters (same amortization pattern as ``ensure_ab_index``: fresh
    sessions always build, same-session reruns time the probe only).
    Shared by the streaming search and the index-stats gate queries."""
    from ..operators.ann import build_ivf_index
    from ..operators.pipeline_queries import _IVF_ITERS, _IVF_LISTS
    from ..sources.io import _ensure_session_confs, load_table

    _ensure_session_confs(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    index = f"ivfidx_{tag}"
    want = dict(vec_col="embedding", id_col="vec_id",
                n_lists=int(_IVF_LISTS), n_iters=int(_IVF_ITERS))
    have = None
    if spark.catalog.tableExists(f"{index}_meta"):
        m = index_meta(spark, f"{index}_meta")
        have = dict(vec_col=m.vec_col, id_col=m.id_col,
                    n_lists=m.n_lists,
                    n_iters=m.n_iters if "n_iters" in m.__fields__
                    else None)
    if have != want:
        import sys
        import time

        t0 = time.perf_counter()
        build_ivf_index(emb, index, vec_col="embedding",
                        id_col="vec_id", n_lists=_IVF_LISTS,
                        n_iters=_IVF_ITERS)
        print(f"# ensure_ivf_index: index build took "
              f"{time.perf_counter() - t0:.2f}s (reused by later runs "
              f"in this session)", file=sys.stderr)
    return index


def ann_ivf_search_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate query: the ``ann_ivf_topk`` workload (queries =
    ``vec_id < _N_QUERIES``) driven through an actual streaming query —
    query vectors arrive as a file-source stream and probe the
    persisted IVF index inside ``foreachBatch``.  Same index parameters
    as the batch twin, so it carries the identical exact DuckDB oracle
    (``ANN_IVF_LLOYD_ORACLE``)."""
    from ..operators.ann import search_ivf_index
    from ..operators.pipeline_queries import _ANN_K, _IVF_PROBE, _N_QUERIES
    from ..sources.io import load_table

    index = ensure_ivf_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")

    stream = (
        spark.readStream.schema(emb.schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(sf_dir)
        .where(F.col("vec_id") < _N_QUERIES)
    )
    out_dir = f"/tmp/lsh_spark_stream_ivf_{tag}"
    ckpt = f"/tmp/lsh_spark_ckpt_stream_ivf_{tag}"
    for d in (out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = search_ivf_index(spark, index, batch_df,
                               k=_ANN_K, n_probe=_IVF_PROBE)
        _write_batch_idempotent(res, out_dir, batch_id)

    from .events import scoped_state_partitions

    with scoped_state_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(process)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

    if not os.path.isdir(out_dir) or not any(
            f.startswith("batch_id=") for f in os.listdir(out_dir)):
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine_sim double, "
                "rank int")
    return spark.read.parquet(out_dir).select(
        "query_id", "neighbor_id", "cosine_sim", "rank")


def ann_pq_search_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``ann_pq_topk`` workload driven through a streaming query:
    query vectors arrive as a file-source stream and probe the
    persisted PQ index inside ``foreachBatch`` — same parameters as
    the batch twin, so it carries the identical exact unrolled-Lloyd
    ADC oracle.  Registered via pipeline_queries.QUERIES_LATE (the
    late-registration contract keeps earlier registry positions
    stable)."""
    from ..operators.ann import search_pq_index
    from ..operators.pipeline_queries import _ANN_K, _N_QUERIES
    from ..sources.io import load_table

    index = ensure_pq_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")

    stream = (
        spark.readStream.schema(emb.schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(sf_dir)
        .where(F.col("vec_id") < _N_QUERIES)
    )
    out_dir = f"/tmp/lsh_spark_stream_pq_{tag}"
    ckpt = f"/tmp/lsh_spark_ckpt_stream_pq_{tag}"
    for d in (out_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = search_pq_index(spark, index, batch_df, k=_ANN_K)
        _write_batch_idempotent(res, out_dir, batch_id)

    from .events import scoped_state_partitions

    with scoped_state_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(process)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

    if not os.path.isdir(out_dir) or not any(
            f.startswith("batch_id=") for f in os.listdir(out_dir)):
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, approx_dist double, "
                "rank int")
    return spark.read.parquet(out_dir).select(
        "query_id", "neighbor_id", "approx_dist", "rank")


def _oracle() -> str:
    from ..operators.pipeline_queries import ANN_IVF_LLOYD_ORACLE

    return ANN_IVF_LLOYD_ORACLE


QUERIES = {
    "ann_ivf_search_streaming": (ann_ivf_search_streaming, _oracle()),
}


def ensure_ivf_sq8_index(spark: SparkSession, sf_dir: str) -> str:
    """Session-amortized build of the QUANTIZED gate index — the
    ``ensure_ivf_index`` twin with ``storage="sq8"`` (FAISS IVF-SQ
    shape: int8 codes + frozen per-dim bounds instead of float
    vectors).  Separate physical name so the float32 gate index and its
    driver-row history are untouched."""
    from ..operators.ann import build_ivf_index
    from ..operators.pipeline_queries import _IVF_ITERS, _IVF_LISTS, _SQ8_DIM
    from ..sources.io import _ensure_session_confs, load_table

    _ensure_session_confs(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    index = f"ivfsq8idx_{tag}"
    want = dict(vec_col="embedding", id_col="vec_id",
                n_lists=int(_IVF_LISTS), n_iters=int(_IVF_ITERS),
                storage="sq8", dim=int(_SQ8_DIM))
    have = None
    if spark.catalog.tableExists(f"{index}_meta"):
        m = index_meta(spark, f"{index}_meta")
        have = dict(vec_col=m.vec_col, id_col=m.id_col,
                    n_lists=m.n_lists, n_iters=m.n_iters,
                    storage=m.storage if "storage" in m.__fields__
                    else "float32",
                    # pre-dim meta rows (round 7) force one rebuild
                    dim=m.dim if "dim" in m.__fields__ else None)
    if have != want:
        import sys
        import time

        t0 = time.perf_counter()
        build_ivf_index(emb, index, vec_col="embedding",
                        id_col="vec_id", n_lists=_IVF_LISTS,
                        n_iters=_IVF_ITERS, storage="sq8", dim=_SQ8_DIM)
        print(f"# ensure_ivf_sq8_index: index build took "
              f"{time.perf_counter() - t0:.2f}s (reused by later runs "
              f"in this session)", file=sys.stderr)
    return index


def ensure_pq_index(spark: SparkSession, sf_dir: str) -> str:
    """Session-amortized build of the gate's persisted PQ index over the
    embeddings table (the ``ann_pq_topk`` parameters); same contract as
    ``ensure_ivf_index``: fresh sessions build, parameter changes force
    a rebuild via the meta row, same-session reruns time the probe
    only."""
    from ..operators.ann import build_pq_index
    from ..operators.pipeline_queries import (
        _PQ_CODES,
        _PQ_DIM,
        _PQ_ITERS,
        _PQ_M,
    )
    from ..sources.io import _ensure_session_confs, load_table

    _ensure_session_confs(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    index = f"pqidx_{tag}"
    want = dict(vec_col="embedding", id_col="vec_id", m=int(_PQ_M),
                n_codes=int(_PQ_CODES), n_iters=int(_PQ_ITERS),
                dim=int(_PQ_DIM))
    have = None
    if spark.catalog.tableExists(f"{index}_meta"):
        mt = index_meta(spark, f"{index}_meta")
        have = dict(vec_col=mt.vec_col, id_col=mt.id_col, m=mt.m,
                    n_codes=mt.n_codes, n_iters=mt.n_iters, dim=mt.dim)
    if have != want:
        import sys
        import time

        t0 = time.perf_counter()
        build_pq_index(emb, index, vec_col="embedding", id_col="vec_id",
                       m=_PQ_M, n_codes=_PQ_CODES, n_iters=_PQ_ITERS,
                       dim=_PQ_DIM)
        print(f"# ensure_pq_index: index build took "
              f"{time.perf_counter() - t0:.2f}s (reused by later runs "
              f"in this session)", file=sys.stderr)
    return index


def ensure_ivf_pq_index(spark: SparkSession, sf_dir: str) -> str:
    """Session-amortized build of the gate's persisted IVF-PQ index
    (the ``ann_ivf_pq_topk`` parameters); same contract as the other
    ensure_* helpers."""
    from ..operators.ann import build_ivf_pq_index
    from ..operators.pipeline_queries import (
        _IVF_ITERS,
        _IVF_LISTS,
        _PQ_CODES,
        _PQ_DIM,
        _PQ_ITERS,
        _PQ_M,
    )
    from ..sources.io import _ensure_session_confs, load_table

    _ensure_session_confs(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    index = f"ivfpqidx_{tag}"
    want = dict(vec_col="embedding", id_col="vec_id",
                n_lists=int(_IVF_LISTS), cells_iters=int(_IVF_ITERS),
                m=int(_PQ_M), n_codes=int(_PQ_CODES),
                pq_iters=int(_PQ_ITERS), dim=int(_PQ_DIM))
    have = None
    if spark.catalog.tableExists(f"{index}_meta"):
        mt = index_meta(spark, f"{index}_meta")
        have = dict(vec_col=mt.vec_col, id_col=mt.id_col,
                    n_lists=mt.n_lists, cells_iters=mt.cells_iters,
                    m=mt.m, n_codes=mt.n_codes, pq_iters=mt.pq_iters,
                    dim=mt.dim)
    if have != want:
        import sys
        import time

        t0 = time.perf_counter()
        build_ivf_pq_index(emb, index, vec_col="embedding",
                           id_col="vec_id", n_lists=_IVF_LISTS,
                           cells_iters=_IVF_ITERS, m=_PQ_M,
                           n_codes=_PQ_CODES, pq_iters=_PQ_ITERS,
                           dim=_PQ_DIM)
        print(f"# ensure_ivf_pq_index: index build took "
              f"{time.perf_counter() - t0:.2f}s (reused by later runs "
              f"in this session)", file=sys.stderr)
    return index
