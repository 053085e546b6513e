"""Scale check: replicate the documents corpus N× (fresh ids, perturbed
texts) and run the heavy operators, recording wall time vs corpus size.

This is the 100×-scale-up sanity the small-SF bench cannot give:
  * does candidate volume grow like the banding model predicts?
  * does anything collect/OOM on the driver?
  * is the growth in wall time ~linear in rows (for signatures) and
    ~linear in candidate pairs (for dedup)?

Run: python3 scripts/scale_check.py [replication ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from lsh_spark.operators.similarity_join import (
        lsh_dedup_clusters,
        lsh_dedup_keep_first,
    )
    from lsh_spark.plans import get_spark
    from lsh_spark.sources.io import load_table

    reps = [int(a) for a in sys.argv[1:]] or [1, 5, 20]
    spark = get_spark(app_name="lsh_spark-scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    n_base = base.count()

    for rep in reps:
        # fresh ids per replica; perturb text per replica so replicas are
        # near-dups (suffix changes a few trailing shingles), exercising
        # the verification path rather than pure exact-dup collapse
        docs = (
            base.crossJoin(
                spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("doc_id") * rep + F.col("__rep")).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(" tail"),
                    F.col("__rep").cast("string")).alias("text"),
            )
        )
        n = n_base * rep
        t0 = time.perf_counter()
        # 1) signature pass
        from lsh_spark.functions.lsh import lsh_min_bands_long

        n_sig = docs.select(
            lsh_min_bands_long(F.col("text"), 3, 6, 6, 123).alias("b")
        ).where(F.size("b") == 6).count()
        t_sig = time.perf_counter() - t0

        # 2) pair-free cluster dedup (the 100 TB path — scales with rows,
        # not with within-cluster pair counts)
        t0 = time.perf_counter()
        clusters = lsh_dedup_clusters(
            docs, "text", id_col="doc_id", ngram_width=3, band_count=6,
            band_size=6, seed=123)
        n_reps = clusters.where("is_representative").count()
        t_cc = time.perf_counter() - t0

        # 3) verified keep-first dedup — output-bound (within-cluster pairs
        # grow quadratically with replication), so only at small reps
        t_dedup, n_kept = float("nan"), -1
        if rep <= 5:
            t0 = time.perf_counter()
            kept = lsh_dedup_keep_first(
                docs, "text", id_col="doc_id", ngram_width=3, band_count=6,
                band_size=6, seed=123, threshold=0.8,
                broadcast_sets=(n <= 200_000))
            n_kept = kept.count()
            t_dedup = time.perf_counter() - t0
        print(
            f"rep={rep:3d} rows={n:8d}  signatures={t_sig:7.1f}s "
            f"({n_sig} ok)  cluster_cc={t_cc:7.1f}s ({n_reps} reps)  "
            f"keep_first={t_dedup:7.1f}s (kept {n_kept})",
            flush=True)
        spark.catalog.clearCache()
    spark.stop()




def vectors() -> None:
    """Vector-family scale check: replicate embeddings N× (fresh ids,
    small deterministic perturbation via id-seeded linear shift) and run
    cell-blocked semantic dedup + IVF-flat search."""
    from lsh_spark.operators.ann import ivf_flat_topk
    from lsh_spark.operators.dedup import semantic_dedup_cells
    from lsh_spark.plans import get_spark
    from lsh_spark.sources.io import load_table

    reps = [int(a) for a in sys.argv[2:]] or [1, 5, 20]
    spark = get_spark(app_name="lsh_spark-scale-check-vec")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    n_base = base.count()
    for rep in reps:
        emb = (
            base.crossJoin(spark.range(rep).select(F.col("id").alias("__rep")))
            .select(
                (F.col("vec_id") * rep + F.col("__rep")).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x + (F.col("__rep") % 7).cast("float")
                    * F.lit(0.001) * (i % 3).cast("float")
                ).alias("embedding"),
            )
        )
        n = n_base * rep
        # production inputs are tables, not lazy transform chains —
        # materialize the replica so operator timings measure the
        # operators, and scale cells LINEARLY with rows so cell width
        # (hence pairs per row) stays constant
        from pyspark import StorageLevel

        emb = emb.persist(StorageLevel.MEMORY_AND_DISK)
        emb.count()
        n_lists = 32 * rep
        t0 = time.perf_counter()
        n_reps = (semantic_dedup_cells(emb, n_lists=n_lists, threshold=0.95)
                  .where("is_representative").count())
        t_sem = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_hits = ivf_flat_topk(
            emb, emb.where(F.col("vec_id") < 10), k=10,
            n_lists=n_lists, n_probe=4).count()
        t_ivf = time.perf_counter() - t0
        print(
            f"rep={rep:3d} rows={n:8d} cells={n_lists:4d}  "
            f"semantic_dedup={t_sem:7.1f}s ({n_reps} reps)  "
            f"ivf_flat={t_ivf:7.1f}s ({n_hits} hits)", flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--vectors":
        vectors()
    else:
        main()
