"""Connected components over doc↔bucket bipartite block graphs by
alternating min-label propagation — the shared pair-free clustering core
(factored verbatim from ``similarity_join.lsh_dedup_clusters`` so the
MinHash-band and Hamming-block callers run the identical iteration).

Every iteration is two hash-aggregations bounded by rows × blocks —
never a pair join — which is what makes cluster dedup viable when a
duplicate group of m members would otherwise materialize m²/2 pairs.
Convergence in O(cluster diameter) rounds with an early fixed-point
exit; see the caller docstrings for the measured residual curves.
"""

from __future__ import annotations

import warnings

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.cache import track


class CCNonConvergenceWarning(RuntimeWarning):
    """``min_label_components`` exhausted ``max_iter`` rounds while
    labels were still changing: the returned components may be SPLIT
    (a true component can carry more than one label).  Diameter >
    max_iter chains are plausible at scale — long duplicate chains —
    so the condition must be loud, never silent (round-6 verdict
    item 3).  Remedy: raise ``max_iter``; convergence needs
    O(component diameter) rounds."""


def min_label_components(
    blocks: DataFrame,
    *,
    max_iter: int = 12,
) -> DataFrame:
    """Labels (``__id``, ``__label``) of the connected components of the
    bipartite graph whose edges are ``blocks`` rows (columns ``__id``,
    ``band_idx``, ``band_hash``); the label is the component's min id.
    Docs appearing only in singleton buckets are their own component.

    ``blocks`` should already be persisted by the caller if its lineage
    is expensive (the iteration scans it once per round)."""
    all_ids = blocks.select("__id").distinct()
    # doc ↔ bucket edges; singleton buckets can never link anything, so
    # drop them before iterating — in a real corpus the overwhelming
    # majority of buckets are singletons and the propagation graph
    # shrinks to just the linked subset
    bucket_sizes = (
        blocks.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .select("band_idx", "band_hash")
    )
    edges = track(
        blocks.join(bucket_sizes, on=["band_idx", "band_hash"])
        .select("__id", "band_idx", "band_hash")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # right-size the iteration: every propagation stage maps over the
    # cached edges, so its partition count sets the per-round task count.
    # The singleton-prune typically shrinks edges far below the input
    # (measured at sf0.1: 245k block rows → 21k edges in 32 partitions —
    # 7 rounds of 32 near-empty tasks per stage was pure scheduling
    # overhead, measured ~40% of the operator's wall time).  One count
    # materializes the cache (the first round would have anyway) and
    # sizes partitions to the graph; on a 100 TB corpus the quotient
    # keeps thousands of partitions, so scale behavior is unchanged.
    n_edges = edges.count()
    target_parts = n_edges // 100_000 + 1
    if target_parts < edges.rdd.getNumPartitions():
        resized = track(edges.repartition(target_parts, "__id")
                        .persist(StorageLevel.MEMORY_AND_DISK))
        edges.unpersist()
        edges = resized

    # initialization already performs round 1: a bucket's min member id is
    # its label, a doc's initial label is the min over its buckets
    labels = (
        edges.groupBy("band_idx", "band_hash")
        .agg(F.min("__id").alias("__bucket_label"))
        .join(edges, on=["band_idx", "band_hash"])
        .groupBy("__id")
        .agg(F.min("__bucket_label").alias("__label"))
    )
    # checking the fixed point only every 2nd round lets two propagation
    # rounds pipeline into ONE job (each check is an action that
    # materializes the lineage — measured: checking every round costs
    # more than the redundant, label-stable round it saves; a per-round
    # pointer-jump self-join also measured slower — its join key differs
    # from the groupBy key, forcing an extra shuffle and re-computing the
    # unpersisted propagation lineage twice)
    prev = None
    converged = False
    if max_iter < 2:
        # a 1-round budget never MEASURES change, which is not the same
        # as converging — say so loudly instead of silently returning
        # possibly-split components (the exact condition the warning
        # exists for)
        warnings.warn(
            f"min_label_components: max_iter={max_iter} leaves no round "
            "to check the fixed point — components may be split; use "
            "max_iter >= 2 (needs O(component diameter) rounds)",
            CCNonConvergenceWarning,
            stacklevel=2,
        )
        converged = True  # suppress the redundant post-loop warning
    changed = 0
    labels_is_leaf = False  # True once labels is checkpoint-backed
    for it in range(max_iter - 1):
        if not labels_is_leaf:
            labels = track(labels.persist(StorageLevel.MEMORY_AND_DISK))
        bucket_min = (
            edges.join(labels, on="__id")
            .groupBy("band_idx", "band_hash")
            .agg(F.min("__label").alias("__bucket_label"))
        )
        new_labels = (
            edges.join(bucket_min, on=["band_idx", "band_hash"])
            .groupBy("__id")
            .agg(F.min("__bucket_label").alias("__label"))
        )
        check_now = it % 2 == 1 or it == max_iter - 2
        if check_now:
            # truncate the plan at every fixed-point check (the GraphX /
            # GraphFrames iteration idiom): the lazy localCheckpoint is
            # materialized by the `changed` count and makes labels a
            # LogicalRDD LEAF.  persist() alone is NOT enough for
            # high-diameter graphs: each round's InMemoryRelation embeds
            # the previous round's physical plan, so plan trees (and the
            # AQE explainString regenerated on every plan update) grow
            # quadratically with rounds — observed driver heap OOM at
            # ~20 check rounds on a 40-node path graph.  With the leaf
            # cut, plan depth is constant regardless of iteration count;
            # superseded checkpoint blocks are freed by the
            # ContextCleaner once the Python refs drop below.
            new_labels = new_labels.localCheckpoint(eager=False)
            changed = (
                new_labels.join(labels.withColumnRenamed("__label", "__old"),
                                on="__id")
                .where(F.col("__label") != F.col("__old"))
                .count()
            )
            if prev is not None:
                prev_df, prev_is_leaf = prev
                if not prev_is_leaf:
                    prev_df.unpersist()
            if not labels_is_leaf:
                labels.unpersist()
            prev = None
            labels = new_labels
            labels_is_leaf = True
            if changed == 0:
                converged = True
                break
        else:
            # no action this round: keep the previous cache pinned so the
            # next round's action can still reuse it through the lineage
            prev = (labels, labels_is_leaf)
            labels = new_labels
            labels_is_leaf = False

    if not converged and changed > 0:
        # the final round's fixed-point check (always taken at
        # it == max_iter - 2) still saw moving labels — surface it
        warnings.warn(
            f"min_label_components: no fixed point after {max_iter} "
            f"rounds ({changed} labels still changing in the last "
            f"round); components may be split — raise max_iter "
            f"(needs O(component diameter) rounds)",
            CCNonConvergenceWarning,
            stacklevel=2,
        )

    # docs whose every bucket was a singleton never entered the iteration:
    # they are their own cluster
    isolated = all_ids.join(labels.select("__id"), on="__id", how="left_anti")
    return labels.unionAll(
        isolated.select("__id", F.col("__id").alias("__label")))
