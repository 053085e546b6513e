"""Partitioning-independence: query results must be identical under a
different parallelism/shuffle-partition regime than the default test
session (the verification harness chooses its own session settings).

Each regime runs in its own subprocess (one JVM cannot host two
SparkContexts); canonicalized results are compared across regimes for a
representative slice: pure agg, window rank, python-UDF pipeline, blocking
join, sessionization, and the scalar-subquery comparison.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

QUERIES_TO_CHECK = [
    "q1_pricing_summary",
    "top_orders_per_customer",
    "minhash_near_dup_pairs",
    "jaccard_near_dup_pairs",
    "events_sessionize",
    "high_value_order_customers",
    # round-8 float-fold / digest-plan queries — the exact surfaces a
    # 1000-executor repartitioning would break if any summation order
    # or keep-first tie leaked partition layout:
    "bm25_search",            # term-sorted sequential fold + ranking
    "hybrid_search_rrf",      # two-channel fusion of integer ranks
    "bigram_logprob_scores",  # bigram-sorted sequential fold
    "prepare_training_corpus",  # digest chunk dedup + greedy packing
    "split_leakage_stats",    # in-plan md5 split over mined pairs
    "duplicate_substring_spans",  # min-pack canonical occurrence
    "mixture_sample_counts",  # md5-bucket weighted keep
    "q10_returned_items",     # TakeOrdered top-k (exact-decimal order)
    "pmi_top_pairs",          # TakeOrdered top-k + per-pair ln
    "ann_recall_report",      # integer set intersection of two top-ks
    "source_quality_report",  # DECIMAL(18,6) mean of 6-dp scores
    "corpus_snapshot_diff",   # digest full-outer statuses
    # round-9 surfaces:
    "ann_pq_topk",            # fixed-point Lloyd ×m + ADC LUT chain
    "phrase_search_docs",     # anchor-vote counts (pure integers)
    "zipf_fit_stats",         # decimal-summed quantized log terms
    "q17_small_quantity_revenue",  # per-part avg broadcast filter
    "ann_ivf_pq_topk",        # two-level index: cells × ADC codes
    "curriculum_stages",      # exact-percentile boundary bucketing
]

_RUNNER = """
import json, sys
from pyspark.sql import SparkSession

master, shuffle, aqe, out_path = sys.argv[1:5]
spark = (SparkSession.builder.master(master)
         .config("spark.sql.shuffle.partitions", shuffle)
         .config("spark.sql.adaptive.enabled", aqe)
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as entry
qs = entry.queries()
results = {{}}
for name in {queries!r}:
    df = qs[name](spark, "/root/testdata/sf0.001")
    cols = sorted(df.columns)
    rows = sorted(tuple(str(r[c]) for c in cols) for r in df.collect())
    results[name] = rows
with open(out_path, "w") as f:
    json.dump(results, f)
spark.stop()
"""


def _run_regime(tmp_path, tag, master, shuffle, aqe):
    out = str(tmp_path / f"{tag}.json")
    script = _RUNNER.format(queries=QUERIES_TO_CHECK)
    subprocess.run(
        [sys.executable, "-c", script, master, shuffle, aqe, out],
        check=True, cwd="/root/repo", timeout=420,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(out) as f:
        return json.load(f)


@pytest.mark.slow
def test_results_independent_of_partitioning(tmp_path):
    a = _run_regime(tmp_path, "wide", "local[8]", "16", "true")
    b = _run_regime(tmp_path, "narrow", "local[3]", "7", "false")
    for name in QUERIES_TO_CHECK:
        assert a[name] == b[name], (
            f"{name} depends on partitioning: {len(a[name])} vs "
            f"{len(b[name])} rows or value drift")
