"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
SHORT JSON line on stdout: {"metric": ..., "value": total_sec,
"unit": "sec", "sf": ..., "n_queries": N}.

The per-query timing dict lives in BENCH_DETAIL.json (repo root) and is
mirrored to stderr.  It is deliberately NOT part of the stdout line: the
driver captures only a bounded tail of stdout and truncates from the
FRONT, so at 68 registered queries the old single all-in-one line
(~2.3 KB) lost its leading "metric"/"value" keys and round 4 recorded
"parsed": null.  A short final line is robust to any registry growth.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Queries whose ``.count()`` terminal under-measures: Catalyst legally
# prunes work that cannot change a count(1)'s row count — left joins on
# unique keys are ELIMINATED and deterministic output-only projections
# (Arrow/Python eval columns) are column-pruned (r12 verdict item 3 /
# SCALECHECK session 2: lang_id_predictions benched 0.25 s against a
# ~6 s real collect).  These get a noop-sink terminal instead: full
# column materialization, zero I/O.  The list is DERIVED, not curated —
# scripts/find_prunable_terminals.py plan-diffs every registry query
# (full optimized plan vs its count(1) plan, tallying prunable node
# kinds), and tests/test_plans.py::test_bench_noop_terminal_set_is_current
# fails if this set drifts from the detection.
_NOOP_TERMINAL = {
    "ann_recall_report",
    "asof_click_next_purchase",
    "asof_purchase_last_click",
    "bigram_logprob_scores",
    "bloom_dedup_docs",
    "bpe_encoded_token_counts",
    "cdc_chunk_dedup_stats",
    "chunk_novelty_docs",
    "contamination_overlap",
    "dup_ngram_stats",
    "errors_with_nearby_clicks",
    "events_dedup_streaming",
    "item_ppr_scores",
    "jaccard_near_dup_pairs",
    "kmv_doc_stats",
    "lang_id_predictions",
    "line_dedup_docs",
    "ngram_novelty_scores",
    "remove_duplicated_spans",
    "semantic_dedup",
    "unigram_logprob_scores",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from lsh_spark.plans import get_spark

    spark = get_spark(app_name="lsh_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    timings: dict[str, float] = {}
    # warm the JVM/python-worker pool once with a trivial action
    spark.range(1000).count()
    # JIT-warm the heavy code paths (Arrow pandas_udf, mapInPandas verify,
    # broadcast + window) on the tiny SF so the first timed query doesn't
    # absorb one-time codegen/JIT cost (measured: the first pair query
    # runs 2-5x its steady-state time on a cold JVM)
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf) and warm_sf != sf_dir.rstrip("/"):
        # one warm query per heavy code path: minhash set/verify UDFs,
        # brute vector ops, IVF centroid crossJoin + codegen, euclidean-LSH
        # banding, simhash UDF
        # similarity_join_ab included: the two-sided broadcast-kernel
        # A/B path JITs separately from the self-join (measured 23 s
        # cold vs 5.4 s warm at sf0.1)
        for warm in ("minhash_near_dup_pairs", "ann_topk",
                     "ann_ivf_flat_topk", "simhash_near_dup_pairs",
                     "similarity_join_ab"):
            if warm in qs:
                qs[warm](spark, warm_sf).count()
        # the session's FIRST bucketed saveAsTable pays one-time committer/
        # catalog init (~8s measured); absorb it here so the index-probe
        # query's timed builds reflect steady state
        try:
            from lsh_spark.operators.similarity_join import (
                build_lsh_corpus_index,
            )
            from lsh_spark.sources.io import load_table

            build_lsh_corpus_index(
                load_table(spark, warm_sf, "documents").limit(50),
                "bench_warm_idx", text_col="text", id_col="doc_id",
                ngram_width=3, band_count=2, band_size=2, seed=123)
            spark.sql("DROP TABLE IF EXISTS bench_warm_idx_bands")
            spark.sql("DROP TABLE IF EXISTS bench_warm_idx_sets")
            spark.sql("DROP TABLE IF EXISTS bench_warm_idx_meta")
        except Exception:
            pass
        spark.catalog.clearCache()
    def run_once(name: str) -> tuple[float, int]:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        if name in _NOOP_TERMINAL:
            # count(1) would let Catalyst legally prune real work here
            # (join elimination on unique keys / column-pruned Arrow
            # projections — see _NOOP_TERMINAL); the noop sink forces a
            # full-column materialization with no I/O cost.
            df.write.format("noop").mode("overwrite").save()
            n = -1
        else:
            n = df.count()
        dt = time.perf_counter() - t0
        # operators persist intermediates (shingle sets etc.) for their own
        # lifetime; drop them so queries are timed independently
        spark.catalog.clearCache()
        return dt, n

    for name in sorted(qs):
        dt, n = run_once(name)
        # host-noise control: identical heavy queries have measured 2x
        # swings run-to-run on a shared host, so anything slow gets a
        # second timed run and reports the min (standard best-of-N; both
        # runs are full end-to-end executions from cold caches).
        # Threshold 2s (was 5s): the r3 "drift" on the two embedding pair
        # queries (+18%/+50% with unchanged code) did not reproduce under
        # repeated timing — single-shot numbers in the 2-5s band swing up
        # to 2x on this host, so they get the same best-of-2 treatment.
        # Threshold 1s (was 2s): the r4 dev runs showed the same 2-4x
        # single-shot swings on 0.4s-class queries (minhash_signatures
        # measured 0.39s and 1.31s for identical code hours apart); the
        # extra re-runs cost ~10s of bench wall for a far stabler artifact.
        if dt > 1.0:
            dt = min(dt, run_once(name)[0])
        # >5s queries dominate the total AND show the biggest absolute
        # noise (measured 2x swings on identical code within one hour);
        # one more sample costs ~1 min of bench wall for a far stabler
        # headline number
        if dt > 5.0:
            dt = min(dt, run_once(name)[0])
        timings[name] = round(dt, 3)
        rows = "noop terminal" if n < 0 else f"{n} rows"
        print(f"# {name}: {timings[name]:.3f}s ({rows})", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    detail = {
        "metric": "total_query_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # core count the run used — a scaling run at a different
        # $SPARK_GRAFT_CPUS is NOT per-query comparable to a 32-core
        # artifact (r15 lesson: the driver's 8-core run overwrote the
        # 32-core detail and a naive diff fabricated ~99 regressions)
        "cpus": int(cpus) if cpus.isdigit() else cpus,
        # queries timed against the noop sink (count(1) would let
        # Catalyst prune real work); their numbers are NOT comparable
        # to pre-r13 BENCH_DETAIL artifacts, which under-measured them
        "noop_terminal": sorted(_NOOP_TERMINAL),
    }
    # full per-query detail: stderr (driver logs) + a stable file path
    print(json.dumps(detail), file=sys.stderr)
    here = os.path.dirname(os.path.abspath(__file__))
    # BENCH_DETAIL.json keeps its name (driver compatibility); the
    # cpus-suffixed copy survives a later run at a different core count,
    # so both per-query artifacts stay on disk after a scaling sweep
    for detail_path in (os.path.join(here, "BENCH_DETAIL.json"),
                        os.path.join(here, f"BENCH_DETAIL_c{cpus}.json")):
        try:
            with open(detail_path, "w") as f:
                json.dump(detail, f, indent=1, sort_keys=True)
                f.write("\n")
        except OSError:
            pass
    out = {
        "metric": "total_query_seconds",
        "value": detail["value"],
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "detail_file": "BENCH_DETAIL.json",
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
