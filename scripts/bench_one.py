"""Time individual gate queries repeatedly: iteration tool for perf work.

    python3 scripts/bench_one.py QUERY [QUERY...] [--sf DIR] [--n N]

Same session/config shape as bench.py (local[$SPARK_GRAFT_CPUS], cache
cleared between runs) so numbers are comparable to BENCH_r{N}.json.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    from lsh_spark.plans import get_spark

    spark = get_spark(app_name="lsh_spark-bench-one")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    spark.range(1000).count()
    # same JIT warm-up as bench.py so first-run numbers are comparable
    warm_sf = "/root/testdata/sf0.001"
    for warm in ("minhash_near_dup_pairs", "ann_topk",
                 "ann_ivf_flat_topk", "simhash_near_dup_pairs"):
        if warm in qs:
            qs[warm](spark, warm_sf).count()
    spark.catalog.clearCache()

    # match bench.py's terminal per query: count() legally lets Catalyst
    # prune real work for the _NOOP_TERMINAL set (see bench.py)
    import bench as bench_mod

    for name in args.queries:
        times = []
        n_rows = -1
        for _ in range(args.n):
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            if name in bench_mod._NOOP_TERMINAL:
                df.write.format("noop").mode("overwrite").save()
            else:
                n_rows = df.count()
            times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        rows = "noop terminal" if n_rows < 0 else f"{n_rows} rows"
        print(f"{name}: {[round(t, 3) for t in times]} "
              f"min={min(times):.3f}s ({rows})")
    spark.stop()


if __name__ == "__main__":
    main()
