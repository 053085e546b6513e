"""Interleaved A/B: self-join band-blocks persist ON vs OFF, one session.

Flips similarity_join._PERSIST_SELF_JOIN_BLOCKS between timed runs so
both variants share every host-throughput window (min-vs-min decides).

    python3 scripts/ab_blocks_persist.py [--n 3] [--sf /root/testdata/sf0.1]
"""
from __future__ import annotations

import argparse
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = ["minhash_near_dup_pairs", "containment_near_dup_pairs",
           "clean_corpus"]
NOOP = set()  # all three use count() in bench.py


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from lsh_spark.plans import get_spark
    from lsh_spark.plans.cache import release_intermediates
    from lsh_spark.operators import similarity_join as sj

    spark = get_spark(app_name="ab-blocks-persist")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    spark.range(1000).count()
    for warm in ("minhash_near_dup_pairs", "containment_near_dup_pairs"):
        qs[warm](spark, "/root/testdata/sf0.001").count()
    release_intermediates()
    spark.catalog.clearCache()

    res: dict[tuple[str, bool], list[float]] = defaultdict(list)
    for cycle in range(args.n):
        for flag in (False, True):
            sj._PERSIST_SELF_JOIN_BLOCKS = flag
            for name in QUERIES:
                t0 = time.perf_counter()
                df = qs[name](spark, args.sf)
                if name in NOOP:
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.count()
                dt = time.perf_counter() - t0
                release_intermediates()
                spark.catalog.clearCache()
                res[(name, flag)].append(dt)
                print(f"cycle {cycle} persist={int(flag)} {name}: "
                      f"{dt:.2f}s", flush=True)
    print("\n== min-vs-min ==")
    for name in QUERIES:
        off = min(res[(name, False)])
        on = min(res[(name, True)])
        print(f"{name}: off={off:.2f}s on={on:.2f}s "
              f"({off / on:.2f}x)")
    spark.stop()


if __name__ == "__main__":
    main()
