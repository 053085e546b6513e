"""Dump .explain("formatted") for named registry queries to files.

Usage:
  python3 scripts/dump_plans.py SUFFIX QUERY [QUERY ...] \
      [--sf /root/testdata/sf0.1] [--out plans/r15]

Writes plans/r15/<query>_<SUFFIX>.txt.  Plan construction runs zero Spark
jobs (tests/test_plans.py contract), so this is cheap and safe to run
alongside other work.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("suffix")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r15")
    args = ap.parse_args()

    from lsh_spark.plans import get_spark

    spark = get_spark(app_name="lsh_spark-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    os.makedirs(args.out, exist_ok=True)
    for name in args.queries:
        if name not in qs:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        df = qs[name](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
