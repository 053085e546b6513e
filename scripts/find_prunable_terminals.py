"""Enumerate registry queries whose ``.count()`` terminal under-measures
the real collect cost (round-12 verdict item 3 / SCALECHECK session 2).

Catalyst legally prunes work that cannot change the row count of a
``count(1)`` aggregate: a left join on a unique key with no referenced
columns is ELIMINATED (``lang_id_predictions`` benched 0.25 s vs its ~6 s
real cost), and deterministic scalar projections (Arrow/Python UDF
columns) are column-pruned away.  Both are correct optimizations — the
bug is using the pruned plan as the *measurement*.

Detection is plan-diffing, not guessing: for each query, compare the
OPTIMIZED logical plan of the full frame against the optimized plan of
``count(1)`` over it, counting the prunable node kinds (joins, scan
leaves, Python/Arrow eval nodes).  Any loss means the count() terminal
skips real work.  Join elimination and column pruning are rule-based
(never stats/AQE-driven), so the verdict is SF-independent — detection
runs at sf0.001 and holds at any scale.

Usage: python3 scripts/find_prunable_terminals.py [sf_dir]
Prints one line per affected query: name, node kind(s) lost, and the
full-vs-count node tallies; then a Python-literal set for bench.py.
tests/test_plans.py::test_bench_noop_terminal_set_is_current keeps the
hardcoded set in bench.py in lockstep with this detection.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Node kinds count(1) may legally prune; losing any of them means the
# count() terminal measures less than a full collect.  Aggregate /
# Generate / Window / mapInPandas nodes change row counts, so Catalyst
# keeps them and they need no entry here.
_PRUNABLE_NODE_RE = re.compile(
    r"^\s*[+:\-\s]*(Join|Relation|LogicalRDD|LocalRelation"
    r"|ArrowEvalPython|BatchEvalPython)\b")


def plan_tallies(df) -> dict[str, int]:
    s = df._jdf.queryExecution().optimizedPlan().toString()
    tallies: dict[str, int] = {}
    for line in s.splitlines():
        m = _PRUNABLE_NODE_RE.match(line)
        if m:
            tallies[m.group(1)] = tallies.get(m.group(1), 0) + 1
    return tallies


def lost_under_count(df) -> dict[str, int]:
    """Node kinds (and how many) the count(1) plan drops vs the full
    plan — empty means the count() terminal is an honest measurement."""
    full = plan_tallies(df)
    cnt = plan_tallies(df.selectExpr("count(1) AS __n"))
    return {k: full[k] - cnt.get(k, 0)
            for k in full if full[k] > cnt.get(k, 0)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from lsh_spark.plans import get_spark

    spark = get_spark(app_name="lsh_spark-prunable-scan")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    affected = []
    for name, fn in sorted(entry.queries().items()):
        df = fn(spark, sf_dir)
        lost = lost_under_count(df)
        if lost:
            affected.append(name)
            print(f"{name}: count() drops {lost}")
    print("\n_NOOP_TERMINAL = {")
    for name in affected:
        print(f'    "{name}",')
    print("}")
    spark.stop()


if __name__ == "__main__":
    main()
