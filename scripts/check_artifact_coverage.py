"""Diff the driver's latest CORRECTNESS artifact against the registry.

The driver gate is the hard correctness signal: every entry in
``__spark_entry__.queries()`` should have a row in ``CORRECTNESS_r{N}.json``.
Round 3 showed the driver covering exactly the first 50 of 53 registered
queries, so this script makes the gap explicit and machine-checkable:

    python3 scripts/check_artifact_coverage.py          # report
    python3 scripts/check_artifact_coverage.py --strict # exit 1 on gap

It never fails silently: missing rows, extra rows, and failing rows are
each listed by name.

Exit status (round-6 verdict item 7): a registered query with NEITHER a
green driver row in ANY CORRECTNESS_r*.json NOR a replica record in
REPLICA.json (written by tests/test_entry_oracle.py on pass) is an
UNCOVERED query — the script exits 1 so coverage regressions fail CI
rather than scroll by.  ``--strict`` additionally fails on any gap in
the LATEST artifact alone.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def latest_artifact() -> Path | None:
    arts = sorted(
        REPO.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    return arts[-1] if arts else None


def _row_green(r: dict) -> bool:
    return bool(r.get("rows_match") and r.get("schema_match")
                and r.get("err") is None)


def driver_union() -> set[str]:
    """Names with a green row in ANY round's artifact."""
    green: set[str] = set()
    for p in REPO.glob("CORRECTNESS_r*.json"):
        for q, r in json.loads(p.read_text()).items():
            if _row_green(r):
                green.add(q)
    return green


def replica_records() -> set[str]:
    try:
        return set(json.loads((REPO / "REPLICA.json").read_text()))
    except (OSError, ValueError):
        return set()


def last_green_round() -> dict[str, int]:
    """query name -> latest round with a fully-green driver row
    (rows+schema+hash, no err); absent = never driver-green."""
    best: dict[str, int] = {}
    for p in REPO.glob("CORRECTNESS_r*.json"):
        rnd = int(re.search(r"r(\d+)", p.name).group(1))
        for q, r in json.loads(p.read_text()).items():
            if (_row_green(r) and r.get("hash_match")
                    and rnd > best.get(q, -1)):
                best[q] = rnd
    return best


def emit_promotions(registered: list[str], head_size: int = 50) -> list[str]:
    """Mechanical next-round head list (round-9 verdict item 6): the
    ``head_size`` registered queries with the WEAKEST driver evidence —
    never-driver-green first (includes new additions and red rows),
    then by staleness (oldest green round first), registry position as
    the tie-break.  Code-changed-this-round promotions still need the
    builder's judgment on top; this emits the staleness baseline."""
    green = last_green_round()
    return sorted(
        registered,
        key=lambda q: (green.get(q, -1), registered.index(q)),
    )[:head_size]


def main() -> int:
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    registered = list(entry.queries())
    if "--emit-promotions" in sys.argv:
        promos = emit_promotions(registered)
        green = last_green_round()
        print(f"# suggested next-round head ({len(promos)} weakest-evidence "
              f"queries; add code-changed-this-round promotions on top):")
        for q in promos:
            tag = f"last green r{green[q]}" if q in green else "NEVER green"
            print(f'    "{q}",  # {tag}')
        return 0
    art_path = latest_artifact()
    if art_path is None:
        print("no CORRECTNESS_r*.json artifact found")
        return 1
    rows = json.loads(art_path.read_text())

    missing = [q for q in registered if q not in rows]
    extra = [q for q in rows if q not in registered]
    failing = [
        q
        for q, r in rows.items()
        if not (r.get("rows_match") and r.get("schema_match"))
        or r.get("err") is not None
    ]

    print(f"artifact: {art_path.name} ({len(rows)} rows)")
    print(f"registry: {len(registered)} queries")
    print(f"covered:  {len(registered) - len(missing)}/{len(registered)}")
    if missing:
        print("MISSING driver rows (position in registry order):")
        for q in missing:
            print(f"  #{registered.index(q) + 1:>2} {q}")
    if extra:
        print("rows for queries no longer registered:", ", ".join(extra))
    if failing:
        print("FAILING rows:", ", ".join(failing))

    union = driver_union()
    replica = replica_records()
    uncovered = [q for q in registered
                 if q not in union and q not in replica]
    never_driver = [q for q in registered if q not in union]
    print(f"driver-row union (all rounds): "
          f"{len(registered) - len(never_driver)}/{len(registered)}")
    if never_driver:
        print("never driver-checked (rotation backlog):")
        for q in never_driver:
            via = "replica" if q in replica else "NOTHING"
            print(f"  #{registered.index(q) + 1:>2} {q} [covered via {via}]")
    if uncovered:
        print("UNCOVERED (no driver row in any round, no replica record):",
              ", ".join(uncovered))
        return 1

    ok = not missing and not failing
    if "--strict" in sys.argv and not ok:
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
