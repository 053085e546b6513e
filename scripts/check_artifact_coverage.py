"""Diff the driver's latest CORRECTNESS artifact against the registry.

The driver gate is the hard correctness signal: every entry in
``__spark_entry__.queries()`` should have a row in ``CORRECTNESS_r{N}.json``.
Round 3 showed the driver covering exactly the first 50 of 53 registered
queries, so this script makes the gap explicit and machine-checkable:

    python3 scripts/check_artifact_coverage.py          # report
    python3 scripts/check_artifact_coverage.py --strict # exit 1 on gap

It never fails silently: missing rows, extra rows, and failing rows are
each listed by name.
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


def main() -> int:
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    registered = list(entry.queries())
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

    ok = not missing and not failing
    if "--strict" in sys.argv and not ok:
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
