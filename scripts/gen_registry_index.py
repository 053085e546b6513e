#!/usr/bin/env python3
"""Emit the SURVEY.md registry-index table: one row per registry query
(position, name, gate callable file:line, oracle kind) so a fresh
reader can navigate the registry without grepping __spark_entry__.py.

Usage: python3 scripts/gen_registry_index.py > /tmp/registry_index.md
then paste into SURVEY.md §9 (or run with --check to diff against the
committed section).
"""

import inspect
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from __spark_entry__ import _registry

    rows = []
    for pos, (name, (fn, sql)) in enumerate(_registry().items(), start=1):
        f = inspect.unwrap(fn)
        path = os.path.relpath(inspect.getsourcefile(f),
                               os.path.join(os.path.dirname(__file__), ".."))
        line = inspect.getsourcelines(f)[1]
        oracle = "exact" if sql is not None else "rows-only"
        rows.append((pos, name, f"`{path}:{line}`", oracle))
    print("| # | query | gate callable | oracle |")
    print("|---|---|---|---|")
    for pos, name, loc, oracle in rows:
        print(f"| {pos} | `{name}` | {loc} | {oracle} |")


if __name__ == "__main__":
    main()
