"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB over
the same parquet, compare row count, column names, and order-insensitive
values.

Runs at sf0.001 by default (fast); set LSH_SPARK_TEST_SF_DIR for sf0.01.
"""

from __future__ import annotations

import json
import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("LSH_SPARK_TEST_SF_DIR", "/root/testdata/sf0.001")

# Passing queries are recorded here (name -> sorted list of sf dirs the
# replica passed at) so scripts/check_artifact_coverage.py can fail CI
# when a registered query has NEITHER a driver row in any
# CORRECTNESS_r*.json NOR a replica record (round-6 verdict item 7).
_REPLICA_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "REPLICA.json")


def _record_replica(name: str) -> None:
    sf = os.path.basename(SF_DIR.rstrip("/"))
    try:
        with open(_REPLICA_PATH) as f:
            rec = json.load(f)
    except (OSError, ValueError):
        rec = {}
    sfs = set(rec.get(name, []))
    if sf in sfs:
        return
    rec[name] = sorted(sfs | {sf})
    tmp = _REPLICA_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(dict(sorted(rec.items())), f, indent=0, sort_keys=True)
        f.write("\n")
    os.replace(tmp, _REPLICA_PATH)

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, normalize
    values, sort rows.  Floats compare by their exact IEEE-754 bits — the
    decimal-exact aggregate strategy and int-ratio divisions make Spark
    and DuckDB bit-identical, so nothing weaker is needed."""
    import struct

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = struct.pack("<d", v).hex()
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def _pairs():
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    return [(name, qs[name], oracles[name]) for name in sorted(oracles)]


@pytest.mark.parametrize("name,fn,sql", _pairs(),
                         ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, name, fn, sql):
    sdf = fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: {len(spark_rows)} spark rows vs {len(duck_rows)} oracle rows")
    cs, cd = _canon(spark_rows, spark_cols), _canon(duck_rows, duck_cols)
    mismatches = [i for i, (a, b) in enumerate(zip(cs, cd)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first: "
        f"{cs[mismatches[0]]} vs {cd[mismatches[0]]}")
    _record_replica(name)


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    assert df.count() >= 0
    assert df.schema is not None


def test_rows_only_queries_run(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    for name in sorted(set(qs) - set(oracles)):
        df = qs[name](spark, SF_DIR)
        assert df.count() > 0, f"{name} returned no rows"
        _record_replica(name)
