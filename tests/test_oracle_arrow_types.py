"""Arrow-type guard for every DuckDB oracle (round-9 verdict item 2).

The driver's correctness gate hashes Spark and DuckDB results through a
canonicalization that DISTINGUISHES Arrow value types: DuckDB widens
``sum(BIGINT)`` to HUGEINT, which crosses Arrow as ``decimal128(38,0)``
while Spark's ``F.sum(long)`` stays int64 — identical values, red
``hash_match`` row.  Round 9 lost exactly two driver rows to this
(``mixture_sample_counts``, ``corpus_snapshot_diff`` — uncast
``sum(doc_id)``), and the string-based replica comparison in
``test_entry_oracle._canon`` can never catch the class because
``str(Decimal(5)) == str(5)``.

This test closes the blind spot structurally: it type-checks every
registered oracle through DuckDB's planner (``WHERE 1=0`` wrapper — no
data execution, ~2 s for the whole registry) and fails if ANY output
column arrives as a decimal type.  The repo-wide contract is that gate
outputs are int64/int32/double/string/bool only: money aggregates go
through DECIMAL(18,2)/DECIMAL(28,6) INTERMEDIATES but are always cast
to DOUBLE before projection, and integer sums must be cast ``::BIGINT``
(DuckDB) to match Spark's long.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("LSH_SPARK_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Arrow type names that are allowed to cross the driver's hash gate.
# Spark's collected longs/ints/doubles/strings/bools map onto exactly
# these; anything else (decimal128, decimal256, large_string, ...) is a
# canonicalization hazard even when values match.
_ALLOWED_PREFIXES = ("int64", "int32", "double", "string", "bool")


def test_no_oracle_emits_decimal_or_exotic_arrow_types():
    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    offenders: list[tuple[str, str, str]] = []
    for name, sql in entry.oracle_sql().items():
        # WHERE 1=0 keeps the planner's full type derivation but skips
        # execution — the Arrow schema is identical to a real run's.
        tbl = con.execute(f"SELECT * FROM ({sql}) __guard WHERE 1=0").arrow()
        for field in tbl.schema:
            tname = str(field.type)
            if not tname.startswith(_ALLOWED_PREFIXES):
                offenders.append((name, field.name, tname))
    con.close()

    assert not offenders, (
        "oracle output columns with hash-hazard Arrow types (cast integer "
        "sums ::BIGINT, money/ratio aggregates ::DOUBLE): "
        f"{offenders}"
    )
