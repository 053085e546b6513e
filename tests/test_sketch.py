"""KMV sketch accuracy tests (property/tolerance — sketches are estimates)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lsh_spark.functions.sketch import (
    kmv_containment_estimate,
    kmv_distinct_estimate,
    kmv_jaccard_estimate,
    kmv_sketch_col,
)

SF_DIR = "/root/testdata/sf0.001"


def test_kmv_distinct_estimate_accuracy(spark):
    from lsh_spark.sources.io import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    out = docs.select(
        "doc_id",
        kmv_sketch_col("text", ngram_width=3, k=64).alias("sk"),
    ).select(
        "doc_id",
        F.col("sk.n_total").alias("exact"),
        kmv_distinct_estimate("sk", k=64).alias("est"),
    ).collect()
    assert out
    rel_errs = []
    for r in out:
        if r.exact < 64:
            assert r.est == float(r.exact)  # exact below sketch capacity
        else:
            rel_errs.append(abs(r.est - r.exact) / r.exact)
    if rel_errs:
        # KMV with k=64: stderr ≈ 1/sqrt(62) ≈ 13%; allow generous bounds
        assert max(rel_errs) < 0.6
        assert sum(rel_errs) / len(rel_errs) < 0.2


def test_kmv_jaccard_tracks_exact(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog " * 4,
          "the quick brown fox jumps over the lazy dog " * 4),
         (2, "the quick brown fox jumps over the lazy dog " * 4,
          "a completely different document about spark engines " * 4)],
        ["id", "ta", "tb"])
    out = df.select(
        "id",
        kmv_jaccard_estimate(
            kmv_sketch_col("ta", 3, 64), kmv_sketch_col("tb", 3, 64)
        ).alias("est"),
    ).collect()
    by_id = {r.id: r.est for r in out}
    assert by_id[1] == 1.0            # identical texts
    assert by_id[2] < 0.3             # dissimilar texts


def test_kmv_containment(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    df = spark.createDataFrame(
        [(1, base, base + " plus extra suffix content here " * 6),
         (2, base, "unrelated words entirely different topic " * 6)],
        ["id", "ta", "tb"])
    out = df.select(
        "id",
        kmv_containment_estimate(
            kmv_sketch_col("ta", 3, 64), kmv_sketch_col("tb", 3, 64)
        ).alias("cont"),
    ).collect()
    by_id = {r.id: r.cont for r in out}
    assert by_id[1] > 0.8   # A almost fully contained in its superset pair
    assert by_id[2] < 0.4


def test_kmv_null_propagation(spark):
    df = spark.createDataFrame([(None,), ("abc",)], ["t"])
    rows = df.select(kmv_sketch_col("t", 3, 8).alias("sk")).collect()
    # null input → null sketch fields
    null_rows = [r for r in rows if r.sk is None or r.sk.mins is None]
    assert len(null_rows) == 1


def test_fx32_col_matches_sql_oracle(spark):
    """fx32_col (Arrow kernel) and string_hash_sql (DuckDB replay of the
    FxHash stream) agree byte-for-byte, including the empty string."""
    import duckdb

    from lsh_spark.functions.sketch import fx32_col
    from lsh_spark.oracles.duckdb_lsh import string_hash_sql

    words = ["", "a", "spark", "0 window", "3 agg", "ñandú"]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = {r.s: r.h for r in df.select("s", fx32_col("s").alias("h"))
           .collect()}
    con = duckdb.connect()
    for w in words:
        sexpr = "'" + w.replace("'", "''") + "'"
        want = con.execute(
            "SELECT " + string_hash_sql(sexpr)).fetchone()[0]
        assert got[w] == want, w
