"""Spark integration tests: the reference's sqllogictest blocks replayed
through ``spark.sql`` and the Column API (SURVEY.md §5 port plan step 2/3).

Every golden literal below is from ``/root/reference/test/sql/lsh/*.test``.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import Row
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

import lsh_spark.functions as F_lsh
from pyspark.sql import functions as F

NAMES = [
    "Alice Johnson", "Robert Smith", None, "Charlotte Brown",
    "David Martinez", "Emily Davis", "Michael Wilson", "Sophia Taylor",
    None, "James Anderson", "Olivia Thomas", "Benjamin Lee",
]

MIN_GOLDEN = [
    [13571929851950895096, 9380027513982184887, 2973452616913389687],
    [8779492002049334510, 6213046290947405081, 13321761559668221936],
    None,
    [17147317566672094549, 9868884775472345505, 9544039307031965287],
    [8205471107123956470, 3856457550471365223, 160978381860159594],
    [5031590273592478399, 2643794611755346220, 10496886524478706543],
    [7351019434982270461, 11969544284460938578, 1096653296545732983],
    [947309311728102588, 6485027977500841069, 11465726828575944543],
    None,
    [6511242524203601686, 5368660891928216176, 4531328875985401258],
    [6134578107120707744, 8471287122008225606, 13561556383590060017],
    [7926739398273580158, 2501438919389423193, 17085734390799214704],
]

MIN32_GOLDEN = [
    [235769848, 2454482359, 2878605431],
    [3397950702, 4177163545, 2323277808],
    None,
    [4232987989, 1800024481, 3925962343],
    [1524288246, 3006792295, 1128972394],
    [13257407, 616884524, 3676525423],
    [2401003005, 4271502674, 3864959351],
    [3388550332, 493376621, 1961848671],
    None,
    [3851603734, 115982960, 3449058730],
    [970025120, 832845638, 3176206321],
    [758168702, 2844468825, 2185439344],
]


@pytest.fixture(scope="module")
def names_df(spark):
    schema = StructType([StructField("name", StringType(), True)])
    return spark.createDataFrame([Row(name=n) for n in NAMES], schema)


def _as_int_lists(rows, col):
    out = []
    for r in rows:
        v = r[col]
        out.append(None if v is None else [int(x) for x in v])
    return out


def test_lsh_min_column_api(spark, names_df):
    df = names_df.select(
        F_lsh.lsh_min("name", 2, 3, 2, 123).alias("hash"))
    got = _as_int_lists(df.collect(), "hash")
    assert got == MIN_GOLDEN


def test_lsh_min32_column_api(spark, names_df):
    df = names_df.select(
        F_lsh.lsh_min32("name", 2, 3, 2, 123).alias("hash"))
    got = _as_int_lists(df.collect(), "hash")
    assert got == MIN32_GOLDEN


def test_lsh_min_sql(spark, names_df):
    F_lsh.register_all(spark)
    names_df.createOrReplaceTempView("temp_names")
    got = _as_int_lists(
        spark.sql(
            "SELECT lsh_min(name, 2, 3, 2, 123) AS hash FROM temp_names"
        ).collect(),
        "hash",
    )
    assert got == MIN_GOLDEN


def test_lsh_min_scalar_literal_sql(spark):
    F_lsh.register_all(spark)
    row = spark.sql("SELECT lsh_min('Princeton University', 2, 3, 2, 123) AS h").first()
    assert [int(x) for x in row.h] == [
        6891191098855684803, 6484452798683863108, 14488917645112899542]


def test_lsh_min_shingles(spark):
    schema = StructType([StructField("shingles", ArrayType(StringType()), True)])
    data = [
        (["Today is", "is such", "such a", "a beautiful", "beautiful day"],),
        (None,),
        (["Jane was", "was happy", "happy to", "to hear", "hear the", "the news"],),
    ]
    df = spark.createDataFrame(data, schema)
    got = _as_int_lists(
        df.select(F_lsh.lsh_min_shingles("shingles", 3, 2, 123).alias("hash"))
        .collect(), "hash")
    assert got == [
        [9974840119851185478, 4711155484753061995, 16211519798383806619],
        None,
        [2354814969659523670, 7221458756809834639, 17094615994155466934],
    ]
    got32 = _as_int_lists(
        df.select(F_lsh.lsh_min32_shingles("shingles", 3, 2, 123).alias("hash"))
        .collect(), "hash")
    assert got32 == [
        [1930130758, 3730237547, 1138821275],
        None,
        [307495510, 2009645199, 4015587510],
    ]


def test_lsh_jaccard(spark):
    schema = StructType([
        StructField("name_a", StringType(), True),
        StructField("name_b", StringType(), True),
    ])
    data = [
        ("Charlotte Brown", "Charlene Browning"),
        ("David Martinez", "Davis Martin"),
        ("Olivia Thomas", "Olive Thomason"),
        ("Alice Johnson", None),
        (None, "Roberta Mills"),
        ("Emily Davis", "Laura Bennett"),
        ("Michael Wilson", "Mike Wilson"),
        ("James Anderson", "Jamie Anders"),
        ("Sophia Taylor", None),
        ("Benjamin Lee", "Christopher Grant"),
    ]
    df = spark.createDataFrame(data, schema)
    got = [r.similarity for r in df.select(
        F_lsh.lsh_jaccard("name_a", "name_b", 2).alias("similarity")).collect()]
    assert got == [0.5, 0.6, 0.5625, None, None, 0.0, 0.4375, 0.5, None, 0.0]


def test_lsh_euclidean(spark):
    schema = StructType([StructField("val", ArrayType(DoubleType()), True)])
    data = [
        ([1.1, 2.2, 3.3, 5.8, 3.9],), (None,),
        ([4.5, 5.5, 2.3, 1.8, 6.3],), ([7.3, 1.2, 9.6, 5.5, 7.8],),
        (None,), ([6.7, 4.5, 1.3, 0.6, 4.6],),
    ]
    df = spark.createDataFrame(data, schema)
    got = _as_int_lists(
        df.select(F_lsh.lsh_euclidean("val", 0.5, 2, 3, 123).alias("hash"))
        .collect(), "hash")
    assert got == [
        [4153593470791884295, 13333357882440433242],
        None,
        [9539244981710099531, 8978554412800410753],
        [3765229951789618540, 13117769235920535871],
        None,
        [13333357882440433242, 2643848813970240984],
    ]
    got32 = _as_int_lists(
        df.select(F_lsh.lsh_euclidean32("val", 0.5, 2, 3, 123).alias("hash"))
        .collect(), "hash")
    assert got32 == [
        [1206820359, 3590602330], None, [272766027, 58459265],
        [773117292, 2157396287], None, [3590602330, 344503768],
    ]


def test_lsh_euclidean_ragged_arrays_error(spark):
    # src/euclidean_hash.rs:41: "All input arrays must have the same length"
    schema = StructType([StructField("val", ArrayType(DoubleType()), True)])
    # the check is per Arrow batch (the reference's is per DataChunk) —
    # coalesce to one partition so both rows share a batch
    df = spark.createDataFrame(
        [([1.0, 2.0],), ([1.0, 2.0, 3.0],)], schema).coalesce(1)
    with pytest.raises(Exception, match="same length"):
        df.select(F_lsh.lsh_euclidean("val", 0.5, 1, 2, 1).alias("h")).collect()


def test_param_constancy_sql(spark, names_df):
    # SQL form mirrors the reference's per-chunk constant-param rule
    F_lsh.register_all(spark)
    names_df.createOrReplaceTempView("temp_names")
    with pytest.raises(Exception, match="constant value"):
        spark.sql(
            "SELECT lsh_min(name, CAST(length(name) AS BIGINT), 3, 2, 123) "
            "FROM temp_names"
        ).collect()


def test_bands_long_equality_preserved(spark, names_df):
    # the int64 join representation must match the Decimal surface value
    # modulo two's complement
    df = names_df.select(
        "name",
        F_lsh.lsh_min("name", 2, 3, 2, 123).alias("dec"),
        F_lsh.lsh_min_bands_long("name", 2, 3, 2, 123).alias("lng"),
    )
    for r in df.collect():
        if r.dec is None:
            assert r.lng is None
            continue
        assert [int(d) & 0xFFFFFFFFFFFFFFFF for d in r.dec] == [
            v & 0xFFFFFFFFFFFFFFFF for v in r.lng]


def test_sql_euclidean_and_shingles_forms(spark):
    # the remaining SQL-registered names (register.py) against goldens
    import lsh_spark.functions as F_lsh

    F_lsh.register_all(spark)
    row = spark.sql(
        "SELECT lsh_euclidean(ARRAY(1.1D, 2.2D, 3.3D, 5.8D, 3.9D), "
        "0.5D, 2, 3, 123) AS h").first()
    assert [int(x) for x in row.h] == [4153593470791884295, 13333357882440433242]
    row = spark.sql(
        "SELECT lsh_euclidean32(ARRAY(1.1D, 2.2D, 3.3D, 5.8D, 3.9D), "
        "0.5D, 2, 3, 123) AS h").first()
    assert row.h == [1206820359, 3590602330]
    row = spark.sql(
        "SELECT lsh_min_shingles(ARRAY('Today is', 'is such', 'such a', "
        "'a beautiful', 'beautiful day'), 3, 2, 123) AS h").first()
    assert [int(x) for x in row.h] == [
        9974840119851185478, 4711155484753061995, 16211519798383806619]
    row = spark.sql(
        "SELECT lsh_min32_shingles(ARRAY('Today is', 'is such', 'such a', "
        "'a beautiful', 'beautiful day'), 3, 2, 123) AS h").first()
    assert row.h == [1930130758, 3730237547, 1138821275]


def test_public_api_imports(spark):
    import lsh_spark

    df = spark.createDataFrame([("Princeton University",)], ["name"])
    row = df.select(lsh_spark.lsh_min("name", 2, 3, 2, 123).alias("h")).first()
    assert [int(x) for x in row.h] == [
        6891191098855684803, 6484452798683863108, 14488917645112899542]


def test_shingle_set_and_jaccard_from_sets_consistent(spark):
    # the materialized-set path must agree with the reference lsh_jaccard
    from pyspark.sql import functions as F

    from lsh_spark.functions.lsh import jaccard_from_sets, shingle_set_col

    df = spark.createDataFrame(
        [("Princeton University", "Harvard University"),
         ("Charlotte Brown", "Charlene Browning"),
         ("a", "ab"),
         (None, "x")],
        ["ta", "tb"])
    out = df.select(
        F_lsh.lsh_jaccard("ta", "tb", 2).alias("direct"),
        jaccard_from_sets(
            shingle_set_col(F.col("ta"), 2),
            shingle_set_col(F.col("tb"), 2)).alias("via_sets"),
    ).collect()
    for r in out:
        assert r.direct == r.via_sets


def test_unregistered_function_raises(spark):
    # parity with the reference's pre-LOAD negative block
    # (test/sql/lsh/lsh_min.test:5-9: "Catalog Error ... lsh_min" before
    # LOAD, success after).  SQL registration is session-scoped, so a fresh
    # session (same SparkContext) starts without the functions.
    from pyspark.errors import AnalysisException

    fresh = spark.newSession()
    with pytest.raises(AnalysisException):
        fresh.sql("SELECT lsh_min('Princeton University', 2, 3, 2, 123)").collect()
    F_lsh.register_all(fresh)
    row = fresh.sql(
        "SELECT lsh_min('Princeton University', 2, 3, 2, 123) AS h").first()
    assert [int(x) for x in row.h] == [
        6891191098855684803, 6484452798683863108, 14488917645112899542]


def test_weighted_minhash_is_replicated_shingle_minhash(spark):
    # the weighted wrapper must equal plain shingle MinHash over the
    # explicitly replicated (word, occurrence) multiset — pins the
    # integer-weight reduction against the bit-exact from_shingles path
    from collections import Counter

    from lsh_spark.functions.lsh import (
        lsh_min_shingles_bands_long,
        weighted_minhash_bands_long,
    )

    texts = ["the cat the cat the dog", "a b a b a b a", "solo",
             "", None, "x \t x \n x"]

    def replicate(t):
        seen = Counter()
        out = []
        for w in (t or "").split():
            seen[w] += 1
            out.append(f"{w} {seen[w]}")
        return out

    df = spark.createDataFrame(
        [(i, t, replicate(t) if t is not None else None)
         for i, t in enumerate(texts)],
        "id long, text string, shingles array<string>")
    out = df.select(
        "id",
        weighted_minhash_bands_long(F.col("text"), 4, 2, 123)
        .alias("weighted"),
        lsh_min_shingles_bands_long(F.col("shingles"), 4, 2, 123)
        .alias("explicit"),
    ).collect()
    for r in out:
        assert r.weighted == r.explicit, r.id


def test_weighted_minhash_tf_sensitivity(spark):
    # same token SET, different counts -> weighted signatures differ
    # (plain set MinHash would collide); identical weighted multisets
    # collide exactly
    from lsh_spark.functions.lsh import weighted_minhash_bands_long

    df = spark.createDataFrame(
        [(1, "spam spam spam ham"), (2, "spam ham"),
         (3, "spam  spam\tspam ham")],
        "id long, text string")
    rows = {r.id: r.b for r in df.select(
        "id", weighted_minhash_bands_long(F.col("text"), 8, 2, 123)
        .alias("b")).collect()}
    assert rows[1] != rows[2]       # tf difference visible
    assert rows[1] == rows[3]       # whitespace-run invariant


def test_compression_ratio_matches_zlib_reference(spark):
    """compression_ratio: exact vs the python zlib reference; repetitive
    text compresses below prose; empty/NULL -> NULL."""
    import zlib

    from lsh_spark.functions.text import compression_ratio

    prose = "the quick brown fox jumps over the lazy dog near the bank"
    repetitive = "spam " * 40
    rows = [(1, prose), (2, repetitive), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.cr for r in df.select(
        "id", compression_ratio("text").alias("cr")).collect()}
    for i, t in ((1, prose), (2, repetitive)):
        raw = t.encode("utf-8")
        assert got[i] == round(len(zlib.compress(raw, 6)) / len(raw), 6)
    assert got[3] is None and got[4] is None
    # the heuristic's point: repetition compresses far below prose
    assert got[2] < 0.2 < got[1]
