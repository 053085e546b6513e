"""LSH / dedup query suite over the documents + embeddings tables.

These are the reference's five functions exercised as full queries (the
capability layer), plus the exact-dedup family.  Where the semantics are
SQL-expressible, the DuckDB oracle is exact:

  * ``lsh_jaccard`` similarity over char-ngrams equals Jaccard over *raw*
    ngram strings unless a u32 hash collision occurs inside a document
    (probability ≈ |set|²/2³³ per doc — negligible at oracle scale), so the
    jaccard queries get a raw-ngram SQL oracle.
  * minhash / euclidean signatures looked non-SQL-expressible, but every
    hash is deterministic FxHash arithmetic over RNG constants drawn once
    per (params, seed) — so :mod:`lsh_spark.oracles.duckdb_lsh` inlines the
    constants and reproduces the Spark output EXACTLY in DuckDB SQL (hash
    match, not rows-only).  Golden-vector tests additionally pin the
    kernels to the reference (tests/test_core_golden.py).

Column names are aligned with the oracles (driver hash-compares by sorted
column name).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.lsh import (
    lsh_euclidean32,
    lsh_euclidean_bands_long,
    lsh_jaccard,
    lsh_min32,
    lsh_min32_shingles,
    lsh_min_bands_long,
    lsh_min_shingles_bands_long,
)
from ..oracles import duckdb_lsh as _orc
from ..operators.banding import tune_bands
from ..operators.similarity_join import lsh_self_dedup_pairs, lsh_similarity_join
from ..sources.io import fanout_scan, load_table

# bounded sample for the all-pairs oracle-able query (45k pairs at any sf)
_JACCARD_SAMPLE = 300


def jaccard_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs (jaccard > 0.6) among a bounded doc sample via
    all-pairs ``lsh_jaccard``.  Oracle: raw-ngram Jaccard in SQL.

    This is the *exact* baseline; ``minhash_near_dup_pairs`` is the
    scalable LSH-blocked variant of the same question."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _JACCARD_SAMPLE)
        .select("doc_id", "text")
    )
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("jac", lsh_jaccard(F.col("ta"), F.col("tb"), 3))
        .where(F.col("jac") > 0.6)
        .select("id_a", "id_b", F.round("jac", 6).alias("jaccard"))
    )


JACCARD_PAIRS_ORACLE = f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < {_JACCARD_SAMPLE}),
e AS (SELECT doc_id, text, unnest(generate_series(1, length(text)-2)) AS i FROM d),
g AS (SELECT DISTINCT doc_id, substring(text, i, 3) AS gr FROM e),
sz AS (SELECT doc_id, count(*) n FROM g GROUP BY 1),
inter AS (
  SELECT a.doc_id id_a, b.doc_id id_b, count(*) ni
  FROM g a JOIN g b ON a.gr = b.gr AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(ni * 1.0 / (sa.n + sb.n - ni), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE ni * 1.0 / (sa.n + sb.n - ni) > 0.6
"""


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lsh_min over every document, exploded to one scalar row per band
    hash ``(doc_id, band_idx, band_hash)`` so the driver can canonicalize
    the output (array cells are unhashable in its pandas compare), in the
    int64 two's-complement band representation so Spark and the DuckDB
    oracle compare on the same dtype.  The LIST(UBIGINT)-printing Column
    API (:func:`lsh_min`) is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(lsh_min_bands_long(F.col("text"), 3, 4, 2, 123))
        .alias("band_idx", "band_hash"),
    )


def minhash32_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(lsh_min32(F.col("text"), 3, 4, 2, 123))
        .alias("band_idx", "band_hash"),
    )


# the documents corpus has a heavy similarity background (measured median
# pairwise jaccard ≈ 0.45 — template-generated texts), so the flagship
# banding comes from the tuner rather than a hardcoded (b, r): maximum
# selectivity against that background subject to recall ≥ 0.9 at the
# verification threshold.  The loose 8×2 banding this replaces passed
# ~84% of background pairs into verification.
# signature budget 384 admits r=6 rows/band at threshold 0.6 — measured
# 18.4s vs 24.3s for the default budget's 29×5 at sf0.1 AND ~3% more true
# pairs (the sharper s-curve passes less j≈0.45 background at equal
# recall); signatures stay cheap (one numpy outer product per doc)
_PAIRS_PLAN = tune_bands(0.6, target_recall=0.9, background_similarity=0.45,
                         max_signature_size=384)
_JOIN_AB_PLAN = tune_bands(0.7, target_recall=0.9, background_similarity=0.45,
                           max_signature_size=384)


def minhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable near-dup detection: banded-MinHash blocking join + exact
    jaccard verification (the README.md:133-163 usage pattern).

    Banding is tuner-selected (see ``_PAIRS_PLAN``); the shingle-set side
    of the verification joins is size-gated (broadcast while the estimated
    set payload fits the cap, shuffle by pair ids beyond it — an
    unconditional full (id, set) broadcast would be a scale-killer at
    100×)."""
    return _near_dup_pairs_frames(spark, sf_dir)[0]


def _near_dup_pairs_frames(spark: SparkSession, sf_dir: str):
    """(pairs, sets) of the flagship miner — the sets frame lets the
    calibration gate compute its signature matrix from the miner's
    cached shingle sets instead of re-shingling the corpus (bit-equal;
    see ``lsh_min_minima_long_from_set``)."""
    docs = load_table(spark, sf_dir, "documents")
    raw, sets = lsh_self_dedup_pairs(
        docs, "text", id_col="doc_id",
        ngram_width=3, band_count=_PAIRS_PLAN.band_count,
        band_size=_PAIRS_PLAN.band_size, seed=123, threshold=0.6,
        return_sets=True)
    return (raw.select("id_a", "id_b",
                       F.round("jaccard", 6).alias("jaccard")),
            sets)


# the README's seed-rotation recall booster (README.md:146-148): two
# rotations of deliberately more selective per-seed banding — combined
# recall 1-(1-r)^2 ≈ 0.93 with a far lower background pass-rate than one
# rotation at the same recall would need
# same 384-signature budget as _PAIRS_PLAN: admits r=7 rows/band (49×7)
# — measured 13-22s vs 24-29s for the default budget's 30×6 at sf0.1,
# with slightly MORE verified pairs (sharper per-rotation s-curve)
_ROT_PLAN = tune_bands(0.6, target_recall=0.75, background_similarity=0.45,
                       max_signature_size=384)
_ROT_SEEDS = (123, 456)


def minhash_near_dup_pairs_rotated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed-rotated near-dup pairs — the reference README's rotate-seed
    UNION trick (``README.md:146-148``) as a DataFrame operator option
    (``seed`` accepts a sequence; rotations fuse into the band index so
    the blocking join still ships two ints per row).  Exact DuckDB
    oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return lsh_self_dedup_pairs(
        docs, "text", id_col="doc_id",
        ngram_width=3, band_count=_ROT_PLAN.band_count,
        band_size=_ROT_PLAN.band_size, seed=_ROT_SEEDS, threshold=0.6,
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def similarity_join_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-table similarity join (the README pattern proper, A ≠ B):
    odd-id docs probed against even-id docs; exact DuckDB oracle (the
    oracle reproduces banding + verification, so recall loss cancels).
    Banding tuner-selected against the measured corpus background."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.where(F.col("doc_id") % 2 == 1).selectExpr(
        "doc_id AS probe_id", "text")
    b = docs.where(F.col("doc_id") % 2 == 0).selectExpr(
        "doc_id AS corpus_id", "text")
    return lsh_similarity_join(
        a, b, "text", "text", left_id="probe_id", right_id="corpus_id",
        ngram_width=3, band_count=_JOIN_AB_PLAN.band_count,
        band_size=_JOIN_AB_PLAN.band_size, seed=123, threshold=0.7,
    ).select("probe_id", "corpus_id", F.round("jaccard", 6).alias("jaccard"))


# weighted-unigram background on this corpus (measured via DuckDB at
# sf0.01: weighted-jaccard median 0.35, p90 0.50, p99 0.58 across
# near-id pairs; true near-dups reach 0.98) — threshold 0.65 separates,
# banding tuned against the p90 background
_WEIGHTED_PLAN = tune_bands(0.65, target_recall=0.9,
                            background_similarity=0.5,
                            max_signature_size=384)


def weighted_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-weighted near-dup pairs: banded MinHash blocking + exact
    verification over the REPLICATED occurrence shingle sets, whose
    plain Jaccard equals the weighted Jaccard Σmin(tf)/Σmax(tf) — so
    the whole existing pair machinery (id-only blocking join,
    size-gated broadcast verify) composes unchanged via
    ``shingle="weighted"``.  Exact DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return lsh_self_dedup_pairs(
        docs, "text", id_col="doc_id",
        ngram_width=1, band_count=_WEIGHTED_PLAN.band_count,
        band_size=_WEIGHTED_PLAN.band_size, seed=123, threshold=0.65,
        shingle="weighted",
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def weighted_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-weighted MinHash signatures over word tokens (integer-weight
    replication reduction — see
    ``functions.lsh.weighted_minhash_bands_long``), exploded to scalar
    rows; exact DuckDB oracle replays the replication + string-hash +
    band machinery."""
    from ..functions.lsh import weighted_minhash_bands_long

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(weighted_minhash_bands_long(F.col("text"), 4, 2, 123))
        .alias("band_idx", "band_hash"),
    )


def euclidean_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lsh_euclidean over embeddings (cast float[] → double[]), exploded to
    scalar rows ``(vec_id, band_idx, band_hash)``; exact DuckDB oracle with
    inlined Gaussian projection tables."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.posexplode(
            lsh_euclidean_bands_long(F.col("embedding").cast("array<double>"),
                                     0.5, 4, 2, 123)
        ).alias("band_idx", "band_hash"),
    )


def euclidean32_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lsh_euclidean32 (low-32-bit variant, ``src/euclidean_hash.rs:127-152``)
    over embeddings, exploded to scalar rows; exact DuckDB oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.posexplode(
            lsh_euclidean32(F.col("embedding").cast("array<double>"),
                            0.5, 4, 2, 123)
        ).alias("band_idx", "band_hash"),
    )


def _with_word_bigrams(docs: DataFrame) -> DataFrame:
    """Word-bigram shingles built JVM-side.  The whitespace split is bound
    ONCE to ``__toks`` in its own projection: CollapseProject refuses to
    inline a non-cheap expression referenced three times, so ``split`` runs
    once per row (inlining it in the transform re-evaluated it per
    reference — a measured 14x slowdown at sf0.1)."""
    docs = fanout_scan(docs)
    # tokenizer contract shared with word_shingle_set_col and the DuckDB
    # oracle: split on ASCII \s runs, drop empty tokens (Java's split
    # already drops trailing empties; the filter drops the leading one a
    # leading separator produces)
    return docs.withColumn(
        "__toks", F.expr("filter(split(text, '\\\\s+'), x -> x != '')")
    ).withColumn(
        "__bigrams",
        F.expr("transform(slice(__toks, 1, greatest(size(__toks) - 1, 0)), "
               "(x, i) -> concat(x, ' ', __toks[i + 1]))"),
    )


def minhash_shingle_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LIST(VARCHAR) overload (``src/minhash.rs:85-150``) as a query:
    word-bigram shingles, then lsh_min_shingles, exploded to scalar rows;
    exact DuckDB oracle."""
    docs = _with_word_bigrams(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.posexplode(
            lsh_min_shingles_bands_long(F.col("__bigrams"), 4, 2, 123))
        .alias("band_idx", "band_hash"),
    )


def minhash32_shingle_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature #4 of 7: ``lsh_min32(LIST(VARCHAR), ...)``
    (``src/minhash.rs:194-234``) — low-32-bit minhash over word-bigram
    shingles, exploded to scalar rows; exact DuckDB oracle."""
    docs = _with_word_bigrams(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.posexplode(lsh_min32_shingles(F.col("__bigrams"), 4, 2, 123))
        .alias("band_idx", "band_hash"),
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group identical texts, keep the smallest doc_id as
    canonical — via the 100 TB plan its docstring always promised:

    1. pre-group on ``xxhash64(text)`` — the wide exchange carries an
       8-byte digest + partial counts, never document text;
    2. digests seen more than once (bounded by the number of DUPLICATED
       documents, a small fraction of any corpus — planted-duplicate
       pytest pins the path) broadcast back as a semi-join filter;
    3. verify within candidate groups by TRUE text equality, so an
       xxhash64 collision can never merge two distinct documents — the
       semantics stay exactly ``GROUP BY text`` (oracle unchanged), only
       the duplicated subset's text ever crosses a shuffle.

    At extreme duplication rates (dup digests too big to broadcast) the
    step-2 hint would come off and AQE picks the join side — the
    semantics don't depend on it."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", "text", F.xxhash64("text").alias("__dig"))
    dup_digs = (
        d.groupBy("__dig")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .select("__dig")
    )
    return (
        d.join(F.broadcast(dup_digs), on="__dig", how="left_semi")
        .groupBy("__dig", "text")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .where(F.col("n_copies") > 1)
        .select("canonical_id", "n_copies")
    )


DEDUP_EXACT_ORACLE = """
SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
FROM documents
GROUP BY text
HAVING count(*) > 1
"""


# embeddings tables ship 64-dim vectors (TESTDATA.md); the euclidean oracle
# inlines the projection tables for that dimension
_EMB_DIM = 64

QUERIES = {
    "jaccard_near_dup_pairs": (jaccard_near_dup_pairs, JACCARD_PAIRS_ORACLE),
    "minhash_signatures": (
        minhash_signatures, _orc.minhash_signatures_sql(3, 4, 2, 123)),
    "minhash32_signatures": (
        minhash32_signatures,
        _orc.minhash_signatures_sql(3, 4, 2, 123, low32=True)),
    "minhash_near_dup_pairs": (
        minhash_near_dup_pairs,
        _orc.near_dup_pairs_sql(3, _PAIRS_PLAN.band_count,
                                _PAIRS_PLAN.band_size, 123, 0.6)),
    "minhash_near_dup_pairs_rotated": (
        minhash_near_dup_pairs_rotated,
        _orc.near_dup_pairs_sql(3, _ROT_PLAN.band_count,
                                _ROT_PLAN.band_size, _ROT_SEEDS, 0.6)),
    "similarity_join_ab": (
        similarity_join_ab,
        _orc.similarity_join_ab_sql(3, _JOIN_AB_PLAN.band_count,
                                    _JOIN_AB_PLAN.band_size, 123, 0.7)),
    "weighted_minhash_signatures": (
        weighted_minhash_signatures,
        _orc.weighted_minhash_signatures_sql(4, 2, 123)),
    "weighted_near_dup_pairs": (
        weighted_near_dup_pairs,
        _orc.weighted_near_dup_pairs_sql(
            _WEIGHTED_PLAN.band_count, _WEIGHTED_PLAN.band_size, 123,
            0.65)),
    "euclidean_signatures": (
        euclidean_signatures,
        _orc.euclidean_signatures_sql(0.5, 4, 2, 123, _EMB_DIM)),
    "euclidean32_signatures": (
        euclidean32_signatures,
        _orc.euclidean_signatures_sql(0.5, 4, 2, 123, _EMB_DIM, low32=True)),
    "minhash_shingle_signatures": (
        minhash_shingle_signatures,
        _orc.minhash_shingle_signatures_sql(4, 2, 123)),
    "minhash32_shingle_signatures": (
        minhash32_shingle_signatures,
        _orc.minhash_shingle_signatures_sql(4, 2, 123, low32=True)),
    "dedup_exact": (dedup_exact, DEDUP_EXACT_ORACLE),
}


# word-level near-dup: the bigram-jaccard background is LOW (measured
# median ≈ 0.03, near-dups ≈ 0.99 — word shingles separate templates far
# better than char ngrams on this corpus), so the tuner picks selective
# banding cheaply
_WORD_PLAN = tune_bands(0.4, target_recall=0.9, background_similarity=0.08,
                        max_signature_size=384)


def word_bigram_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-level n-gram Jaccard dedup: banded MinHash over WORD-bigram
    shingles as the blocking key, exact bigram-set Jaccard verification.
    Same machinery as the char-ngram flagship (ids-only blocking join,
    size-gated set re-attach, batch-Arrow verify) — only the shingle
    definition changes, which is the point: the pair pipeline is
    shingle-agnostic.  Exact DuckDB oracle over the bigram shingle CTE."""
    docs = load_table(spark, sf_dir, "documents")
    return lsh_self_dedup_pairs(
        docs, "text", id_col="doc_id",
        ngram_width=2, band_count=_WORD_PLAN.band_count,
        band_size=_WORD_PLAN.band_size, seed=123, threshold=0.4,
        shingle="word",
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


_WORD_PAIRS_ORACLE = f"""
WITH {_orc.bigram_shingles_cte()},
{_orc.minhash_bands_ctes(_WORD_PLAN.band_count, _WORD_PLAN.band_size, 123)},
{_orc.pair_verify_ctes(0.4)}
SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM ver
"""

QUERIES["word_bigram_near_dup_pairs"] = (
    word_bigram_near_dup_pairs, _WORD_PAIRS_ORACLE)


def weighted_word_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-weighted WORD-BIGRAM near-dup pairs — the replication
    reduction composed with n-gram shingling (``shingle=
    "weighted_word"``): occurrence k of a bigram contributes
    ``"w1 w2 k"``, so plain Jaccard over the replicated sets equals the
    weighted bigram Jaccard Σmin(tf)/Σmax(tf).  The bigram background
    is as low as the unweighted word case (repeated bigrams are rare on
    this corpus), so the same tuned banding separates; exact DuckDB
    oracle replays the composition."""
    docs = load_table(spark, sf_dir, "documents")
    return lsh_self_dedup_pairs(
        docs, "text", id_col="doc_id",
        ngram_width=2, band_count=_WORD_PLAN.band_count,
        band_size=_WORD_PLAN.band_size, seed=123, threshold=0.4,
        shingle="weighted_word",
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


QUERIES["weighted_word_near_dup_pairs"] = (
    weighted_word_near_dup_pairs,
    _orc.weighted_word_near_dup_pairs_sql(
        _WORD_PLAN.band_count, _WORD_PLAN.band_size, 123, 0.4, width=2))
