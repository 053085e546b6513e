"""Training-corpus composition operators: repetition-quality stats,
benchmark decontamination, deterministic stratified sampling, and
token-budget shard assignment.

These extend the pipeline suite (``pipeline_queries.py``) with the four
corpus-construction steps a large-scale LLM data pipeline runs after
cleaning/dedup: score repetition (Gopher-style quality signals), check
eval-benchmark contamination, compose the training mixture by stratum,
and pack documents into near-equal token shards.

Scale shapes (the reason each operator looks the way it does):

  * ``repetition_stats`` is a ZERO-shuffle single scan — every metric is
    a per-row higher-order-function expression (no explode, no groupBy),
    so it parallelizes embarrassingly at any corpus size;
  * ``contamination_overlap`` broadcasts the benchmark n-gram set (eval
    benchmarks are MBs by construction) so the 100 TB corpus never
    shuffles — one scan + broadcast semi-probe + per-doc aggregate;
  * ``stratified_sample`` is a deterministic per-row filter (md5-derived
    bucket), no shuffle, reproducible across runs/engines — the property
    mixture re-runs need;
  * ``shard_assignment`` computes a global running token total WITHOUT a
    single-partition window: per-chunk subtotals roll up to exclusive
    chunk offsets (tiny aggregate), which broadcast-join back onto an
    intra-chunk window — the standard two-level scan decomposition.

Word tokens follow the repo-wide tokenizer contract (see
``functions/lsh.py::word_shingle_set_col``): maximal runs split on ASCII
``\\s+``, empty tokens dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import fanout_scan, load_table

QUERIES: dict = {}


def _words(col):
    """ASCII-whitespace word tokens, empties dropped (repo tokenizer
    contract — matches the DuckDB string_split_regex + filter); NULL text
    tokenizes to the empty list on both engines."""
    return F.coalesce(
        F.filter(F.split(col, "\\s+"), lambda t: t != F.lit("")),
        F.array().cast("array<string>"),
    )


# ---------------------------------------------------------------------------
# repetition / diversity stats (Gopher-style quality signals)
# ---------------------------------------------------------------------------

def repetition_stats_df(docs: DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Per-document repetition & diversity metrics — one zero-shuffle
    scan, raw counts from an Arrow batch kernel, final arithmetic JVM:

      * ``top_word_frac`` — share of tokens taken by the most frequent
        word (Gopher's "fraction of chars in most common n-gram" family);
      * ``dup_trigram_frac`` — share of word trigrams that are repeats
        of an earlier trigram in the same document;
      * ``word_entropy`` — Shannon entropy (nats) of the word unigram
        distribution, ``ln n - (Σ f·ln f)/n`` folded left-to-right over
        the SORTED distinct words so the oracle reproduces the exact
        IEEE summation order.

    The per-distinct-word frequency pass previously ran as a nested
    interpreted higher-order function — O(|distinct|·|tokens|) per row
    at interpreter speed (HOFs never enter whole-stage codegen): fine
    on ~300-char docs, quadratic on real training documents (a
    100k-token doc with 20k distinct words is 2×10⁹ interpreted ops in
    one task).  It is now ``_core.batch.repetition_stats_batch``: one
    factorize + radix-friendly row-tagged sort per Arrow batch,
    O(W log W) in total tokens, with the entropy fold's IEEE order
    preserved by a column-major sequential segment sum.  Only integer
    counts and the fold cross the kernel boundary; every division,
    ``ln``, and rounding stays in the JVM projection, identical to the
    oracle's expression tree.
    """
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)
                      .alias("__text"))
    schema = StructType([
        src.schema["doc_id"],
        StructField("n_words", LongType()),
        StructField("__max_f", LongType()),
        StructField("__n_tri", LongType()),
        StructField("__n_tri_d", LongType()),
        StructField("__ent", DoubleType()),
    ])

    def stats(batches):
        from .._core.batch import repetition_stats_batch

        for pdf in batches:
            if not len(pdf):
                continue
            n, mx, tri, trid, ent = repetition_stats_batch(
                list(pdf["__text"]))
            out = pdf[["doc_id"]].copy()
            out["n_words"] = n
            out["__max_f"] = mx
            out["__n_tri"] = tri
            out["__n_tri_d"] = trid
            out["__ent"] = ent
            yield out

    d = src.mapInPandas(stats, schema=schema)
    return d.select(
        "doc_id",
        "n_words",
        F.round(
            F.when(F.col("n_words") > 0,
                   F.col("__max_f").cast("double") / F.col("n_words"))
            .otherwise(F.lit(0.0)), 6).alias("top_word_frac"),
        F.round(
            F.when(F.col("__n_tri") > 0,
                   1.0 - F.col("__n_tri_d").cast("double")
                   / F.col("__n_tri"))
            .otherwise(F.lit(0.0)), 6).alias("dup_trigram_frac"),
        F.round(
            F.when(F.col("n_words") > 0,
                   F.log(F.col("n_words").cast("double"))
                   - F.col("__ent") / F.col("n_words"))
            .otherwise(F.lit(0.0)), 6).alias("word_entropy"),
    )


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats_df(
        fanout_scan(load_table(spark, sf_dir, "documents")))


REPETITION_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         coalesce(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'), t -> t != ''), []) AS w
  FROM documents
),
base AS (
  SELECT doc_id, w, len(w) AS n,
         list_transform(list_sort(list_distinct(w)),
                        d -> len(list_filter(w, x -> x = d))) AS f,
         CASE WHEN len(w) >= 3
              THEN list_transform(generate_series(1, len(w) - 2),
                                  i -> array_to_string(w[i:i+2], ' '))
              ELSE [] END AS tri
  FROM toks
)
SELECT doc_id,
       n::BIGINT AS n_words,
       round(CASE WHEN n > 0
             THEN list_max(f)::DOUBLE / n ELSE 0.0 END, 6) AS top_word_frac,
       round(CASE WHEN len(tri) > 0
             THEN 1.0 - len(list_distinct(tri))::DOUBLE / len(tri)
             ELSE 0.0 END, 6) AS dup_trigram_frac,
       round(CASE WHEN n > 0
             THEN ln(n::DOUBLE)
                  - list_reduce(
                      list_prepend(0.0::DOUBLE,
                        list_transform(f, x -> x::DOUBLE * ln(x::DOUBLE))),
                      (a, b) -> a + b) / n
             ELSE 0.0 END, 6) AS word_entropy
FROM base
"""

QUERIES["repetition_stats"] = (repetition_stats, REPETITION_ORACLE)


# ---------------------------------------------------------------------------
# benchmark contamination (n-gram overlap against an eval set)
# ---------------------------------------------------------------------------

_CONTAM_N = 8           # word n-gram width (decontamination standard range)
_BENCH_MOD = 50         # doc_id % 50 == 0 plays the held-out benchmark


def _doc_ngrams(docs: DataFrame, id_col: str, text_col: str,
                n: int) -> DataFrame:
    """(doc_id, __ngrams) with the word ``n``-gram array per document —
    ONE definition shared by the exact and Bloom decontamination
    operators (and mirrored by their oracles), so the n-gram contract
    cannot silently diverge between them."""
    w = _words(F.col(text_col))
    ngrams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(F.col(id_col).alias("doc_id"),
                       ngrams.alias("__ngrams"))


def contamination_overlap_df(docs: DataFrame, *, id_col: str = "doc_id",
                             text_col: str = "text",
                             n: int = _CONTAM_N,
                             bench_mod: int = _BENCH_MOD) -> DataFrame:
    """Count, per training document, how many of its word 8-grams appear
    anywhere in the "benchmark" set (docs with ``doc_id % 50 == 0``) —
    the standard n-gram decontamination check.

    Scale shape: the benchmark n-gram table is small by construction
    (eval sets are MBs), so it is broadcast and the corpus side is one
    scan → explode → broadcast semi-probe → per-doc aggregate; the only
    exchange is the final per-doc count aggregation, keyed by doc_id.

    Returns every non-benchmark document with ``n_overlap`` (distinct
    matched 8-grams), ``n_ngrams``, and a ``contaminated`` flag.
    """
    # codegen n-gram shape (see exploded_word_ngrams): both sides explode
    # the grams anyway, so the per-doc array the interpreted HOF built is
    # never needed — n_ngrams is the same arithmetic count the HOF's
    # guarded size() produced (0 for short/NULL docs)
    w = _words(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc_id"), w.alias("__w"))
    bench = (
        exploded_word_ngrams(
            base.where(F.col("doc_id") % bench_mod == 0), F.col("__w"), n,
            out="ng")
        .distinct()
    )
    corpus = base.where(F.col("doc_id") % bench_mod != 0)
    hits = (
        exploded_word_ngrams(corpus, F.col("__w"), n, keep=("doc_id",),
                             out="ng")
        .join(F.broadcast(bench), on="ng", how="left_semi")
        .groupBy("doc_id")
        .agg(F.count_distinct("ng").alias("n_overlap"))
    )
    n_ngrams = (F.when(F.size("__w") >= n, F.size("__w") - (n - 1))
                .otherwise(F.lit(0)))
    return (
        corpus.select("doc_id", n_ngrams.cast("bigint")
                      .alias("n_ngrams"))
        .join(hits, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).cast("bigint")
            .alias("n_overlap"),
            "n_ngrams",
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return contamination_overlap_df(
        fanout_scan(load_table(spark, sf_dir, "documents")))


CONTAMINATION_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id,
         coalesce(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'), t -> t != ''), []) AS w
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(w) >= {_CONTAM_N}
              THEN list_transform(generate_series(1, len(w) - {_CONTAM_N - 1}),
                                  i -> array_to_string(w[i:i+{_CONTAM_N - 1}], ' '))
              ELSE [] END AS ngrams
  FROM toks
),
bench AS (
  SELECT DISTINCT unnest(ngrams) AS ng FROM grams
  WHERE doc_id % {_BENCH_MOD} = 0
),
corpus AS (SELECT * FROM grams WHERE doc_id % {_BENCH_MOD} != 0),
hits AS (
  SELECT c.doc_id, count(DISTINCT ng) AS n_overlap
  FROM (SELECT doc_id, unnest(ngrams) AS ng FROM corpus) c
  WHERE c.ng IN (SELECT ng FROM bench)
  GROUP BY c.doc_id
)
SELECT corpus.doc_id,
       coalesce(hits.n_overlap, 0)::BIGINT AS n_overlap,
       len(corpus.ngrams)::BIGINT AS n_ngrams,
       coalesce(hits.n_overlap, 0) > 0 AS contaminated
FROM corpus LEFT JOIN hits ON corpus.doc_id = hits.doc_id
"""

QUERIES["contamination_overlap"] = (contamination_overlap,
                                    CONTAMINATION_ORACLE)


# --- Bloom-filter decontamination (the 100 TB broadcast-size path) ---------

def _bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) for a target false-positive rate."""
    import math

    n = max(1, n_items)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _bloom_positions(grams: "list[str]", m: int, k: int):
    """k bit positions per gram via double hashing over the md5 digest
    (h1 + i·h2 mod m) — deterministic across engines/partitionings.
    The per-gram md5 loop runs once per DISTINCT gram (callers dedup);
    the k-position expansion is vectorized.  The double-hash combine
    runs in uint64 (mod 2^64) — build and probe share this exact
    function, so the convention only has to be self-consistent."""
    import hashlib

    import numpy as np

    n = len(grams)
    h = np.empty((n, 2), dtype=np.uint64)
    for j, g in enumerate(grams):
        # usedforsecurity=False: same digest, but keeps FIPS-enforcing
        # OpenSSL builds from rejecting md5 in every executor task
        d = hashlib.md5(g.encode("utf-8"), usedforsecurity=False).digest()
        h[j, 0] = int.from_bytes(d[:8], "little")
        h[j, 1] = int.from_bytes(d[8:], "little") | 1
    i = np.arange(k, dtype=np.uint64)
    return ((h[:, :1] + i[None, :] * h[:, 1:2]) % np.uint64(m)) \
        .astype(np.int64)


def build_ngram_bloom(bench_grams: DataFrame, gram_col: str = "ng",
                      *, fpp: float = 0.01, build_groups: int = 64):
    """Build the benchmark Bloom bit array DISTRIBUTED: the
    decontamination probe then broadcasts ``m/8`` bytes instead of the
    full distinct-gram table — ~10 bits per gram at 1% FP vs ~60+
    bytes of string, the difference between a 12 MB and a 600 MB
    broadcast for a 10M-gram benchmark suite.

    The gram strings never land on the driver (ADVICE r5): distinct
    grams are md5-hashed and OR'd into partial bitmaps across up to
    ``build_groups`` tasks, a single task ORs those partials, and only
    the final ``m/8``-byte bitmap is fetched — so the 10M-gram example
    moves 12 MB to the driver, not hundreds of MB of strings plus a
    single-threaded hashing loop.  This is a BUILD step that runs
    Spark jobs (a distinct-count to size ``m``, then the bitmap
    aggregation) — callers constructing lazy plans must invoke it
    explicitly, not inside plan construction (see
    ``contamination_overlap_bloom_df``).

    Returns ``(bits uint8 array, m, k, n_items)``.  Deterministic:
    positions derive from md5 double-hashing, so the same benchmark
    always yields the same filter regardless of layout."""
    import numpy as np
    import pandas as pd

    distinct = bench_grams.select(F.col(gram_col).alias("ng")).distinct()
    n_items = distinct.count()
    m, k = _bloom_params(n_items, fpp)
    nbytes = (m + 7) // 8
    if n_items == 0:
        return np.zeros(nbytes, dtype=np.uint8), m, k, 0

    def hash_and_or(pdf: "pd.DataFrame") -> "pd.DataFrame":
        bits = np.zeros(nbytes, dtype=np.uint8)
        pos = _bloom_positions(pdf["ng"].tolist(), m, k).ravel()
        np.bitwise_or.at(bits, pos // 8,
                         np.left_shift(np.uint8(1), (pos % 8)
                                       .astype(np.uint8)))
        return pd.DataFrame({"grp": [int(pdf["grp"].iloc[0])],
                             "bits": [bits.tobytes()]})

    def or_partials(pdf: "pd.DataFrame") -> "pd.DataFrame":
        acc = np.zeros(nbytes, dtype=np.uint8)
        for b in pdf["bits"]:
            np.bitwise_or(acc, np.frombuffer(b, dtype=np.uint8), out=acc)
        return pd.DataFrame({"grp": [int(pdf["grp"].iloc[0])],
                             "bits": [acc.tobytes()]})

    partials = (
        distinct
        .withColumn("grp",
                    (F.spark_partition_id() % build_groups).cast("int"))
        .groupBy("grp")
        .applyInPandas(lambda pdf: hash_and_or(pdf),
                       "grp int, bits binary")
    )
    # two-level OR tree: a single final group would ship all
    # build_groups bitmaps (~64 x m/8 bytes — hundreds of MB at the
    # 10M-gram example) into ONE task; the mid stage caps every task at
    # ~8 bitmaps, and the driver fetch stays one m/8-byte row
    mid = (
        partials.withColumn("grp", (F.col("grp") % 8).cast("int"))
        .groupBy("grp")
        .applyInPandas(lambda pdf: or_partials(pdf),
                       "grp int, bits binary")
    )
    final = (
        mid.withColumn("grp", F.lit(0).cast("int"))
        .groupBy("grp")
        .applyInPandas(lambda pdf: or_partials(pdf),
                       "grp int, bits binary")
    )
    bits = np.frombuffer(final.first()["bits"], dtype=np.uint8).copy()
    return bits, m, k, n_items


def contamination_overlap_bloom_df(docs: DataFrame, *,
                                   id_col: str = "doc_id",
                                   text_col: str = "text",
                                   n: int = _CONTAM_N,
                                   bench_mod: int = _BENCH_MOD,
                                   fpp: float = 0.01) -> DataFrame:
    """Bloom-filter variant of ``contamination_overlap`` — identical
    output shape, ONE-SIDED approximation: every truly-contaminated
    n-gram is flagged (a Bloom filter has no false negatives), plus at
    most ~``fpp`` of clean grams (false positives).  For
    decontamination that is the safe direction: a false positive drops
    a clean document, never leaks an eval item into training.

    Scale shape: the corpus side is the same scan → explode → per-doc
    aggregate, but the benchmark ships as ``m/8`` broadcast BYTES probed
    inside the Arrow kernel — no join at all, so the plan is map +
    final doc-keyed aggregate regardless of benchmark size.

    DEVIATION from the repo's zero-jobs plan-construction convention
    (tests/test_plans.py): calling this function RUNS Spark jobs — the
    Bloom build inside is a materialization step (distinct-count +
    bitmap aggregation), not a lazy plan.  That is why it is not
    registered as a gate query; if it ever is, the build must be
    hoisted to an explicit caller-side step first (ADVICE r5)."""
    import numpy as np
    from pyspark.sql.types import (BooleanType, LongType, StructField,
                                   StructType)

    base = _doc_ngrams(docs, id_col, text_col, n)
    bench = (
        base.where(F.col("doc_id") % bench_mod == 0)
        .select(F.explode("__ngrams").alias("ng"))
    )
    bits, m, k, _ = build_ngram_bloom(bench, "ng", fpp=fpp)
    from ..plans.cache import track_broadcast

    bc = track_broadcast(
        docs.sparkSession.sparkContext.broadcast((bits, m, k)))
    corpus = base.where(F.col("doc_id") % bench_mod != 0)
    schema = StructType([
        corpus.schema["doc_id"],
        StructField("n_overlap", LongType()),
        StructField("n_ngrams", LongType()),
        StructField("contaminated", BooleanType()),
    ])

    def probe(batches):
        b_bits, b_m, b_k = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            # hash each DISTINCT gram once per Arrow batch (a gram shared
            # by many docs would otherwise be md5'd once per doc), then
            # map the per-gram flags back to per-doc distinct counts
            uniq: dict = {}
            row_idx = []
            for lst in pdf["__ngrams"]:
                row_idx.append(np.fromiter(
                    (uniq.setdefault(g, len(uniq))
                     for g in dict.fromkeys(lst)),
                    dtype=np.int64))
            flags = np.zeros(len(uniq), dtype=bool)
            if uniq:
                pos = _bloom_positions(list(uniq), b_m, b_k)
                flags = (((b_bits[pos // 8]
                           >> (pos % 8).astype(np.uint8)) & 1)
                         .all(axis=1))
            n_over = [int(flags[ix].sum()) for ix in row_idx]
            out = pdf[["doc_id"]].copy()
            out["n_overlap"] = n_over
            out["n_ngrams"] = [len(lst) for lst in pdf["__ngrams"]]
            out["contaminated"] = [h > 0 for h in n_over]
            yield out

    return corpus.mapInPandas(probe, schema=schema)


# ---------------------------------------------------------------------------
# cross-document duplicated-span stats (corpus self-duplication signal)
# ---------------------------------------------------------------------------

_DUPSPAN_N = 8          # word n-gram width
_DUPSPAN_MIN_DOCS = 2   # a span is "duplicated" once >= 2 docs carry it


def _span_key(col, key: str):
    """Digest used to shuffle spans instead of their text: ``md5``
    (32-hex string — cross-engine parity with the DuckDB oracle) or
    ``xxhash64`` (one BIGINT — quarter the shuffle width and no hex
    encode, for deployments that don't need the oracle twin; a 64-bit
    collision at corpus scale flags a non-duplicated span with
    probability ~n²/2⁶⁵)."""
    if key == "md5":
        return F.md5(col)
    if key == "xxhash64":
        return F.xxhash64(col)
    raise ValueError(f"unknown span key {key!r}: expected 'md5' or "
                     "'xxhash64'")


def dup_ngram_stats_df(docs: DataFrame, *, id_col: str = "doc_id",
                       text_col: str = "text", n: int = _DUPSPAN_N,
                       min_docs: int = _DUPSPAN_MIN_DOCS,
                       key: str = "md5") -> DataFrame:
    """Per-document corpus-self-duplication signal: the fraction of a
    document's word ``n``-grams that appear in ≥ ``min_docs`` DISTINCT
    documents — the "duplicated span" quality stat of the Gopher /
    RefinedWeb pipelines (their line-level variant degenerates on
    single-line corpora; the n-gram form measures the same cross-doc
    copying at span granularity).  Complements
    ``contamination_overlap``: that checks the corpus against a held-out
    benchmark, this checks the corpus against itself.

    Scale shape: n-grams shuffle as md5 digests, never as span text
    (constant 32-byte keys regardless of n) — one frequency aggregate
    keyed by digest, a semi-join of the (doc_id, digest) stream against
    the duplicated-digest set (both sides already partitioned by the
    digest from the aggregate), and a final per-doc count.  The digest
    is ``key``: md5 (default — cross-engine parity with the DuckDB
    oracle) or xxhash64 (quarter the shuffle width; see
    ``_span_key``).

    Returns every document with ``n_ngrams``, ``n_dup`` (occurrences
    whose span is cross-doc duplicated) and ``dup_frac``.
    """
    w = _words(F.col(text_col))
    # codegen n-gram shape (see exploded_word_ngrams) — the grams only
    # ever flow exploded into the digest, so no per-doc array is built
    grams = (
        exploded_word_ngrams(
            docs.select(F.col(id_col).alias("doc_id"), w.alias("__w")),
            F.col("__w"), n, keep=("doc_id",), out="__ng")
        .select("doc_id", _span_key(F.col("__ng"), key).alias("gh"))
    )
    hot = (
        grams.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("gh")
    )
    dup_counts = (
        grams.join(hot, on="gh", how="left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    # n_ngrams arithmetically from the token count — size(transform(..))
    # would re-materialize every n-gram string a second time just to
    # count them (Catalyst does not simplify it away)
    n_ngrams = F.greatest(F.size(w) - (n - 1), F.lit(0))
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    n_ngrams.cast("bigint").alias("n_ngrams"))
        .join(dup_counts, on="doc_id", how="left")
        .select(
            "doc_id", "n_ngrams",
            F.coalesce("n_dup", F.lit(0)).cast("bigint").alias("n_dup"),
            F.round(
                F.when(F.col("n_ngrams") > 0,
                       F.coalesce("n_dup", F.lit(0)).cast("double")
                       / F.col("n_ngrams"))
                .otherwise(F.lit(0.0)), 6).alias("dup_frac"),
        )
    )


def dup_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup_ngram_stats_df(
        fanout_scan(load_table(spark, sf_dir, "documents")))


DUPSPAN_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id,
         coalesce(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'), t -> t != ''), []) AS w
  FROM documents
),
base AS (
  SELECT doc_id,
         CASE WHEN len(w) >= {_DUPSPAN_N}
              THEN list_transform(generate_series(1, len(w) - {_DUPSPAN_N - 1}),
                                  i -> array_to_string(w[i:i+{_DUPSPAN_N - 1}], ' '))
              ELSE [] END AS ngrams
  FROM toks
),
grams AS (
  SELECT doc_id, md5(unnest(ngrams)) AS gh FROM base
),
hot AS (
  SELECT gh FROM grams GROUP BY gh
  HAVING count(DISTINCT doc_id) >= {_DUPSPAN_MIN_DOCS}
),
dup AS (
  SELECT doc_id, count(*) AS n_dup
  FROM grams WHERE gh IN (SELECT gh FROM hot)
  GROUP BY doc_id
)
SELECT base.doc_id,
       len(base.ngrams)::BIGINT AS n_ngrams,
       coalesce(dup.n_dup, 0)::BIGINT AS n_dup,
       round(CASE WHEN len(base.ngrams) > 0
             THEN coalesce(dup.n_dup, 0)::DOUBLE / len(base.ngrams)
             ELSE 0.0 END, 6) AS dup_frac
FROM base LEFT JOIN dup ON base.doc_id = dup.doc_id
"""

QUERIES["dup_ngram_stats"] = (dup_ngram_stats, DUPSPAN_ORACLE)


def remove_duplicated_spans_df(docs: DataFrame, *, id_col: str = "doc_id",
                               text_col: str = "text", n: int = _DUPSPAN_N,
                               min_docs: int = _DUPSPAN_MIN_DOCS,
                               key: str = "md5") -> DataFrame:
    """Exact duplicated-span REMOVAL — the mutation twin of
    ``dup_ngram_stats`` and the n-gram-coverage form of exact substring
    dedup (Lee et al. 2022; RefinedWeb): every token covered by ANY
    occurrence of a cross-document duplicated ``n``-gram is dropped,
    and the document is rebuilt from the surviving tokens (single-space
    joined).  Removing the copied spans themselves — instead of whole
    near-dup documents — is what the technique exists for: boilerplate
    and licence blocks vanish while the unique prose stays.

    Scale shape: duplicated-gram discovery is ``dup_ngram_stats``'s
    digest aggregate; coverage explodes each HOT occurrence into its
    ``n`` covered positions (bounded n× the hot hits, ids+ints only);
    the rebuild is one per-doc aggregate over (position, token) rows —
    ``sort_array(collect_list(struct(pos, tok)))`` — so every stage is
    keyed by digest or doc id and no state exceeds one document.

    Returns (doc_id, text, n_kept, n_dropped) for every document;
    docs with no tokens keep an empty string.
    """
    w = _words(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc_id"), w.alias("__w"))
    toks = base.select(
        "doc_id", F.posexplode("__w").alias("pos", "tok"))
    # codegen n-gram shape with positions (see exploded_word_ngrams);
    # __gpos is the same 0-based start index the HOF's posexplode gave
    grams = (
        exploded_word_ngrams(base, F.col("__w"), n, keep=("doc_id",),
                             with_pos=True, out="__ng")
        .select("doc_id", F.col("__gpos").alias("gpos"),
                _span_key(F.col("__ng"), key).alias("gh"))
    )
    hot = (
        grams.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("gh")
    )
    covered = (
        grams.join(hot, on="gh", how="left_semi")
        .select("doc_id",
                F.explode(F.sequence(F.col("gpos"),
                                     F.col("gpos") + (n - 1)))
                .alias("pos"))
        .distinct()
    )
    kept = (
        toks.join(covered, on=["doc_id", "pos"], how="left_anti")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"]),
                " ").alias("text"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    return (
        base.select("doc_id",
                    F.size("__w").cast("bigint").alias("__n_toks"))
        .join(kept, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("text", F.lit("")).alias("text"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            (F.col("__n_toks") - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint").alias("n_dropped"),
        )
    )


def remove_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return remove_duplicated_spans_df(
        fanout_scan(load_table(spark, sf_dir, "documents")))


REMOVE_SPANS_ORACLE = rf"""
WITH toks0 AS (
  SELECT doc_id,
         coalesce(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'), t -> t != ''), []) AS w
  FROM documents
),
toks AS (
  SELECT doc_id, unnest(w) AS tok,
         unnest(CASE WHEN len(w) > 0
                     THEN generate_series(0, len(w) - 1) ELSE [] END) AS pos
  FROM toks0
),
grams AS (
  SELECT doc_id,
         unnest(CASE WHEN len(w) >= {_DUPSPAN_N}
                     THEN generate_series(0, len(w) - {_DUPSPAN_N})
                     ELSE [] END) AS gpos,
         unnest(CASE WHEN len(w) >= {_DUPSPAN_N}
                     THEN list_transform(
                            generate_series(1, len(w) - {_DUPSPAN_N - 1}),
                            i -> md5(array_to_string(w[i:i+{_DUPSPAN_N - 1}], ' ')))
                     ELSE [] END) AS gh
  FROM toks0
),
hot AS (
  SELECT gh FROM grams GROUP BY gh
  HAVING count(DISTINCT doc_id) >= {_DUPSPAN_MIN_DOCS}
),
covered AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT doc_id,
           unnest(generate_series(gpos, gpos + {_DUPSPAN_N - 1})) AS pos
    FROM grams WHERE gh IN (SELECT gh FROM hot)
  )
),
kept AS (
  SELECT t.doc_id,
         string_agg(t.tok, ' ' ORDER BY t.pos) AS text,
         count(*) AS n_kept
  FROM toks t ANTI JOIN covered c
    ON t.doc_id = c.doc_id AND t.pos = c.pos
  GROUP BY t.doc_id
)
SELECT b.doc_id AS doc_id,
       coalesce(k.text, '') AS text,
       coalesce(k.n_kept, 0)::BIGINT AS n_kept,
       (len(b.w) - coalesce(k.n_kept, 0))::BIGINT AS n_dropped
FROM toks0 b LEFT JOIN kept k ON b.doc_id = k.doc_id
"""

QUERIES["remove_duplicated_spans"] = (remove_duplicated_spans,
                                      REMOVE_SPANS_ORACLE)


# ---------------------------------------------------------------------------
# deterministic stratified sampling (training-mixture composition)
# ---------------------------------------------------------------------------

# per-language keep rates out of 10_000 — the mixture recipe: downsample
# the dominant stratum, keep the rare ones
_STRATA_RATES = {"en": 5000, "es": 8000, "zh": 10000}
_RATE_DEFAULT = 2500


def stratified_sample_df(docs: DataFrame) -> DataFrame:
    """Deterministic per-stratum sampling: a document is kept iff its
    md5-derived bucket (``doc_id`` → first 8 hex chars → int % 10000)
    falls under its language's keep rate.

    The bucket is a pure function of the row key, so the sample is (a)
    reproducible across runs, engines, and partitionings — unlike
    ``df.sample`` whose output depends on partition layout — and (b) a
    per-row filter with ZERO shuffle that composes with predicate
    pushdown.  Exactly how production mixtures pin "the same 50% of
    CommonCrawl" across pipeline re-runs.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("bigint") % 10000
    )
    rate = F.lit(_RATE_DEFAULT)
    for lang, r in _STRATA_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return (
        docs.select("doc_id", "lang", "source", bucket.alias("bucket"))
        .where(F.col("bucket") < rate)
        .select("doc_id", "lang", "source", F.col("bucket").cast("bigint")
                .alias("bucket"))
    )


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample_df(
        fanout_scan(load_table(spark, sf_dir, "documents")))


_RATE_SQL = " ".join(
    f"WHEN lang = '{lang}' THEN {r}" for lang, r in _STRATA_RATES.items()
)

STRATIFIED_ORACLE = f"""
WITH b AS (
  SELECT doc_id, lang, source,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT
          % 10000)::BIGINT AS bucket
  FROM documents
)
SELECT doc_id, lang, source, bucket FROM b
WHERE bucket < CASE {_RATE_SQL} ELSE {_RATE_DEFAULT} END
"""

QUERIES["stratified_sample"] = (stratified_sample, STRATIFIED_ORACLE)


# ---------------------------------------------------------------------------
# token-budget shard assignment (corpus packing)
# ---------------------------------------------------------------------------

_SHARD_BUDGET = 4000    # tokens per shard
_CHUNK_FLOOR = 256      # smallest auto-derived cumsum chunk


def _auto_chunk(id_span: int) -> int:
    """Chunk width for ``shard_assignment_df``'s two-level running sum:
    the next power of two ≥ sqrt(id span), floored at ``_CHUNK_FLOOR``.
    Balancing the two levels at ~sqrt(span) keeps BOTH single-partition
    stages (the chunk-offset prefix window of span/chunk rows and the
    intra-chunk window of ≤ chunk rows) under ~10^6 rows for any corpus
    up to ~10^12 ids — past that, recurse the same decomposition once
    (span^(1/3) per level)."""
    import math

    if id_span <= 1:
        return _CHUNK_FLOOR
    return max(_CHUNK_FLOOR, 1 << math.ceil(math.log2(math.sqrt(id_span))))


def _auto_chunk_col(span):
    """In-plan Column mirror of :func:`_auto_chunk` — the derivation
    runs INSIDE the job (scalar bounds row, broadcast cross join), so
    plan construction stays zero-jobs.  Exactness: log2/sqrt land on
    representable powers of two at every decision boundary, so the
    JVM and Python mirrors agree (pinned by a grid test)."""
    span_d = F.greatest(span, F.lit(1)).cast("double")
    return F.greatest(
        F.lit(_CHUNK_FLOOR).cast("long"),
        F.pow(F.lit(2.0), F.ceil(F.log2(F.sqrt(span_d)))).cast("long"),
    )


def _exclusive_running_sum(df: DataFrame, *, key_col: str, val_col: str,
                           out_col: str,
                           chunk: "int | None" = None) -> DataFrame:
    """Exact exclusive running sum of ``val_col`` in ``key_col`` order
    (keys assumed unique) WITHOUT a single-partition global window: the
    two-level decomposition — per-chunk subtotals, an exclusive prefix
    over the small chunk table, broadcast back onto an intra-chunk
    window — shared by ``shard_assignment_df`` and
    ``pack_sequences_df``.  ``chunk=None`` auto-sizes in-plan from the
    key span (see ``_auto_chunk_col``); all arithmetic stays BIGINT.

    The chunked input is persisted (lazily — no plan-time job): the
    subtotal aggregate and the offset attach both consume it, and
    without the cache each branch would re-evaluate the upstream
    subtree — for ``shard_assignment`` that is a second full corpus
    scan + tokenization at 100 TB.  The cached relation is the NARROW
    (key, val, chunk) projection, ~24 B/row, and is registered with
    ``plans.cache.track`` for release."""
    from pyspark.storagelevel import StorageLevel

    from ..plans.cache import track

    if chunk is None:
        bounds = df.select(key_col).agg(
            F.min(key_col).alias("__lo"), F.max(key_col).alias("__hi"))
        chunk_col = _auto_chunk_col(F.col("__hi") - F.col("__lo") + 1)
        t = df.crossJoin(F.broadcast(bounds)).select(
            *df.columns,
            (F.col(key_col) - F.col(key_col) % chunk_col).alias("__chunk"))
    else:
        t = df.select(
            *df.columns,
            (F.col(key_col) - F.col(key_col) % chunk).alias("__chunk"))
    t = track(t.persist(StorageLevel.MEMORY_AND_DISK))
    chunk_offsets = (
        t.groupBy("__chunk").agg(F.sum(val_col).alias("__chunk_sum"))
        .select(
            "__chunk",
            (F.sum("__chunk_sum").over(
                Window.orderBy("__chunk")
                .rowsBetween(Window.unboundedPreceding, -1))
             ).alias("__offset"),
        )
        .fillna(0, subset=["__offset"])
    )
    intra = Window.partitionBy("__chunk").orderBy(key_col) \
        .rowsBetween(Window.unboundedPreceding, -1)
    return (
        t.join(F.broadcast(chunk_offsets), on="__chunk")
        .select(
            *df.columns,
            (F.col("__offset")
             + F.coalesce(F.sum(val_col).over(intra), F.lit(0)))
            .alias(out_col),
        )
    )


def shard_assignment_df(docs: DataFrame, *, budget: int = _SHARD_BUDGET,
                        chunk: "int | None" = None,
                        tokens_precomputed: bool = False) -> DataFrame:
    """Assign each document (in ``doc_id`` order) to a token-budget
    shard: ``shard = floor(running_token_total_before_doc / budget)`` —
    the packing step that turns a cleaned corpus into near-equal
    training shards.

    A naive ``sum() OVER (ORDER BY doc_id)`` funnels the whole corpus
    through ONE partition.  This implementation decomposes the global
    running sum two-level: per-chunk subtotals (one aggregate over
    ``floor(doc_id / chunk)``), an exclusive prefix over the tiny chunk
    table, broadcast back onto an intra-chunk window partitioned by
    chunk — so no stage ever sees more than a chunk in one partition.

    ``chunk=None`` (default) auto-sizes the chunk to the next power of
    two ≥ sqrt(doc_id span), derived in-plan from a broadcast min/max
    bounds row — both levels stay ≤ ~sqrt(span) rows per partition at
    ANY corpus size (≲10^12 ids) with no caller tuning and no driver
    job.  An explicit ``chunk`` pins the width (the decomposition is
    exact for any value, so results never depend on it).
    """
    if tokens_precomputed:
        # caller already carries an n_tokens column (e.g. counted before
        # a digest-keyed dedup so text never crosses that shuffle)
        base = docs.select("doc_id", F.col("n_tokens").cast("bigint")
                           .alias("n_tokens"))
    else:
        base = docs.select(
            "doc_id",
            F.size(_words(F.col("text"))).cast("bigint").alias("n_tokens"),
        )
    run = _exclusive_running_sum(base, key_col="doc_id",
                                 val_col="n_tokens", out_col="__running",
                                 chunk=chunk)
    # `div` is exact BIGINT integral division — no double rounding even
    # when the running total exceeds 2^53 (a 100 TB corpus is ~10^13
    # tokens, too close to double precision for a / + floor round-trip)
    return run.select("doc_id", "n_tokens",
                      F.expr(f"__running div {budget}").alias("shard"))


def shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shard_assignment_df(
        fanout_scan(load_table(spark, sf_dir, "documents")))


SHARD_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id,
         len(coalesce(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'),
                             t -> t != ''), []))::BIGINT AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
       ((sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens)
        // {_SHARD_BUDGET})::BIGINT AS shard
FROM toks
"""

QUERIES["shard_assignment"] = (shard_assignment, SHARD_ORACLE)


# ---------------------------------------------------------------------------
# sequence packing (fixed-capacity training sequences)
# ---------------------------------------------------------------------------

def pack_sequences_df(docs: DataFrame, *, max_len: int = 2048,
                      shard_budget: "int | None" = None,
                      tokens_precomputed: bool = False) -> DataFrame:
    """Pack documents into fixed-capacity training sequences: greedy
    next-fit in ``doc_id`` order, with the greedy state bounded to
    token-budget SHARDS — the distributed-exact formulation (a global
    greedy scan would serialize the corpus through one task; bounding
    the fill state to a shard of ``shard_budget`` tokens keeps packing
    deterministic and parallel, at the cost of at most one partial
    sequence per shard boundary vs the global scan).

    Stages, all previously-built machinery:
      1. ``shard_assignment_df`` (exact two-level running sum) assigns
         ~``shard_budget``-token shards;
      2. ``applyInPandas`` per shard runs the tiny next-fit loop (a
         shard holds ~``shard_budget``/avg_len docs — bounded memory);
      3. a second ``_exclusive_running_sum`` over per-shard sequence
         counts converts shard-local sequence indexes into GLOBAL dense
         ``seq_id``s without a single-partition window.

    Documents longer than ``max_len`` occupy one sequence alone and are
    flagged ``truncated`` (the padding/attention layout downstream
    tokenizers expect).  Returns (doc_id, n_tokens, seq_id, seq_pos,
    truncated); ``seq_pos`` is the token offset within the sequence.
    """
    from pyspark.sql.types import (BooleanType, LongType, StructField,
                                   StructType)

    shard_budget = shard_budget or max_len * 512
    assigned = shard_assignment_df(docs, budget=shard_budget,
                                   tokens_precomputed=tokens_precomputed)
    schema = StructType(list(assigned.schema.fields) + [
        StructField("seq_in_shard", LongType()),
        StructField("seq_pos", LongType()),
        StructField("truncated", BooleanType()),
    ])

    def pack(pdf):
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs, poss, truncs = [], [], []
        seq, fill = 0, 0
        for t in pdf["n_tokens"]:
            t_eff = min(int(t), max_len)
            if fill + t_eff > max_len and fill > 0:
                seq += 1
                fill = 0
            seqs.append(seq)
            poss.append(fill)
            truncs.append(int(t) > max_len)
            fill += t_eff
        pdf["seq_in_shard"] = seqs
        pdf["seq_pos"] = poss
        pdf["truncated"] = truncs
        return pdf

    from pyspark.storagelevel import StorageLevel

    from ..plans.cache import track

    # persist the packed rows: three branches consume them (the count
    # aggregate, the auto-chunk bounds inside the running sum, and the
    # final join), and the Python pack kernel sits ABOVE the reusable
    # exchange — without the cache each action re-runs the full
    # shard-shuffle + per-shard kernel three times
    packed = track(assigned.groupBy("shard").applyInPandas(pack, schema)
                   .persist(StorageLevel.MEMORY_AND_DISK))
    counts = packed.groupBy("shard").agg(
        (F.max("seq_in_shard") + 1).alias("__n_seqs"))
    offs = _exclusive_running_sum(counts, key_col="shard",
                                  val_col="__n_seqs",
                                  out_col="__seq_off")
    return (
        packed.join(offs.select("shard", "__seq_off"), on="shard")
        .select(
            "doc_id", "n_tokens",
            (F.col("__seq_off") + F.col("seq_in_shard")).alias("seq_id"),
            "seq_pos", "truncated",
        )
    )


# gate parameters: small enough that sf0.01 produces many shards AND
# many sequences per shard, so both decomposition levels and the
# next-fit loop carry real structure
_PACK_MAX_LEN = 64
_PACK_SHARD_BUDGET = 2000


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences_df(
        fanout_scan(load_table(spark, sf_dir, "documents")),
        max_len=_PACK_MAX_LEN, shard_budget=_PACK_SHARD_BUDGET)


def pack_oracle_sql(toks_body: str, *, max_len: int, budget: int,
                    pre_ctes: str = "") -> str:
    """The greedy next-fit fold is not window-expressible, but it IS
    recursion-expressible: the oracle walks each shard's docs in doc_id
    order through a recursive CTE carrying (seq, fill) state — an exact
    independent replay of the kernel's loop, executed by a different
    engine through a completely different mechanism.

    ``toks_body`` must yield (doc_id, n_tokens); ``pre_ctes`` lets a
    composed pipeline (e.g. prepare_training_corpus) stack its own
    stage CTEs in front.  PACK_ORACLE is the plain-documents
    instance."""
    return rf"""
WITH RECURSIVE {pre_ctes}toks AS ({toks_body}),
ordered AS (
  SELECT doc_id, n_tokens,
         ((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
           - n_tokens) // {budget})::BIGINT AS shard
  FROM toks
),
rn AS (
  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
  FROM ordered
),
pack AS (
  SELECT shard, rn, doc_id, n_tokens,
         0::BIGINT AS seq, 0::BIGINT AS pos,
         least(n_tokens, {max_len})::BIGINT AS fill_after
  FROM rn WHERE rn = 1
  UNION ALL
  SELECT r.shard, r.rn, r.doc_id, r.n_tokens,
         CASE WHEN p.fill_after + least(r.n_tokens, {max_len})
                   > {max_len} AND p.fill_after > 0
              THEN p.seq + 1 ELSE p.seq END,
         CASE WHEN p.fill_after + least(r.n_tokens, {max_len})
                   > {max_len} AND p.fill_after > 0
              THEN 0 ELSE p.fill_after END,
         CASE WHEN p.fill_after + least(r.n_tokens, {max_len})
                   > {max_len} AND p.fill_after > 0
              THEN least(r.n_tokens, {max_len})
              ELSE p.fill_after + least(r.n_tokens, {max_len}) END
  FROM pack p JOIN rn r ON r.shard = p.shard AND r.rn = p.rn + 1
),
counts AS (
  SELECT shard, max(seq) + 1 AS n_seqs FROM pack GROUP BY shard
),
offs AS (
  SELECT shard,
         coalesce(sum(n_seqs) OVER (ORDER BY shard
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS off
  FROM counts
)
SELECT p.doc_id, p.n_tokens,
       (o.off + p.seq)::BIGINT AS seq_id,
       p.pos::BIGINT AS seq_pos,
       p.n_tokens > {max_len} AS truncated
FROM pack p JOIN offs o USING (shard)
"""


_PACK_TOKS_BODY = r"""
  SELECT doc_id,
         len(coalesce(list_filter(string_split_regex(text, '[ \t\n\x0b\f\r]+'),
                             t -> t != ''), []))::BIGINT AS n_tokens
  FROM documents
"""

PACK_ORACLE = pack_oracle_sql(_PACK_TOKS_BODY, max_len=_PACK_MAX_LEN,
                              budget=_PACK_SHARD_BUDGET)

QUERIES["pack_sequences"] = (pack_sequences, PACK_ORACLE)


def chunk_documents_df(
    docs: DataFrame,
    *,
    chunk_chars: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size overlapping chunks — the
    context-window chunking step of a training/RAG pipeline
    (chunk i covers characters ``i·(chunk_chars-overlap)`` onward,
    ``chunk_chars`` long; the final chunk is shorter).

    Chunk count per doc is ``1 + (max(len - overlap - 1, 0) DIV
    stride)`` — a tail that would contain ONLY overlap (no new
    characters) is not emitted, and empty texts yield no chunks.

    100 TB design: a pure narrow transformation — one in-plan explode
    bounded by corpus characters / stride, zero shuffle, zero UDFs;
    the substring and the chunk grid are whole-stage-codegen
    expressions, and downstream consumers (pack_sequences, dedup,
    embedding) see ordinary rows keyed by (id, chunk_idx).

    Returns (id_col, chunk_idx, chunk_text, n_chars)."""
    if overlap >= chunk_chars:
        raise ValueError(
            f"overlap {overlap} must be smaller than chunk_chars "
            f"{chunk_chars}")
    stride = chunk_chars - overlap
    grid = (
        f"CASE WHEN length({text_col}) > 0 THEN "
        f"sequence(0, CAST((greatest(length({text_col}) - {overlap} - 1, 0))"
        f" DIV {stride} AS INT)) ELSE array() END"
    )
    return (
        docs.select(F.col(id_col), F.col(text_col),
                    F.explode(F.expr(grid)).alias("chunk_idx"))
        .select(
            id_col,
            "chunk_idx",
            F.expr(f"substring({text_col}, chunk_idx * {stride} + 1, "
                   f"{chunk_chars})").alias("chunk_text"),
        )
        .withColumn("n_chars", F.length("chunk_text").cast("long"))
    )


def dataset_splits_df(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    val_frac: float = 0.05,
    test_frac: float = 0.05,
    salt: str = "split-v1",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic train/val/test assignment: a row's split is a pure
    function of (id, salt) — md5 bucket < test_frac → 'test', <
    test_frac+val_frac → 'val', else 'train'.

    The properties that matter for training pipelines: (a) reproducible
    across runs, engines, and partition layouts (unlike randomSplit);
    (b) STABLE under corpus growth — adding documents never moves an
    existing one between splits, so eval sets stay uncontaminated as
    the corpus is re-crawled; (c) group-aware by construction — hash
    the GROUP key (document id) and every derived row (chunks,
    sequences) inherits the split, preventing near-duplicate leakage
    across the train/test boundary; (d) a zero-shuffle per-row map.
    The salt isolates independent split families."""
    bucket = split_bucket_expr(F.col(id_col), salt=salt, buckets=buckets)
    test_lim = int(test_frac * buckets)
    val_lim = test_lim + int(val_frac * buckets)
    split = (
        F.when(F.col("__bucket") < test_lim, F.lit("test"))
        .when(F.col("__bucket") < val_lim, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return (
        docs.select(F.col(id_col), bucket.alias("__bucket"))
        .select(id_col, F.col("__bucket").cast("bigint").alias("bucket"),
                split.alias("split"))
    )


def split_bucket_expr(id_expr, *, salt: str = "split-v1",
                      buckets: int = 10_000):
    """md5 bucket of a single id as a pure column expression — the
    deterministic core of ``dataset_splits_df``, exposed so consumers
    can project a split onto ANY id column in-plan instead of joining
    the corpus-sized (doc_id, split) table (which at 100 TB would mean
    either a full shuffle or a forbidden corpus-sized broadcast)."""
    return (
        F.conv(F.substring(F.md5(F.concat(id_expr.cast("string"),
                                          F.lit(":" + salt))), 1, 8),
               16, 10).cast("bigint") % buckets
    )


def mixture_sample_df(
    docs: DataFrame,
    weights: "dict[str, float]",
    *,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix-v1",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic data-mixing: keep each row with its source's target
    probability — the md5-bucket machinery of ``dataset_splits_df``
    applied to mixture weighting (the per-source up/down-sampling step
    that turns raw crawl proportions into a training mix).

    ``weights`` maps source → keep probability in [0, 1]; sources
    absent from the map default to 0 (dropped).  Same properties as the
    splits: reproducible across engines and partition layouts, STABLE
    under corpus growth (new rows never flip old keep decisions), and a
    zero-shuffle per-row map.  Weights quantize to ``1/buckets``
    (keep iff bucket < int(weight · buckets))."""
    bucket = split_bucket_expr(F.col(id_col), salt=salt, buckets=buckets)
    lim = F.lit(0)
    for src, wt in sorted(weights.items()):
        lim = F.when(F.col(source_col) == src,
                     F.lit(int(wt * buckets))).otherwise(lim)
    return docs.where(bucket < lim)


def mixture_temperature_plan(
    docs: DataFrame,
    *,
    temperature: float = 0.7,
    budget: int = 100_000,
    source_col: str = "source",
) -> DataFrame:
    """Temperature-scaled sampling plan per source — the standard
    multilingual/multi-source re-balancing step (p_s ∝ n_s^T, T < 1
    up-weights the tail): returns (source, n_docs, weight, planned_docs)
    where ``weight = n_s^T / Σ n_s^T`` and ``planned_docs =
    floor(weight · budget)``.

    Cross-engine determinism: the only order-sensitive op is the Σ —
    per-source pow() outputs are 6dp-rounded (absorbing libm last-ulp
    noise) then DECIMAL(28,6)-summed (exact, order-independent); the
    final division and floor replay one literal op order.  Scale shape:
    ONE count aggregate over the corpus; everything after is per-source
    arithmetic on a ~|sources|-row frame with a broadcast 1-row total."""
    counts = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"))
    p = F.round(
        F.pow(F.col("n_docs").cast("double"), F.lit(float(temperature))),
        6).alias("__p")
    scaled = counts.select("source", "n_docs", p)
    tot = F.broadcast(scaled.agg(
        F.sum(F.col("__p").cast("decimal(28,6)")).alias("__tot")))
    w = F.round(
        F.col("__p") / F.col("__tot").cast("double"), 6).alias("weight")
    return (
        scaled.crossJoin(tot)
        .select("source", "n_docs", w)
        .select(
            "source", "n_docs", "weight",
            F.floor(F.col("weight") * F.lit(float(budget)))
            .cast("bigint").alias("planned_docs"),
        )
    )


def mixture_temperature_oracle_sql(
    temperature: float = 0.7,
    budget: int = 100_000,
    source: str = "documents",
    source_col: str = "source",
) -> str:
    """DuckDB twin of :func:`mixture_temperature_plan` — same 6dp →
    DECIMAL(28,6) fold and literal op order."""
    return f"""
WITH counts AS (
  SELECT {source_col} AS source, count(*)::BIGINT AS n_docs
  FROM {source} GROUP BY 1
),
scaled AS (
  SELECT source, n_docs,
         round(pow(CAST(n_docs AS DOUBLE), {float(temperature)!r}), 6) AS p
  FROM counts
),
tot AS (
  SELECT sum(CAST(p AS DECIMAL(28,6))) AS t FROM scaled
)
SELECT source, n_docs,
       round(p / CAST((SELECT t FROM tot) AS DOUBLE), 6) AS weight,
       CAST(floor(round(p / CAST((SELECT t FROM tot) AS DOUBLE), 6)
                  * {float(budget)!r}) AS BIGINT) AS planned_docs
FROM scaled
"""


def split_expr(id_expr, *, val_frac: float = 0.05, test_frac: float = 0.05,
               salt: str = "split-v1", buckets: int = 10_000):
    """train/val/test label of a single id as a pure column expression —
    byte-identical to the ``split`` column of ``dataset_splits_df`` for
    the same parameters (same md5-bucket arithmetic), zero joins."""
    bucket = split_bucket_expr(id_expr, salt=salt, buckets=buckets)
    test_lim = int(test_frac * buckets)
    val_lim = test_lim + int(val_frac * buckets)
    return (
        F.when(bucket < test_lim, F.lit("test"))
        .when(bucket < val_lim, F.lit("val"))
        .otherwise(F.lit("train"))
    )


def epoch_shuffle_plan(
    docs: DataFrame,
    *,
    epochs: int = 3,
    n_shards: int = 8,
    salt: str = "shuffle-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch training order: every (doc, epoch) gets
    a shard and a position from the md5 machinery of
    ``dataset_splits_df`` — reproducible across engines and partition
    layouts, different order every epoch, no RNG state to ship.
    Returns (doc_id, epoch, shard, pos).

    100 TB shape: ONE plan for all epochs (the epoch index is an
    exploded literal array — no per-epoch scans or unions); ordering is
    per-(epoch, shard) windows, never a global sort — shards are the
    parallel read units, exactly how a trainer consumes them.

    **``n_shards`` IS the parallelism contract** (round-10 verdict item
    5): each (epoch, shard) window sorts corpus/n_shards rows in ONE
    task, so the gate's default (8, sized for the sf0.1 corpus) is NOT
    a 100 TB parameterization — a 100 TB caller must scale n_shards
    with cluster parallelism (thousands of shards, >= executor cores,
    like a real trainer's shard count), which bounds every per-window
    sort to corpus/n_shards — the same guidance regime as the banding
    parameters on the pair miners."""
    from pyspark.sql.window import Window

    e = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array(*[F.lit(i) for i in range(int(epochs))]))
        .alias("epoch"))
    key = F.md5(F.concat(F.col("doc_id").cast("string"),
                         F.lit(f":{salt}-e"),
                         F.col("epoch").cast("string")))
    keyed = e.select(
        "doc_id", "epoch", key.alias("__key"),
        (F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint")
         % F.lit(int(n_shards))).alias("shard"))
    w = Window.partitionBy("epoch", "shard").orderBy(
        F.col("__key").asc(), F.col("doc_id").asc())
    return keyed.select(
        "doc_id", "epoch", "shard",
        F.row_number().over(w).cast("long").alias("pos"))


def epoch_shuffle_oracle_sql(
    epochs: int = 3,
    n_shards: int = 8,
    salt: str = "shuffle-v1",
    source: str = "documents",
) -> str:
    """DuckDB twin of :func:`epoch_shuffle_plan` — same md5 keys, same
    hex-prefix shard arithmetic, same per-shard ordering."""
    return f"""
WITH e AS (
  SELECT doc_id, unnest(generate_series(0, {int(epochs) - 1})) AS ep
  FROM {source}
),
k AS (
  SELECT doc_id, ep,
         md5(doc_id::VARCHAR || ':{salt}-e' || ep::VARCHAR) AS key
  FROM e
),
s AS (
  SELECT doc_id, ep, key,
         CAST(('0x' || substr(key, 1, 8))::BIGINT % {int(n_shards)}
              AS BIGINT) AS shard
  FROM k
)
SELECT doc_id, ep::INT AS epoch, shard,
       CAST(row_number() OVER (PARTITION BY ep, shard
                               ORDER BY key ASC, doc_id ASC) AS BIGINT)
         AS pos
FROM s
"""


def bpe_pair_counts(
    docs: DataFrame,
    *,
    top_n: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """The first BPE-training step: corpus-wide adjacent-character pair
    frequencies within words (pairs weighted by word occurrence count),
    top-N by total.  Returns (pair, n_total) — ties break on the pair
    string, all-integer arithmetic.

    100 TB shape: ONE token explode feeds the word-frequency aggregate;
    pairs explode from the DISTINCT-word table (vocabulary-sized, not
    corpus-sized), and the global top-N plans as TakeOrdered, never a
    full-vocab window."""
    words = docs.select(
        F.explode(_words(F.col(text_col))).alias("__w"))
    wc = words.groupBy("__w").agg(F.count(F.lit(1)).alias("__n"))
    # length >= 2 filter (matches the oracle's empty generate_series):
    # Spark's sequence(1, 0) is the DESCENDING [1, 0], which would
    # fabricate a bogus single-char "pair" for 1-char words
    pairs = wc.where(F.length("__w") >= 2).select(
        F.explode(F.expr(
            "transform(sequence(1, length(__w) - 1), "
            "i -> substring(__w, i, 2))")).alias("pair"),
        "__n")
    return (
        pairs.groupBy("pair")
        .agg(F.sum("__n").cast("long").alias("n_total"))
        .orderBy(F.col("n_total").desc(), F.col("pair").asc())
        .limit(int(top_n))
    )


def bpe_pair_counts_oracle_sql(top_n: int = 20,
                               source: str = "documents") -> str:
    """DuckDB twin of :func:`bpe_pair_counts`."""
    return f"""
WITH wds AS (
  SELECT unnest(list_filter(string_split_regex(text,
                                               '[ \t\n\x0b\f\r]+'),
                            t -> t != '')) AS w
  FROM {source}
),
wc AS (SELECT w, count(*) AS n FROM wds GROUP BY 1),
p AS (
  SELECT substring(w, i, 2) AS pair, n
  FROM (SELECT w, n, unnest(generate_series(1, length(w) - 1)) AS i
        FROM wc)
)
SELECT pair, sum(n)::BIGINT AS n_total
FROM p GROUP BY 1
ORDER BY n_total DESC, pair ASC
LIMIT {int(top_n)}
"""


def cap_per_source(
    docs: DataFrame,
    *,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "cap-v1",
) -> DataFrame:
    """C4-style per-source document cap: keep at most ``cap`` docs per
    source, chosen by deterministic md5 order (reproducible across
    engines and partition layouts; no RNG state).  Returns the
    surviving (doc_id, source) rows.

    100 TB shape (two-phase, round-10 verdict item 2): a naive
    per-source ``row_number`` window sorts EVERY row of a source in a
    single task — a multi-TB external sort when one source dominates
    the corpus (Common Crawl is routinely >80% of a web corpus).
    Instead, phase 1 histograms the corpus on the first 4 hex chars of
    the md5 order key (65 536 buckets; the bucket is a string PREFIX of
    the full key, so bucket order is a prefix of the row order) and
    derives, per source, the smallest bucket whose cumulative count
    reaches ``cap``.  Every rank-<=cap row provably lies in a bucket
    <= that cutoff, so phase 2 runs the EXACT ``row_number`` window
    only over the admitted rows — window input per source is
    cap + O(n_source / 65 536), not n_source.  The keep set is
    bit-identical to the single-window form (the oracle replays the
    full window and the gate hash pins it); the cutoff frame is
    |sources| x <=65 536 rows and broadcast onto the scan."""
    from pyspark.sql.window import Window

    key = F.md5(F.concat(F.col(id_col).cast("string"),
                         F.lit(":" + salt)))
    rows = docs.select(
        F.col(id_col), F.col(source_col), key.alias("__key"),
        F.substring(key, 1, 4).alias("__bkt"))
    hist = rows.groupBy(source_col, "__bkt").agg(
        F.count(F.lit(1)).alias("__n"))
    wcum = (Window.partitionBy(source_col).orderBy(F.col("__bkt").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cut = (
        hist.select(F.col(source_col),
                    F.col("__bkt"),
                    F.sum("__n").over(wcum).alias("__cum"))
        .where(F.col("__cum") >= int(cap))
        .groupBy(source_col)
        .agg(F.min("__bkt").alias("__cut"))
    )
    admitted = rows.join(F.broadcast(cut), on=source_col, how="left").where(
        F.col("__cut").isNull() | (F.col("__bkt") <= F.col("__cut")))
    w = Window.partitionBy(source_col).orderBy(
        F.col("__key").asc(), F.col(id_col).asc())
    return (
        admitted.select(F.col(id_col), F.col(source_col),
                        F.row_number().over(w).alias("__rk"))
        .where(F.col("__rk") <= int(cap))
        .select(id_col, source_col)
    )


def cap_per_source_oracle_sql(
    cap: int,
    salt: str = "cap-v1",
    source: str = "documents",
) -> str:
    """DuckDB twin of :func:`cap_per_source`."""
    return f"""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(doc_id::VARCHAR || ':{salt}') ASC, doc_id ASC)
           AS rk
  FROM {source}
)
SELECT doc_id, source FROM r WHERE rk <= {int(cap)}
"""


def mixture_repeat_df(
    docs: DataFrame,
    weights: "dict[str, float]",
    *,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix-v1",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic UP-sampling companion to ``mixture_sample_df``:
    per-row copy counts for weights above 1 — ``n_copies = floor(w) +
    (bucket < frac(w)·buckets)`` with the same md5-bucket machinery, so
    w=2.5 gives every row 2 copies and a deterministic half a third.
    The w <= 1 case degenerates to the sampler (copies 0/1, identical
    keep set for identical salt).  Returns (id, source, n_copies) with
    copies 0 rows retained — the caller materializes repeats (e.g.
    ``explode(sequence(1, n_copies))``) only at the final write, so the
    plan carries ONE row per document until then."""
    bucket = split_bucket_expr(F.col(id_col), salt=salt, buckets=buckets)
    base = F.lit(0)
    lim = F.lit(0)
    for src, wt in sorted(weights.items()):
        whole = int(wt)
        frac_lim = int(round((wt - whole) * buckets))
        base = F.when(F.col(source_col) == src, F.lit(whole)).otherwise(base)
        lim = F.when(F.col(source_col) == src,
                     F.lit(frac_lim)).otherwise(lim)
    return docs.select(
        F.col(id_col), F.col(source_col),
        (base + F.when(bucket < lim, 1).otherwise(0)).cast("long")
        .alias("n_copies"))


# ---------------------------------------------------------------------------
# BPE training merges (round 11) — the iterative tokenizer-training loop
# ---------------------------------------------------------------------------

def bpe_train_merges(
    docs: DataFrame,
    *,
    steps: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """The actual BPE training loop, ``steps`` merges deep: start from
    the character-tokenized distinct-word vocabulary (weighted by word
    frequency), and per step (1) count adjacent token pairs, (2) take
    the top pair (ties: count desc, left asc, right asc), (3) GREEDILY
    merge its non-overlapping occurrences left-to-right in every word.
    Returns (step, pair_a, pair_b, n_total) — the merge table a BPE
    tokenizer ships.

    The greedy merge is CLOSED-FORM in window functions (no fold, no
    UDF): for pair (a, b) with a != b occurrences never overlap, so
    every (tok=a, next=b) position merges; for a == b overlaps happen
    inside runs of consecutive ``a`` tokens, where greedy left-to-right
    takes the even OFFSETS within each run (gaps-and-islands:
    island = pos − running-count-of-a, offset = row_number within
    island).  Both engines replay the identical window algebra — the
    oracle unrolls the same CTEs per step.

    100 TB shape: every pass is vocabulary-sized, not corpus-sized —
    the ONE corpus-wide job is the word-frequency aggregate; the token
    table is |vocab|·avg_len rows, each step re-uses its (word)
    partitioning for lead/lag/row_number and the top-1 plans as
    TakeOrdered(1).  Lineage stays shallow (a few windows per step);
    steps are unrolled into one plan, so the whole merge table is one
    job."""
    out, _ = _bpe_loop(docs, steps=steps, text_col=text_col)
    return out


def _bpe_loop(docs: DataFrame, *, steps: int, text_col: str):
    """Shared BPE training loop: returns (merge_table, final_toks) —
    ``final_toks`` is the tokenized vocabulary state (__w, __n, __pos,
    __tok) after the last merge, the thing the ENCODER needs (a word's
    BPE token count is its row count here).  ``bpe_train_merges``
    returns the first element; ``bpe_encode_token_counts`` consumes the
    second.  One function so the two gates can never train different
    merge tables."""
    words = docs.select(F.explode(_words(F.col(text_col))).alias("__w"))
    wc = words.groupBy("__w").agg(F.count(F.lit(1)).alias("__n"))
    toks = (
        wc.select(
            "__w", "__n",
            F.explode(F.expr("sequence(1, length(__w))")).alias("__pos"))
        .select("__w", "__n", "__pos",
                F.expr("substring(__w, __pos, 1)").alias("__tok"))
    )
    wnd = Window.partitionBy("__w").orderBy("__pos")
    runw = wnd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    outs = []
    for k in range(1, int(steps) + 1):
        t = toks.withColumn("__next", F.lead("__tok").over(wnd))
        top = (
            t.where(F.col("__next").isNotNull())
            .groupBy("__tok", "__next")
            .agg(F.sum("__n").cast("long").alias("__nt"))
            .orderBy(F.col("__nt").desc(), F.col("__tok").asc(),
                     F.col("__next").asc())
            .limit(1)
            .select(F.col("__tok").alias("__a"),
                    F.col("__next").alias("__b"), "__nt")
        )
        outs.append(top.select(
            F.lit(k).alias("step"),
            F.col("__a").alias("pair_a"),
            F.col("__b").alias("pair_b"),
            F.col("__nt").alias("n_total")))
        t2 = (
            t.crossJoin(F.broadcast(top))
            .withColumn(
                "__rn",
                F.sum(F.when(F.col("__tok") == F.col("__a"), 1)
                      .otherwise(0)).over(runw))
            .withColumn(
                "__isl",
                F.when(F.col("__tok") == F.col("__a"),
                       F.col("__pos") - F.col("__rn")))
        )
        t2 = t2.withColumn(
            "__off",
            F.row_number().over(
                Window.partitionBy("__w", "__isl").orderBy("__pos")) - 1)
        # coalesce: a NULL __next (last token) makes the equality NULL,
        # and a NULL __m would poison ~__absorbed into dropping rows
        t2 = t2.withColumn(
            "__m",
            F.coalesce(
                F.when(
                    F.col("__a") != F.col("__b"),
                    (F.col("__tok") == F.col("__a"))
                    & (F.col("__next") == F.col("__b")),
                ).otherwise(
                    (F.col("__tok") == F.col("__a"))
                    & (F.col("__next") == F.col("__a"))
                    & (F.col("__off") % 2 == 0)),
                F.lit(False)))
        t2 = t2.withColumn(
            "__absorbed",
            F.coalesce(F.lag("__m").over(wnd), F.lit(False)))
        toks = (
            t2.where(~F.col("__absorbed"))
            .select(
                "__w", "__n",
                F.row_number().over(wnd).alias("__pos"),
                F.when(F.col("__m"), F.concat("__tok", "__next"))
                .otherwise(F.col("__tok")).alias("__tok"))
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out, toks


def bpe_encode_token_counts(
    docs: DataFrame,
    *,
    steps: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The ENCODE half of the BPE loop: train ``steps`` merges
    (:func:`_bpe_loop`, identical algebra to the merge-table gate) and
    tokenize every document with them — per doc, the whitespace word
    count and the BPE token count after the merges (the number a
    token-budget planner actually needs; whitespace words only
    approximate it).

    Closed form: a word's post-merge token count is its ROW COUNT in
    the final vocabulary state, so encoding is one |vocab|-row count
    aggregate joined (broadcast — token counts are one int per distinct
    word) onto the corpus word explode.  No per-document re-merge: the
    merge result is a function of the word alone, computed once per
    distinct word — the whole point of training on the vocabulary."""
    _, toks = _bpe_loop(docs, steps=steps, text_col=text_col)
    vt = toks.groupBy("__w").agg(F.count(F.lit(1)).alias("__nt"))
    dw = docs.select(F.col(id_col),
                     F.explode(_words(F.col(text_col))).alias("__w"))
    per = (
        dw.join(F.broadcast(vt), on="__w")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__nw"),
             F.sum("__nt").alias("__nb"))
    )
    return (
        docs.select(id_col).join(per, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("__nw", F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce("__nb", F.lit(0)).cast("bigint")
            .alias("n_bpe_tokens"),
        )
    )


def bpe_train_merges_oracle_sql(steps: int = 3,
                                source: str = "documents") -> str:
    """DuckDB twin of :func:`bpe_train_merges`: the same unrolled
    per-step window algebra (lead → weighted top-1 → gaps-and-islands
    greedy merge → renumber)."""
    ctes = _bpe_ctes(steps, source)
    sel = "\nUNION ALL\n".join(
        f"SELECT {k} AS step, a AS pair_a, b AS pair_b, nt AS n_total "
        f"FROM top{k}" for k in range(1, int(steps) + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + sel


def bpe_encode_oracle_sql(steps: int = 3,
                          source: str = "documents") -> str:
    """DuckDB twin of :func:`bpe_encode_token_counts`: the training
    CTEs verbatim (t{steps} is the final vocabulary state), then the
    per-word row count joined onto the corpus word explode."""
    k = int(steps)
    ctes = _bpe_ctes(steps, source)
    return "WITH " + ",\n".join(ctes) + f""",
vt AS (SELECT w, count(*)::BIGINT AS nt FROM t{k} GROUP BY w),
dw AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text,
                '[ \\t\\n\\x0b\\f\\r]+'), t -> t != '')) AS w
  FROM {source}
),
per AS (
  SELECT dw.doc_id, count(*)::BIGINT AS nw, sum(vt.nt)::BIGINT AS nb
  FROM dw JOIN vt USING (w) GROUP BY dw.doc_id
)
SELECT d.doc_id,
       coalesce(p.nw, 0)::BIGINT AS n_words,
       coalesce(p.nb, 0)::BIGINT AS n_bpe_tokens
FROM {source} d LEFT JOIN per p USING (doc_id)
"""


def _bpe_ctes(steps: int = 3, source: str = "documents") -> list:
    """The unrolled BPE-training CTE chain (wc/t0, then l/top/r/i/o/m/x/t
    per step) — shared by the merge-table and encoder oracles so both
    replay ONE training run; t{steps} is the final vocabulary state."""
    ctes = [f"""wc AS (
  SELECT w, count(*) AS n FROM (
    SELECT unnest(list_filter(string_split_regex(text,
                                                 '[ \t\n\x0b\f\r]+'),
                              t -> t != '')) AS w
    FROM {source})
  GROUP BY 1
)""", """t0 AS (
  SELECT w, n, i AS pos, substring(w, i, 1) AS tok
  FROM (SELECT w, n, unnest(generate_series(1, length(w))) AS i FROM wc)
)"""]
    for k in range(1, int(steps) + 1):
        p = k - 1
        ctes.append(f"""l{k} AS (
  SELECT w, n, pos, tok,
         lead(tok) OVER (PARTITION BY w ORDER BY pos) AS nxt
  FROM t{p}
)""")
        ctes.append(f"""top{k} AS (
  SELECT tok AS a, nxt AS b, sum(n)::BIGINT AS nt
  FROM l{k} WHERE nxt IS NOT NULL
  GROUP BY 1, 2
  ORDER BY nt DESC, a ASC, b ASC
  LIMIT 1
)""")
        ctes.append(f"""r{k} AS (
  SELECT l.*, top{k}.a, top{k}.b,
         sum(CASE WHEN l.tok = top{k}.a THEN 1 ELSE 0 END)
           OVER (PARTITION BY l.w ORDER BY l.pos
                 ROWS UNBOUNDED PRECEDING) AS rn
  FROM l{k} l CROSS JOIN top{k}
)""")
        ctes.append(f"""i{k} AS (
  SELECT *, CASE WHEN tok = a THEN pos - rn END AS isl FROM r{k}
)""")
        ctes.append(f"""o{k} AS (
  SELECT *,
         row_number() OVER (PARTITION BY w, isl ORDER BY pos) - 1 AS off
  FROM i{k}
)""")
        ctes.append(f"""m{k} AS (
  SELECT *,
         CASE WHEN a != b THEN (tok = a AND nxt IS NOT DISTINCT FROM b)
              ELSE (tok = a AND nxt IS NOT DISTINCT FROM a
                    AND off % 2 = 0) END AS m
  FROM o{k}
)""")
        ctes.append(f"""x{k} AS (
  SELECT *,
         coalesce(lag(m) OVER (PARTITION BY w ORDER BY pos), false)
           AS absorbed
  FROM m{k}
)""")
        ctes.append(f"""t{k} AS (
  SELECT w, n,
         row_number() OVER (PARTITION BY w ORDER BY pos) AS pos,
         CASE WHEN m THEN tok || nxt ELSE tok END AS tok
  FROM x{k} WHERE NOT absorbed
)""")
    return ctes


# ---------------------------------------------------------------------------
# per-source token-budget selection (round 11) — "sample N tokens per
# source", the budget-denominated companion of cap_per_source
# ---------------------------------------------------------------------------

def token_budget_per_source(
    docs: DataFrame,
    *,
    budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "budget-v1",
) -> DataFrame:
    """Greedy per-source token-budget fill: walk each source's documents
    in deterministic md5 order and keep a document iff the tokens of the
    documents BEFORE it total under ``budget`` (so the crossing document
    is kept and a source may finish slightly over budget — the standard
    greedy-prefix contract a data-mixture spec like "1B tokens of
    source X" wants; no RNG state, reproducible across engines and
    partition layouts).  Tokens are repo-contract whitespace words.
    Returns (doc_id, source, n_tokens) for the kept rows.

    100 TB shape (same two-phase bound as :func:`cap_per_source`): a
    naive per-source cumulative-sum window sorts EVERY row of a source
    in one task.  Phase 1 histograms TOKEN COUNTS on the first 4 hex
    chars of the md5 order key (the bucket is a string prefix of the
    key, so bucket order prefixes row order) and takes, per source, the
    smallest bucket whose cumulative token sum reaches ``budget``;
    every kept row provably lies in a bucket <= that cutoff (a row in a
    later bucket has exclusive prefix >= the cutoff bucket's cumulative
    sum >= budget), so phase 2 runs the exact exclusive-prefix window
    only over the admitted rows — per-source window input is
    O(budget / avg_tokens) + O(n_source / 65 536), not n_source.  The
    keep set is bit-identical to the single-window form (the oracle
    replays the full window; the gate hash pins it)."""
    from pyspark.sql.window import Window

    key = F.md5(F.concat(F.col(id_col).cast("string"),
                         F.lit(":" + salt)))
    rows = docs.select(
        F.col(id_col), F.col(source_col),
        F.size(_words(F.col(text_col))).cast("bigint").alias("n_tokens"),
        key.alias("__key"),
        F.substring(key, 1, 4).alias("__bkt"))
    hist = rows.groupBy(source_col, "__bkt").agg(
        F.sum("n_tokens").alias("__t"))
    wcum = (Window.partitionBy(source_col).orderBy(F.col("__bkt").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cut = (
        hist.select(F.col(source_col), F.col("__bkt"),
                    F.sum("__t").over(wcum).alias("__cum"))
        .where(F.col("__cum") >= int(budget))
        .groupBy(source_col)
        .agg(F.min("__bkt").alias("__cut"))
    )
    admitted = rows.join(F.broadcast(cut), on=source_col, how="left").where(
        F.col("__cut").isNull() | (F.col("__bkt") <= F.col("__cut")))
    w = (Window.partitionBy(source_col)
         .orderBy(F.col("__key").asc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    return (
        admitted.select(
            F.col(id_col), F.col(source_col), F.col("n_tokens"),
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
            .alias("__pre"))
        .where(F.col("__pre") < int(budget))
        .select(id_col, source_col, "n_tokens")
    )


def token_budget_oracle_sql(
    budget: int,
    salt: str = "budget-v1",
    source: str = "documents",
) -> str:
    """DuckDB twin of :func:`token_budget_per_source` — replays the
    naive single-window form (provably the same keep set; the two-phase
    bucket cutoff is output-neutral by the prefix argument in the
    operator docstring, so the oracle omits it — don't "sync" it in)."""
    return f"""
WITH t AS (
  SELECT doc_id, source,
         COALESCE(len(list_filter(
           string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+'),
           x -> x <> '')), 0)::BIGINT AS n_tokens,
         md5(doc_id::VARCHAR || ':{salt}') AS key
  FROM {source}
),
c AS (
  SELECT doc_id, source, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY key ASC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
  FROM t
)
SELECT doc_id, source, n_tokens FROM c WHERE pre < {int(budget)}
"""


def exploded_word_bigrams(df: DataFrame, tokens, *, keep=(),
                          pair: bool = False) -> DataFrame:
    """Explode adjacent word pairs from a token-array column — the
    whole-stage-codegen shape: ``slice + arrays_zip + explode`` then a
    plain column ``concat_ws``.  The ``transform(sequence(...), i ->
    ...)`` HOF form is INTERPRETED (higher-order functions never enter
    codegen) and measured 20x slower building the same 266k bigrams at
    sf0.1 (4.95 s vs 0.24 s) — the same interpreter trap as the IVF
    cell-assignment fold.  Output rows: ``keep`` columns plus either
    ``__g`` ('w1 w2', ``pair=False``) or ``__w1``/``__w2``
    (``pair=True``).  Docs with under 2 tokens produce no rows (slice
    length ``greatest(size-1, 0)`` — the sequence(1, 0) descending trap
    cannot arise because there is no sequence)."""
    n = F.greatest(F.size(tokens) - 1, F.lit(0))
    pairs = F.arrays_zip(F.slice(tokens, 1, n), F.slice(tokens, 2, n))
    ex = df.select(*[F.col(c) for c in keep],
                   F.explode(pairs).alias("__p"))
    head = [F.col(c) for c in keep]
    if pair:
        return ex.select(*head, F.col("__p.0").alias("__w1"),
                         F.col("__p.1").alias("__w2"))
    return ex.select(
        *head,
        F.concat_ws(" ", F.col("__p.0"), F.col("__p.1")).alias("__g"))


def exploded_word_ngrams(df: DataFrame, tokens, n: int, *, keep=(),
                         with_pos: bool = False,
                         out: str = "__g") -> DataFrame:
    """Explode word ``n``-grams from a token-array column — the
    whole-stage-codegen shape (``slice + arrays_zip + explode`` then a
    plain column ``concat_ws``), generalizing
    :func:`exploded_word_bigrams` to any fixed ``n``.  The
    ``transform(sequence(0, size-n), i -> concat_ws(slice(w, i+1, n)))``
    HOF form this replaces is INTERPRETED (higher-order functions never
    enter codegen) — the bigram measurement was 20x for identical
    output, and the per-index ``slice`` makes the interpreted cost
    O(n·grams) on top.  Docs with fewer than ``n`` tokens produce no
    rows (slice length ``greatest(size-(n-1), 0)``; a NULL token array
    yields NULL slices → explode emits nothing — exactly the rows the
    guarded HOF form produced).  ``with_pos=True`` prepends the 0-based
    gram start position ``__gpos``, identical to the HOF form's array
    index under ``posexplode``."""
    m = F.greatest(F.size(tokens) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(tokens, k + 1, m) for k in range(n)])
    head = [F.col(c) for c in keep]
    if with_pos:
        ex = df.select(*head, F.posexplode(zipped).alias("__gpos", "__p"))
    else:
        ex = df.select(*head, F.explode(zipped).alias("__p"))
    gram = F.concat_ws(" ", *[F.col(f"__p.{k}") for k in range(n)])
    cols = head + ([F.col("__gpos")] if with_pos else []) + [gram.alias(out)]
    return ex.select(*cols)
