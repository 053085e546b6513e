"""Unit tests for the training-corpus composition operators
(``operators/training_ops.py``): handcrafted inputs with known answers,
plus the structural guarantees the 100 TB shapes rely on (two-level
cumsum exactness, partition-layout-independent sampling)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from lsh_spark.operators.training_ops import (
    contamination_overlap_df,
    repetition_stats_df,
    shard_assignment_df,
    stratified_sample_df,
)

_DOC_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("text", StringType(), True),
])


def _docs(spark, rows):
    return spark.createDataFrame(rows, _DOC_SCHEMA)


# ---------------------------------------------------------------------------
# repetition_stats
# ---------------------------------------------------------------------------

def test_repetition_known_values(spark):
    df = _docs(spark, [
        (1, "a a a a"),          # pure repeat
        (2, "a b c d"),          # all distinct
        (3, ""),                 # empty
        (4, "x y"),              # fewer than 3 words: no trigrams
    ])
    out = {r.doc_id: r for r in repetition_stats_df(df).collect()}

    r1 = out[1]
    assert r1.n_words == 4
    assert r1.top_word_frac == 1.0
    # trigrams: "a a a" x2 -> 1 - 1/2
    assert r1.dup_trigram_frac == 0.5
    assert r1.word_entropy == 0.0

    r2 = out[2]
    assert r2.top_word_frac == 0.25
    assert r2.dup_trigram_frac == 0.0
    assert r2.word_entropy == round(math.log(4.0), 6)

    r3 = out[3]
    assert (r3.n_words, r3.top_word_frac, r3.dup_trigram_frac,
            r3.word_entropy) == (0, 0.0, 0.0, 0.0)

    assert out[4].dup_trigram_frac == 0.0


def test_repetition_null_text(spark):
    df = _docs(spark, [(1, None)])
    r = repetition_stats_df(df).collect()[0]
    assert (r.n_words, r.word_entropy) == (0, 0.0)


def _rep_mirror(text):
    """Straightforward per-row mirror of the repetition metrics with the
    contract fold order (sorted distinct words, sequential float adds) —
    the independent check for the batch kernel."""
    import re
    from collections import Counter

    toks = ([w for w in re.split("[ \t\n\x0b\x0c\r]+", text) if w]
            if text else [])
    n = len(toks)
    c = Counter(toks)
    ent = 0.0
    for wd in sorted(c):
        f = float(c[wd])
        ent = ent + f * math.log(f)
    tris = [" ".join(toks[i:i + 3]) for i in range(n - 2)] if n >= 3 else []
    return {
        "n_words": n,
        "top_word_frac": (max(c.values()) / n) if n else 0.0,
        "dup_trigram_frac": (1.0 - len(set(tris)) / len(tris)) if tris
        else 0.0,
        "word_entropy": (math.log(n) - ent / n) if n else 0.0,
    }


def test_repetition_long_document_linear_kernel(spark):
    # the HOF form this kernel replaced was O(|distinct|*|tokens|) per
    # row — a >=50k-token document with thousands of distinct words is
    # exactly the shape that made it quadratic; the Arrow kernel must
    # handle it AND agree with the per-row mirror on every metric
    rng_words = [f"w{(i * i * 7919) % 4001}" for i in range(55_000)]
    seps = [" ", "\t", "\n", "\x0b", "\x0c", "\r", "  \t "]
    long_text = "".join(w + seps[i % len(seps)]
                        for i, w in enumerate(rng_words))
    rows = [
        (1, long_text),
        (2, "münchen zürich münchen été zürich"),  # non-ASCII
        (3, "solo"),
        (4, None),
        (5, " \t\n "),
    ]
    out = {r.doc_id: r for r in
           repetition_stats_df(_docs(spark, rows)).collect()}
    for doc_id, text in rows:
        want = _rep_mirror(text)
        got = out[doc_id]
        assert got.n_words == want["n_words"], doc_id
        for k in ("top_word_frac", "dup_trigram_frac", "word_entropy"):
            # df values are rounded to 6dp; the mirror is unrounded
            assert math.isclose(getattr(got, k), want[k], abs_tol=5.1e-7), \
                (doc_id, k, getattr(got, k), want[k])


def test_repetition_kernel_matches_mirror_randomized(spark):
    import random

    rnd = random.Random(123)
    vocab = [f"t{j}" for j in range(40)] + ["é", "ß", "漢"]
    rows = []
    for i in range(60):
        n = rnd.randrange(0, 30)
        rows.append((i, " ".join(rnd.choice(vocab) for _ in range(n))))
    out = {r.doc_id: r for r in
           repetition_stats_df(_docs(spark, rows)).collect()}
    for doc_id, text in rows:
        want = _rep_mirror(text)
        got = out[doc_id]
        assert got.n_words == want["n_words"]
        for k in ("top_word_frac", "dup_trigram_frac", "word_entropy"):
            assert math.isclose(getattr(got, k), want[k], abs_tol=5.1e-7)


# ---------------------------------------------------------------------------
# contamination_overlap
# ---------------------------------------------------------------------------

def test_contamination_planted_overlap(spark):
    bench_text = "b1 b2 b3 b4 b5 b6 b7 b8 b9"      # doc_id 0 -> benchmark
    df = _docs(spark, [
        (0, bench_text),
        # shares the 8-gram b1..b8 (prefix) with the benchmark doc
        (1, "b1 b2 b3 b4 b5 b6 b7 b8 zzz"),
        # no 8-gram overlap
        (2, "c1 c2 c3 c4 c5 c6 c7 c8 c9"),
        # too short for any 8-gram
        (3, "b1 b2 b3"),
    ])
    out = {r.doc_id: r for r in
           contamination_overlap_df(df, bench_mod=50).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_overlap == 1 and out[1].contaminated
    assert out[2].n_overlap == 0 and not out[2].contaminated
    assert out[3].n_ngrams == 0 and out[3].n_overlap == 0


def test_contamination_counts_distinct_ngrams_once(spark):
    # training doc repeats the same contaminated 8-gram twice -> counted 1
    g = "b1 b2 b3 b4 b5 b6 b7 b8"
    df = _docs(spark, [(0, g), (1, f"{g} sep {g}")])
    out = {r.doc_id: r for r in
           contamination_overlap_df(df, bench_mod=50).collect()}
    assert out[1].n_overlap == 1


# ---------------------------------------------------------------------------
# dup_ngram_stats (corpus self-duplication)
# ---------------------------------------------------------------------------

def test_dup_ngram_planted_spans(spark):
    from lsh_spark.operators.training_ops import dup_ngram_stats_df

    shared = "s1 s2 s3 s4 s5 s6 s7 s8"            # one shared 8-gram
    df = _docs(spark, [
        (1, f"{shared} aaa bbb"),                  # carries the shared span
        (2, f"zzz {shared}"),                      # carries it too
        (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),         # fully unique
        (4, "w1 w2 w3"),                           # too short for 8-grams
    ])
    out = {r.doc_id: r for r in dup_ngram_stats_df(df).collect()}
    assert set(out) == {1, 2, 3, 4}
    # doc 1: 3 ngrams total, exactly one (the leading window) duplicated
    assert out[1].n_ngrams == 3 and out[1].n_dup == 1
    assert out[2].n_ngrams == 2 and out[2].n_dup == 1
    assert out[2].dup_frac == 0.5
    assert out[3].n_dup == 0 and not out[3].dup_frac
    assert (out[4].n_ngrams, out[4].n_dup, out[4].dup_frac) == (0, 0, 0.0)


def test_dup_ngram_within_doc_repeat_not_duplicated(spark):
    from lsh_spark.operators.training_ops import dup_ngram_stats_df

    # the same span twice in ONE doc is not cross-doc duplication
    g = "r1 r2 r3 r4 r5 r6 r7 r8"
    df = _docs(spark, [(1, f"{g} mid {g}"), (2, "x1 x2 x3 x4 x5 x6 x7 x8")])
    out = {r.doc_id: r for r in dup_ngram_stats_df(df).collect()}
    assert out[1].n_dup == 0 and out[2].n_dup == 0


def test_contamination_bloom_no_false_negatives(spark):
    # the Bloom variant must flag a SUPERSET of the exact operator's
    # contaminated grams (no false negatives — the safe direction for
    # decontamination), with identical n_ngrams
    from lsh_spark.operators.training_ops import (
        contamination_overlap_bloom_df,
        contamination_overlap_df,
    )

    rows = [(0, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10")]
    rows += [(i, f"b{i} b1 b2 b3 b4 b5 b6 b7 b8 x{i} y{i}")
             for i in range(1, 20)]
    rows += [(i, " ".join(f"u{i}_{j}" for j in range(12)))
             for i in range(20, 40)]
    df = _docs(spark, rows)
    exact = {r.doc_id: r for r in
             contamination_overlap_df(df, bench_mod=50).collect()}
    bloom = {r.doc_id: r for r in
             contamination_overlap_bloom_df(df, bench_mod=50).collect()}
    assert set(exact) == set(bloom)
    for i in exact:
        assert bloom[i].n_ngrams == exact[i].n_ngrams
        assert bloom[i].n_overlap >= exact[i].n_overlap
        if exact[i].contaminated:
            assert bloom[i].contaminated


def test_contamination_bloom_fp_rate_and_determinism(spark):
    from lsh_spark.operators.training_ops import (
        contamination_overlap_bloom_df,
    )

    # benchmark doc + 50 clean docs with fully disjoint vocabulary:
    # flagged grams are pure false positives, bounded by ~fpp
    rows = [(0, " ".join(f"bench{j}" for j in range(40)))]
    rows += [(i, " ".join(f"c{i}_{j}" for j in range(30)))
             for i in range(1, 51)]
    df = _docs(spark, rows)
    out = contamination_overlap_bloom_df(df, bench_mod=50,
                                         fpp=0.01).collect()
    total_grams = sum(r.n_ngrams for r in out)
    fps = sum(r.n_overlap for r in out)
    assert fps <= max(3, 0.05 * total_grams), (fps, total_grams)
    # layout-independent: same result under a different partitioning
    again = {(r.doc_id, r.n_overlap, r.contaminated)
             for r in contamination_overlap_bloom_df(
                 df.repartition(7), bench_mod=50, fpp=0.01).collect()}
    assert again == {(r.doc_id, r.n_overlap, r.contaminated) for r in out}


def test_remove_duplicated_spans_planted(spark):
    from lsh_spark.operators.training_ops import remove_duplicated_spans_df

    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    df = _docs(spark, [
        (1, f"keep1 keep2 {shared} tail1"),
        (2, f"{shared} other stuff here"),
        (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
        (4, "short doc"),
    ])
    out = {r.doc_id: r for r in remove_duplicated_spans_df(df).collect()}
    # the shared 8-gram's tokens vanish; surrounding unique tokens stay
    assert out[1].text == "keep1 keep2 tail1"
    assert (out[1].n_kept, out[1].n_dropped) == (3, 8)
    assert out[2].text == "other stuff here"
    assert out[3].text == "u1 u2 u3 u4 u5 u6 u7 u8 u9"
    assert out[3].n_dropped == 0
    assert out[4].text == "short doc"


def test_remove_duplicated_spans_overlapping_coverage(spark):
    from lsh_spark.operators.training_ops import remove_duplicated_spans_df

    # doc 1 carries a NINE-token run whose two overlapping 8-grams are
    # each duplicated elsewhere; covered positions union, tokens counted
    # once
    run9 = "a1 a2 a3 a4 a5 a6 a7 a8 a9"
    df = _docs(spark, [
        (1, f"x {run9} y"),
        (2, "a1 a2 a3 a4 a5 a6 a7 a8 zz"),
        (3, "zz a2 a3 a4 a5 a6 a7 a8 a9"),
    ])
    out = {r.doc_id: r for r in remove_duplicated_spans_df(df).collect()}
    assert out[1].text == "x y"
    assert out[1].n_dropped == 9


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------

def _strat_docs(spark, n=200):
    rows = [(i, "t", ["en", "es", "zh"][i % 3], "src") for i in range(n)]
    schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
    ])
    return spark.createDataFrame(rows, schema)


def test_stratified_bucket_is_md5_derived(spark):
    # md5('42') first 8 hex = a1d0c6e8 -> 0xa1d0c6e8 % 10000 = 4184
    # (independently computed in DuckDB)
    df = _strat_docs(spark, 100)
    r = (stratified_sample_df(df).where(F.col("doc_id") == 42).collect())
    assert len(r) == 1 and r[0].bucket == 4184


def test_stratified_sample_layout_independent(spark):
    df = _strat_docs(spark)
    a = {r.doc_id for r in stratified_sample_df(df).collect()}
    b = {r.doc_id for r in
         stratified_sample_df(df.repartition(7, "lang")).collect()}
    assert a == b and len(a) > 0
    # zh keeps everything (rate 10000/10000)
    zh = {i for i in range(200) if i % 3 == 2}
    assert zh <= a


def test_stratified_respects_rates(spark):
    out = stratified_sample_df(_strat_docs(spark, 3000)).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, 0)
        by_lang[r.lang] += 1
    assert by_lang["zh"] == 1000
    # binomial(1000, p) stays well inside +-6 sigma of the keep rate
    assert 380 <= by_lang["en"] <= 620
    assert 720 <= by_lang["es"] <= 880


# ---------------------------------------------------------------------------
# shard_assignment
# ---------------------------------------------------------------------------

def test_shard_two_level_matches_global_window(spark):
    # sparse, shuffled doc_ids across several chunk boundaries
    rows = [(i * 37 % 211, "w " * ((i * 13) % 29 + 1)) for i in range(100)]
    rows = [(int(i), t.strip()) for i, t in dict(rows).items()]
    df = _docs(spark, rows)
    got = {(r.doc_id, r.n_tokens, r.shard)
           for r in shard_assignment_df(df, budget=50, chunk=16).collect()}
    naive = (
        df.select(
            "doc_id",
            F.size(F.filter(F.split("text", "\\s+"),
                            lambda t: t != F.lit(""))).cast("bigint")
            .alias("n_tokens"))
        .select(
            "doc_id", "n_tokens",
            ((F.sum("n_tokens").over(
                Window.orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, -1)))
             ).alias("off"))
        .select("doc_id", "n_tokens",
                F.expr("coalesce(off, 0) div 50").alias("shard"))
    )
    want = {(r.doc_id, r.n_tokens, r.shard) for r in naive.collect()}
    assert got == want


def test_shard_auto_chunk_pinned_sizes():
    from lsh_spark.operators.training_ops import _auto_chunk

    # two synthetic corpus sizes pin the derivation: sqrt(1e5) = 316 ->
    # 512 (above the floor), sqrt(1e12) = 1e6 -> 2^20
    assert _auto_chunk(100_000) == 512
    assert _auto_chunk(10**12) == 1 << 20
    # the floor binds for small corpora; degenerate spans stay sane
    assert _auto_chunk(5_000) == 256
    assert _auto_chunk(0) == 256
    assert _auto_chunk(1) == 256


def test_shard_auto_chunk_column_mirror_parity(spark):
    from lsh_spark.operators.training_ops import _auto_chunk, _auto_chunk_col

    spans = [0, 1, 2, 255, 256, 257, 65_536, 65_537, 100_000,
             2**40 - 1, 2**40, 10**12]
    rows = spark.range(len(spans)).select(
        F.col("id"),
        _auto_chunk_col(
            F.element_at(F.array(*[F.lit(s).cast("long") for s in spans]),
                         F.col("id").cast("int") + 1)).alias("c"),
    ).collect()
    got = {int(r.id): r.c for r in rows}
    for i, s in enumerate(spans):
        assert got[i] == _auto_chunk(s), (s, got[i], _auto_chunk(s))


def test_shard_auto_chunk_matches_global_window(spark):
    rows = [(i * 41 % 1009, "w " * ((i * 7) % 23 + 1)) for i in range(150)]
    rows = [(int(i), t.strip()) for i, t in dict(rows).items()]
    df = _docs(spark, rows)
    got = {(r.doc_id, r.n_tokens, r.shard)
           for r in shard_assignment_df(df, budget=40).collect()}
    explicit = {(r.doc_id, r.n_tokens, r.shard)
                for r in shard_assignment_df(df, budget=40,
                                             chunk=32).collect()}
    assert got == explicit and len(got) == len(rows)


def _pack_mirror(rows, max_len, shard_budget):
    """Independent mirror of pack_sequences_df's full two-stage
    definition (shard by running token total, next-fit per shard,
    global dense seq ids)."""
    import re
    from collections import defaultdict

    def ntok(t):
        return len([w for w in re.split("[ \t\n\x0b\x0c\r]+", t) if w]) \
            if t else 0

    toks = sorted((i, ntok(t)) for i, t in rows)
    running, per = 0, []
    for i, n in toks:
        per.append((i, n, running // shard_budget))
        running += n
    by = defaultdict(list)
    for i, n, s in per:
        by[s].append((i, n))
    out, nseqs = {}, {}
    for s in sorted(by):
        seq, fill = 0, 0
        for i, n in by[s]:
            te = min(n, max_len)
            if fill + te > max_len and fill > 0:
                seq, fill = seq + 1, 0
            out[i] = (n, s, seq, fill, n > max_len)
            fill += te
        nseqs[s] = seq + 1
    off, acc = {}, 0
    for s in sorted(nseqs):
        off[s] = acc
        acc += nseqs[s]
    return {i: (n, off[s] + q, p, tr)
            for i, (n, s, q, p, tr) in out.items()}


def test_pack_sequences_matches_mirror(spark):
    from lsh_spark.operators.training_ops import pack_sequences_df

    rows = [(int(i * 29 % 401), "tok " * ((i * 11) % 37 + 1))
            for i in range(80)]
    rows = [(i, t.strip()) for i, t in dict(rows).items()]
    rows.append((999, "big " * 50))        # longer than max_len
    rows.append((998, ""))                 # zero tokens
    df = _docs(spark, rows)
    got = {r.doc_id: (r.n_tokens, r.seq_id, r.seq_pos, r.truncated)
           for r in pack_sequences_df(df, max_len=24,
                                      shard_budget=100).collect()}
    want = _pack_mirror(rows, 24, 100)
    assert got == want


def test_pack_sequences_invariants(spark):
    from collections import defaultdict

    from lsh_spark.operators.training_ops import pack_sequences_df

    rows = [(i, "w " * ((i * 13) % 31 + 1)) for i in range(120)]
    rows = [(i, t.strip()) for i, t in rows]
    out = pack_sequences_df(_docs(spark, rows), max_len=20,
                            shard_budget=90).collect()
    # dense global seq ids
    seq_ids = sorted({r.seq_id for r in out})
    assert seq_ids == list(range(len(seq_ids)))
    # capacity respected: effective tokens per sequence <= max_len
    fill = defaultdict(int)
    for r in out:
        fill[r.seq_id] += min(r.n_tokens, 20)
        assert r.seq_pos + min(r.n_tokens, 20) <= 20
        assert r.truncated == (r.n_tokens > 20)
    assert all(v <= 20 for v in fill.values())


def test_shard_boundaries_monotone(spark):
    df = _docs(spark, [(i, "a b c d") for i in range(50)])
    out = sorted(shard_assignment_df(df, budget=10, chunk=8).collect(),
                 key=lambda r: r.doc_id)
    shards = [r.shard for r in out]
    assert shards == sorted(shards)
    # 4 tokens/doc, budget 10 -> docs 0,1 shard 0 (offsets 0,4), doc 2
    # offset 8 -> shard 0, doc 3 offset 12 -> shard 1
    assert shards[:4] == [0, 0, 0, 1]


def test_span_ops_xxhash64_key_matches_md5(spark):
    """key='xxhash64' (quarter-width shuffle, no oracle twin) must
    return exactly what the md5 default returns on real data — the key
    only names spans, it never changes which spans are hot."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from lsh_spark.operators.training_ops import (
        dup_ngram_stats_df,
        remove_duplicated_spans_df,
    )
    from lsh_spark.sources.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = sorted(tuple(r) for r in dup_ngram_stats_df(docs).collect())
    b = sorted(tuple(r) for r in
               dup_ngram_stats_df(docs, key="xxhash64").collect())
    assert a == b and any(r[2] > 0 for r in a)
    ra = sorted(tuple(r) for r in remove_duplicated_spans_df(docs)
                .collect())
    rb = sorted(tuple(r) for r in
                remove_duplicated_spans_df(docs, key="xxhash64").collect())
    assert ra == rb
    with _pytest.raises(ValueError, match="unknown span key"):
        dup_ngram_stats_df(docs, key="sha1")


def test_unigram_logprob_empty_doc_and_exactness(spark):
    """unigram_logprob_scores building blocks: an empty/whitespace doc
    yields (0, NULL); a uniform two-word corpus scores ln(cw/N) exactly."""
    import math

    from pyspark.sql import functions as F

    from lsh_spark.operators.training_ops import _words

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "   "), (3, "b")],
        "doc_id long, text string")
    dc = (docs.select("doc_id", F.explode(_words(F.col("text")))
                      .alias("w"))
          .groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c")))
    freq = {r.w: r.cw for r in
            dc.groupBy("w").agg(F.sum("c").alias("cw")).collect()}
    assert freq == {"a": 2, "b": 2}
    # doc 1: (2*ln(2/4) + 1*ln(2/4)) / 3 = ln(0.5)
    n = sum(freq.values())
    expected = round((2 * math.log(2 / n) + 1 * math.log(2 / n)) / 3, 6)
    from lsh_spark.operators.pipeline_queries import unigram_logprob_scores
    import os
    # drive the full query shape on a temp view-free path: reuse the
    # internal pipeline by monkey-free direct construction is overkill —
    # assert via the public gate callable on a tmp parquet corpus
    tmp = os.path.join(spark.conf.get("spark.sql.warehouse.dir")
                       .removeprefix("file:"), "unigram_tmp_corpus")
    docs.select("doc_id", "text",
                F.lit("en").alias("lang"), F.lit("t").alias("source"),
                F.length("text").alias("n_chars")).write.mode(
        "overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    out = {r.doc_id: r for r in
           unigram_logprob_scores(spark, tmp).collect()}
    assert (out[2].n_tokens, out[2].avg_logprob) == (0, None)
    assert out[1].n_tokens == 3
    assert out[1].avg_logprob == expected
    assert out[3].avg_logprob == round(math.log(2 / n), 6)


def test_chunk_documents_grid_semantics(spark):
    from lsh_spark.operators.training_ops import chunk_documents_df

    import pytest

    docs = spark.createDataFrame(
        [(1, "a" * 512),          # exactly one chunk
         (2, "b" * 513),          # tail has 1 new char -> 2 chunks
         (3, "c" * 64),           # shorter than overlap -> 1 chunk
         (4, ""),                 # empty -> no chunks
         (5, "d" * 960)],         # 0..512, 448..960 -> 2 full chunks
        "doc_id long, text string")
    out = chunk_documents_df(docs, chunk_chars=512, overlap=64).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0].n_chars == 512
    assert len(by_doc[2]) == 2
    tail = sorted(by_doc[2], key=lambda r: r.chunk_idx)[-1]
    assert tail.n_chars == 513 - 448          # overlap 64 + 1 new char
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_chars == 64
    assert 4 not in by_doc
    assert [r.n_chars for r in sorted(by_doc[5],
                                      key=lambda r: r.chunk_idx)] == [512, 512]
    # consecutive chunks overlap by exactly `overlap` characters
    a, b = sorted(by_doc[5], key=lambda r: r.chunk_idx)
    assert a.chunk_text[-64:] == b.chunk_text[:64]
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents_df(docs, chunk_chars=64, overlap=64)


def test_chunk_documents_reconstruction(spark):
    """Lossless-coverage invariant over a grid of lengths and params:
    chunk 0 plus the non-overlap tail of every later chunk rebuilds the
    original text exactly, for texts spanning empty..multi-chunk and
    including multi-byte characters."""
    from lsh_spark.operators.training_ops import chunk_documents_df

    alphabet = "abcdefghij é中"
    rows = [(n, "".join(alphabet[(n * 13 + i * 7) % len(alphabet)]
                        for i in range(n)))
            for n in (0, 1, 31, 32, 33, 63, 64, 65, 100, 257, 500)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for chunk_chars, overlap in ((32, 8), (64, 0), (40, 39)):
        out = chunk_documents_df(docs, chunk_chars=chunk_chars,
                                 overlap=overlap).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk_text
        for n, text in rows:
            chunks = [t for _, t in sorted(by_doc.get(n, {}).items())]
            if n == 0:
                assert chunks == []
                continue
            rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
            assert rebuilt == text, (n, chunk_chars, overlap)
            # every chunk except the last is full-width; every chunk
            # past the first contributes new characters
            assert all(len(c) == chunk_chars for c in chunks[:-1])
            assert all(len(c) > overlap for c in chunks[1:])


def test_dataset_splits_stability_and_salts(spark):
    from lsh_spark.operators.training_ops import dataset_splits_df

    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    full = {r.doc_id: r.split for r in dataset_splits_df(docs).collect()}
    # growth-stable: the split of an existing doc never changes when the
    # corpus grows (the assignment is a pure function of id + salt)
    small = {r.doc_id: r.split for r in dataset_splits_df(
        docs.where("doc_id < 500")).collect()}
    assert all(full[k] == v for k, v in small.items())
    # fractions approximately respected
    from collections import Counter

    c = Counter(full.values())
    assert 0.03 < c["test"] / 2000 < 0.07
    assert 0.03 < c["val"] / 2000 < 0.07
    # independent salt -> a different (but still deterministic) family
    other = {r.doc_id: r.split for r in dataset_splits_df(
        docs, salt="split-v2").collect()}
    assert other != full
    again = {r.doc_id: r.split for r in dataset_splits_df(
        docs, salt="split-v2").collect()}
    assert other == again


def test_split_expr_matches_dataset_splits(spark):
    """split_expr (the in-plan projection split_leakage_stats relies on)
    must stay byte-identical to dataset_splits_df's split column for
    the same parameters — the round-8 de-broadcast depends on it."""
    from pyspark.sql import functions as F

    from lsh_spark.operators.training_ops import dataset_splits_df, split_expr

    docs = spark.range(0, 5000, 7).select(F.col("id").alias("doc_id"))
    via_df = dataset_splits_df(docs).select("doc_id", "split")
    via_expr = docs.select("doc_id", split_expr(F.col("doc_id")).alias("s"))
    diff = (via_df.join(via_expr, "doc_id")
            .where(F.col("split") != F.col("s")).count())
    assert diff == 0


def test_mixture_sample_monotone_in_weight(spark):
    """Growth-stable mixing contract: raising a source's weight only
    ADDS documents (kept sets are nested), because keep is a fixed
    bucket threshold test per id."""
    from pyspark.sql import functions as F

    from lsh_spark.operators.training_ops import mixture_sample_df

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text"),
        F.lit("s").alias("source"))
    prev: set = set()
    for w in (0.1, 0.3, 0.7, 1.0):
        kept = {r.doc_id for r in
                mixture_sample_df(docs, {"s": w}).collect()}
        assert prev <= kept, f"weight {w} dropped previously-kept docs"
        prev = kept
    assert len(prev) == 500


def test_bpe_train_merges_matches_reference_bpe(spark):
    """The window-algebra greedy merge equals a classic Python BPE
    trainer (greedy left-to-right non-overlapping merges, ties count
    desc then pair asc) — including the a == b run-parity case."""
    from lsh_spark.operators.training_ops import bpe_train_merges

    texts = ["aaab aa ab banana", "banana aaab aaaa", "ab ab aa aaab"]

    def ref_merges(texts, steps):
        from collections import Counter
        wc = Counter(w for t in texts for w in t.split())
        vocab = {w: list(w) for w in wc}
        merges = []
        for _ in range(steps):
            pc = Counter()
            for w, toks in vocab.items():
                for i in range(len(toks) - 1):
                    pc[(toks[i], toks[i + 1])] += wc[w]
            if not pc:
                break
            (a, b), nt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((a, b, nt))
            for w, toks in vocab.items():
                out, i = [], 0
                while i < len(toks):
                    if (i + 1 < len(toks) and toks[i] == a
                            and toks[i + 1] == b):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                vocab[w] = out
        return merges

    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")
    got = sorted((r.step, r.pair_a, r.pair_b, r.n_total)
                 for r in bpe_train_merges(docs, steps=4).collect())
    want = [(k + 1, a, b, nt)
            for k, (a, b, nt) in enumerate(ref_merges(texts, 4))]
    assert got == sorted(want)


def test_leakfree_splits_keep_near_dups_together(spark):
    """Hashing the component label puts every member of a near-dup
    cluster in the same split — no pair can straddle the train/test
    boundary (the leakage dataset_splits allows by hashing doc ids)."""
    from lsh_spark.operators.similarity_join import lsh_dedup_clusters
    from lsh_spark.operators.training_ops import split_expr
    from pyspark.sql import functions as F

    base = "the quick brown fox jumps over the lazy dog tonight again"
    docs = spark.createDataFrame(
        [(i, base + ("" if i % 2 == 0 else "!")) for i in range(10)]
        + [(100 + i, f"completely unrelated document number {i} "
                     f"with its own words") for i in range(3)],
        "doc_id long, text string")
    out = (
        lsh_dedup_clusters(docs, "text", id_col="doc_id",
                           band_count=8, band_size=2, seed=123)
        .select("doc_id", "cluster_id",
                split_expr(F.col("cluster_id")).alias("split"))
        .collect())
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    # every cluster maps to exactly one split; the 10 planted dups share
    # one cluster and therefore one split
    assert all(len(s) == 1 for s in by_cluster.values())
    big = [c for c, _ in by_cluster.items()
           if sum(1 for r in out if r.cluster_id == c) >= 10]
    assert big, by_cluster
