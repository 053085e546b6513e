"""Round-14 units: the banded proximity position-pair prefilter
(output-neutral — r13 verdict's one scale flag) and the PPR node-set
fix (|S| and the rank frame keyed off src ∪ dst, r13 advice)."""

from __future__ import annotations

import random


def _naive_pairs(toks: list[str], a: str, b: str, window: int):
    """Reference pair semantics: every (pos_a, pos_b) occurrence pair
    with |pa − pb| ≤ window (ordered pa-side × pb-side, the operator's
    pa × pb convention)."""
    pa = [i for i, t in enumerate(toks) if t == a]
    pb = [i for i, t in enumerate(toks) if t == b]
    gaps = [abs(x - y) for x in pa for y in pb if abs(x - y) <= window]
    return (len(gaps), min(gaps)) if gaps else None


def test_proximity_banding_parity_randomized(spark):
    """The banded __bk prefilter must be invisible: n_pairs and
    min_gap bit-equal to the naive tf_a × tf_b product on a seeded
    random corpus, across windows that exercise same-bucket,
    adjacent-bucket, and boundary (gap == window) pairs — and exact
    pair COUNTS pin the matches-exactly-once property (a pair meeting
    two probe keys would double-count)."""
    from lsh_spark.operators.retrieval import proximity_search

    rng = random.Random(14)
    docs = []
    for d in range(40):
        n = rng.randint(1, 48)
        toks = [rng.choice(["alpha", "beta", "x", "alpha", "beta"])
                for _ in range(n)]
        docs.append((d, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    q = spark.createDataFrame([(0, "alpha", "beta")],
                              "query_id long, term_a string, term_b string")
    for window in (0, 1, 2, 3, 8, 47):
        got = {r.doc_id: (r.n_pairs, r.min_gap)
               for r in proximity_search(df, q, window=window).collect()}
        want = {}
        for d, text in docs:
            ref = _naive_pairs(text.split(), "alpha", "beta", window)
            if ref is not None:
                want[d] = ref
        assert got == want, f"window={window}"


def test_proximity_banding_identical_terms(spark):
    """a == b queries pair every occurrence with every occurrence
    (including self-pairs, gap 0) — the banding must preserve the
    convention exactly."""
    from lsh_spark.operators.retrieval import proximity_search

    docs = spark.createDataFrame(
        [(1, "a x x a x x x a")], "doc_id long, text string")
    q = spark.createDataFrame([(0, "a", "a")],
                              "query_id long, term_a string, term_b string")
    got = {r.doc_id: (r.n_pairs, r.min_gap)
           for r in proximity_search(docs, q, window=3).collect()}
    # positions 0, 3, 7: self-pairs (3, gap 0) + (0,3)/(3,0) gap 3;
    # (3,7)/(7,3) gap 4 > 3 excluded
    assert got == {1: (5, 0)}


def test_proximity_rank_banding_pair_term_exact(spark):
    """The rank tail's banded pair stage: min_gap per (t1, t2) crosses
    a bucket boundary (positions 7 and 9, window 8 → buckets 0 and 9)
    and must still be found; the proximity contribution is verified by
    the score delta between prox_weight=1 and prox_weight=0."""
    from lsh_spark.operators.retrieval import proximity_rank

    docs = spark.createDataFrame(
        [(1, "x x x x x x x sort x merge x x x x x x x x x x join")],
        "doc_id long, text string")
    q = spark.createDataFrame([(0, "sort merge join")],
                              "query_id long, query_text string")
    with_prox = proximity_rank(docs, q, window=8, k=5).collect()[0]
    without = proximity_rank(docs, q, window=8, k=5,
                             prox_weight=0.0).collect()[0]
    # qualifying pairs at window 8: (merge=9, sort=7) gap 2;
    # (merge=9, join=20) gap 11 > 8; (join=20, sort=7) gap 13 > 8.
    # Fold over sorted (t1, t2): only (merge, sort) contributes 1/3
    # (each score is independently 6dp-rounded, so the delta carries
    # up to 2 ulp at 6dp).
    assert abs((with_prox.score - without.score) - 1.0 / 3.0) <= 2e-6


def test_ppr_dst_only_seed_counts_and_ranks(spark):
    """r14 advice fix: the node set is distinct(src) ∪ distinct(dst).
    A seed that appears only as a DESTINATION is a real node: it must
    count toward |S| AND keep a rank row drawing restart mass (the old
    out-degree-keyed |S| either over-paid total mass or, when NO seed
    had out-edges, divided by zero).  Hand-unrolled, iters=1,
    d = 17/20: edges 1→2, 2→1, 1→3, seeds {2, 3} (3 is dst-only)."""
    from lsh_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame([(1, 2), (2, 1), (1, 3)],
                                  "src long, dst long")
    seeds = spark.createDataFrame([(2,), (3,)], "node long")
    got = {r.node: r.rank
           for r in personalized_pagerank(edges, seeds, iters=1).collect()}
    # r0: node2 = node3 = halfup(1e6/2) = 500000, node1 = 0
    # contribs: 2→1 carries halfup(500000/1) = 500000; 1→{2,3} carry 0
    # restart = halfup(0.15e6/2) = 75000 per seed
    # node1 = 0 + halfup(0.85 · 500000) = 425000
    assert got == {1: 0.425, 2: 0.075, 3: 0.075}


def test_ppr_no_out_degree_seed_no_divide_by_zero(spark):
    """Seeds whose nodes ALL lack out-edges: |S| must still count them
    (they are in the node set via dst) — the old deg-keyed |S| was 0
    here and the ANSI integer DIV raised DIVIDE_BY_ZERO."""
    from lsh_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    seeds = spark.createDataFrame([(3,)], "node long")
    got = {r.node: r.rank
           for r in personalized_pagerank(edges, seeds, iters=2).collect()}
    # node 3 is dst-only: it keeps its restart mass every iteration and
    # receives halfup(0.85 · rank(2)) from node 2.
    assert set(got) == {1, 2, 3}
    assert got[3] > 0.0
    # total mass never exceeds 1 (dangling node 3 drops its non-restart
    # mass by design; the old bug's signature was a sum > 1).
    assert sum(got.values()) <= 1.0 + 1e-9


def test_ppr_src_only_seed_keeps_rank_row(spark):
    """A seed with no IN-edges must keep its rank row every iteration
    (the rank frame is keyed off the node set, not off contribs):
    restart mass alone, never absence."""
    from lsh_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 2)],
                                  "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.rank
           for r in personalized_pagerank(edges, seeds, iters=3).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] == 0.15  # restart share only: halfup(0.15e6/1)


def test_hybrid_prox_rrf_compose_parity(spark):
    """The 3-channel fusion must equal the RRF of its three audited
    channels computed independently: lexical (bm25_topk), vector
    (cosine_topk), proximity (proximity_rank), fused
    lexical→vector→proximity with half-up 6-dp rounding and doc_id
    ties — replayed here in Python over the sf0.001 gate inputs."""
    from decimal import ROUND_HALF_UP, Decimal

    from lsh_spark.operators.ann import cosine_topk
    from lsh_spark.operators.pipeline_queries import (
        _HPX_CH_K, _HPX_K, _PROXRANK_QUERIES, _PROXRANK_WINDOW, _RRF_C,
        _hpx_queries, hybrid_prox_search_rrf)
    from lsh_spark.operators.retrieval import bm25_topk, proximity_rank
    from lsh_spark.sources.io import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    qt = _hpx_queries(spark)
    qv = emb.where(emb.vec_id < len(_PROXRANK_QUERIES))
    lex = {(r.query_id, r.doc_id): r.rank
           for r in bm25_topk(docs, qt, k=_HPX_CH_K).collect()}
    vec = {(r.query_id, r.neighbor_id): r.rank
           for r in cosine_topk(emb, qv, k=_HPX_CH_K).collect()}
    prox = {(r.query_id, r.doc_id): r.rank
            for r in proximity_rank(docs, qt, window=_PROXRANK_WINDOW,
                                    k=_HPX_CH_K).collect()}
    fused = {}
    for key in set(lex) | set(vec) | set(prox):
        s = sum(1.0 / (_RRF_C + d[key]) for d in (lex, vec, prox)
                if key in d)
        fused[key] = float(Decimal(repr(s)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP))
    want = {}
    by_q = {}
    for (q, d), s in fused.items():
        by_q.setdefault(q, []).append((-s, d))
    for q, rows in by_q.items():
        for i, (ns, d) in enumerate(sorted(rows)[:_HPX_K], start=1):
            want[(q, d)] = (-ns, i)
    got = {(r.query_id, r.doc_id): (r.rrf_score, r.rank)
           for r in hybrid_prox_search_rrf(spark, sf).collect()}
    assert got == want


def test_hybrid_prox_indexed_matches_on_the_fly(spark):
    """The indexed 3-channel form (postings + positions off one
    positional text index) must reproduce the on-the-fly fusion exactly
    — the proximity_rank_indexed contract lifted to the fused score."""
    from lsh_spark.operators.pipeline_queries import (
        _HPX_CH_K, _HPX_K, _PROXRANK_QUERIES, _PROXRANK_WINDOW, _RRF_C,
        _hpx_queries, hybrid_prox_search_rrf)
    from lsh_spark.operators.retrieval import hybrid_prox_topk_rrf
    from lsh_spark.sources.io import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    qv = emb.where(emb.vec_id < len(_PROXRANK_QUERIES))
    fly = {(r.query_id, r.doc_id): (r.rrf_score, r.rank)
           for r in hybrid_prox_topk_rrf(
               docs, emb, _hpx_queries(spark), qv,
               window=_PROXRANK_WINDOW, k=_HPX_K, channel_k=_HPX_CH_K,
               rrf_c=_RRF_C).collect()}
    idx = {(r.query_id, r.doc_id): (r.rrf_score, r.rank)
           for r in hybrid_prox_search_rrf(spark, sf).collect()}
    assert fly and fly == idx


from hypothesis import given, settings
from hypothesis import strategies as st


def _bucket(p: int, w: int) -> int:
    return p - p % (w + 1)


def _probes(p: int, w: int) -> list[int]:
    b = _bucket(p, w)
    return [b - (w + 1), b, b + (w + 1)]


@settings(max_examples=300, deadline=None)
@given(pa=st.integers(0, 1 << 20), pb=st.integers(0, 1 << 20),
       window=st.integers(0, 64))
def test_banding_bucket_math_property(pa, pb, window):
    """The two claims the banded prefilter rests on, for ALL position
    pairs: (completeness) every |pa − pb| ≤ window pair meets on some
    probe key; (exactly-once) a position pair meets on AT MOST one
    probe key — the three probe keys are distinct, so the equi-join
    never double-counts.  The Spark randomized-corpus test pins the
    implementation against this same semantics end-to-end."""
    matches = sum(1 for k in _probes(pb, window)
                  if k == _bucket(pa, window))
    assert matches <= 1
    if abs(pa - pb) <= window:
        assert matches == 1


@settings(max_examples=100, deadline=None)
@given(pas=st.lists(st.integers(0, 200), min_size=0, max_size=40),
       pbs=st.lists(st.integers(0, 200), min_size=0, max_size=40),
       window=st.integers(0, 16))
def test_banding_pair_count_property(pas, pbs, window):
    """Pair-count equality on arbitrary position multisets: the banded
    equi-join (bucket == probe, then exact gap filter) yields exactly
    the naive product's qualifying pairs — duplicates in the position
    lists (repeated tf) included."""
    naive = sum(1 for a in pas for b in pbs if abs(a - b) <= window)
    banded = sum(1 for a in pas for b in pbs
                 for k in _probes(b, window)
                 if k == _bucket(a, window) and abs(a - b) <= window)
    assert banded == naive
