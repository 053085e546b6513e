"""Round-12 operator units: the progressive-JPEG gate corpus (exact
block-constant DCT round-trip, strict decode-stats kernel), grouped-HLL
distinct users, and the language-ID confusion matrix."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_progressive_corpus_decodes_exactly(spark):
    """The gate corpus contract: 8x8-block-constant pixels + all-ones
    quant make the progressive encode/decode round-trip EXACT, so the
    SQL oracle may replay pixels closed-form without a codec."""
    from lsh_spark.multimodal.jpeg import decode_jpeg
    from lsh_spark.multimodal.media import (
        synthesize_progressive_jpegs_from_documents)

    docs = spark.createDataFrame([(d,) for d in range(12)],
                                 "doc_id long")
    for r in synthesize_progressive_jpegs_from_documents(docs).collect():
        d = r.media_id
        bw, bh = 2 + d % 3, 1 + (d // 3) % 3
        i = np.arange(bw, dtype=np.int64)[None, :]
        j = np.arange(bh, dtype=np.int64)[:, None]
        blocks = ((d * 11 + 29 * i + 47 * j) % 256).astype(np.uint8)
        gray = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
        want = np.repeat(gray[:, :, None], 3, axis=2)
        content = bytes(r.content)
        # the stream is genuinely progressive (SOF2 marker present)
        assert b"\xff\xc2" in content and b"\xff\xc0" not in content
        meta = decode_jpeg(content)
        assert np.array_equal(meta["_pixels"], want), f"doc {d}"


def test_decoded_image_stats_strict_raises(spark):
    """decoded_image_stats is the STRICT kernel (no stub fallback):
    foreign bytes raise instead of yielding digest-derived fakes."""
    from lsh_spark.multimodal.media import (MEDIA_SCHEMA,
                                            decoded_image_stats)

    bad = spark.createDataFrame(
        [(1, "image", bytearray(b"not an image"), "image/jpeg")],
        MEDIA_SCHEMA)
    with pytest.raises(Exception, match="undecodable"):
        decoded_image_stats(bad).collect()


def test_hll_users_tracks_exact_distinct(spark):
    """Grouped HLL on a corpus WELL ABOVE the raw estimator's validity
    floor (n >> 2.5 m = 640): estimate within the 3-sigma band of the
    exact count carried in the same aggregate."""
    from lsh_spark.operators.pipeline_queries import hll_distinct_report

    df = spark.range(60_000).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        # ~20k distinct items per group, disjoint across groups
        F.col("id").alias("item"))
    rows = hll_distinct_report(df, "grp", "item",
                               exact_evidence=True).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.exact_distinct == 20_000
        # sigma = 1.04/sqrt(256) = 6.5%; allow 3 sigma
        rel = abs(r.est_distinct - r.exact_distinct) / r.exact_distinct
        assert rel < 0.20, (r.grp, r.est_distinct, r.exact_distinct)
    # the production default (exact_evidence=False) reports the SAME
    # estimate/register columns with no exact-distinct aggregate at all
    est = {r.grp: (r.n_registers, r.sum_rho, r.est_distinct)
           for r in hll_distinct_report(df, "grp", "item").collect()}
    assert est == {r.grp: (r.n_registers, r.sum_rho, r.est_distinct)
                   for r in rows}
    cols = hll_distinct_report(df, "grp", "item").columns
    assert "exact_distinct" not in cols


def test_hll_users_small_range_floor(spark):
    """The gate's documented small-range behavior: far below 2.5·m
    distinct items the RAW estimate sits near the alpha*m floor (no
    ln-based linear counting cross-engine) while exact_distinct stays
    correct — pinned so nobody 'fixes' the estimator and silently
    breaks the gate hash."""
    from lsh_spark.operators.pipeline_queries import (
        _HLL_M, hll_users_per_event_type)

    rows = hll_users_per_event_type(
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 < r.exact_distinct < _HLL_M
        # raw floor: alpha*m ~ 184 at m=256; estimate lands near it
        assert 100.0 < r.est_distinct < 300.0


def test_langid_confusion_diagonal_and_totals(spark):
    """The confusion matrix must re-aggregate lang_id_predictions
    exactly: cell counts sum to the corpus size and the diagonal
    dominates (the identifier is trained on the corpus itself)."""
    from lsh_spark.operators.pipeline_queries import (
        langid_confusion_matrix)
    from lsh_spark.sources.io import load_table

    sf = "/root/testdata/sf0.001"
    cells = langid_confusion_matrix(spark, sf).collect()
    n_docs = load_table(spark, sf, "documents").count()
    assert sum(c.n_docs for c in cells) == n_docs
    # exact re-aggregation parity with the prediction-level operator
    from lsh_spark.operators.langid import char_ngram_lang_id
    from lsh_spark.operators.pipeline_queries import (_LANGID_N,
                                                      _LANGID_PROFILE)

    pred = char_ngram_lang_id(
        load_table(spark, sf, "documents"),
        ngram_width=_LANGID_N, profile_size=_LANGID_PROFILE)
    want = {(r.lang, r.predicted_lang): (r.cnt, r.sc)
            for r in pred.groupBy("lang", "predicted_lang")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum("score").alias("sc")).collect()}
    got = {(c.true_lang, c.predicted_lang): (c.n_docs, c.total_score)
           for c in cells}
    assert got == want
    # the self-trained identifier must beat chance on the diagonal
    langs = {c.true_lang for c in cells}
    diag = sum(c.n_docs for c in cells
               if c.predicted_lang == c.true_lang)
    assert diag * len(langs) > n_docs


def test_proximity_search_window_semantics(spark):
    """Hand-built corpus: gap arithmetic, window boundary inclusivity,
    pair counting with repeated terms, and the order-free contract."""
    from lsh_spark.operators.retrieval import proximity_search

    docs = spark.createDataFrame(
        [(1, "alpha x x beta"),          # gap 3
         (2, "beta alpha"),              # gap 1, order-free
         (3, "alpha x beta x alpha"),    # gaps 2 and 2 -> 2 pairs
         (4, "alpha only here"),         # term_b absent
         (5, "x x alpha beta x")],       # gap 1
        "doc_id long, text string")
    q = spark.createDataFrame([(0, "alpha", "beta")],
                              "query_id long, term_a string, term_b string")
    got = {r.doc_id: (r.n_pairs, r.min_gap)
           for r in proximity_search(docs, q, window=2).collect()}
    assert got == {2: (1, 1), 3: (2, 2), 5: (1, 1)}
    # window 3 admits doc 1's gap-3 pair (boundary is inclusive)
    got3 = {r.doc_id: (r.n_pairs, r.min_gap)
            for r in proximity_search(docs, q, window=3).collect()}
    assert got3[1] == (1, 3)


def test_proximity_indexed_matches_on_the_fly(spark):
    """The indexed probe must reproduce the on-the-fly result exactly
    (same positional semantics through the persisted table)."""
    from lsh_spark.operators.pipeline_queries import (
        proximity_search_docs, proximity_search_indexed_docs)

    sf = "/root/testdata/sf0.001"
    fly = {(r.query_id, r.doc_id): (r.n_pairs, r.min_gap)
           for r in proximity_search_docs(spark, sf).collect()}
    idx = {(r.query_id, r.doc_id): (r.n_pairs, r.min_gap)
           for r in proximity_search_indexed_docs(spark, sf).collect()}
    assert fly and fly == idx


def test_hll_streaming_matches_batch(spark):
    """The streaming sketch (per-batch register maxima, merged by max
    at read-back) must equal the batch aggregate row-for-row — the
    mergeability property that makes the sketch deployable."""
    from lsh_spark.operators.pipeline_queries import (
        hll_users_per_event_type)
    from lsh_spark.streaming.events import hll_users_streaming

    sf = "/root/testdata/sf0.001"
    batch = {r.event_type: tuple(r)[1:]
             for r in hll_users_per_event_type(spark, sf).collect()}
    stream = {r.event_type: tuple(r)[1:]
              for r in hll_users_streaming(spark, sf).collect()}
    assert batch and batch == stream


def test_personalized_pagerank_seed_locality(spark):
    """PPR semantics on a hand graph: restart mass stays in the seed's
    connected component (the other component reports rank 0.0, not
    absence), seeds outrank their neighbors, and a non-rational damping
    is rejected (the integer micro-unit contract)."""
    import pytest as _pytest

    from lsh_spark.operators.graph import personalized_pagerank

    # component A: 1-2-3 path; component B: 10-11
    und = [(1, 2), (2, 3), (10, 11)]
    rows = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    edges = spark.createDataFrame(rows, "src long, dst long")
    seeds = spark.createDataFrame([(2,)], "node long")
    got = {r.node: r.rank
           for r in personalized_pagerank(edges, seeds, iters=3).collect()}
    # hand-unrolled integer micro-unit arithmetic (seed mass oscillates
    # along the path — neighbors hold more mass than the seed at odd
    # iteration counts; that IS power iteration, pinned exactly):
    # r1 = {2: 150000, 1/3: 425000}; r2 = {2: 872500, 1/3: 63750};
    # r3 = {2: 258375, 1/3: 370813}
    assert got == {1: 0.370813, 2: 0.258375, 3: 0.370813,
                   10: 0.0, 11: 0.0}
    with _pytest.raises(ValueError, match="rational"):
        personalized_pagerank(edges, seeds, damping=0.8500000001)


def test_hits_star_graph_exact(spark):
    """HITS on the star K1,3 (center 0, leaves 1-3): the center is the
    sole authority, leaves are the hubs; micro-unit half-steps
    hand-unrolled — a(center)=1.0, a(leaf)=333333/1e6,
    h(leaf)=1.0, h(center)=999999/1e6 at the fixed point."""
    from lsh_spark.operators.graph import hits_scores

    und = [(0, 1), (0, 2), (0, 3)]
    rows = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {r.node: (r.hub, r.authority)
           for r in hits_scores(edges, iters=3).collect()}
    assert got[0] == (0.999999, 1.0)
    for leaf in (1, 2, 3):
        assert got[leaf] == (1.0, 0.333333)


def test_lpa_two_cliques_converge_to_min_ids(spark):
    """LPA on two disconnected triangles: each converges to its
    minimum node id (hand-unrolled: after the tie-to-smallest round
    the min label floods the clique); communities never leak across
    components."""
    from lsh_spark.operators.graph import lpa_communities

    und = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    rows = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {r.node: r.community
           for r in lpa_communities(edges, iters=4).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_ppr_out_of_graph_seed_excluded(spark):
    """r13 advice fix: a seed id absent from the graph's node set must
    not dilute the restart share — |S| counts only seeds that intersect
    the node set, so PPR({2, 999}) == PPR({2}) exactly (with the old
    distinct-seed count, node 999 would silently eat half the restart
    mass and total rank would drop below 1)."""
    from lsh_spark.operators.graph import personalized_pagerank

    und = [(1, 2), (2, 3), (10, 11)]
    rows = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    edges = spark.createDataFrame(rows, "src long, dst long")
    in_graph = spark.createDataFrame([(2,)], "node long")
    with_ghost = spark.createDataFrame([(2,), (999,)], "node long")
    want = {r.node: r.rank
            for r in personalized_pagerank(edges, in_graph,
                                           iters=3).collect()}
    got = {r.node: r.rank
           for r in personalized_pagerank(edges, with_ghost,
                                          iters=3).collect()}
    assert got == want
    assert got[2] == 0.258375  # the hand-unrolled value, undiluted


def test_hits_zero_iters_rejected(spark):
    """r13 advice fix: iters=0 has no authority half-step to report —
    a meaningful ValueError at entry, not an AttributeError later."""
    import pytest as _pytest

    from lsh_spark.operators.graph import hits_scores

    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    with _pytest.raises(ValueError, match="iters must be >= 1"):
        hits_scores(edges, iters=0)
