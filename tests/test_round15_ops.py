"""Round-15 operator pins: the IVF-backed 3-channel hybrid (r14
verdict item 3 — the standing-deployment shape with no linear-scan
channel)."""

import uuid

import pyspark.sql.functions as F


def _drop_hybrid_tables(spark, tname: str, vname: str) -> None:
    from lsh_spark.sources.formats import drop_table_and_files

    for sfx in ("_postings", "_doclen", "_positions", "_stats", "_meta",
                "_deletes"):
        drop_table_and_files(spark, f"{tname}{sfx}")
    for sfx in ("", "_centroids", "_meta", "_bounds", "_deletes"):
        drop_table_and_files(spark, f"{vname}{sfx}")


def test_hybrid_prox_ivf_full_probe_matches_on_the_fly(spark):
    """hybrid_prox_search_ivf with n_probe = n_lists (every cell probed
    → the vector channel IS the exact scan) equals hybrid_prox_topk_rrf
    bit-for-bit over the sf0.001 gate inputs — the full
    standing-deployment 3-channel fusion (positional text index + IVF
    probe, no raw-corpus channel) pinned against the audited on-the-fly
    form, the ``hybrid_search_indexed`` full-probe precedent lifted to
    three channels."""
    from lsh_spark.operators.ann import build_ivf_index
    from lsh_spark.operators.pipeline_queries import (
        _HPX_CH_K, _HPX_K, _PROXRANK_QUERIES, _PROXRANK_WINDOW, _RRF_C,
        _hpx_queries)
    from lsh_spark.operators.retrieval import (
        build_text_index,
        hybrid_prox_search_ivf,
        hybrid_prox_topk_rrf,
    )
    from lsh_spark.sources.io import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    qt = _hpx_queries(spark)
    qv = emb.where(emb.vec_id < len(_PROXRANK_QUERIES))
    tname = f"hpxtxt_{uuid.uuid4().hex[:8]}"
    vname = f"hpxivf_{uuid.uuid4().hex[:8]}"
    try:
        build_text_index(docs, tname, num_buckets=4, positional=True)
        build_ivf_index(emb, vname, n_lists=4, num_buckets=4)
        fly = {(r.query_id, r.doc_id): (r.rrf_score, r.rank)
               for r in hybrid_prox_topk_rrf(
                   docs, emb, qt, qv, window=_PROXRANK_WINDOW, k=_HPX_K,
                   channel_k=_HPX_CH_K, rrf_c=_RRF_C).collect()}
        got = {(r.query_id, r.doc_id): (r.rrf_score, r.rank)
               for r in hybrid_prox_search_ivf(
                   spark, tname, vname, qt, qv, window=_PROXRANK_WINDOW,
                   k=_HPX_K, channel_k=_HPX_CH_K, rrf_c=_RRF_C,
                   n_probe=4).collect()}
        assert fly and got == fly
    finally:
        _drop_hybrid_tables(spark, tname, vname)


def test_hybrid_prox_ivf_partial_probe_shape(spark):
    """At partial probe (n_probe < n_lists) the fused frame keeps the
    output contract — per-query dense ranks from 1, 6-dp scores, ≤ k
    rows per query — and every (query, doc) the vector channel missed
    still surfaces when a lexical channel ranked it (a doc missing
    from a channel contributes 0, never drops)."""
    from lsh_spark.operators.ann import build_ivf_index
    from lsh_spark.operators.pipeline_queries import (
        _HPX_CH_K, _HPX_K, _PROXRANK_QUERIES, _PROXRANK_WINDOW, _RRF_C,
        _hpx_queries)
    from lsh_spark.operators.retrieval import (
        build_text_index,
        hybrid_prox_search_ivf,
    )
    from lsh_spark.sources.io import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    qt = _hpx_queries(spark)
    qv = emb.where(emb.vec_id < len(_PROXRANK_QUERIES))
    tname = f"hpxtxt_{uuid.uuid4().hex[:8]}"
    vname = f"hpxivf_{uuid.uuid4().hex[:8]}"
    try:
        build_text_index(docs, tname, num_buckets=4, positional=True)
        build_ivf_index(emb, vname, n_lists=4, num_buckets=4)
        rows = hybrid_prox_search_ivf(
            spark, tname, vname, qt, qv, window=_PROXRANK_WINDOW,
            k=_HPX_K, channel_k=_HPX_CH_K, rrf_c=_RRF_C,
            n_probe=1).collect()
        assert rows
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
        for q, qs in by_q.items():
            qs.sort(key=lambda r: r.rank)
            assert [r.rank for r in qs] == list(range(1, len(qs) + 1))
            assert len(qs) <= _HPX_K
            for a, b in zip(qs, qs[1:]):
                assert (a.rrf_score, -a.doc_id) >= (b.rrf_score, -b.doc_id)
            for r in qs:
                assert r.rrf_score == round(r.rrf_score, 6)
    finally:
        _drop_hybrid_tables(spark, tname, vname)
