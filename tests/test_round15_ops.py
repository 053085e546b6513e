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


def test_bitmap_intersect_counts_matches_radix_merge():
    """Kernel parity: the packed-bitmap popcount path must be
    integer-identical to sorted_intersect_counts on every shape —
    including empty sets, single-side-only values, and a W=0 (empty
    common universe) pack."""
    import numpy as np

    from lsh_spark._core.batch import (
        bitmap_intersect_counts,
        sorted_intersect_counts,
    )
    from lsh_spark.operators.similarity_join import _bitmap_pack_side

    rng = np.random.default_rng(1234)
    n = 300
    mk = lambda lo, hi: [
        np.unique(rng.integers(lo, hi, rng.integers(0, 70),
                               dtype=np.int32)) for _ in range(n)]

    def flatten(sets):
        lens = np.array([len(s) for s in sets], dtype=np.int64)
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        flat = (np.concatenate(sets).astype(np.int32) if lens.sum()
                else np.empty(0, dtype=np.int32))
        return flat, off, lens

    def keys(flat, off, idx, lens, rows):
        tot = int(lens.sum())
        outs = np.cumsum(lens) - lens
        w = np.arange(tot, dtype=np.int64) - np.repeat(outs, lens)
        vals = flat[np.repeat(off[idx], lens) + w]
        return (np.repeat(rows, lens) << 32) | (
            vals.astype(np.int64) & 0xFFFFFFFF)

    # negative values exercise the signed-int32 storage contract;
    # side B's [−50, 400) range gives single-side-only values
    fa, oa, la_all = flatten(mk(-150, 150))
    fb, ob, lb_all = flatten(mk(-50, 400))
    common = np.intersect1d(np.unique(fa), np.unique(fb),
                            assume_unique=True)
    n_words = (common.shape[0] + 63) // 64
    bma = _bitmap_pack_side(fa, oa, common, n_words)
    bmb = _bitmap_pack_side(fb, ob, common, n_words)
    npair = 4000
    ia = rng.integers(0, n, npair)
    ib = rng.integers(0, n, npair)
    rows = np.arange(npair, dtype=np.int64)
    ref = sorted_intersect_counts(
        keys(fa, oa, ia, la_all[ia], rows),
        keys(fb, ob, ib, lb_all[ib], rows), npair)
    got = bitmap_intersect_counts(bma, bmb, ia, ib)
    assert (ref == got).all()

    # W=0 pack (disjoint universes) counts zero everywhere
    z = _bitmap_pack_side(fa, oa, np.empty(0, dtype=np.int32), 0)
    assert (bitmap_intersect_counts(z, z, ia[:7], ib[:7]) == 0).all()


def test_broadcast_verify_bitmap_toggle_bit_equal(spark):
    """End-to-end: the size-gated bitmap fast path must yield
    bit-identical pair frames to the radix-merge path for both the
    jaccard self-join and the (no-size-prune) containment miner."""
    import lsh_spark.operators.similarity_join as sj
    from lsh_spark.operators.similarity_join import (
        lsh_containment_pairs,
        lsh_self_dedup_pairs,
    )
    from lsh_spark.plans.cache import release_intermediates
    from lsh_spark.sources.io import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")

    def run():
        jac = sorted(
            tuple(r) for r in lsh_self_dedup_pairs(
                docs, "text", id_col="doc_id", ngram_width=3,
                band_count=6, band_size=6, seed=123,
                threshold=0.6).collect())
        release_intermediates()
        cont = sorted(
            tuple(r) for r in lsh_containment_pairs(
                docs, "text", id_col="doc_id",
                threshold=0.7).collect())
        release_intermediates()
        return jac, cont

    saved = sj._USE_BITMAP_VERIFY
    try:
        sj._USE_BITMAP_VERIFY = True
        jac_on, cont_on = run()
        sj._USE_BITMAP_VERIFY = False
        jac_off, cont_off = run()
    finally:
        sj._USE_BITMAP_VERIFY = saved
    assert jac_on and cont_on
    assert jac_on == jac_off
    assert cont_on == cont_off


def test_sq8_sql_text_plans_identical(spark):
    """The SQL-text sq8 quant/dequant/bounds builders must produce
    CANONICALLY IDENTICAL optimized plans to the Column-API spec forms
    — same Catalyst ops, same literals, same double op order."""
    import pyspark.sql.functions as F

    from lsh_spark.operators.ann import (
        _sq8_dequant,
        _sq8_dequant_sql,
        _sq8_quant,
        _sq8_quant_sql,
        sq8_bounds,
    )
    from lsh_spark.sources.io import load_table

    corpus = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = 8
    c = corpus.select(F.col("embedding").cast("array<double>").alias("__v"))
    withb = c.crossJoin(F.broadcast(sq8_bounds(corpus, vec_col="embedding",
                                               dim=dim)))

    def err_col(i):  # the pre-round-15 Column form, verbatim
        x = F.get("__v", i)
        return F.round(
            F.abs(x - _sq8_dequant(_sq8_quant(x, F.lit(i)), F.lit(i))), 6)

    def err_sql(i):
        x = f"get(__v, {i})"
        return (f"round(abs({x} - "
                f"{_sq8_dequant_sql(_sq8_quant_sql(x, i), i)}), 6)")

    old = withb.select(F.posexplode(
        F.array(*[err_col(i) for i in range(dim)])).alias("dim_idx", "__e"))
    new = withb.select(F.posexplode(F.expr(
        "array(" + ", ".join(err_sql(i) for i in range(dim)) + ")"))
        .alias("dim_idx", "__e"))
    po = old._jdf.queryExecution().optimizedPlan().canonicalized().toString()
    pn = new._jdf.queryExecution().optimizedPlan().canonicalized().toString()
    assert po == pn

    # the bounds aggregate itself: expr-array vs Column-array
    old_b = corpus.select(
        F.col("embedding").cast("array<double>").alias("__v")).agg(
        F.array(*[F.min(F.get("__v", i)) for i in range(dim)]).alias("__mn"),
        F.array(*[F.max(F.get("__v", i)) for i in range(dim)]).alias("__mx"))
    new_b = sq8_bounds(corpus, vec_col="embedding", dim=dim)
    po = old_b._jdf.queryExecution().optimizedPlan().canonicalized().toString()
    pn = new_b._jdf.queryExecution().optimizedPlan().canonicalized().toString()
    assert po == pn


def test_pq_lut_sql_text_plans_identical(spark):
    """The SQL-text PQ LUT / codebook-row builders must be canonically
    plan-identical to the per-literal Column forms (float literals
    round-trip via repr; int literals keep F.lit's int32/int64 split)."""
    import pyspark.sql.functions as F

    from lsh_spark.operators.ann import (
        _codebook_rows_df,
        _pq_query_luts,
        _sqdist_mirror,
        _train_pq_books,
    )
    from lsh_spark.sources.io import load_table

    corpus = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    books = _train_pq_books(corpus, vec_col="embedding", id_col="vec_id",
                            m=2, width=32, n_codes=4, n_iters=1)
    books_np = [b.value for b in books]
    width = 32
    new = _pq_query_luts(corpus.limit(3), books_np, vec_col="embedding",
                         id_col="vec_id", width=width)

    def old_luts(queries):  # the pre-round-15 Column form, verbatim
        qs = queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("__q"))

        def _lut(qslice):
            return lambda ct: _sqdist_mirror(qslice, ct["__cv"])

        for s, (cells, mat) in enumerate(books_np):
            qslice = F.slice(F.col("__q"), s * width + 1, width)
            cent_lit = F.array(*[
                F.struct(F.lit(int(cells[j])).alias("__cell"),
                         F.array(*[F.lit(float(x)) for x in mat[j]])
                         .alias("__cv"))
                for j in range(len(cells))])
            qs = qs.withColumn(f"__lut_{s}",
                               F.transform(cent_lit, _lut(qslice)))
        return qs.drop("__q")

    old = old_luts(corpus.limit(3))
    po = old._jdf.queryExecution().optimizedPlan().canonicalized().toString()
    pn = new._jdf.queryExecution().optimizedPlan().canonicalized().toString()
    assert po == pn

    def old_cb():  # the pre-round-15 Column form, verbatim
        cb_rows = []
        for s, b in enumerate(books):
            cells, mat = b.value
            for j in range(len(cells)):
                cb_rows.append(F.struct(
                    F.lit(s).cast("int").alias("sub"),
                    F.lit(int(cells[j])).cast("int").alias("cell"),
                    F.array(*[F.lit(float(x)) for x in mat[j]])
                    .alias("centroid")))
        return (spark.range(1)
                .select(F.explode(F.array(*cb_rows)).alias("__r"))
                .select("__r.sub", "__r.cell", "__r.centroid"))

    co, cn = old_cb(), _codebook_rows_df(spark, books)
    assert co.schema == cn.schema
    po = co._jdf.queryExecution().optimizedPlan().canonicalized().toString()
    pn = cn._jdf.queryExecution().optimizedPlan().canonicalized().toString()
    assert po == pn


def test_minima_from_set_bit_equal_to_text(spark):
    """lsh_min_minima_long_from_set(shingle_set_col(text)) must be
    bit-equal to lsh_min_minima_long(text) — incl. NULL text (NULL row),
    empty text and shorter-than-ngram text (all-U64MAX rows)."""
    import pyspark.sql.functions as F

    from lsh_spark.functions.lsh import (
        lsh_min_minima_long,
        lsh_min_minima_long_from_set,
        shingle_set_col,
    )
    from lsh_spark.sources.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    edge = spark.createDataFrame(
        [(100001, None), (100002, ""), (100003, "ab"), (100004, "abc")],
        "doc_id long, text string")
    df = docs.select("doc_id", "text").unionByName(edge)
    a = df.select(
        "doc_id",
        lsh_min_minima_long("text", 3, 6, 6, 123).alias("sig"))
    b = df.select(
        "doc_id",
        lsh_min_minima_long_from_set(
            shingle_set_col(F.col("text"), 3), 6, 6, 123).alias("sig"))
    ra = {r.doc_id: r.sig for r in a.collect()}
    rb = {r.doc_id: r.sig for r in b.collect()}
    assert ra == rb
    assert ra[100001] is None
    assert len(set(ra[100002])) == 1  # all-U64MAX row


def test_calibration_sets_path_bit_equal(spark):
    """minhash_estimate_for_pairs with a precomputed sets frame must be
    bit-equal to the from-text path, and sampling must be refused."""
    import pytest as _pytest

    from lsh_spark.operators.similarity_join import (
        lsh_self_dedup_pairs,
        minhash_estimate_for_pairs,
    )
    from lsh_spark.plans.cache import release_intermediates
    from lsh_spark.sources.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs, sets = lsh_self_dedup_pairs(
        docs, "text", id_col="doc_id", ngram_width=3, band_count=6,
        band_size=6, seed=123, threshold=0.6, return_sets=True)
    a = sorted(tuple(r) for r in minhash_estimate_for_pairs(
        pairs, docs, "text", id_col="doc_id", ngram_width=3,
        band_count=6, band_size=6, seed=123, max_docs=None).collect())
    b = sorted(tuple(r) for r in minhash_estimate_for_pairs(
        pairs, docs, "text", id_col="doc_id", ngram_width=3,
        band_count=6, band_size=6, seed=123, max_docs=None,
        sets=sets).collect())
    assert a and a == b
    with _pytest.raises(ValueError, match="max_docs=None"):
        minhash_estimate_for_pairs(
            pairs, docs, "text", id_col="doc_id", sets=sets)
    release_intermediates()

def test_winnow_global_kernel_matches_row_loop(spark):
    """The vectorized winnowing kernel (one global sliding-min +
    row-tagged unique) must reproduce the per-row rightmost-argmin loop
    bit-for-bit — incl. NULL/empty/short docs, all-equal runs, and
    n == window boundaries, across window widths."""
    import random

    import numpy as np

    from lsh_spark._core.batch import batch_window_hashes, flatten_texts
    from lsh_spark.functions.fingerprint import winnow_fingerprints

    def row_loop(texts, kgram, window):  # the pre-round-15 form, verbatim
        mask = [t is not None for t in texts]
        tt = ["" if not ok else t for t, ok in zip(texts, mask)]
        hashes, offs = batch_window_hashes(*flatten_texts(tt), kgram)
        out = []
        for i, ok in enumerate(mask):
            if not ok:
                out.append(None)
                continue
            seg = hashes[offs[i]:offs[i + 1]]
            n = seg.shape[0]
            if n == 0:
                out.append([])
                continue
            if n <= window:
                rev = seg[::-1]
                picked = np.array([seg[n - 1 - int(np.argmin(rev))]])
            else:
                win = np.lib.stride_tricks.sliding_window_view(seg, window)
                idx = (window - 1) - np.argmin(win[:, ::-1], axis=1)
                picked = win[np.arange(win.shape[0]), idx]
            out.append(np.unique(picked).astype(np.int64).tolist())
        return out

    rng = random.Random(7)
    texts = [None, "", "abcd", "abcde", "abcdefgh", "aaaaaaaaaaaa"]
    texts += ["".join(rng.choice("abcdef ") for _ in range(
        rng.randint(0, 60))) for _ in range(400)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string")
    for kg, w in [(5, 4), (3, 2), (2, 8), (6, 1)]:
        got = {r.id: (None if r.fp is None else list(r.fp))
               for r in df.select(
                   "id", winnow_fingerprints(
                       "text", kgram=kg, window=w).alias("fp")).collect()}
        want = row_loop(texts, kg, w)
        assert [got[i] for i in range(len(texts))] == want
