"""Document fingerprinting: winnowing (Schleimer-Wilkerson-Aiken) over the
same FxHash char-ngram hashes the reference uses for shingles
(``src/minhash/shingleset.rs:37-47`` — one hash family across the engine).

``winnow_fingerprints(col, kgram, window)`` selects, for every sliding
window of ``window`` consecutive k-gram hashes, the minimal hash (rightmost
occurrence on ties — the canonical winnowing rule), and returns the sorted
distinct selected hashes as ``array<bigint>``.  Guarantee: any shared
substring of length ≥ window + kgram - 1 contributes ≥1 shared
fingerprint, which is what makes the fingerprint join a sound
containment-detection blocking key at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from .._core.batch import batch_window_hashes, flatten_texts


def winnow_fingerprints(col, kgram: int = 5, window: int = 4) -> Column:
    @pandas_udf(ArrayType(LongType()))
    def _udf(s: pd.Series) -> pd.Series:
        mask = s.notna().to_numpy()
        texts = ["" if not ok else t for t, ok in zip(s, mask)]
        hashes, offs = batch_window_hashes(*flatten_texts(texts), kgram)
        n_docs = offs.shape[0] - 1
        lens = offs[1:] - offs[:-1]
        # The rightmost-minimum rule only selects WHICH position
        # supplies a fingerprint; the emitted VALUE is the window's
        # minimum either way, and the per-doc dedup collapses repeats —
        # so the fingerprint SET is exactly {per-window minima} (plus
        # the whole-segment minimum for docs with ≤ window k-grams),
        # computed in ONE global pass instead of a per-row python loop
        # (bit-equal to the old rightmost-argmin loop; pytest-pinned):
        picked_rows = np.empty(0, dtype=np.int64)
        picked_vals = np.empty(0, dtype=np.uint64)
        if hashes.shape[0] >= window:
            # minima of EVERY width-`window` slice of the flat array;
            # slices spanning doc boundaries are computed and discarded
            # (the batch_window_hashes idiom)
            allmin = np.lib.stride_tricks.sliding_window_view(
                hashes, window).min(axis=1)
            wcnt = np.where(lens > window, lens - window + 1, 0)
            rows_w = np.repeat(np.arange(n_docs, dtype=np.int64), wcnt)
            tot = int(wcnt.sum())
            starts = np.repeat(offs[:-1], wcnt) + (
                np.arange(tot, dtype=np.int64)
                - np.repeat(np.cumsum(wcnt) - wcnt, wcnt))
            picked_rows, picked_vals = rows_w, allmin[starts]
        short = (lens > 0) & (lens <= window)
        if short.any():
            # ≤ window k-grams: one fingerprint, the whole-segment min.
            # reduceat segments span start-to-NEXT-start, so it must run
            # over ALL nonempty docs (consecutive nonempty starts bound
            # each doc exactly) before selecting the short ones
            nonempty = lens > 0
            mins_ne = np.minimum.reduceat(hashes, offs[:-1][nonempty])
            smin = mins_ne[short[nonempty]]
            picked_rows = np.concatenate(
                [picked_rows, np.flatnonzero(short).astype(np.int64)])
            picked_vals = np.concatenate([picked_vals, smin])
        # per-doc sorted unique via ONE row-tagged np.unique (values are
        # u32 in u64, so (row << 32) | v preserves both sort orders)
        uniq = np.unique((picked_rows.astype(np.uint64) << np.uint64(32))
                         | picked_vals)
        counts = np.bincount((uniq >> np.uint64(32)).astype(np.int64),
                             minlength=n_docs)
        vals = (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64)
        bounds = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(counts, out=bounds[1:])
        return pd.Series(
            [vals[bounds[i]:bounds[i + 1]] if ok else None
             for i, ok in enumerate(mask)], dtype=object)

    return _udf(F.col(col) if isinstance(col, str) else col)
