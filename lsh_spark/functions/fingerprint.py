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
        out = []
        for i, ok in enumerate(mask):
            if not ok:
                out.append(None)
                continue
            seg = hashes[offs[i]: offs[i + 1]]
            n = seg.shape[0]
            if n == 0:
                out.append([])
                continue
            if n <= window:
                # fewer k-grams than a window: single fingerprint, the
                # rightmost minimum of the whole segment
                rev = seg[::-1]
                picked = np.array([seg[n - 1 - int(np.argmin(rev))]])
            else:
                win = np.lib.stride_tricks.sliding_window_view(seg, window)
                # rightmost min per window: argmin on the reversed window
                rev = win[:, ::-1]
                idx = (window - 1) - np.argmin(rev, axis=1)
                picked = win[np.arange(win.shape[0]), idx]
            out.append(np.unique(picked).astype(np.int64).tolist())
        return pd.Series(out, dtype=object)

    return _udf(F.col(col) if isinstance(col, str) else col)
