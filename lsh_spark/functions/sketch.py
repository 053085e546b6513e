"""KMV (k-minimum-values) sketches over char-ngram hashes.

A KMV sketch keeps the k smallest hash values of a set; it supports
distinct-count estimation ((k-1) / kth-min-normalized) and union/Jaccard/
containment estimation by merging sketches (cf. GB-KMV, ICDE 2019 — the
augmented-KMV idea of carrying set size alongside the sketch; we store
``n_total`` with each sketch for the containment estimator).

Sketches reuse the engine's shingle hash (FxHash-u32 of char ngrams,
``src/minhash/shingleset.rs:37-47``) so a sketch is directly comparable
with the exact shingle sets elsewhere.  Stored as a struct
(mins: array<long> ascending in unsigned space, n_total: long).

Estimators are deterministic given the text — safe for rows-only driver
checks; accuracy is property-tested against exact counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from .._core.batch import (
    batch_window_hashes,
    flatten_texts,
    hash_strings_batch,
)

_SKETCH_TYPE = StructType([
    StructField("mins", ArrayType(LongType()), True),
    StructField("n_total", LongType(), True),
])

_HASH_SPACE = float(2**32)


def kmv_sketch_col(col, ngram_width: int = 3, k: int = 64) -> Column:
    """KMV sketch of the char-ngram set: k smallest u32 hashes + exact
    distinct count of this row's set (the 'augmented' part)."""

    @pandas_udf(_SKETCH_TYPE)
    def _udf(s: pd.Series) -> pd.DataFrame:
        mask = s.notna().to_numpy()
        texts = ["" if not ok else t for t, ok in zip(s, mask)]
        hashes, offs = batch_window_hashes(*flatten_texts(texts), ngram_width)
        mins, totals = [], []
        for i, ok in enumerate(mask):
            if not ok:
                # struct-returning UDFs yield per-field nulls for null rows
                mins.append(None)
                totals.append(None)
                continue
            seg = np.unique(hashes[offs[i]: offs[i + 1]])  # sorted unsigned
            mins.append(seg[:k].astype(np.int64).tolist())
            totals.append(int(seg.shape[0]))
        return pd.DataFrame({"mins": mins, "n_total": totals})

    return _udf(F.col(col) if isinstance(col, str) else col)


def fx32_col(col) -> Column:
    """FxHash-u32 (as nonnegative BIGINT) of the whole string — the
    engine's ``from_shingles`` hash stream (``shingleset.rs:12-22``),
    bit-replayable in SQL via ``oracles.duckdb_lsh.string_hash_sql``.
    NULL strings hash as the empty string."""

    @pandas_udf(LongType())
    def _udf(s: pd.Series) -> pd.Series:
        vals = hash_strings_batch(s.fillna("").tolist())
        return pd.Series(vals.astype(np.int64))

    return _udf(F.col(col) if isinstance(col, str) else col)


def kmv_distinct_estimate(sketch, k: int = 64) -> Column:
    """Distinct-count estimate: exact when the set held < k values, else
    (k-1) / (kth_min / 2^32)."""
    s = F.col(sketch) if isinstance(sketch, str) else sketch
    mins = s.getField("mins")
    n = F.size(mins)
    kth = F.element_at(mins, n)  # largest kept hash (1-based last)
    return F.when(
        n < F.lit(k), n.cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (kth.cast("double") / F.lit(_HASH_SPACE))
    )


def kmv_jaccard_estimate(sketch_a, sketch_b, k: int = 64) -> Column:
    """Jaccard estimate from two sketches: fraction of the union-sketch's
    k smallest values present in both."""
    a = (F.col(sketch_a) if isinstance(sketch_a, str) else sketch_a).getField("mins")
    b = (F.col(sketch_b) if isinstance(sketch_b, str) else sketch_b).getField("mins")
    union_k = F.slice(F.array_sort(F.array_union(a, b)), 1, k)
    inter = F.size(F.array_intersect(union_k, F.array_intersect(a, b)))
    return F.when(F.size(union_k) > 0,
                  inter.cast("double") / F.size(union_k).cast("double")
                  ).otherwise(F.lit(0.0))


def kmv_containment_estimate(sketch_a, sketch_b, k: int = 64) -> Column:
    """Containment |A∩B| / |A| estimate (GB-KMV-style: Jaccard estimate
    rescaled by the carried exact set sizes)."""
    sa = F.col(sketch_a) if isinstance(sketch_a, str) else sketch_a
    sb = F.col(sketch_b) if isinstance(sketch_b, str) else sketch_b
    jac = kmv_jaccard_estimate(sa, sb, k)
    na = sa.getField("n_total").cast("double")
    nb = sb.getField("n_total").cast("double")
    # |A∩B| ≈ j/(1+j) * (|A|+|B|)
    inter = (jac / (F.lit(1.0) + jac)) * (na + nb)
    return F.when(na > 0, F.least(inter / na, F.lit(1.0))).otherwise(F.lit(0.0))
