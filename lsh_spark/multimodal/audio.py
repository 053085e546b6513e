"""Audio signal statistics over the REAL decode chain (RAWA / RIFF-WAVE
PCM): per-clip sample count, energy, zero-crossing count, and peak — the
standard first-pass audio quality/filtering features a multimodal
training pipeline computes before anything heavier (silence and clipping
detection, energy-based filtering).

Everything is integer arithmetic over the decoded PCM samples (int64
accumulation — no float folds, so results are bit-deterministic and a
SQL oracle over arithmetically-synthesized clips reproduces them
exactly).  Runs inside one Arrow batch per partition via ``mapInPandas``
— a narrow, shuffle-free map; audio bytes never cross a shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

AUDIO_STATS_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("n_samples", IntegerType(), True),
    StructField("sum_sq", LongType(), True),          # energy (exact int)
    StructField("n_sign_changes", IntegerType(), True),
    StructField("peak", IntegerType(), True),         # max |sample|
])


def _signal_stats(samples: np.ndarray) -> tuple[int, int, int, int]:
    """(n, sum_sq, sign_changes, peak) of one clip; multi-channel clips
    use channel 0 (the mono convention for quality features)."""
    s = np.asarray(samples)
    if s.ndim == 2:
        s = s[:, 0]
    s = s.astype(np.int64)
    n = int(s.shape[0])
    if n == 0:
        return 0, 0, 0, 0
    neg = s < 0
    return (
        n,
        int(np.sum(s * s)),
        int(np.count_nonzero(neg[1:] != neg[:-1])),
        int(np.max(np.abs(s))),
    )


def audio_signal_stats(media: DataFrame) -> DataFrame:
    """(media_id, n_samples, sum_sq, n_sign_changes, peak) for every
    decodable audio row (RAWA / PCM WAV via the shared decode chain);
    undecodable, float-PCM, or non-audio rows yield NULLs."""
    from .media import _decode_audio

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                vals = (None, None, None, None)
                if r["kind"] == "audio" and r["content"] is not None:
                    try:
                        meta = _decode_audio(bytes(r["content"]))
                    except ValueError:
                        meta = None
                    samples = (meta or {}).get("_samples")
                    if (samples is not None
                            and np.issubdtype(np.asarray(samples).dtype,
                                              np.integer)):
                        vals = _signal_stats(samples)
                rows.append({"media_id": r["media_id"],
                             "n_samples": vals[0], "sum_sq": vals[1],
                             "n_sign_changes": vals[2], "peak": vals[3]})
            yield pd.DataFrame(rows,
                               columns=[f.name for f in AUDIO_STATS_SCHEMA])

    return media.mapInPandas(_stats, schema=AUDIO_STATS_SCHEMA)
