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


MP3_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("mpeg_version", IntegerType(), True),   # 1 | 2 | 25 (=2.5)
    StructField("sample_rate", IntegerType(), True),
    StructField("channels", IntegerType(), True),
    StructField("n_mpeg_frames", IntegerType(), True),
    StructField("n_samples", LongType(), True),         # frames x spf
    StructField("bitrate_sum_kbps", LongType(), True),  # VBR: avg = sum/frames
    StructField("duration_ms", LongType(), True),       # 1000*samples // rate
    StructField("n_bytes", LongType(), True),
])


def mp3_stream_features(media: DataFrame) -> DataFrame:
    """(media_id, mpeg_version, sample_rate, channels, n_mpeg_frames,
    n_samples, bitrate_sum_kbps, duration_ms, n_bytes) for every audio
    row the MPEG header walk accepts (``containers.decode_mp3`` —
    metadata only, no DSP); non-MP3 or corrupt rows yield NULLs.  All
    integer arithmetic (duration is floor-division milliseconds), so an
    oracle over the arithmetic MP3 corpus replays it exactly.  Narrow
    shuffle-free map; audio bytes never cross a shuffle."""
    from .containers import decode_mp3

    cols = [f.name for f in MP3_FEATURES_SCHEMA]

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                out = {c: None for c in cols}
                out["media_id"] = r["media_id"]
                if r["kind"] == "audio" and r["content"] is not None:
                    content = bytes(r["content"])
                    try:
                        meta = decode_mp3(content)
                    except ValueError:
                        meta = None
                    if meta is not None:
                        rate = meta["_sample_rate"]
                        out.update(
                            mpeg_version=meta["_mpeg_version"],
                            sample_rate=rate,
                            channels=meta["_channels"],
                            n_mpeg_frames=meta["_mpeg_frames"],
                            n_samples=meta["n_frames"],
                            bitrate_sum_kbps=meta["_bitrate_sum_kbps"],
                            duration_ms=1000 * meta["n_frames"] // rate,
                            n_bytes=len(content),
                        )
                rows.append(out)
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(_feat, schema=MP3_FEATURES_SCHEMA)
