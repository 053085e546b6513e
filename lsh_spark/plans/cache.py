"""Tracking for operator-persisted intermediates.

Pair-heavy operators (similarity join, dedup) persist per-row shingle
sets / signatures so the blocking and verification stages reuse one UDF
pass.  Those cached partitions must outlive the *returned* DataFrame's
materialization (Spark persistence is lazy; unpersisting inside the
operator would silently recompute the UDF per consumer), so the operator
cannot unpersist them itself.  Instead every internal ``persist`` is
registered here and a long-lived session releases them between operator
runs with :func:`release_intermediates` (``bench.py`` does the blunter
``spark.catalog.clearCache()``, which also works).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

_TRACKED: list[weakref.ReferenceType] = []
_TRACKED_BROADCASTS: list = []


def track(df: DataFrame) -> DataFrame:
    """Register an operator-persisted intermediate for later release."""
    _TRACKED.append(weakref.ref(df))
    return df


def track_broadcast(bc):
    """Register an operator-created Broadcast variable for later release
    (verify kernels broadcast flattened set tables; without explicit
    destroy a long-lived session accumulates one copy per operator run
    in every executor/python worker)."""
    _TRACKED_BROADCASTS.append(bc)
    return bc


def release_intermediates() -> int:
    """Unpersist every tracked intermediate still alive and destroy
    tracked broadcasts; returns the count released.

    Call between operator runs in a long-lived session to keep executor
    storage from accumulating dead cached partitions."""
    released = 0
    while _TRACKED:
        ref = _TRACKED.pop()
        df = ref()
        if df is None:
            continue
        try:
            df.unpersist()
            released += 1
        except Exception:
            pass  # session already stopped — nothing to release
    while _TRACKED_BROADCASTS:
        bc = _TRACKED_BROADCASTS.pop()
        try:
            bc.destroy()
            released += 1
        except Exception:
            pass
    return released
