"""Scoped cache tracking.

Several operators cache an intermediate that feeds multiple consumers
(minhash signatures, the 5-min rollup tier). The cache must outlive the
operator function — the CALLER runs the consuming action after the
function returns — so the operator can't unpersist it itself. Instead,
caches register here and ``release_caches()`` drops every tracked block;
the query registry calls it on entry to each query, so a long sweep
(the driver runs 50 queries in one session) never accumulates more than
one query's worth of cached blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def track_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register for deferred release."""
    df.cache()
    _LIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked cache (blocking=False); returns count."""
    n = len(_LIVE)
    for df in _LIVE:
        try:
            df.unpersist()
        except Exception:
            pass  # session may already be stopped
    _LIVE.clear()
    return n
