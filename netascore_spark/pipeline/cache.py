"""Registry for the pipeline's internal .persist() caches.

build_network / build_attributes cache intermediates that several of their
own stages re-scan (exploded cell covers, split edges, water buffers).
Those caches are dead weight once the stage OUTPUT is durably materialized
(checkpoint parquet / localCheckpoint) — but the builder functions return
lazy DataFrames, so they cannot unpersist eagerly themselves.

Contract: builders register caches via :func:`track`; an orchestrator that
has materialized the downstream results calls :func:`release_all`.
run_pipeline does this automatically after its checkpoint snapshots.  A
caller composing builders directly on a long-lived session should either
call release_all() after its own materialization, or accept LRU eviction
of executor storage (the caches are MEMORY_AND_DISK, never correctness-
relevant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_live: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for later release."""
    _live.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked cache (non-blocking); returns the count."""
    n = len(_live)
    for df in _live:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped
    _live.clear()
    return n
