"""Bounded persist hygiene for operators that cache an intermediate frame.

Several operators persist a shared intermediate (the post-dedup corpus,
DBSCAN pair frames, the pruned LM model, the DSIR bucketized proxy)
because it feeds 2+ consumers inside one query. Re-invoking the operator
(bench repeats, parameter sweeps, streaming loops) would otherwise pile a
fresh session-lifetime cache entry per call (r6 advice, low #4). This
registry keeps AT MOST ONE live cached frame per logical slot: the next
call for the same slot unpersists the previous frame (non-blocking — a
straggling consumer just recomputes) before persisting the new one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_ACTIVE: dict[str, DataFrame] = {}


def swap_persist(
    slot: str,
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df`` under ``slot``, unpersisting the slot's previous
    frame (if any). Returns the persisted frame."""
    prev = _ACTIVE.pop(slot, None)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass  # session may be gone (tests spin sessions up and down)
    df = df.persist(level)
    _ACTIVE[slot] = df
    return df
