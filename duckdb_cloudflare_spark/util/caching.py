"""One-slot persisted-intermediate registry (r16).

Several operators materialize a corpus-derived intermediate ONCE per call
and return a DataFrame that stays lazy over it (bpe_token_counts' encoded
vocab, bigram_xent's hashed-bigram stream). The root cannot be
unpersisted inside the operator — the returned table still reads it — so
without bookkeeping every call leaks one evictable-but-live storage
entry for the life of the driver session.

``one_slot_persist(slot, df)`` keeps AT MOST ONE live entry per slot
name: persisting a new root releases the previous call's. Recompute-safe
by construction — a still-held result from an earlier call simply
re-derives its fold from the source (values unchanged, lazily slower).
``release_slot(slot)`` lets a caller (or a serving harness, like
queries.uncache_tables for the base tables) drop the last entry too.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_SLOTS: dict[str, DataFrame] = {}


def one_slot_persist(slot: str, df: DataFrame) -> DataFrame:
    """Persist ``df`` (evictable MEMORY_AND_DISK), releasing the slot's
    previous entry first. Returns the persisted DataFrame."""
    release_slot(slot)
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    _SLOTS[slot] = out
    return out


def release_slot(slot: str) -> None:
    prev = _SLOTS.pop(slot, None)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass


def release_all_slots() -> None:
    for slot in list(_SLOTS):
        release_slot(slot)
