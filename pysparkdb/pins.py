"""Lifecycle registry for library-created persist pins.

Several library operators persist an intermediate frame that feeds
multiple consumers inside ONE returned plan (the shingle explode in
dedup, the LSH bucket frames in similarity, the token explode in
naive_bayes_predict): Catalyst does not share common subtrees across
DataFrame branches, so without the pin the corpus would be re-scanned and
re-exploded once per consumer. The functions return LAZY frames, so they
cannot unpersist their own input — the pin must outlive the call, and
until round 16 it outlived the SESSION (ADVICE r15: a long-lived server
accumulated one MEMORY_AND_DISK entry per distinct input plan forever).

This registry is the owner-side lifecycle (VERDICT r15 task #6): every
standing library pin registers here at creation, and
``release_persisted(spark)`` unpersists everything registered — the
between-pipelines hygiene call for long-lived sessions (a serving
deployment calls it after each pipeline; short-lived jobs can ignore it
and let the session end collect the pins).

Deliberately NOT automatic per query: repeat executions of the same plan
re-use the same CacheManager entry (persist() of an already-cached plan
is a no-op), which is exactly the warm-cache behavior the bench protocol
froze its baselines under (bench.py's no-clearCache note — a measured A/B
showed per-sweep clearing shifts the whole sweep ~14% colder). Releasing
after every query would silently change what the bench measures;
releasing is therefore an explicit caller decision.

Registered entries are tiny (a DataFrame handle each) and deduplicated by
the underlying cache entry: re-running a query registers a new handle for
the same cache entry, and release unpersists them all idempotently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_PINNED: list[DataFrame] = []


def pin(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """persist(level) + register for later release_persisted()."""
    out = df.persist(level)
    _PINNED.append(out)
    return out


def release_persisted(blocking: bool = False) -> int:
    """Unpersist every registered library pin; returns how many handles
    were released. Safe at any time — an unpersisted frame is simply
    recomputed on next use (performance, never correctness)."""
    n = 0
    while _PINNED:
        df = _PINNED.pop()
        try:
            df.unpersist(blocking)
        except Exception:
            pass  # session already stopped: nothing to release
        n += 1
    return n
