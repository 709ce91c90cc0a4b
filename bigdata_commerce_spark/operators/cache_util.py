"""Bounded persist registry for operators that cache a narrow input
they cannot release themselves.

Several operators persist a small projection (an (id, hash) frame, a
shingle stream) because their banded/multi-branch plans would
otherwise recompute an expensive upstream (an image decode, the
tokenizer) once per branch. The returned frame is LAZY, so the
operator cannot unpersist before the caller consumes it — and a
naked ``persist()`` then leaks one cache-registry entry per call for
the session lifetime (VERDICT r11 hygiene finding on the phash pair
ops). This registry bounds that: each new registration evicts — and
explicitly unpersists — the oldest entry past ``PERSIST_BOUND``, so
a long-lived session (the 150-query suite, a notebook) holds a fixed
number of these frames no matter how many operator calls it makes.

An evicted frame's consumers stay CORRECT on re-collect: the lineage
simply recomputes (the ``catalog_dataops._PAIRS_CACHE`` eviction
contract). The bound is 4 so a composed pipeline's wide/narrow paths
and a re-run of either coexist without thrash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

PERSIST_BOUND = 4
_PERSISTED_INPUTS: list[DataFrame] = []


def persist_bounded(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it; unpersist the oldest
    registered frame once more than ``PERSIST_BOUND`` are live.

    Plan-identical registrations refresh recency instead of
    appending: Spark's CacheManager keys cached data by the
    canonicalized plan, so two operators persisting the same subtree
    (the minhash-LSH and n-gram-Jaccard dedup paths share one shingle
    frame) hold ONE cache entry — a duplicate registration would let
    the eviction of the stale handle unpersist the cache the newer
    consumer still rides."""
    for i, old in enumerate(_PERSISTED_INPUTS):
        try:
            if df.sameSemantics(old):
                _PERSISTED_INPUTS.append(_PERSISTED_INPUTS.pop(i))
                return df.persist()
        except Exception:  # noqa: BLE001 — stopped session, foreign plan
            continue
    df = df.persist()
    _PERSISTED_INPUTS.append(df)
    while len(_PERSISTED_INPUTS) > PERSIST_BOUND:
        old = _PERSISTED_INPUTS.pop(0)
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001 — session may be stopped
            pass
    return df
