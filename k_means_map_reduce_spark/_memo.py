"""Bounded per-session memoization for persisted DataFrames/artifacts.

Several operators persist a derived table that multiple queries (or both
sides of a self-join) reuse — basket tables, graph edge lists, ANN indexes,
BM25 per-doc stats. Module-level dicts memoize them, but round-3 review
flagged two hazards with the ad-hoc versions:

- keying by ``id(spark)`` can alias a NEW session to a stopped one whose
  SparkSession object was garbage-collected (CPython reuses addresses),
  handing back persisted DataFrames bound to a dead context;
- unbounded growth: a long-lived session invoking queries across many
  sf_dirs accumulates pinned executor storage with no eviction.

``SessionMemo`` fixes both: keys lead with
``spark.sparkContext.applicationId`` (stable, never reused within a
cluster), entries are LRU-evicted beyond ``maxsize``, and eviction
unpersists every DataFrame found in the evicted value (walking tuples and
lists). ``clear_all_memos()`` is the explicit release hook.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any

from pyspark.sql import SparkSession

_ALL_MEMOS: list["SessionMemo"] = []


def _unpersist_value(value: Any) -> None:
    if isinstance(value, (tuple, list)):
        for v in value:
            _unpersist_value(v)
        return
    unpersist = getattr(value, "unpersist", None)
    if callable(unpersist):
        try:
            unpersist()
        except Exception:
            pass  # session already stopped — nothing left to release


class SessionMemo:
    """LRU dict keyed by (applicationId, *parts); unpersists on eviction."""

    def __init__(self, name: str, maxsize: int = 4) -> None:
        self.name = name
        self.maxsize = maxsize
        self._entries: OrderedDict[tuple, Any] = OrderedDict()
        _ALL_MEMOS.append(self)

    @staticmethod
    def _key(spark: SparkSession, parts: tuple) -> tuple:
        return (spark.sparkContext.applicationId, *parts)

    def get(self, spark: SparkSession, *parts: Any) -> Any | None:
        key = self._key(spark, parts)
        if key in self._entries:
            self._entries.move_to_end(key)
            return self._entries[key]
        return None

    def put(self, spark: SparkSession, *parts_and_value: Any) -> Any:
        *parts, value = parts_and_value
        key = self._key(spark, tuple(parts))
        self._entries[key] = value
        self._entries.move_to_end(key)
        while len(self._entries) > self.maxsize:
            _, evicted = self._entries.popitem(last=False)
            _unpersist_value(evicted)
        return value

    def clear(self) -> None:
        while self._entries:
            _, evicted = self._entries.popitem(last=False)
            _unpersist_value(evicted)

    def __len__(self) -> int:
        return len(self._entries)


def clear_all_memos() -> None:
    """Release every memoized persisted artifact (all operator modules)."""
    for memo in _ALL_MEMOS:
        memo.clear()


def memo_persist(memo: "SessionMemo", spark: SparkSession, key: Any, build):
    """Fetch-or-build a persisted single-DataFrame memo entry.

    The standard fix for lesson 27/30's pair of hazards: a derived frame
    consumed by several plan branches must be persisted (or every consumer
    re-runs its subtree), and that persist must be memoized per
    (applicationId, key) (or every warm bench rep pins a fresh block).
    """
    hit = memo.get(spark, key)
    if hit is not None:
        return hit[0]
    df = build().persist()
    memo.put(spark, key, (df,))
    return df
