"""Caller-visible lifecycle for operator-internal persists.

Several operators persist an intermediate frame that multiple
downstream branches read (the surprisal ops' occurrence/count
streams). Their outputs are lazy, so the operator cannot unpersist
its own cache — the returned plan still reads it. Round 5 documented
the leak; this module bounds it:

- :class:`CacheScope` — an explicit handle: the caller passes one
  in, the operator registers every internal persist on it, the
  caller releases after consuming the result (context-manager form
  for the common case).
- :func:`op_scope` — the default when no scope is passed:
  latest-call-only residency. Each NEW invocation of the same
  operator on the same SparkSession releases the PREVIOUS
  invocation's frames before persisting its own, so a long-lived
  session (the epoch-loop / per-corpus-batch shape) holds at most
  one invocation's cache per operator instead of growing without
  bound. A result frame from an earlier call stays CORRECT after
  its cache is released — Spark recomputes from lineage — it just
  loses the cached speed, which is the right trade for a frame the
  caller has usually already consumed.
"""

from __future__ import annotations

import threading
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel


class CacheScope:
    """Registry of persisted frames with one release point.

    >>> with CacheScope() as scope:
    ...     out = bigram_surprisal(df, "id", "text", cache=scope)
    ...     out.write.parquet(path)       # consume while cached
    ... # scope.release() ran — zero residual cache
    """

    def __init__(self) -> None:
        self._frames: list[DataFrame] = []

    def persist(
        self,
        df: DataFrame,
        level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    ) -> DataFrame:
        df = df.persist(level)
        self._frames.append(df)
        return df

    def release(self) -> None:
        for f in self._frames:
            try:
                f.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
        self._frames.clear()

    def __enter__(self) -> "CacheScope":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


# (session, op-name) -> the one live scope for that operator; the
# session key is a weakref so a stopped session's entries vanish
# instead of pinning the JVM gateway.
_LATEST: "weakref.WeakKeyDictionary[SparkSession, dict[str, CacheScope]]" = (
    weakref.WeakKeyDictionary()
)
# composed demos build their sections from a thread pool, so two
# operators may open their scopes concurrently — guard the registry
_LATEST_LOCK = threading.Lock()


def op_scope(spark: SparkSession, op: str) -> CacheScope:
    """Latest-call-only scope: release the previous invocation's
    cache for ``op`` on this session and open a fresh scope."""
    with _LATEST_LOCK:
        per_session = _LATEST.setdefault(spark, {})
        prev = per_session.get(op)
        scope = CacheScope()
        per_session[op] = scope
    if prev is not None:
        prev.release()
    return scope
