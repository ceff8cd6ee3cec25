"""Rendezvous (highest-random-weight) hashing: deterministic,
coordination-free shard assignment with MINIMAL movement under
resharding — the placement primitive a 100 TB corpus keeps needing
(which storage shard owns this doc id, which serving replica owns
this embedding bucket, which worker owns this domain's crawl
state). ``key mod S`` reassigns ~100% of keys when S changes;
rendezvous (Thaler & Ravishankar 1998 HRW) reassigns EXACTLY the
keys the new shard wins (~1/(S+1) of them, in expectation), and
removal moves only the removed shard's keys — both properties
pinned by test, not just claimed.

Shape: for a BOUNDED shard list (tens to thousands — placement
targets, not data), the per-shard weights ``stable_hash40(key ||
':' || shard)`` and their argmax unroll into ONE zero-shuffle
codegen Project — no explode, no window, no join; assignment is a
row-local pure function (that is the point: any process computes
the same owner with no directory service). The argmax is expressed
as `greatest()` over (weight, shard-index) pairs packed into a
single int64 — ties (2^-40 probability per pair) break toward the
LOWER shard index identically in both engines.

Reference parity: none; 100 TB placement extension
(SURVEY §2 C75).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from umls2rdf_spark.functions.hashing import (
    stable_hash40,
    stable_hash40_sql,
)

#: weights get the low 20 bits for the shard index: 40-bit hash
#: << 20 never overflows int64 and keeps (weight, index) one key
_IDX_BITS = 20


def _packed_weight(key: Column, shard: str, idx: int) -> Column:
    """(hash << 20) + (max_idx - idx): lexicographic (weight DESC,
    idx ASC) argmax as a single int64 max."""
    h = stable_hash40(
        F.concat(key.cast("string"), F.lit(":" + shard))
    )
    return F.shiftleft(h, _IDX_BITS) + F.lit(
        (1 << _IDX_BITS) - 1 - idx
    )


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    shards: list[str],
    out_col: str = "shard",
) -> DataFrame:
    """Append ``out_col``: the rendezvous winner among ``shards``
    for each row's ``key_col`` — one zero-shuffle Project."""
    if not shards:
        raise ValueError("rendezvous_assign: need at least one shard")
    if len(shards) != len(set(shards)):
        raise ValueError("rendezvous_assign: duplicate shard names")
    if len(shards) >= (1 << _IDX_BITS):
        raise ValueError(
            f"rendezvous_assign: > {(1 << _IDX_BITS) - 1} shards — "
            "use hierarchical assignment (shard groups, then members)"
        )
    key = F.col(key_col)
    packed = [
        _packed_weight(key, s, i) for i, s in enumerate(shards)
    ]
    best = packed[0] if len(packed) == 1 else F.greatest(*packed)
    idx = F.lit((1 << _IDX_BITS) - 1) - (
        best % F.lit(1 << _IDX_BITS)
    )
    shard_name = F.element_at(
        F.array(*[F.lit(s) for s in shards]), idx.cast("int") + 1
    )
    return df.withColumn(out_col, shard_name)


def rendezvous_assign_sql(
    key_sql: str, shards: list[str], out_col: str = "shard"
) -> str:
    """The assignment EXPRESSION (not a full query) for the DuckDB
    twin — same packed-weight argmax, same tie-break."""
    packs = []
    top = (1 << _IDX_BITS) - 1
    for i, s in enumerate(shards):
        esc = s.replace("'", "''")
        h = stable_hash40_sql(
            f"CAST({key_sql} AS VARCHAR) || ':{esc}'"
        )
        packs.append(f"(({h}) * {1 << _IDX_BITS} + {top - i})")
    best = (
        packs[0]
        if len(packs) == 1
        else "greatest(" + ", ".join(packs) + ")"
    )
    arr = "[" + ", ".join(
        "'" + s.replace("'", "''") + "'" for s in shards
    ) + "]"
    return (
        f"{arr}[CAST({top} - ({best}) % {1 << _IDX_BITS} AS INTEGER)"
        f" + 1] AS {out_col}"
    )
