"""Engine-neutral stable hashing for dedup/similarity operators.

Everything here must produce bit-identical values in Spark and any
ANSI-SQL oracle (DuckDB), so nothing uses engine-native hash():
the base primitive is md5 (identical everywhere) with a fixed-width
hex prefix parsed to a 40-bit integer, and universal-hash
permutations (a*h+b) mod p kept inside BIGINT range by construction
(a,b < 2^20, h < 2^40 → a*h+b < 2^61 = no overflow).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^40 + 15, prime — modulus for the minhash permutation family.
# The modulus MUST sit BELOW the a*h product range (a < 2^20,
# h < 2^40 -> a*h+b < 2^60, still overflow-free in int64): an
# earlier 2^61-1 modulus never wrapped, so every "permutation" was
# order-PRESERVING in h — all k minima came from the same min-hash
# shingle, the bands were perfectly correlated, and banding recall
# collapsed to single-permutation recall (caught by the exact-
# Jaccard recall calibration: a j=0.9 pair missed all 8 bands).
# With p just above the 40-bit hash range, a*h wraps ~a times per
# permutation and the maps genuinely scramble order.
PERM_MODULUS = (1 << 40) + 15
HASH_HEX_CHARS = 10  # 40 bits


def stable_hash40(col: Column) -> Column:
    """40-bit integer hash of a string: first 10 hex chars of md5.

    SQL twin: ``CAST(('0x' || substr(md5(x), 1, 10)) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(col), 1, HASH_HEX_CHARS), 16, 10).cast(
        "bigint"
    )


def stable_hash40_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, {HASH_HEX_CHARS})) AS BIGINT)"


def stable_hash40_spark_sql(expr: str) -> str:
    """Spark-SQL-string twin of :func:`stable_hash40` — for builders
    that assemble ``selectExpr``/``F.expr`` strings (one py4j
    round-trip regardless of expression size). Kept HERE next to the
    Column and DuckDB forms so a change to ``HASH_HEX_CHARS`` or the
    hash shape cannot silently desynchronize the inline copies."""
    return (
        f"CAST(conv(substring(md5({expr}), 1, {HASH_HEX_CHARS}), 16, 10)"
        " AS BIGINT)"
    )


def stable_hash40_py(s: str) -> int:
    """Plain-Python twin of :func:`stable_hash40` — for replica tests
    and driver-side sizing decisions that must agree with the plans."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:HASH_HEX_CHARS], 16)


def perm_params(k: int) -> list[tuple[int, int, int]]:
    """Deterministic (perm_id, a, b) universal-hash parameters,
    a odd, both < 2^20 (the a bound keeps a*h+b < 2^60, int64-safe)
    — the same table is inlined into oracle SQL. md5-derived per
    permutation: a linearly-generated (a_i, b_i) family is the same
    silent-correlation class as the non-wrapping modulus and the
    LCG hyperplanes (shifted copies of one progression)."""
    out = []
    for i in range(k):
        a = stable_hash40_py(f"perm-a-{i}") % (1 << 20) | 1
        b = stable_hash40_py(f"perm-b-{i}") % (1 << 20)
        out.append((i, a, b))
    return out


def perm_hash(h: Column, a: Column, b: Column) -> Column:
    """(a*h + b) mod PERM_MODULUS — overflow-free in 64-bit by
    construction (a < 2^20, h < 2^40), and genuinely wrapping (see
    the PERM_MODULUS comment)."""
    return F.pmod(a * h + b, F.lit(PERM_MODULUS))
