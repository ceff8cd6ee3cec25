"""C46 count-min / C47 HyperLogLog (operators/sketch.py): oracle
parity, the one-sided-error and merge contracts, bounded state, and
estimate quality at a cardinality where the asymptotic formula is
meaningful."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import assert_matches_oracle
from umls2rdf_spark.functions.hashing import stable_hash40_py
from umls2rdf_spark.operators.sketch import (
    cms_cells_py,
    cms_estimates,
    cms_estimates_sql,
    cms_sketch,
    cms_sketch_sql,
    hll_estimate,
    hll_estimate_sql,
    hll_registers,
    hll_registers_sql,
)
from umls2rdf_spark.plans.completion import (
    _CMS_D,
    _CMS_QUERIES,
    _CMS_W,
    _HLL_B,
    _OCC_SQL,
    _token_occ_frame,
)
from umls2rdf_spark.sources.parquet import load_table

SF_ORACLE = "/root/testdata/sf0.01"


def _occ(spark):
    return _token_occ_frame(load_table(spark, SF_ORACLE, "documents"))


# ── oracle parity (full frames, not fingerprints) ────────────────────
def test_cms_sketch_matches_oracle(spark, duck):
    got = cms_sketch(_occ(spark), "token", depth=_CMS_D, width=_CMS_W)
    assert_matches_oracle(
        got, duck, cms_sketch_sql(_OCC_SQL, "token", _CMS_D, _CMS_W)
    )


def test_cms_estimates_match_oracle(spark, duck):
    sk = cms_sketch(_occ(spark), "token", depth=_CMS_D, width=_CMS_W)
    got = cms_estimates(sk, list(_CMS_QUERIES), _CMS_D, _CMS_W)
    assert_matches_oracle(
        got,
        duck,
        cms_estimates_sql(
            _OCC_SQL, "token", list(_CMS_QUERIES), _CMS_D, _CMS_W
        ),
    )


def test_hll_registers_match_oracle(spark, duck):
    got = hll_registers(_occ(spark), "token", b=_HLL_B)
    assert_matches_oracle(
        got, duck, hll_registers_sql(_OCC_SQL, "token", b=_HLL_B)
    )


def test_hll_estimate_matches_oracle(spark, duck):
    got = hll_estimate(
        hll_registers(_occ(spark), "token", b=_HLL_B), b=_HLL_B
    )
    assert_matches_oracle(
        got,
        duck,
        hll_estimate_sql(
            hll_registers_sql(_OCC_SQL, "token", b=_HLL_B), b=_HLL_B
        ),
    )


# ── count-min contracts ──────────────────────────────────────────────
def test_cms_never_underestimates_and_absent_key_floor(spark):
    occ = _occ(spark)
    true = {
        r.token: r.n
        for r in occ.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    sk = cms_sketch(occ, "token", depth=_CMS_D, width=_CMS_W)
    keys = list(true) + ["zz_absent"]
    ests = {
        r.token: r.est
        for r in cms_estimates(sk, keys, _CMS_D, _CMS_W).collect()
    }
    n_total = sum(true.values())
    for k, t in true.items():
        assert ests[k] >= t, f"{k}: est {ests[k]} < true {t}"
        # classic w.h.p. bound, generous constant: over-count <= eN/w
        assert ests[k] - t <= math.e * n_total / _CMS_W * 4
    assert ests["zz_absent"] >= 0  # collision floor only


def test_cms_state_is_bounded_and_merge_is_exact(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    full = cms_sketch(
        _token_occ_frame(docs), "token", depth=_CMS_D, width=_CMS_W
    )
    assert full.count() <= _CMS_D * _CMS_W
    halves = [
        cms_sketch(
            _token_occ_frame(docs.where(F.col("doc_id") % 2 == p)),
            "token", depth=_CMS_D, width=_CMS_W,
        )
        for p in (0, 1)
    ]
    merged = (
        halves[0].unionByName(halves[1])
        .groupBy("row_i", "col")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


# ── HLL contracts ────────────────────────────────────────────────────
def test_hll_merge_is_register_wise_max(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    full = hll_registers(_token_occ_frame(docs), "token", b=_HLL_B)
    halves = [
        hll_registers(
            _token_occ_frame(docs.where(F.col("doc_id") % 2 == p)),
            "token", b=_HLL_B,
        )
        for p in (0, 1)
    ]
    merged = (
        halves[0].unionByName(halves[1])
        .groupBy("bucket")
        .agg(F.max("reg").cast("bigint").alias("reg"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_hll_registers_match_python_twin(spark):
    keys = [f"key-{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r.bucket: r.reg
        for r in hll_registers(df, "k", b=_HLL_B).collect()
    }
    m, w_bits = 1 << _HLL_B, 40 - _HLL_B
    exp = {b: 0 for b in range(m)}
    for k in keys:
        h = stable_hash40_py(k)
        w = h // m
        rho = w_bits - w.bit_length() + 1
        exp[h % m] = max(exp[h % m], rho)
    assert got == exp


def test_hll_estimate_quality(spark):
    # corpus vocabulary (31) is deep in the linear-counting regime:
    # the documented caller-side correction from n_zero must land
    # close; a 5000-key synthetic exercises the raw-alpha regime
    # (m=64 -> rse ~13%; everything is deterministic, no flake)
    occ = _occ(spark)
    true_v = occ.select("token").distinct().count()
    row = hll_estimate(
        hll_registers(occ, "token", b=_HLL_B), b=_HLL_B
    ).collect()[0]
    m = 1 << _HLL_B
    assert row.m == m
    corrected = m * math.log(m / row.n_zero)
    assert abs(corrected - true_v) <= 0.25 * true_v

    big = spark.range(5000).select(
        F.concat(F.lit("syn-"), F.col("id")).alias("k")
    )
    est = hll_estimate(
        hll_registers(big, "k", b=_HLL_B), b=_HLL_B
    ).collect()[0].est_floor
    assert abs(est - 5000) <= 0.30 * 5000


def test_cms_cells_py_agrees_with_plan(spark):
    # the driver-side cell derivation used for lookups/oracles must
    # agree with the in-plan derivation — pin via a 1-key sketch
    df = spark.createDataFrame([("only-key",)], "k string")
    sk = cms_sketch(df, "k", depth=_CMS_D, width=_CMS_W).collect()
    got = sorted((r.row_i, r.col) for r in sk)
    assert got == sorted(cms_cells_py("only-key", _CMS_D, _CMS_W))
    assert all(r.cnt == 1 for r in sk)


# ── q-digest ─────────────────────────────────────────────────────────
_QD_L = 10  # test universe 1024
_QD_K = 16


def _qd_replica(values, levels, k):
    """Independent Python replica of the level-by-level compression
    (third implementation alongside Spark and the DuckDB twin)."""
    from collections import Counter

    n = len(values)
    T = n // k
    cur = Counter(values)
    frozen = []
    for lvl in range(levels, 0, -1):
        groups = {}
        for idx, cnt in cur.items():
            groups.setdefault(idx // 2, []).append((idx, cnt))
        nxt = Counter()
        for p, kids in groups.items():
            s = sum(c for _, c in kids)
            if s <= T:
                nxt[p] += s
            else:
                frozen.extend(
                    (lvl, idx, c) for idx, c in kids if c > 0
                )
                nxt[p] += 0
        cur = nxt
    frozen.extend((0, idx, c) for idx, c in cur.items() if c > 0)
    return sorted(frozen)


def _qd_rank_est(digest, levels, q_ppm, n):
    order = sorted(
        ((idx + 1) * (1 << (levels - lvl)) - 1, -lvl, cnt)
        for lvl, idx, cnt in digest
    )
    r = (q_ppm * n + 999_999) // 1_000_000
    cum = 0
    for ub, _, cnt in order:
        cum += cnt
        if cum >= r:
            return ub, r
    return None, r


def test_qdigest_matches_replica_and_mass(spark):
    import random

    rng = random.Random(7)
    vals = [
        min(int(rng.expovariate(1 / 60)), (1 << _QD_L) - 1)
        for _ in range(2000)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    from umls2rdf_spark.operators.sketch import qdigest_build

    dig = sorted(
        (r.level, r.idx, r.cnt)
        for r in qdigest_build(df, "v", levels=_QD_L, k=_QD_K).collect()
    )
    assert dig == _qd_replica(vals, _QD_L, _QD_K)
    assert sum(c for _, _, c in dig) == len(vals)
    # size bound: <= 2k nodes frozen per level + root
    assert len(dig) <= 2 * _QD_K * _QD_L + 1


def test_qdigest_rank_error_bound(spark):
    """The classic q-digest guarantee: the estimate's true rank
    bracket — count(x <= est) >= target rank, and est is not more
    than levels·(n div k) ranks too far right."""
    import random

    rng = random.Random(13)
    for trial in range(3):
        vals = [
            min(int(rng.expovariate(1 / (30 * (trial + 1)))),
                (1 << _QD_L) - 1)
            for _ in range(1500)
        ]
        dig = _qd_replica(vals, _QD_L, _QD_K)
        n = len(vals)
        bound = _QD_L * (n // _QD_K)
        sv = sorted(vals)
        for q in (100_000, 500_000, 900_000):
            est, r = _qd_rank_est(dig, _QD_L, q, n)
            le = sum(1 for v in sv if v <= est)
            lt = sum(1 for v in sv if v < est)
            assert le >= r, (trial, q, le, r)
            assert lt <= r - 1 + bound, (trial, q, lt, r, bound)


def test_qdigest_merge_is_compress_of_union(spark):
    """Mergeability: compress(union of shard digests) has the same
    total mass and stays within the doubled rank-error bound."""
    import random

    from umls2rdf_spark.operators.sketch import (
        qdigest_build,
        qdigest_compress,
        qdigest_quantiles,
    )

    rng = random.Random(99)
    a = [min(int(rng.expovariate(1 / 50)), 1023) for _ in range(900)]
    b = [min(int(rng.expovariate(1 / 200)), 1023) for _ in range(900)]
    da = qdigest_build(
        spark.createDataFrame([(v,) for v in a], "v bigint"),
        "v", levels=_QD_L, k=_QD_K,
    )
    db = qdigest_build(
        spark.createDataFrame([(v,) for v in b], "v bigint"),
        "v", levels=_QD_L, k=_QD_K,
    )
    merged = qdigest_compress(
        da.unionByName(db), levels=_QD_L, k=_QD_K
    )
    rows = merged.collect()
    n = len(a) + len(b)
    assert sum(r.cnt for r in rows) == n
    qs = qdigest_quantiles(merged, [500_000], levels=_QD_L).collect()
    est, r = qs[0].est, qs[0].rank_target
    sv = sorted(a + b)
    bound = 2 * _QD_L * (n // _QD_K) + _QD_L  # shard Ts + merge T
    le = sum(1 for v in sv if v <= est)
    lt = sum(1 for v in sv if v < est)
    assert le >= r
    assert lt <= r - 1 + bound


def test_qdigest_valve_and_empty(spark):
    import pytest

    from umls2rdf_spark.operators.sketch import (
        qdigest_build,
        qdigest_quantiles,
    )

    bad = spark.createDataFrame([(1 << _QD_L,)], "v bigint")
    with pytest.raises(Exception, match="qdigest_build"):
        qdigest_build(bad, "v", levels=_QD_L, k=_QD_K).collect()
    empty = spark.createDataFrame([], "v bigint")
    dig = qdigest_build(empty, "v", levels=_QD_L, k=_QD_K)
    assert dig.count() == 0
    assert qdigest_quantiles(dig, [500_000], levels=_QD_L).count() == 0


def test_qdigest_matches_duckdb_twin(spark, duck):
    from tests.conftest import assert_matches_oracle
    from umls2rdf_spark.plans.completion import (
        _QD_LEVELS,
        _QD_K as _DEMO_K,
        _QD_QS,
        _qdigest_nodes_sql,
    )
    from umls2rdf_spark.operators.sketch import (
        qdigest_build,
        qdigest_quantiles,
        qdigest_quantiles_sql,
    )
    from umls2rdf_spark.sources.parquet import load_table
    from tests.conftest import SF_DIR_ORACLE
    import pyspark.sql.functions as F

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    dig = qdigest_build(
        docs.select(
            F.least(
                F.col("n_chars"), F.lit((1 << _QD_LEVELS) - 1)
            ).alias("len_clamped")
        ),
        "len_clamped", levels=_QD_LEVELS, k=_DEMO_K,
    )
    assert_matches_oracle(dig, duck, _qdigest_nodes_sql())
    assert_matches_oracle(
        qdigest_quantiles(dig, list(_QD_QS), levels=_QD_LEVELS),
        duck,
        qdigest_quantiles_sql(
            _qdigest_nodes_sql(), list(_QD_QS), levels=_QD_LEVELS
        ),
    )


def test_qdigest_per_group_equals_filtered_builds(spark):
    """group_cols: per-group digests and quantiles from one frame
    must be byte-equal to filtering first and building per group."""
    import random

    from umls2rdf_spark.operators.sketch import (
        qdigest_build,
        qdigest_quantiles,
    )

    rng = random.Random(5)
    rows = [
        (["a", "b", "c"][i % 3],
         min(int(rng.expovariate(1 / (40 * (i % 3 + 1)))), 1023))
        for i in range(1200)
    ]
    df = spark.createDataFrame(rows, "src string, v bigint")
    grouped = qdigest_build(
        df, "v", levels=_QD_L, k=_QD_K, group_cols=("src",)
    )
    got = sorted(map(tuple, grouped.collect()))
    want = []
    for s in ("a", "b", "c"):
        sub = qdigest_build(
            df.where(F.col("src") == s), "v", levels=_QD_L, k=_QD_K
        )
        want.extend((s, *t) for t in map(tuple, sub.collect()))
    assert got == sorted(want)

    gq = sorted(
        map(
            tuple,
            qdigest_quantiles(
                grouped, [500_000], levels=_QD_L, group_cols=("src",)
            ).collect(),
        )
    )
    wq = []
    for s in ("a", "b", "c"):
        sub = qdigest_build(
            df.where(F.col("src") == s), "v", levels=_QD_L, k=_QD_K
        )
        for t in qdigest_quantiles(
            sub, [500_000], levels=_QD_L
        ).collect():
            wq.append((s, *tuple(t)))
    assert gq == sorted(wq)


def test_qdigest_local_finish_equals_distributed(spark):
    """The ungrouped build's driver-side compression must be
    byte-equal to the distributed level sweep."""
    import random

    from umls2rdf_spark.operators.sketch import qdigest_build

    rng = random.Random(21)
    vals = [
        min(int(rng.expovariate(1 / 90)), (1 << _QD_L) - 1)
        for _ in range(1500)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    loc = sorted(
        map(
            tuple,
            qdigest_build(
                df, "v", levels=_QD_L, k=_QD_K, local_finish=True
            ).collect(),
        )
    )
    dist = sorted(
        map(
            tuple,
            qdigest_build(
                df, "v", levels=_QD_L, k=_QD_K, local_finish=False
            ).collect(),
        )
    )
    assert loc == dist
