"""Bucketed (LSH) hard-negative mining vs the exact broadcast
baseline (similarity.py hard_negative_topk / hard_negative_topk_lsh).

The exact form is the oracle: every LSH property here is stated
relative to it — full-coverage degeneration, monotone recall in
nprobe, score agreement on returned pairs, and the label/self
predicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from umls2rdf_spark.operators.similarity import (
    hard_negative_topk,
    hard_negative_topk_lsh,
)


def _pairs(rows):
    return {(r.query_id, r.neighbor_id) for r in rows}


def _exact(spark, emb, k=2):
    return hard_negative_topk(
        emb, emb, "vec_id", "embedding", "label", k=k
    ).collect()


def test_full_probe_degenerates_to_exact(spark):
    """planes=1 splits the corpus into 2 buckets; nprobe=2 probes
    both, so every query sees the whole corpus and the bucketed
    miner must return EXACTLY the exact baseline's rows — ranks,
    ids, and cosines."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = sorted(
        (r.query_id, r.neighbor_id, r.rank, round(r.cos_sim, 9))
        for r in _exact(spark, emb)
    )
    lsh = sorted(
        (r.query_id, r.neighbor_id, r.rank, round(r.cos_sim, 9))
        for r in hard_negative_topk_lsh(
            emb, "vec_id", "embedding", "label", k=2, planes=1, nprobe=2
        ).collect()
    )
    assert lsh == exact


def test_recall_monotone_in_nprobe(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact_set = _pairs(_exact(spark, emb))
    recalls = []
    for nprobe in (1, 2, 4):
        got = _pairs(
            hard_negative_topk_lsh(
                emb, "vec_id", "embedding", "label",
                k=2, planes=5, nprobe=nprobe,
            ).collect()
        )
        recalls.append(len(got & exact_set) / len(exact_set))
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] > 0


def test_label_and_self_predicates_and_score_agreement(spark):
    """Every returned pair is non-self and different-label, and its
    cosine equals the exact scorer's cosine for the same pair (the
    bucket restricts candidates, never changes scores)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    lab = dict(
        emb.select("vec_id", "label").rdd.map(tuple).collect()
    )
    # exact all-pairs scores at a large k so every LSH pair appears
    exact_all = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in hard_negative_topk(
            emb, emb, "vec_id", "embedding", "label", k=500
        ).collect()
    }
    rows = hard_negative_topk_lsh(
        emb, "vec_id", "embedding", "label", k=2, planes=5, nprobe=2
    ).collect()
    assert rows
    for r in rows:
        assert r.query_id != r.neighbor_id
        assert lab[r.query_id] != lab[r.neighbor_id]
        assert abs(exact_all[(r.query_id, r.neighbor_id)] - r.cos_sim) < 1e-12


def test_separate_query_frame(spark):
    """Corpus-resident / query-probe split: only query ids emit
    rows, corpus rows never mine, and predicates hold."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 40)
    rows = hard_negative_topk_lsh(
        emb, "vec_id", "embedding", "label",
        k=2, planes=4, nprobe=2, queries=qs,
    ).collect()
    assert rows
    assert {r.query_id for r in rows} <= set(range(40))
    lab = dict(emb.select("vec_id", "label").rdd.map(tuple).collect())
    for r in rows:
        assert r.query_id != r.neighbor_id
        assert lab[r.query_id] != lab[r.neighbor_id]


def test_adaptive_planes_path(spark):
    """planes=None sizes the bucket space from the corpus and still
    returns well-formed, predicate-respecting rows."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = hard_negative_topk_lsh(
        emb, "vec_id", "embedding", "label", k=2, planes=None,
        known_n=500,
    ).collect()
    assert rows
    by_q: dict[int, list[int]] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_max_bucket_valve_is_result_identical(spark):
    """The block-pair skew valve must return EXACTLY the unsalted
    result — including on a degenerate corpus where every vector
    lands in one bucket (planes=1 on one-sided data would; here we
    force pressure with a tiny max_bucket on real buckets), and
    composed with nprobe."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def rows(**kw):
        return sorted(
            (r.query_id, r.neighbor_id, r.rank, round(r.cos_sim, 9))
            for r in hard_negative_topk_lsh(
                emb, "vec_id", "embedding", "label", k=2, **kw
            ).collect()
        )

    for kw in (
        dict(planes=2),
        dict(planes=2, nprobe=2),
        dict(planes=4, nprobe=3),
    ):
        base = rows(**kw)
        salted = rows(max_bucket=8, **kw)
        assert salted == base, kw
    # separate-query form too
    qs = emb.where(F.col("vec_id") < 30)
    base = sorted(
        (r.query_id, r.neighbor_id, r.rank, round(r.cos_sim, 9))
        for r in hard_negative_topk_lsh(
            emb, "vec_id", "embedding", "label", k=2, planes=2,
            queries=qs,
        ).collect()
    )
    salted = sorted(
        (r.query_id, r.neighbor_id, r.rank, round(r.cos_sim, 9))
        for r in hard_negative_topk_lsh(
            emb, "vec_id", "embedding", "label", k=2, planes=2,
            queries=qs, max_bucket=8,
        ).collect()
    )
    assert salted == base


def test_lsh_topk_exact_salt_mode_identical(spark):
    """lsh_cosine_topk(salt_mode='exact'): the block-pair valve
    yields row-identical results to the unsalted run (no recall
    loss), including composed with nprobe — unlike the default
    subsample salting, which is a documented recall trade."""
    from umls2rdf_spark.operators.similarity import lsh_cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def rows(**kw):
        return sorted(
            (r.query_id, r.neighbor_id, r.rank, round(r.cos_sim, 9))
            for r in lsh_cosine_topk(
                emb, "vec_id", "embedding", k=3, **kw
            ).collect()
        )

    for kw in (dict(planes=2), dict(planes=3, nprobe=2)):
        base = rows(**kw)
        exact_salted = rows(max_bucket=8, salt_mode="exact", **kw)
        assert exact_salted == base, kw
    # the default subsample mode on the same pressure DOES differ
    # (documents the trade the exact mode removes)
    assert rows(planes=2, max_bucket=8) != rows(planes=2)


def test_near_dup_pairs_exact_salt_mode_identical(spark):
    """cosine_near_dup_pairs(salt_mode='exact'): pair set identical
    to unsalted under heavy bucket pressure — each unordered pair
    surfaces exactly once (no post-distinct needed)."""
    from umls2rdf_spark.operators.similarity import cosine_near_dup_pairs

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def pairs(**kw):
        rows = cosine_near_dup_pairs(
            emb, "vec_id", "embedding", min_cos=0.2, planes=2, **kw
        ).collect()
        tuples = [(r.id_a, r.id_b, round(r.cos_sim, 9)) for r in rows]
        assert len(tuples) == len(set(tuples))  # no duplicates
        return sorted(tuples)

    assert pairs(max_bucket=8, salt_mode="exact") == pairs()
    # the default subsample mode drops cross-class pairs (the trade)
    assert pairs(max_bucket=8) != pairs()


def test_ivf_form_degenerates_and_is_monotone(spark):
    """hard_negative_topk_ivf: nprobe=cells degenerates to the exact
    baseline row-for-row; recall is monotone in nprobe; predicates
    hold on the separate-query form."""
    from umls2rdf_spark.operators.similarity import hard_negative_topk_ivf

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = sorted(
        (r.query_id, r.neighbor_id, r.rank, round(r.cos_sim, 9))
        for r in _exact(spark, emb)
    )
    full = sorted(
        (r.query_id, r.neighbor_id, r.rank, round(r.cos_sim, 9))
        for r in hard_negative_topk_ivf(
            emb, "vec_id", "embedding", "label", k=2, cells=4, nprobe=4
        ).collect()
    )
    assert full == exact
    exact_set = {(a, b) for a, b, _, _ in exact}
    recalls = []
    for nprobe in (1, 2, 3):
        got = {
            (r.query_id, r.neighbor_id)
            for r in hard_negative_topk_ivf(
                emb, "vec_id", "embedding", "label",
                k=2, cells=8, nprobe=nprobe,
            ).collect()
        }
        recalls.append(len(got & exact_set) / len(exact_set))
    assert recalls == sorted(recalls), recalls
    # separate-query form respects predicates
    lab = dict(emb.select("vec_id", "label").rdd.map(tuple).collect())
    rows = hard_negative_topk_ivf(
        emb, "vec_id", "embedding", "label", k=2, cells=8, nprobe=2,
        queries=emb.where(F.col("vec_id") < 25),
    ).collect()
    assert rows and {r.query_id for r in rows} <= set(range(25))
    for r in rows:
        assert r.query_id != r.neighbor_id
        assert lab[r.query_id] != lab[r.neighbor_id]


def test_null_labels_never_mine_or_get_mined(spark):
    """Three-valued '<>' parity: a NULL-label vector can neither
    mine negatives nor be mined as one — in the exact baseline
    (Spark's q_lab != c_lab is unknown for nulls) AND in both
    bucketed kernels, whose numpy object-array == would otherwise
    keep null-vs-labeled pairs (None == 'x' is False, not unknown).
    Degeneracy (full-probe bucketed == exact) must hold on a corpus
    containing a null label."""
    from umls2rdf_spark.operators.similarity import (
        hard_negative_topk_ivf,
    )

    rows = [
        (1, [1.0] * 4 + [0.0] * 60, "a"),
        (2, [0.9, 0.1] + [0.0] * 62, None),
        (3, [0.8, 0.3] + [0.0] * 62, "b"),
        (4, [0.7, 0.4] + [0.0] * 62, "a"),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    exact = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in hard_negative_topk(
            emb, emb, "vec_id", "embedding", "label", k=3
        ).collect()
    )
    assert all(2 not in (q, n) for q, n, _ in exact)
    assert exact  # the labeled rows do mine each other
    lsh = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in hard_negative_topk_lsh(
            emb, "vec_id", "embedding", "label", k=3, planes=1, nprobe=2
        ).collect()
    )
    assert lsh == exact
    ivf = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in hard_negative_topk_ivf(
            emb, "vec_id", "embedding", "label", k=3, cells=4, nprobe=4
        ).collect()
    )
    assert ivf == exact


def test_kernel_impl_equals_sql_baseline(spark):
    """round 9: hard_negative_topk's default impl moved to the
    single-bucket vectorized kernel (the SQL per-pair cosine is a
    ~190-node expression evaluated row-at-a-time above a
    BroadcastNestedLoopJoin — measured 3.2s vs 1.3s at sf0.1). The
    two implementations must return EXACTLY the same rows — ids,
    ranks, and bit-level cosines — including under the max_bucket
    completeness valve."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 40)
    sql_rows = sorted(
        (r.query_id, r.neighbor_id, r.rank, r.cos_sim)
        for r in hard_negative_topk(
            emb, queries, "vec_id", "embedding", "label", k=3,
            impl="sql",
        ).collect()
    )
    assert sql_rows
    kernel_rows = sorted(
        (r.query_id, r.neighbor_id, r.rank, r.cos_sim)
        for r in hard_negative_topk(
            emb, queries, "vec_id", "embedding", "label", k=3
        ).collect()
    )
    assert kernel_rows == sql_rows
    salted = sorted(
        (r.query_id, r.neighbor_id, r.rank, r.cos_sim)
        for r in hard_negative_topk(
            emb, queries, "vec_id", "embedding", "label", k=3,
            max_bucket=7,
        ).collect()
    )
    assert salted == sql_rows
