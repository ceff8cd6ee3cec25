"""ANN recall@10 at 1M clustered vectors (round-7 verdict item 8):
the small-n recall evidence in SCALE.md is extended to a
million-vector CLUSTERED corpus — the distribution ANN indexes are
actually built for (web embeddings cluster; the sf0.1 synthetic
embeddings are near-random, LSH's worst case) — with the auto-sizing
knobs (`auto_planes`, `auto_cells`) left to pick their own settings.

Corpus: 1M vectors, dim=16, 2000 synthetic clusters (hash-seeded
centers, deterministic per-id noise — reproducible without RNG
state). Ground truth: exact cosine top-10 for 256 hash-sampled query
ids via the broadcast `cosine_topk` (1M × 256 scored pairs).
Measured: LSH multi-probe (planes=auto) and trained-IVF
(cells=auto, Lloyd-trained on a 1-in-16 sample) at nprobe 1/2/4/8 —
both corpus-vs-corpus, the production workload — plus IVF-PQ
(ADC over 1-byte-per-subspace codes) query-vs-corpus at nprobe
1/4/16.

Run: ``python tools/ann_recall.py [--n 1000000]`` — one JSON line on
stdout, a markdown table on stderr. Numbers recorded in SCALE.md;
tests/test_ann_recall_small.py pins the harness's mechanics at small
n so the tool itself stays correct.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

DIM = 16
CLUSTERS = 2000
QUERY_RATE = 4096  # 1M / 4096 ≈ 244 sampled queries
K = 10


def make_vectors(spark, n: int, out_path: str,
                 clusters: int = CLUSTERS):
    """Deterministic clustered corpus: center[c] from a hash grid,
    member = center + per-(id, component) hash noise. float arrays
    (the ANN ops quantize ×1000 themselves). ``clusters`` scales the
    members-per-cluster density (recall@10 is only meaningful when
    clusters hold >= ~K members)."""
    import numpy as np
    import pandas as pd

    centers = (
        np.random.default_rng(42)
        .normal(0.0, 1.0, size=(clusters, DIM))
        .astype(np.float64)
    )

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].values
            cl = (ids % clusters).astype(np.int64)
            # deterministic per-(id, j) noise in [-0.05, 0.05):
            # integer hash, no RNG state
            i = ids[:, None].astype(np.uint64)
            j = np.arange(DIM, dtype=np.uint64)[None, :]
            h = (i * np.uint64(2654435761) + j * np.uint64(40503)) % (
                np.uint64(100000)
            )
            noise = (h.astype(np.float64) / 100000.0 - 0.5) * 0.1
            yield pd.DataFrame(
                {"id": ids, "vec": list(centers[cl] + noise)}
            )

    df = spark.range(n).mapInPandas(gen, "id long, vec array<double>")
    df.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


def recall_at_k(approx_rows, exact: dict[int, set]) -> float:
    """Mean |approx ∩ exact| / |exact| over the sampled queries.
    ``approx_rows``: (query_id, neighbor_id) pairs for sampled ids."""
    got: dict[int, set] = {q: set() for q in exact}
    for q, nbr in approx_rows:
        if q in got:
            got[q].add(nbr)
    return sum(
        len(got[q] & e) / max(len(e), 1) for q, e in exact.items()
    ) / len(exact)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--path", default="/tmp/ann_recall_vec.parquet")
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument(
        "--methods", default="",
        help="comma-separated substring filter on method labels "
        "(empty = run all); training for a filtered-out family "
        "still runs (cheap next to the scoring legs)",
    )
    ap.add_argument(
        "--clusters",
        type=int,
        default=CLUSTERS,
        help="cluster count; n/clusters members each — at 1M/2000 "
        "(default) every exact top-10 is same-cluster and recall "
        "saturates once the right cluster is probed; 1M/100k (10 "
        "members) makes the 10th neighbor cross-cluster, the "
        "non-saturated operating point",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from umls2rdf_spark.functions.hashing import stable_hash40
    from umls2rdf_spark.operators.pq import (
        ivf_pq_topk,
        train_pq_codebooks,
    )
    from umls2rdf_spark.operators.similarity import (
        auto_cells,
        auto_planes,
        cosine_topk,
        ivf_cosine_topk,
        lsh_cosine_topk,
        train_ivf_centroids,
    )
    from umls2rdf_spark.session import get_spark

    spark = get_spark(app_name="ann-recall", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    if args.skip_build and os.path.exists(args.path):
        vectors = spark.read.parquet(args.path)
    else:
        vectors = make_vectors(
            spark, args.n, args.path, clusters=args.clusters
        )
    vectors = vectors.persist()
    n = vectors.count()

    q_pred = stable_hash40(F.col("id").cast("string")) % QUERY_RATE == 0
    queries = vectors.where(q_pred).persist()
    nq = queries.count()
    print(f"n={n} queries={nq} planes_auto={auto_planes(n)} "
          f"cells_auto={auto_cells(n)}", file=sys.stderr)

    t0 = time.time()
    exact_df = cosine_topk(vectors, queries, "id", "vec", k=K, dim=DIM)
    exact: dict[int, set] = {}
    for r in exact_df.collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    t_exact = time.time() - t0
    print(f"exact ground truth: {t_exact:.1f}s", file=sys.stderr)

    results = []

    def run(label, fn, corpus_vs_corpus=True):
        if args.methods and not any(
            m in label for m in args.methods.split(",")
        ):
            return
        t = time.time()
        out = fn()
        if corpus_vs_corpus:
            out = out.where(
                stable_hash40(F.col("query_id").cast("string"))
                % QUERY_RATE == 0
            )
        # drop the self-hit (queries are corpus members) and keep the
        # top-K remaining BY RANK, so a k=K+1 request compares on an
        # equal footing with the K-row ground truth
        per_q: dict[int, list] = {}
        for r in out.select(
            "query_id", "neighbor_id",
            F.col(out.columns[2]).alias("rank")
            if "rank" not in out.columns else F.col("rank"),
        ).collect():
            if r["neighbor_id"] == r["query_id"]:
                continue
            per_q.setdefault(r["query_id"], []).append(
                (r["rank"], r["neighbor_id"])
            )
        rows = [
            (q, nbr)
            for q, lst in per_q.items()
            for _, nbr in sorted(lst)[:K]
        ]
        rec = recall_at_k(rows, exact)
        wall = time.time() - t
        results.append(
            {"method": label, "recall_at_10": round(rec, 4),
             "wall_s": round(wall, 1)}
        )
        print(f"{label}: recall@10={rec:.4f} wall={wall:.1f}s",
              file=sys.stderr, flush=True)

    # LSH multi-probe, auto planes (corpus-vs-corpus; exact-salt mode
    # so nprobe composes with the oversized-bucket valve)
    for nprobe in (1, 2, 4, 8):
        run(
            f"lsh planes=auto nprobe={nprobe}",
            lambda np_=nprobe: lsh_cosine_topk(
                vectors, "id", "vec", k=K, planes=None, dim=DIM,
                known_n=n, nprobe=np_, max_bucket=4096,
                salt_mode="exact",
            ),
        )

    # trained IVF, auto cells (corpus-vs-corpus)
    t = time.time()
    cent = train_ivf_centroids(
        vectors, "id", "vec", cells=None, iters=2, dim=DIM,
        train_mod=16, known_n=n,
    )
    print(f"ivf training ({len(cent)} cells): {time.time()-t:.1f}s",
          file=sys.stderr)
    for nprobe in (1, 2, 4, 8):
        run(
            f"ivf cells=auto(trained) nprobe={nprobe}",
            lambda np_=nprobe: ivf_cosine_topk(
                vectors, "id", "vec", k=K, dim=DIM,
                centroids=cent, nprobe=np_,
            ),
        )

    # IVF-PQ (query-vs-corpus ADC over 2-component subspace codes)
    t = time.time()
    books = train_pq_codebooks(
        vectors, "id", "vec", m=8, k=16, iters=2, dim=DIM,
        train_mod=16,
    )
    print(f"pq training: {time.time()-t:.1f}s", file=sys.stderr)
    for nprobe in (1, 4, 16):
        run(
            f"ivf_pq nprobe={nprobe}",
            lambda np_=nprobe: ivf_pq_topk(
                vectors, queries, "id", "vec", books, cent,
                k=K + 1, dim=DIM, nprobe=np_,
            ),
            corpus_vs_corpus=False,
        )
    # the IVFPQR answer to ADC code collapse: exact re-rank of the
    # top-`rerank` ADC candidates (operators/pq.py ivf_pq_topk)
    for nprobe, rr in ((4, 64), (16, 256)):
        run(
            f"ivf_pq nprobe={nprobe} rerank={rr}",
            lambda np_=nprobe, rr_=rr: ivf_pq_topk(
                vectors, queries, "id", "vec", books, cent,
                k=K + 1, dim=DIM, nprobe=np_, rerank=rr_,
            ),
            corpus_vs_corpus=False,
        )

    print("| method | recall@10 | wall (s) |", file=sys.stderr)
    print("|---|---|---|", file=sys.stderr)
    for r in results:
        print(f"| {r['method']} | {r['recall_at_10']} | "
              f"{r['wall_s']} |", file=sys.stderr)
    print(json.dumps({
        "n": n, "queries": nq, "dim": DIM,
        # with --skip-build the on-disk corpus's geometry is
        # whatever it was built with — don't mislabel the evidence
        "clusters": None if args.skip_build else args.clusters,
        "exact_wall_s": round(t_exact, 1), "results": results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
