"""Nearest-class-centroid classification over embedding columns —
the evaluation-loop primitive for a labeled corpus (train a centroid
per label, classify held-out vectors, emit the confusion matrix).

Everything is exact integer math on the milliunit-quantized vectors
(same convention as operators/similarity): centroids are per-label
component-wise floor-div means, distances are int64 squared-L2, ties
resolve to the lowest label — so train/predict/confusion are
bit-identical across engines and partitionings, and the whole loop
has a plain-SQL oracle.

Scale shape: the train split reduces to |labels| x dim integer sums
(map-side combined; the collect is label-count x dim ints — constant
in n); scoring is a map-only pass with the centroid matrix in the
closure; the confusion matrix is a |labels|² aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from umls2rdf_spark.functions.hashing import stable_hash40


def train_label_centroids(
    vectors: DataFrame,
    vec_col: str,
    label_col: str,
) -> dict[int, list[int]]:
    """Per-label integer mean centroid of the quantized vectors.

    One aggregation: explode components, sum per (label, position),
    floor-divide by the label count. Returns {label: [int] * dim} —
    bounded at |labels| x dim, collected for broadcast into scoring.
    """
    from umls2rdf_spark.functions.vectors import quantize

    q = vectors.select(
        F.col(label_col).alias("label"),
        quantize(F.col(vec_col)).alias("qvec"),
    )
    comp = q.select(
        "label", F.posexplode(F.col("qvec")).alias("pos", "c")
    )
    sums = comp.groupBy("label", "pos").agg(
        F.sum("c").alias("s"), F.count(F.lit(1)).alias("n")
    )
    rows = sums.collect()
    cent: dict[int, dict[int, int]] = {}
    for r in rows:
        # Python // floors toward -inf; the SQL oracle must use a
        # floor-division spelling too (DuckDB: CAST(floor(s / n) ...))
        cent.setdefault(r["label"], {})[r["pos"]] = r["s"] // r["n"]
    return {
        lab: [by_pos[p] for p in sorted(by_pos)]
        for lab, by_pos in cent.items()
    }


def centroid_confusion(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    test_mod: int = 5,
    kernel_budget_bytes: int = 128 << 20,
) -> DataFrame:
    """Hold-out evaluation: rows with stable_hash40(id) % test_mod
    == 0 form the test split, the rest train the centroids; each test
    vector is assigned the label of its nearest centroid (exact int64
    squared-L2, ties to the lowest label). Output: one row per
    (label, predicted) pair with its count — the confusion matrix in
    long form, plus is_correct for convenience.
    """
    import numpy as np

    # the output label/predicted fields carry the SOURCE label type
    # (same policy as pq.py for id_col) — a bigint or string label
    # must not be truncated through a hard-coded int32 Arrow schema
    label_dtype = dict(vectors.dtypes)[label_col]
    is_test = (
        F.pmod(
            stable_hash40(F.col(id_col).cast("string")), F.lit(test_mod)
        )
        == 0
    )
    train = vectors.where(~is_test)
    test = vectors.where(is_test)
    cent_map = train_label_centroids(train, vec_col, label_col)
    budget_bytes = int(kernel_budget_bytes)
    labels = sorted(cent_map)
    cent = np.array([cent_map[lab] for lab in labels], dtype=np.int64)
    lab_arr = np.array(labels)  # dtype follows the label values

    def assign(batches):
        import pandas as pd_

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf[vec_col].values).astype(np.float64)
            Y = V * 1000
            q = (np.sign(Y) * np.floor(np.abs(Y) + 0.5)).astype(np.int64)
            n, dim = q.shape
            # the broadcasted (batch x labels x dim) difference temp
            # is fine for bounded label sets but scales linearly with
            # |labels| — chunk the label axis so the temp stays
            # ~128 MB whatever the label cardinality. Chunks are
            # processed in sorted-label order and updates are strict
            # '<', so ties still resolve to the lowest label.
            chunk = max(1, int(budget_bytes // max(1, n * dim * 8)))
            best_d = None
            best_i = None
            for s in range(0, len(cent), chunk):
                d2 = (
                    (q[:, None, :] - cent[None, s : s + chunk, :]) ** 2
                ).sum(axis=2)
                i = d2.argmin(axis=1)
                d = d2[np.arange(n), i]
                if best_d is None:
                    best_d, best_i = d, i + s
                else:
                    upd = d < best_d
                    best_d = np.where(upd, d, best_d)
                    best_i = np.where(upd, i + s, best_i)
            pred = lab_arr[best_i]  # first min = lowest label
            yield pd_.DataFrame(
                {"label": pdf[label_col].values, "predicted": pred}
            )

    assigned = test.select(F.col(vec_col), F.col(label_col)).mapInPandas(
        assign, schema=f"label {label_dtype}, predicted {label_dtype}"
    )
    return (
        assigned.groupBy("label", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("is_correct", F.col("label") == F.col("predicted"))
    )
