"""Continuous sketch maintenance: keep a count-min matrix and an HLL
register table up to date over a document stream — live heavy-hitter
counts and live distinct-token cardinality for a corpus that is still
arriving, at O(d·w + m) standing state.

This is the streaming face of operators/sketch.py and it leans
entirely on the sketches' MERGE laws (cell-wise ADD for CMS,
register-wise MAX for HLL — both exact, pinned by the batch tests):

- each micro-batch writes ITS OWN batch-local sketch under a
  ``batch_id=N`` partition (idempotent overwrite — an at-least-once
  foreachBatch replay rewrites the same epoch instead of
  double-counting; the same discipline as
  events.run_incremental_minhash_ingest);
- the standing sketch is the merge-on-read reduction over epochs
  (:func:`read_cms` / :func:`read_hll`) — a groupBy over ≤
  epochs·d·w tiny rows, never over the data;
- because merge is associative+commutative (ADD) / idempotent-max
  (MAX), readers get a CORRECT sketch of everything ingested so far
  at ANY point between batches, and equal to the single-shot batch
  sketch of the same corpus (pinned end-to-end by test).

No watermark, no state store: the sketch tables ARE the state, plain
parquet any batch consumer can read, merge across pipelines, or ship
to another cluster. 100 TB: per-batch cost is the batch sketch
(bounded map-side combine); standing state is epochs·d·w rows until
:func:`compact_sketch_state` folds history into one epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umls2rdf_spark.operators.sketch import cms_sketch, hll_registers
from umls2rdf_spark.streaming.events import read_standing_state

#: tokenizer shared with the batch sketch demos (plans/completion.py)
_TOK_ARR = "filter(split(lower({col}), '[^a-z0-9]+'), x -> x <> '')"


def _token_occ(batch_df: DataFrame, text_col: str) -> DataFrame:
    return batch_df.select(
        F.explode(F.expr(_TOK_ARR.format(col=text_col))).alias("token")
    )


def run_sketch_maintenance(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    depth: int = 4,
    width: int = 512,
    b: int = 6,
) -> None:
    """Drive the stream to completion (availableNow), maintaining
    ``{state_dir}/cms`` and ``{state_dir}/hll`` batch-partitioned
    sketch tables."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        occ = _token_occ(batch_df, text_col)
        cms_sketch(occ, "token", depth=depth, width=width).write.mode(
            "overwrite"
        ).parquet(f"{state_dir}/cms/batch_id={batch_id}")
        hll_registers(occ, "token", b=b).write.mode(
            "overwrite"
        ).parquet(f"{state_dir}/hll/batch_id={batch_id}")

    q = (
        docs_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_cms(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The standing count-min matrix: cell-wise ADD over all epochs
    (None before the first batch lands). Fail-closed on any
    non-missing-path read error (events.read_standing_state)."""
    raw = read_standing_state(spark, f"{state_dir}/cms")
    if raw is None:
        return None
    return (
        raw.groupBy("row_i", "col")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def read_hll(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The standing HLL registers: register-wise MAX over all epochs
    (spine completeness survives the merge — every epoch writes all
    m buckets)."""
    raw = read_standing_state(spark, f"{state_dir}/hll")
    if raw is None:
        return None
    return (
        raw.groupBy("bucket")
        .agg(F.max("reg").cast("bigint").alias("reg"))
    )


def compact_sketch_state(
    spark: SparkSession, state_dir: str, into_batch_id: int = -1
) -> None:
    """Fold all epochs into one ``batch_id={into_batch_id}`` epoch
    (merge laws make this a pure rewrite: merged-then-read equals
    read-then-merged). Run it OUTSIDE the streaming query, between
    triggers; the stream's next epoch writes a fresh partition as
    usual. A crash between the two writes below leaves BOTH the
    compacted epoch and the originals in place — re-reading
    double-counts CMS cells, so the rewrite order is: write compact
    epoch to a temp dir, swap directories, then drop originals.
    For the availableNow/test cadence the simple in-place form
    suffices; a production deployment would stage-and-rename.
    """
    import os
    import shutil

    for sub, merged in (
        ("cms", read_cms(spark, state_dir)),
        ("hll", read_hll(spark, state_dir)),
    ):
        if merged is None:
            continue
        tmp = f"{state_dir}/__compact_{sub}"
        merged.write.mode("overwrite").parquet(tmp)
        out = f"{state_dir}/{sub}"
        shutil.rmtree(out)
        os.makedirs(out)
        shutil.move(tmp, f"{out}/batch_id={into_batch_id}")


# ── q-digest ─────────────────────────────────────────────────────────
def run_qdigest_maintenance(
    values_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str,
    levels: int = 13,
) -> None:
    """Continuous quantile-sketch maintenance — the q-digest face of
    the module. The standing state is the LEAF HISTOGRAM partials
    (``{state_dir}/qd_leaf``, one ``batch_id=N`` partition per
    epoch), not per-epoch digests: leaf counts merge by plain ADD, so
    compress-on-read (:func:`read_qdigest`) is EXACTLY the
    single-shot batch digest of everything ingested — no error
    accumulation across epochs (per-epoch digests would merge with
    bounded but GROWING rank error; the leaf frame is already bounded
    at ≤ 2^levels rows per epoch, so exactness is free). Same
    idempotent-overwrite replay discipline as the CMS/HLL loops.

    Out-of-universe values CLAMP into the edge buckets (an in-plan
    raise would kill the standing query mid-epoch; clamping keeps
    every arrival counted and matches the batch demo's explicit
    clamp — so streamed == batch still holds exactly when the batch
    side clamps the same way, which the pin test does)."""
    top = (1 << levels) - 1

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        leaves = (
            batch_df.select(
                F.greatest(
                    F.lit(0),
                    F.least(
                        F.col(value_col).cast("bigint"), F.lit(top)
                    ),
                ).alias("idx")
            )
            .groupBy("idx")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        leaves.write.mode("overwrite").parquet(
            f"{state_dir}/qd_leaf/batch_id={batch_id}"
        )

    q = (
        values_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_qdigest(
    spark: SparkSession, state_dir: str, levels: int = 13, k: int = 256
) -> DataFrame | None:
    """The standing digest: leaf partials summed across epochs, then
    one compression — byte-equal to the batch digest of the union
    (pinned by test). None before the first epoch lands."""
    from umls2rdf_spark.operators.sketch import qdigest_compress_py

    raw = read_standing_state(spark, f"{state_dir}/qd_leaf")
    if raw is None:
        return None
    leaves = raw.groupBy("idx").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    # merged leaves are <= 2^levels rows by construction — the
    # driver-side compression (byte-equal to the distributed form,
    # pinned) beats `levels` sequential tiny jobs on every read
    digest = qdigest_compress_py(
        [(r["idx"], r["cnt"]) for r in leaves.collect()], levels, k
    )
    return spark.createDataFrame(
        digest or [], "level int, idx bigint, cnt bigint"
    )
