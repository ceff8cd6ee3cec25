"""Continuous funnel maintenance: the streaming face of
operators/funnel.py (B46) — the product-analytics dashboard case,
where events arrive in time-ordered epochs and "how many users have
completed steps 1..i so far" must be maintainable without replaying
history.

Standing state is a SNAPSHOT (not an append-only index like the
dedup stores): one row per (user, step) holding the user's greedy
earliest completion time, rewritten each epoch under
``{state_dir}/funnelstate/batch_id=N``. Reading takes the snapshot
with the HIGHEST batch_id excluding one's own (snapshots are
cumulative), so an at-least-once replay recomputes against the same
prior state — the own-partition-exclusion discipline adapted to
updated-in-place state.

Each micro-batch runs the batch operator's greedy recurrence with
the state as the head start: step 1's completion is
``min(state t1, batch step-1 min)``; step i's is
``min(state t_i, earliest batch step-i event strictly after the
step-(i-1) completion JUST computed)`` — so a conversion whose steps
span epochs (signup in epoch 0, purchase in epoch 2) completes the
moment its last step arrives.

Semantics, stated: with PER-USER TIME-ORDERED epochs (every event in
epoch e+1 at or after every event in epoch e for that user — the
watermark contract), the streamed state equals batch
``funnel_counts`` over the union EXACTLY, pinned by test. The
argument: greedy completions never improve retroactively — an old
step-i event predates the current step-(i-1) completion (else it
would have been used when it arrived), so discarding raw history
loses nothing. Out-of-order arrival degrades gracefully (a late
early event may be missed — the same trade watermarked aggregation
makes); the contract is "never un-complete, never double-count".

100 TB: per-batch cost is |steps| pushdown-filtered min-groupBys of
the BATCH plus one user-keyed join per step against the bounded
(users × steps) state; the state rewrite is O(active users), and
users that never re-appear cost storage, not compute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umls2rdf_spark.streaming.events import read_standing_state


def _read_snapshot(
    spark: SparkSession, state_dir: str, batch_id: int
) -> DataFrame | None:
    """Latest cumulative snapshot EXCLUDING the current epoch's own
    partition (replay idempotence)."""
    raw = read_standing_state(spark, f"{state_dir}/funnelstate")
    if raw is None:
        return None
    prior = raw.where(F.col("batch_id") != batch_id)
    mx = prior.agg(F.max("batch_id").alias("m")).collect()[0]["m"]
    if mx is None:
        return None
    return prior.where(F.col("batch_id") == mx).select(
        "u", "step", "t"
    )


def funnel_epoch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
) -> DataFrame:
    """ONE epoch's funnel advance: merge the batch into the standing
    per-(user, step) completion snapshot, overwrite the epoch's
    snapshot partition, and return the new per-step counts
    (step, event_type, n_users) — the same shape as the batch
    operator."""
    spark = batch_df.sparkSession
    state = _read_snapshot(spark, state_dir, batch_id)
    prev = None  # (u, __t): step i-1 completions after this batch
    levels = []
    for i, step_type in enumerate(steps):
        st = (
            state.where(F.col("step") == i + 1).select(
                "u", F.col("t").alias("__st")
            )
            if state is not None
            else None
        )
        stage = batch_df.where(F.col(type_col) == step_type).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("__ts")
        )
        if prev is None:
            cand = stage.groupBy("u").agg(F.min("__ts").alias("__c"))
        else:
            cand = (
                stage.join(prev, "u")
                .where(F.col("__ts") > F.col("__t"))
                .groupBy("u")
                .agg(F.min("__ts").alias("__c"))
            )
        if st is not None:
            # full-outer merge: either side may be absent for a
            # user; least() ignores NULLs in Spark only when both
            # are non-null, so spell the three cases out
            merged = cand.join(st, "u", "full").select(
                "u",
                F.when(
                    F.col("__c").isNotNull()
                    & F.col("__st").isNotNull(),
                    F.least("__c", "__st"),
                )
                .otherwise(F.coalesce("__c", "__st"))
                .alias("__t"),
            )
        else:
            merged = cand.select("u", F.col("__c").alias("__t"))
        merged = merged.localCheckpoint(eager=True)
        levels.append(merged)
        prev = merged
    snapshot = None
    for i, lv in enumerate(levels):
        part = lv.select(
            "u", F.lit(i + 1).cast("int").alias("step"), F.col("__t").alias("t")
        )
        snapshot = part if snapshot is None else snapshot.unionByName(part)
    snapshot.write.mode("overwrite").parquet(
        f"{state_dir}/funnelstate/batch_id={batch_id}"
    )
    saved = spark.read.parquet(
        f"{state_dir}/funnelstate/batch_id={batch_id}"
    )
    counts = None
    for i, step_type in enumerate(steps):
        c = (
            saved.where(F.col("step") == i + 1)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
            .select(
                F.lit(i + 1).cast("bigint").alias("step"),
                F.lit(step_type).alias("event_type"),
                "n_users",
            )
        )
        counts = c if counts is None else counts.unionByName(c)
    return counts


def run_funnel_intake(
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
) -> None:
    """Drive the stream to completion (availableNow), maintaining the
    per-(user, step) completion snapshot."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        funnel_epoch(
            batch_df, batch_id, state_dir, user_col, type_col,
            ts_col, steps,
        )

    q = (
        events_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_funnel_counts(
    spark: SparkSession, state_dir: str, steps: list[str]
) -> DataFrame:
    """Current funnel counts from the LATEST snapshot."""
    raw = read_standing_state(spark, f"{state_dir}/funnelstate")
    if raw is None:
        raise ValueError("read_funnel_counts: no state written yet")
    mx = raw.agg(F.max("batch_id").alias("m")).collect()[0]["m"]
    cur = raw.where(F.col("batch_id") == mx)
    counts = None
    for i, step_type in enumerate(steps):
        c = (
            cur.where(F.col("step") == i + 1)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
            .select(
                F.lit(i + 1).cast("bigint").alias("step"),
                F.lit(step_type).alias("event_type"),
                "n_users",
            )
        )
        counts = c if counts is None else counts.unionByName(c)
    return counts
