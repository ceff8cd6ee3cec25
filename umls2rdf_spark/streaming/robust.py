"""Continuous robust statistics: keep per-group median/MAD outlier
summaries live over an event stream — the monitoring face of
operators/robust.py (B45), for the alerting case ("value outliers
per event type, updated as epochs land") where recomputing from raw
history every epoch is the thing being avoided.

The enabling observation is the same MERGE law the sketch intakes
lean on (streaming/sketches.py): robust.py computes EVERY statistic
from the ``(group, value, count)`` frame, and value counts are
additive across epochs. So:

- each micro-batch writes its OWN batch-local counts frame under a
  ``batch_id=N`` partition (idempotent overwrite — an at-least-once
  replay rewrites the same epoch instead of double-counting);
- the standing counts are the sum-on-read reduction over epochs —
  a groupBy over epochs · |distinct quantized values| rows, never
  over raw events;
- median, MAD and the Hampel outlier count are recomputed from the
  standing counts at read time (:func:`read_mad_summary`) — EXACTLY
  equal to the batch operator over the union of all epochs, at any
  epoch boundary, with no order sensitivity at all (addition is
  commutative; pinned by test).

Standing state is bounded by the distinct quantized value domain
per group (the B21 counting-quantile argument), NOT the event
count; :func:`compact_value_state` folds completed epochs into a
manifest-pinned base and garbage-collects what the previous base
had already absorbed (one generation of grace for in-flight
readers), so disk state stays ~2 base copies + unfolded epochs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umls2rdf_spark.streaming.events import read_standing_state


def value_counts_epoch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    grp_col: str,
    val_expr,
) -> None:
    """ONE epoch: overwrite the epoch's (g, v, cnt) partial."""
    counts = (
        batch_df.select(
            F.col(grp_col).alias("g"),
            val_expr.cast("bigint").alias("v"),
        )
        .where(F.col("v").isNotNull())
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    counts.write.mode("overwrite").parquet(
        f"{state_dir}/valcounts/batch_id={batch_id}"
    )


def read_value_counts(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """Standing (g, v, cnt): the sum-on-read merge of the compacted
    base (if any) plus every epoch partial NEWER than the base's
    ``folded_through`` — older partitions are replay echoes of
    epochs the base already absorbed and are deliberately ignored
    (see :func:`compact_value_state`). Fully lazy: no driver job
    runs until the caller acts on the frame."""
    merged = _merged_counts(spark, state_dir)
    if merged is None:
        raise ValueError("read_value_counts: no state written yet")
    return merged


def _merged_counts(
    spark: SparkSession,
    state_dir: str,
    upper: int | None = None,
) -> DataFrame | None:
    """Lazy merge of base + raw epochs in (folded_through, upper]
    (``upper=None`` = no upper bound — the read path); None when no
    state exists at all."""
    base = _base_state(state_dir)
    raw = read_standing_state(spark, f"{state_dir}/valcounts")
    folded = base[1]["folded_through"] if base else None
    if raw is not None:
        if folded is not None:
            raw = raw.where(F.col("batch_id") > F.lit(folded))
        if upper is not None:
            raw = raw.where(F.col("batch_id") <= F.lit(upper))
    frames = []
    if base is not None:
        frames.append(
            spark.read.parquet(base[1]["data_dir"]).select(
                "g", "v", "cnt"
            )
        )
    if raw is not None:
        frames.append(raw.select("g", "v", "cnt"))
    if not frames:
        return None
    merged = frames[0]
    for f in frames[1:]:
        merged = merged.unionByName(f)
    return merged.groupBy("g", "v").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def read_mad_summary(
    spark: SparkSession,
    state_dir: str,
    grp_col: str,
    k: int = 3,
    cache=None,
) -> DataFrame:
    """Current (grp, n, med_q, mad_q, n_outliers) from the standing
    counts — literally the batch operator's core
    (:func:`~umls2rdf_spark.operators.robust.mad_summary_from_counts`)
    over the merged state frame. Internal persists are scoped: the
    caller's ``cache`` (a CacheScope) if passed, else
    latest-call-only residency — this IS the per-epoch monitoring
    read, so an unbounded session must not accumulate two cached
    frames per invocation (round-8 advice)."""
    from umls2rdf_spark.operators.caching import op_scope
    from umls2rdf_spark.operators.robust import mad_summary_from_counts

    scope = cache if cache is not None else op_scope(
        spark, "read_mad_summary"
    )
    counts = scope.persist(read_value_counts(spark, state_dir))
    return mad_summary_from_counts(counts, grp_col, k, scope)


#: Compacted-base manifest prefix under ``state_dir`` — the
#: snapshots.py discipline shrunk to one pointer: ``base_v{K}.json``
#: names the base data dir and the highest epoch folded into it.
_BASE_MANIFEST = "valcounts_base_v"


def _base_state(state_dir: str) -> tuple[int, dict] | None:
    """(K, manifest) of the newest committed compaction base, or
    None if never compacted."""
    import json
    import os
    import re

    if not os.path.isdir(state_dir):
        return None
    best = None
    for f in os.listdir(state_dir):
        m = re.fullmatch(rf"{_BASE_MANIFEST}(\d+)\.json", f)
        if m:
            kv = int(m.group(1))
            if best is None or kv > best:
                best = kv
    if best is None:
        return None
    with open(os.path.join(state_dir, f"{_BASE_MANIFEST}{best}.json")) as fh:
        return best, json.load(fh)


def compact_value_state(spark: SparkSession, state_dir: str) -> None:
    """Fold epoch history into a compacted BASE (cnt sums are the
    whole state — compaction changes nothing a reader sees), safely
    under at-least-once replay:

    - the base manifest records ``folded_through`` = the highest
      epoch it absorbed, and readers IGNORE raw ``batch_id <=
      folded_through`` partitions — a micro-batch that wrote its
      partial but crashed before its checkpoint committed can be
      replayed AFTER compaction and rewrites a partition no reader
      consults, never double-counting (the round-8 advice hazard);
    - the NEWEST raw epoch is never folded: it is the only epoch
      that can be torn (a crash mid-write) or still in flight (a
      live stream), and folding a partial epoch would freeze an
      undercount forever — left raw, its eventual replay's full
      overwrite is what readers sum (self-healing preserved);
    - commit is the snapshots.py pattern: data dir first, then an
      atomic manifest rename — a crash mid-compact leaves an orphan
      data dir and the previous base intact;
    - after the commit, GC with one generation of grace: raw
      partitions the PREVIOUS base had already absorbed and base
      data older than the previous version are deleted (an
      in-flight reader that resolved the previous manifest still
      finds everything it referenced; state on disk stays bounded
      at ~2 base copies + unfolded epochs)."""
    import json
    import os
    import re
    import shutil
    import uuid

    raw = read_standing_state(spark, f"{state_dir}/valcounts")
    prev = _base_state(state_dir)
    prev_folded = prev[1]["folded_through"] if prev else None
    max_raw = None
    if raw is not None:
        if prev_folded is not None:
            raw = raw.where(F.col("batch_id") > F.lit(prev_folded))
        row = raw.agg(F.max("batch_id").alias("m")).collect()[0]
        max_raw = row["m"]
    if max_raw is None:
        return  # nothing new — nothing to fold
    fold_through = max_raw - 1  # newest epoch stays raw (see above)
    if prev_folded is not None and fold_through <= prev_folded:
        return  # no complete epoch beyond the previous base
    if prev_folded is None and fold_through < 0:
        return
    merged = _merged_counts(spark, state_dir, upper=fold_through)
    next_v = (prev[0] + 1) if prev else 1
    data_dir = os.path.join(state_dir, f"valcounts_base_data_v{next_v}")
    merged.write.mode("overwrite").parquet(data_dir)
    manifest = {"data_dir": data_dir, "folded_through": fold_through}
    tmp = os.path.join(state_dir, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(
        tmp, os.path.join(state_dir, f"{_BASE_MANIFEST}{next_v}.json")
    )
    # GC (one generation of grace): epochs the PREVIOUS base already
    # absorbed, and bases older than the previous version
    vdir = os.path.join(state_dir, "valcounts")
    if prev_folded is not None and os.path.isdir(vdir):
        for d in os.listdir(vdir):
            m = re.fullmatch(r"batch_id=(\d+)", d)
            if m and int(m.group(1)) <= prev_folded:
                shutil.rmtree(os.path.join(vdir, d), ignore_errors=True)
    for f in os.listdir(state_dir):
        m = re.fullmatch(rf"{_BASE_MANIFEST}(\d+)\.json", f)
        if m and prev and int(m.group(1)) < prev[0]:
            old_v = int(m.group(1))
            shutil.rmtree(
                os.path.join(
                    state_dir, f"valcounts_base_data_v{old_v}"
                ),
                ignore_errors=True,
            )
            os.remove(os.path.join(state_dir, f))


def run_mad_maintenance(
    events_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    grp_col: str,
    val_expr_builder,
) -> None:
    """Drive the stream to completion (availableNow), maintaining the
    per-epoch value-count partials. ``val_expr_builder`` is a
    zero-arg callable returning the quantized value Column (a
    callable because Columns must be built against the batch's
    lineage inside foreachBatch)."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        value_counts_epoch(
            batch_df, batch_id, state_dir, grp_col, val_expr_builder()
        )

    q = (
        events_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
