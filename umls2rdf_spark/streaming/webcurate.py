"""Continuous per-domain cap enforcement: admit at most ``cap``
documents per domain ACROSS a stream of crawl epochs — the intake
form of operators/webcurate.py cap_per_domain (C37), for the
continuous-crawl case where a host's pages arrive spread over many
fetches and the cap must hold over their union.

Same architecture as the other intake loops (streaming/events.py
near-dup intake, streaming/selection.py calibration): standing state
is a batch_id-partitioned parquet index of ADMITTED (domain, id)
rows — bytes per admitted doc, never text — and each micro-batch

- reads the standing index EXCLUDING its own epoch partition (so an
  at-least-once replay recomputes the same admission against the
  same prior state instead of seeing its own half-written output),
- counts prior admissions per domain (a ≤ |domains|-row frame),
- ranks its own rows per domain by the deterministic hash order
  cap_per_domain uses and admits ``cap - used`` of them (blocklist
  dropped first),
- overwrites its epoch partition with the admitted (domain, id) rows.

Semantics, stated: this is an ARRIVAL-ORDER cap — earlier epochs
claim slots first; within an epoch the deterministic hash rank picks,
exactly as the batch operator would on that epoch alone with the
reduced cap. A single-epoch stream therefore equals batch
cap_per_domain EXACTLY (pinned); multi-epoch admission differs from
re-running the batch operator over the union (which would re-draw
slots hash-globally) — the intake contract is "never exceed cap,
never revoke an admission", not "re-sample retroactively".

100 TB: per-batch cost is one groupBy of the batch + one broadcast
of the bounded used-counts frame; standing state grows only with
ADMITTED docs (≤ cap × |domains|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from umls2rdf_spark.functions.hashing import stable_hash40
from umls2rdf_spark.streaming.events import read_standing_state


def domain_cap_epoch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    id_col: str,
    domain_col: str,
    cap: int,
    blocklist: list[str] | None = None,
) -> DataFrame:
    """ONE epoch's cap admission: rank the batch against the standing
    index (own partition excluded — replay-idempotent), overwrite the
    epoch's ``{state_dir}/capidx`` partition, return the admitted
    (domain, id) frame. Factored out of the intake loop so the
    composed crawl intake (streaming/crawl.py) runs the identical
    admission logic inside its single foreachBatch."""
    spark = batch_df.sparkSession
    prior = read_standing_state(spark, f"{state_dir}/capidx")
    out = batch_df.select(F.col(domain_col), F.col(id_col))
    if blocklist:
        bl = spark.createDataFrame(
            [(d,) for d in blocklist], f"{domain_col} string"
        )
        out = out.join(F.broadcast(bl), domain_col, "left_anti")
    if prior is not None:
        used = (
            prior.where(F.col("batch_id") != batch_id)
            .groupBy(domain_col)
            .agg(F.count(F.lit(1)).cast("int").alias("__used"))
        )
    else:
        used = None
    w = Window.partitionBy(domain_col).orderBy(
        stable_hash40(F.col(id_col).cast("string")),
        F.col(id_col),
    )
    ranked = out.withColumn("__r", F.row_number().over(w))
    if used is not None:
        ranked = ranked.join(
            F.broadcast(used), domain_col, "left"
        ).withColumn("__used", F.coalesce("__used", F.lit(0)))
    else:
        ranked = ranked.withColumn("__used", F.lit(0))
    admitted = ranked.where(
        F.col("__r") <= F.lit(cap) - F.col("__used")
    ).select(domain_col, id_col)
    admitted.write.mode("overwrite").parquet(
        f"{state_dir}/capidx/batch_id={batch_id}"
    )
    return spark.read.parquet(f"{state_dir}/capidx/batch_id={batch_id}")


def run_domain_cap_intake(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str,
    domain_col: str,
    cap: int,
    blocklist: list[str] | None = None,
) -> None:
    """Drive the stream to completion (availableNow), maintaining the
    ``{state_dir}/capidx`` admitted-(domain, id) index."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        domain_cap_epoch(
            batch_df, batch_id, state_dir, id_col, domain_col,
            cap, blocklist,
        )

    q = (
        docs_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_admitted(
    spark: SparkSession, state_dir: str
) -> DataFrame | None:
    """The standing admitted (domain, id, batch_id) index — None
    before the first batch; fail-closed on any non-missing-path read
    error (events.read_standing_state)."""
    return read_standing_state(spark, f"{state_dir}/capidx")


def url_dedup_epoch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    id_col: str,
    url_col: str,
) -> DataFrame:
    """ONE epoch's canonical-URL admission: normalize, anti-join the
    standing index (own partition excluded — replay-idempotent),
    min-id within the batch, overwrite the epoch's
    ``{state_dir}/urlidx`` partition, return the admitted
    (url_norm, id) frame. Shared by the standalone intake loop and
    the composed crawl intake (streaming/crawl.py)."""
    from umls2rdf_spark.operators.webcurate import normalize_url_expr

    spark = batch_df.sparkSession
    cand = batch_df.select(
        F.col(id_col),
        normalize_url_expr(F.col(url_col)).alias("url_norm"),
    ).where(F.col("url_norm").isNotNull())
    prior = read_standing_state(spark, f"{state_dir}/urlidx")
    if prior is not None:
        seen = prior.where(
            F.col("batch_id") != batch_id
        ).select("url_norm")
        cand = cand.join(seen, "url_norm", "left_anti")
    w = Window.partitionBy("url_norm").orderBy(F.col(id_col))
    admitted = (
        cand.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .select("url_norm", id_col)
    )
    admitted.write.mode("overwrite").parquet(
        f"{state_dir}/urlidx/batch_id={batch_id}"
    )
    return spark.read.parquet(f"{state_dir}/urlidx/batch_id={batch_id}")


def run_url_dedup_intake(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str,
    url_col: str,
) -> None:
    """Continuous canonical-URL dedup — the intake form of
    operators/webcurate.py dedup_by_url (C41), first-seen-wins across
    crawl epochs: a URL admitted in an earlier fetch blocks every
    later re-fetch (re-crawls of the same page differ by timestamps
    and ads; URL identity is the cheap first gate BEFORE content
    hashing).

    State: ``{state_dir}/urlidx`` — admitted (url_norm, id) rows,
    batch_id-partitioned, bytes per admitted URL. Each micro-batch
    normalizes its URLs, anti-joins the standing index EXCLUDING its
    own epoch (replay-idempotent), keeps the min id per url_norm
    within the batch (the batch operator's rule), and overwrites its
    partition. Single-epoch stream == batch dedup_by_url exactly
    (pinned); multi-epoch semantics are first-seen-wins, never
    revoked. Rows with unparseable URLs drop, as in the batch form.
    """
    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        url_dedup_epoch(batch_df, batch_id, state_dir, id_col, url_col)

    q = (
        docs_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_url_index(
    spark: SparkSession, state_dir: str
) -> DataFrame | None:
    """The standing admitted (url_norm, id, batch_id) index — None
    before the first batch; fail-closed reads."""
    return read_standing_state(spark, f"{state_dir}/urlidx")
