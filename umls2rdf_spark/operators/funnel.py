"""Ordered funnel analysis — the product-analytics conversion
question ("of the users who signed up, how many then clicked, and of
those, how many purchased?") as a declarative join chain, and the
ordered-sequence primitive the windowing family (B6/B7/B22/B23b)
doesn't cover: each step must occur STRICTLY AFTER the user's
completion of the previous step, not merely within the same window.

Semantics: a user completes step i at the EARLIEST event of the
step-i type that is strictly later than their step-(i-1) completion
time (step 1 is their earliest step-1 event). Greedy-earliest is
exact here, not a heuristic: with only ordering constraints, taking
the earliest feasible completion of step i never forecloses a later
step (any witness sequence can be left-shifted onto the greedy one),
so "completed k steps" is decided correctly.

Spark-first shape: one filtered min-groupBy per step plus one
user-keyed join per transition — every shuffle keys on ``user_col``,
so AQE coalesces/reuses the exchange chain, and each step's frame
shrinks monotonically (funnels only narrow). No window over all
events, no per-user UDF, no event-array collect: the per-user state
is one timestamp per step. Per-step frames are localCheckpointed:
level k's plan would otherwise re-derive levels 1..k-1 (the
transitive-closure round discipline).

At 100 TB: cost is |steps| passes over the (pushdown-filtered)
event-type partitions, all shuffles on user_id; a billion-user
funnel is |steps| bounded-width frames of one row per surviving
user.

Reference parity: none (the reference has no event analytics);
LLM-pipeline / product-analytics surface (SURVEY §2 B46).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
) -> DataFrame:
    """(step, event_type, n_users): users completing each funnel
    prefix, in step order. ``steps`` must be non-empty and distinct
    (a repeated type is legal funnel-wise but almost always a spec
    bug — fail closed)."""
    if not steps:
        raise ValueError("funnel_counts: steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(
            f"funnel_counts: duplicate step types in {steps!r} — "
            "repeated stages need distinct event types"
        )
    cur = None
    out_rows = []
    for i, step_type in enumerate(steps):
        stage = events.where(F.col(type_col) == step_type).select(
            F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts")
        )
        if cur is None:
            cur = stage.groupBy("__u").agg(F.min("__ts").alias("__t"))
        else:
            cur = (
                stage.join(cur, "__u")
                .where(F.col("__ts") > F.col("__t"))
                .groupBy("__u")
                .agg(F.min("__ts").alias("__t"))
            )
        cur = cur.localCheckpoint(eager=False)
        out_rows.append(
            cur.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_users")
            ).select(
                F.lit(i + 1).cast("bigint").alias("step"),
                F.lit(step_type).alias("event_type"),
                "n_users",
            )
        )
    res = out_rows[0]
    for r in out_rows[1:]:
        res = res.unionByName(r)
    return res


def funnel_counts_sql(
    events_sql: str,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
) -> str:
    """DuckDB twin of :func:`funnel_counts` — the same greedy
    earliest-completion CTE chain."""
    ctes = []
    for i, step_type in enumerate(steps):
        st = step_type.replace("'", "''")
        if i == 0:
            ctes.append(
                f"__f1 AS (SELECT {user_col} AS u, MIN({ts_col}) AS t"
                f" FROM ({events_sql}) AS __e0"
                f" WHERE {type_col} = '{st}' GROUP BY 1)"
            )
        else:
            ctes.append(
                f"__f{i + 1} AS (SELECT e.{user_col} AS u,"
                f" MIN(e.{ts_col}) AS t"
                f" FROM ({events_sql}) AS e"
                f" JOIN __f{i} p ON e.{user_col} = p.u"
                f" AND e.{ts_col} > p.t"
                f" WHERE e.{type_col} = '{st}' GROUP BY 1)"
            )
    selects = [
        f"SELECT CAST({i + 1} AS BIGINT) AS step,"
        f" '{s.replace(chr(39), chr(39) * 2)}' AS event_type,"
        f" CAST(COUNT(*) AS BIGINT) AS n_users FROM __f{i + 1}"
        for i, s in enumerate(steps)
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(selects)
    )
