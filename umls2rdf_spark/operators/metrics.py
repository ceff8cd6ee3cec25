"""In-flight pipeline metrics via Spark's Observation API.

A long curation pipeline (scrub → quality gate → dedup → select)
needs per-stage accounting — rows in, rows dropped, null rates — but
counting each stage with ``.count()`` actions re-executes the plan
once per metric. ``df.observe()`` attaches named aggregate
expressions to a point IN the plan: they are computed as the one
real action streams past, costing a map-side accumulator instead of
an extra job per stage. That is the Spark-native replacement for the
reference's imperative per-step print counters
(umls2rdf.py run loop's per-SAB progress logging).

At 100 TB this is the difference between "metrics are free" and
"metrics double the pipeline": N observation points add zero extra
scans; N ``.count()`` checkpoints add N full plan executions.

Limits worth knowing (documented, test-pinned where cheap):
- observed metrics are aggregate expressions only (count/sum/min/
  max/avg/count_if...), evaluated over exactly the rows that flow
  through that plan point during ONE action;
- on a re-used DataFrame the values reflect the LAST action;
- streaming queries report per-batch via the listener instead
  (``Observation`` blocks on batch queries only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_stage(
    df: DataFrame,
    name: str,
    metrics: dict[str, F.Column] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach an observation point named ``name`` to ``df``.

    ``metrics`` maps metric name → aggregate Column; default is a
    plain row count (``n_rows``). Returns (df, observation): run ONE
    action on the returned frame (or anything built on it), then
    read ``observation.get`` — a dict of the metric values for the
    rows that crossed this plan point.
    """
    obs = Observation(name)
    if metrics is None:
        metrics = {"n_rows": F.count(F.lit(1))}
    cols = [c.alias(n) for n, c in metrics.items()]
    return df.observe(obs, *cols), obs


def funnel(
    df: DataFrame,
    stages: list[tuple[str, object]],
) -> tuple[DataFrame, dict[str, Observation]]:
    """Instrument a filter funnel: each (name, transform) is applied
    to the OBSERVED previous frame with a row-count observation
    after it, so every observation point sits in the final frame's
    lineage. One action on the returned frame yields the surviving
    row count at every stage — the drop-off report a curation
    pipeline logs per run — at the cost of zero extra jobs (an
    ``input`` observation counts the source rows too).

    ``transform`` is any ``DataFrame -> DataFrame`` callable; chain
    order is list order.
    """
    observations: dict[str, Observation] = {}
    cur, obs = observe_stage(df, "input")
    observations["input"] = obs
    for name, fn in stages:
        cur, obs = observe_stage(fn(cur), name)
        observations[name] = obs
    return cur, observations
