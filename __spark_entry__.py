"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` enumerate every implemented operator
from SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# Make the package importable no matter where the driver process's
# cwd is (this file is loaded by path; the package sits next to it).
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import DataFrame, SparkSession

from umls2rdf_spark.plans import (
    analytics_extra,
    completion,
    llm_demos,
    reference_demos,
    surface_extra,
    tpch,
    tpch_extra,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {
        "q1_pricing_summary": tpch.q1_pricing_summary,
        "q3_shipping_priority": tpch.q3_shipping_priority,
        "q5_local_supplier": tpch.q5_local_supplier,
        "order_priority_count": tpch.order_priority_count,
    }
    out.update(reference_demos.QUERIES)
    out.update(analytics_extra.QUERIES)
    out.update(llm_demos.QUERIES)
    out.update(tpch_extra.QUERIES)
    out.update(surface_extra.QUERIES)
    out.update(completion.QUERIES)
    # curation_demos' C37/C38 ride as text_scoring sections —
    # queries() stays at exactly 50 keys (the driver checks the
    # first 50 insertion positions; see SURVEY §2 preamble)
    return out


def oracle_sql() -> dict[str, str]:
    out = {
        "q1_pricing_summary": tpch.Q1_SQL,
        "q3_shipping_priority": tpch.Q3_SQL,
        "q5_local_supplier": tpch.Q5_SQL,
        "order_priority_count": tpch.ORDER_PRIORITY_SQL,
    }
    out.update(reference_demos.ORACLES)
    out.update(analytics_extra.ORACLES)
    out.update(llm_demos.ORACLES)
    out.update(tpch_extra.ORACLES)
    out.update(surface_extra.ORACLES)
    out.update(completion.oracles())
    return out
