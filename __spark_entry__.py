"""Driver contract for the spark-graft builder (PySpark target).

Adapts the engine's query registry (cdc_system_spark.queries) to the
driver's verify harness: ``entry`` smoke, ``queries`` × ``oracle_sql``
DuckDB comparison at sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdc_system_spark.queries import QUERY_REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3-shaped
    shipping-priority top-k (join + agg + top-k)."""
    return QUERY_REGISTRY["q_shipping_priority"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM ops)."""
    return {name: q.fn for name, q in QUERY_REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query; omitted keys
    (e.g. q_ivf_topk) get the driver's rows-only check."""
    return {name: q.sql for name, q in QUERY_REGISTRY.items() if q.sql is not None}
