"""Query registry plumbing + the shared derived change log.

The driver's test tables carry no CDC audit table, so the CDC-surface
queries derive one *deterministically* from ``events`` — the same
derivation expressed in both engines:

    cdc_id    = event_id
    operation = click/view → INSERT, purchase/signup → UPDATE,
                error → DELETE
    record_id = user_id
    new_data  = props (JSON)
    changed_at= ts
    synced    = event_id % 4 = 0

This makes every reference operator (SURVEY §2) oracle-checkable on
driver data while the *real* change log path is exercised by the unit
tests and the API facade.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_system_spark.sources.catalog import TableCatalog


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → rows-only check
    doc: str = ""


QUERY_REGISTRY: dict[str, Query] = {}


def register(name: str, sql: str | None, doc: str = ""):
    """Decorator: ``@register("q_x", SQL)`` over a (spark, sf_dir) fn."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        QUERY_REGISTRY[name] = Query(name=name, fn=fn, sql=sql, doc=doc)
        return fn

    return deco


def catalog(spark: SparkSession, sf_dir: str) -> TableCatalog:
    return TableCatalog(spark, sf_dir)


# ---- shared derived CDC log ------------------------------------------------

#: SQL CTE body of the derived change log (DuckDB oracle side).
CDC_SQL = """
    SELECT event_id AS cdc_id,
           CASE WHEN event_type IN ('click', 'view') THEN 'INSERT'
                WHEN event_type IN ('purchase', 'signup') THEN 'UPDATE'
                ELSE 'DELETE' END AS operation,
           user_id AS record_id,
           props AS new_data,
           CAST(ts AS TIMESTAMP) AS changed_at,
           (event_id % 4 = 0) AS synced
    FROM events
"""


def cdc_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of :data:`CDC_SQL` (audit-schema change log)."""
    ev = catalog(spark, sf_dir).events
    return ev.select(
        F.col("event_id").alias("cdc_id"),
        F.when(F.col("event_type").isin("click", "view"), "INSERT")
        .when(F.col("event_type").isin("purchase", "signup"), "UPDATE")
        .otherwise("DELETE")
        .alias("operation"),
        F.col("user_id").alias("record_id"),
        F.col("props").alias("new_data"),
        F.col("ts").alias("changed_at"),
        (F.col("event_id") % 4 == 0).alias("synced"),
    )
