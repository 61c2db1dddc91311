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


def embedding_vec(spark: SparkSession, sf_dir: str, vec_id: int) -> list[float]:
    """The retrieval queries' query vector: row ``vec_id`` of the
    embeddings table as Python floats. The vector is collected to the
    driver by construction — it becomes LITERALS in the probe plan
    (the nprobe/LUT convention) — so the only question is how the one
    row gets here. ``filter(id).head()`` serializes a full distributed
    job round-trip into every retrieval query just to fetch it; when
    the table is a plain local path, a pyarrow indexed read
    (row-group-pruned by the vec_id predicate) returns the identical
    widened doubles in-process. Non-local paths keep the Spark
    filter+head fallback. Recomputed from the parquet input on every
    call — nothing is memoized."""
    import os

    from cdc_system_spark.operators._index_stats import driver_local_fs

    path = os.path.join(sf_dir, "embeddings.parquet")
    if "://" not in sf_dir and os.path.exists(path) and driver_local_fs(spark):
        import pyarrow.parquet as pq

        t = pq.read_table(
            path, columns=["embedding"], filters=[("vec_id", "==", vec_id)]
        )
        if t.num_rows:
            return [float(x) for x in t.column("embedding")[0].as_py()]
    row = (
        catalog(spark, sf_dir)
        .embeddings.filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .head()
    )
    return [float(x) for x in row[0]]


def embedding_head_vecs(spark: SparkSession, sf_dir: str, n: int) -> list[list[float]]:
    """The ``n`` smallest-``vec_id`` embedding vectors — the
    deterministic PQ-codebook training rows (the first-k-by-id
    convention every literal-codebook oracle pins). Model-training
    input is collected to the driver by definition (the books become
    plan literals); same rationale and same local-path pyarrow fast
    path as :func:`embedding_vec`, same Spark ``orderBy().limit()``
    fallback, identical widened doubles either way."""
    import os

    from cdc_system_spark.operators._index_stats import driver_local_fs

    path = os.path.join(sf_dir, "embeddings.parquet")
    if "://" not in sf_dir and os.path.exists(path) and driver_local_fs(spark):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=["vec_id", "embedding"])
        idx = pc.select_k_unstable(
            t, k=n, sort_keys=[("vec_id", "ascending")]
        )
        return [
            [float(x) for x in v]
            for v in t.take(idx).column("embedding").to_pylist()
        ]
    return [
        [float(x) for x in r[0]]
        for r in catalog(spark, sf_dir)
        .embeddings.orderBy("vec_id")
        .limit(n)
        .select("embedding")
        .collect()
    ]


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
