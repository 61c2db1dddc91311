"""Conflict-resolution queries over the derived change log.

The reference's conflict demo is a printed stub naming four strategies
(example_usage.py:236-252); these queries run the real operators. LWW is
already exercised by q_merge_apply's net-effect path; here: FWW, the
manual-review queue, and field-level merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_system_spark.operators.conflicts import field_merge, resolve, split_manual
from cdc_system_spark.queries.base import CDC_SQL, catalog, cdc_log, register


@register(
    "q_conflict_fww",
    f"""WITH cdc AS ({CDC_SQL}),
    r AS (SELECT record_id, cdc_id, operation,
                 ROW_NUMBER() OVER (PARTITION BY record_id ORDER BY cdc_id) AS rn
          FROM cdc)
    SELECT record_id, cdc_id, operation FROM r WHERE rn = 1""",
    doc="first-write-wins: earliest change per key (example_usage.py:246)",
)
def q_conflict_fww(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = cdc_log(spark, sf_dir)
    return resolve(log, strategy="fww").select("record_id", "cdc_id", "operation")


@register(
    "q_conflict_manual_queue",
    f"""WITH cdc AS (SELECT * FROM ({CDC_SQL}) WHERE cdc_id % 97 = 0),
    contested AS (
        SELECT record_id FROM cdc GROUP BY record_id HAVING COUNT(*) > 1)
    SELECT c.record_id, c.cdc_id, c.operation
    FROM cdc c JOIN contested USING (record_id)""",
    doc="manual strategy: competing changes routed to a review queue "
    "(example_usage.py:247); singles auto-apply",
)
def q_conflict_manual_queue(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = cdc_log(spark, sf_dir).filter(F.col("cdc_id") % 97 == 0)
    _auto, review = split_manual(log)
    return review.select("record_id", "cdc_id", "operation")


@register(
    "q_conflict_field_merge",
    """WITH c AS (
        SELECT event_id AS cdc_id, user_id AS record_id,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k,
               CASE WHEN event_type IN ('click', 'purchase') THEN value END AS v
        FROM events)
    SELECT record_id,
           max_by(k, CASE WHEN k IS NOT NULL THEN cdc_id END) AS k,
           max_by(v, CASE WHEN v IS NOT NULL THEN cdc_id END) AS v,
           MAX(cdc_id) AS cdc_id
    FROM c GROUP BY record_id""",
    doc="merge strategy: per-field latest non-null writer (CRDT-ish column LWW)",
)
def q_conflict_field_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog(spark, sf_dir).events
    k = F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))["k"]
    changes = ev.select(
        F.col("event_id").alias("cdc_id"),
        F.col("user_id").alias("record_id"),
        F.struct(
            k.alias("k"),
            F.when(F.col("event_type").isin("click", "purchase"), F.col("value")).alias("v"),
        ).alias("new"),
    )
    return field_merge(changes)
