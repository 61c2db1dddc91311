"""Temporal join queries: as-of (point-in-time) and interval range join.

Oracle notes: DuckDB has a native ``ASOF JOIN``; its tie-breaking on
duplicate (key, time) right rows is unspecified, so both engines
deduplicate the right side deterministically first (greatest payload
wins), making the match unique. The range join oracle is the plain
inequality join — correct at oracle scale, quadratic at 100 TB, which is
exactly why the Spark side uses the bucketed equi-join shape instead
(operators/temporal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_system_spark.functions.portable import dsum, dsum_sql
from cdc_system_spark.operators.temporal import asof_join, bucketed_range_join
from cdc_system_spark.queries.base import catalog, register

_ASOF_SQL = """WITH r AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey, o_orderdate
                   ORDER BY o_orderkey DESC, o_totalprice DESC) AS rn
        FROM orders),
    rd AS (SELECT * FROM r WHERE rn = 1)
    SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
           rd.o_orderkey, rd.o_orderdate, rd.o_totalprice
    FROM events e
    ASOF LEFT JOIN rd ON e.user_id = rd.o_custkey AND e.ts >= rd.o_orderdate"""


@register(
    "q_asof_join",
    _ASOF_SQL,
    doc="point-in-time join via union + per-key forward-fill window; "
    "one shuffle, no range explosion",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    ev = cat.events.select("event_id", "user_id", "ts")
    return asof_join(
        ev,
        cat.orders,
        left_time="ts",
        right_time="o_orderdate",
        by_left="user_id",
        by_right="o_custkey",
        payload_cols=["o_orderkey", "o_orderdate", "o_totalprice"],
        direction="backward",
    )


_RANGE_SQL = f"""WITH p AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
        FROM events WHERE event_type = 'purchase'),
    c AS (
        SELECT user_id AS c_user, CAST(ts AS TIMESTAMP) AS c_ts, value AS c_value
        FROM events WHERE event_type = 'click'),
    pairs AS (
        SELECT p.event_id, c.c_value
        FROM p JOIN c ON p.user_id = c.c_user
         AND c.c_ts >= p.p_ts - INTERVAL 3600 SECONDS
         AND c.c_ts < p.p_ts),
    agg AS (
        SELECT event_id, COUNT(*) AS n_prior_clicks,
               {dsum_sql('c_value')} AS click_value
        FROM pairs GROUP BY event_id)
    SELECT p.event_id, p.user_id, p.p_ts,
           COALESCE(agg.n_prior_clicks, 0) AS n_prior_clicks, agg.click_value
    FROM p LEFT JOIN agg USING (event_id)"""


@register(
    "q_range_join",
    _RANGE_SQL,
    doc="interval join (clicks in the hour before each purchase) via "
    "time-bucket explode + equi-join; no BroadcastNestedLoopJoin",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    pairs = bucketed_range_join(
        purchases,
        clicks,
        by_left="user_id",
        by_right="c_user",
        left_time="p_ts",
        right_time="c_ts",
        window_seconds=3600,
    )
    agg = pairs.groupBy("event_id").agg(
        F.count("*").alias("n_prior_clicks"), dsum("c_value", "click_value")
    )
    return purchases.join(agg, "event_id", "left").select(
        "event_id",
        "user_id",
        "p_ts",
        F.coalesce("n_prior_clicks", F.lit(0)).alias("n_prior_clicks"),
        "click_value",
    )
