"""Window-function and time-window queries over ``events`` / ``orders``.

Ranking/running/lag analytic windows, tumbling + sliding event-time
windows, and session windows (gap-based). The Spark side uses the
native constructs (``Window``, ``F.window``, ``F.session_window``); the
oracles re-express them in ANSI SQL (epoch arithmetic for time buckets,
gaps-and-islands for sessions) — deliberately different formulations
that must agree, which is exactly what makes them good checks.

Determinism notes: every ORDER BY inside a window carries a unique-key
tiebreak; running double sums are prefix sums (same addition order in
any engine), so raw doubles hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_system_spark.functions.portable import dsum, dsum_sql
from cdc_system_spark.queries.base import catalog, register


@register(
    "q_window_rank",
    """SELECT c_custkey, o_orderkey, rn FROM (
        SELECT o_custkey AS c_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) WHERE rn <= 3""",
    doc="top-3 orders per customer; single shuffle on the partition key",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        catalog(spark, sf_dir)
        .orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey", "rn")
    )


@register(
    "q_window_running",
    """SELECT event_id, user_id,
           SUM(value) OVER (PARTITION BY user_id ORDER BY event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running_value
    FROM events WHERE event_type = 'purchase'""",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        catalog(spark, sf_dir)
        .events.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.sum("value").over(w).alias("running_value"))
    )


@register(
    "q_window_lag",
    """SELECT event_id, user_id,
           LAG(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_event,
           LEAD(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS next_event
    FROM events WHERE event_type = 'error'""",
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("event_id")
    return (
        catalog(spark, sf_dir)
        .events.filter(F.col("event_type") == "error")
        .select(
            "event_id",
            "user_id",
            F.lag("event_id").over(w).alias("prev_event"),
            F.lead("event_id").over(w).alias("next_event"),
        )
    )


@register(
    "q_tumbling_window",
    f"""SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type,
           COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM events GROUP BY 1, 2""",
    doc="tumbling event-time window via date_trunc (streaming twin: F.window)",
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        catalog(spark, sf_dir)
        .events.groupBy(
            F.date_trunc("day", "ts").alias("day"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
    )


@register(
    "q_sliding_window",
    f"""WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    wins AS (
        SELECT to_timestamp(floor(epoch(ts) / 1800) * 1800)::TIMESTAMP AS w_start, value
        FROM ev
        UNION ALL
        SELECT to_timestamp(floor(epoch(ts) / 1800) * 1800 - 1800)::TIMESTAMP, value
        FROM ev)
    SELECT w_start, COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM wins GROUP BY w_start""",
    doc="1h window sliding 30min: F.window in Spark, epoch arithmetic oracle",
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        catalog(spark, sf_dir)
        .events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
        .select(F.col("w.start").alias("w_start"), "n", "total_value")
    )


@register(
    "q_session_window",
    """WITH ev AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    ordered AS (
        SELECT user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM ev),
    marked AS (
        SELECT user_id, ts,
               CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END
                   AS new_session
        FROM ordered),
    sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id""",
    doc="session window (30min gap): F.session_window vs gaps-and-islands oracle",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        catalog(spark, sf_dir)
        .events.groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "q_window_ntile",
    """SELECT o_orderkey, o_totalprice,
           NTILE(4) OVER w AS price_quartile,
           ROUND(CUME_DIST() OVER w, 6) AS price_cume,
           FIRST_VALUE(o_orderkey) OVER w AS cheapest_in_month
    FROM orders
    WINDOW w AS (PARTITION BY DATE_TRUNC('month', o_orderdate)
                 ORDER BY o_totalprice, o_orderkey)""",
    doc="ntile/cume_dist/first_value per order-month; unique-key tiebreak",
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy(F.date_trunc("month", F.col("o_orderdate"))).orderBy(
        "o_totalprice", "o_orderkey"
    )
    return catalog(spark, sf_dir).orders.select(
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.cume_dist().over(w), 6).alias("price_cume"),
        F.first("o_orderkey").over(w).alias("cheapest_in_month"),
    )
