"""Event-stream analytics: funnel, cohort retention, sessionless paths.

Classic product-analytics shapes over the ``events`` table, each a
single grouped pass over the fact (shuffle on ``user_id`` once, then a
tiny re-aggregation) — the plan shape that survives a 100× scale-up,
because per-user state is bounded and no self-join of the event stream
ever happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_system_spark.queries.base import catalog, register


# -- q_funnel: staged conversion (view → click → purchase) -------------------
@register(
    "q_funnel",
    """WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id)
    SELECT COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
           COUNT(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                      THEN 1 END) AS n_view_click,
           COUNT(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                      AND t_purchase > t_click THEN 1 END) AS n_full_funnel
    FROM per_user""",
    doc="conversion funnel: one shuffle on user_id (conditional-min "
    "stage timestamps), then a scalar rollup — no event self-joins",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog(spark, sf_dir).events

    def first_ts(etype: str, alias: str):
        return F.min(
            F.when(F.col("event_type") == etype, F.col("ts"))
        ).alias(alias)

    per_user = ev.groupBy("user_id").agg(
        first_ts("view", "t_view"),
        first_ts("click", "t_click"),
        first_ts("purchase", "t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.when(viewed, 1)).alias("n_view"),
        F.count(F.when(clicked, 1)).alias("n_view_click"),
        F.count(F.when(purchased, 1)).alias("n_full_funnel"),
    )


# -- q_retention_cohorts: weekly cohort × activity-week matrix ---------------
@register(
    "q_retention_cohorts",
    """WITH firsts AS (
        SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(DATE_DIFF('day', f.cohort_week,
                              DATE_TRUNC('week', e.ts)) / 7 AS BIGINT)
                   AS week_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id)
    SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week, week_offset,
           COUNT(*) AS n_users
    FROM activity GROUP BY cohort_week, week_offset""",
    doc="cohort retention: first-seen week per user (one user_id "
    "shuffle), broadcast back onto events, distinct user-week grid",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog(spark, sf_dir).events.select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    # users ≪ events: the cohort map broadcasts, so the big side is
    # touched once with no extra shuffle beyond the distinct
    activity = (
        ev.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_users")
    )


# -- q_hash_sample: reproducible stratified sampling -------------------------
@register(
    "q_hash_sample",
    """SELECT lang, COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
    FROM documents
    WHERE CAST(CONCAT('0x', SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15))
               AS BIGINT) % 100 < 10
    GROUP BY lang""",
    doc="deterministic 10% sample via md5(doc_id) — reproducible across "
    "engines/runs/partitionings, unlike rand(); the standard trick for "
    "stable training-data subsampling",
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.functions.portable import md5_i64

    docs = catalog(spark, sf_dir).documents
    return (
        docs.filter(md5_i64(F.col("doc_id").cast("string")) % 100 < 10)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("sampled_chars"),
        )
    )


# -- q_event_enrichment: stream-side fact × customer dimension ---------------
@register(
    "q_event_enrichment",
    """SELECT c.c_mktsegment, e.event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment, e.event_type""",
    doc="event enrichment: broadcast the customer dimension onto the "
    "event stream (the foreachBatch enrichment shape), one fact shuffle "
    "for the segment rollup",
)
def q_event_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    ev = cat.events.select("user_id", "event_type", "value")
    cust = cat.customer.select("c_custkey", "c_mktsegment")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


# -- q_skew_profile: heavy hitters of a join key ------------------------------
@register(
    "q_skew_profile",
    """WITH counts AS (
        SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM events GROUP BY user_id),
    tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM counts)
    SELECT key, n_rows,
           ROUND(n_rows / CAST(t.total AS DOUBLE), 6) AS share
    FROM counts c JOIN tot t ON 1 = 1
    ORDER BY n_rows DESC, key ASC LIMIT 10""",
    doc="join-key skew profile: top-10 heavy hitters of events.user_id "
    "with share of total — the salting/AQE decision input; one grouped "
    "pass + 1-row total broadcast + TakeOrderedAndProject",
)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.skew import skew_profile

    return skew_profile(catalog(spark, sf_dir).events, "user_id", top_n=10)


# -- day-over-day volume drift ---------------------------------------------------
_DRIFT_SQL = """WITH d AS (
        SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2),
    l AS (SELECT *, LAG(n_events) OVER (
              PARTITION BY event_type ORDER BY day) AS prev
          FROM d)
    SELECT event_type, day, n_events, prev AS prev_events,
           ROUND((n_events - prev) / CAST(prev AS DOUBLE), 6) AS pct_change
    FROM l"""


@register(
    "q_event_drift",
    _DRIFT_SQL,
    doc="day-over-day event-volume drift per type (count + lag + pct "
    "change) — the monitoring readout that catches a stalled producer "
    "or a duplicate-replay storm; grouped day counts then a lag window "
    "over the bounded per-type day series",
)
def q_event_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = catalog(spark, sf_dir).events
    d = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("n_events").over(w)
    return d.select(
        "event_type",
        "day",
        "n_events",
        prev.alias("prev_events"),
        F.round((F.col("n_events") - prev) / prev.cast("double"), 6).alias(
            "pct_change"
        ),
    )


# -- q_event_trend: per-type daily-volume OLS slope --------------------------
_TREND_SQL = """WITH d AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '2024-01-01',
                              CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)
                   AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
               CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
               CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
               CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy,
               CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx
        FROM d GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope
    FROM s WHERE n * sxx - sx * sx <> 0"""


@register(
    "q_event_trend",
    _TREND_SQL,
    doc="per-type daily-volume trend: closed-form OLS slope of events/"
    "day over the day index — the 'is this producer growing or "
    "decaying' monitoring readout next to q_event_drift's day-over-day "
    "view. All five sufficient statistics are exact integer sums "
    "(DECIMAL(38,0) accumulation, one double division at the end), so "
    "the result is partitioning-independent and engine-exact; two "
    "grouped passes, the second over a day-count-sized frame",
)
def q_event_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog(spark, sf_dir).events
    d = ev.groupBy(
        "event_type",
        F.datediff(
            F.to_date(F.date_trunc("day", F.col("ts"))), F.lit("2024-01-01")
        )
        .cast("bigint")
        .alias("x"),
    ).agg(F.count("*").alias("y"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = d.groupBy("event_type").agg(
        dec(F.count("*")).alias("n"),
        dec(F.sum("x")).alias("sx"),
        dec(F.sum("y")).alias("sy"),
        dec(F.sum(F.col("x") * F.col("y"))).alias("sxy"),
        dec(F.sum(F.col("x") * F.col("x"))).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.filter(den != 0).select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("slope"),
    )


# -- q_event_transitions: per-user event-type transition matrix --------------
_TRANSITIONS_SQL = """WITH s AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events),
    t AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM s WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type),
    tot AS (
        SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_from
        FROM t GROUP BY prev_type)
    SELECT t.prev_type, t.next_type, t.n,
           ROUND(t.n / CAST(tot.n_from AS DOUBLE), 6) AS p
    FROM t JOIN tot USING (prev_type)"""


@register(
    "q_event_transitions",
    _TRANSITIONS_SQL,
    doc="per-user event-type transition matrix (first-order Markov "
    "path mining): lag over each user's time-ordered stream "
    "(event_id tiebreak so the order is total), transition counts + "
    "row-normalized probabilities; one user-keyed window shuffle over "
    "the fact, then type-pair-sized aggregations",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    t = s.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )
    tot = t.groupBy("prev_type").agg(F.sum("n").alias("n_from"))
    return t.join(tot, "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.col("n_from").cast("double"), 6).alias("p"),
    )


# -- q_event_anomalies: exact z-score volume anomalies -----------------------
_ANOMALY_SQL = """WITH d AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
               CAST(SUM(n_events) AS DECIMAL(38,0)) AS sy,
               CAST(SUM(n_events * n_events) AS DECIMAL(38,0)) AS qy
        FROM d GROUP BY 1)
    SELECT d.event_type, CAST(d.day AS VARCHAR) AS day, d.n_events,
           ROUND(CAST((s.n * d.n_events - s.sy) * (s.n * d.n_events - s.sy)
                      AS DOUBLE)
                 / CAST(s.n * s.qy - s.sy * s.sy AS DOUBLE), 6) AS z2,
           (s.n * d.n_events - s.sy) * (s.n * d.n_events - s.sy)
               > 4 * (s.n * s.qy - s.sy * s.sy) AS is_anomaly
    FROM d JOIN s USING (event_type)
    WHERE s.n * s.qy - s.sy * s.sy <> 0"""


@register(
    "q_event_anomalies",
    _ANOMALY_SQL,
    doc="per-type daily-volume anomaly flags: |y - mean| > 2 sigma "
    "decided ENTIRELY in exact integer arithmetic — (n*y - S)^2 > "
    "4*(n*Q - S^2) over DECIMAL(38,0) sums, no float ever enters the "
    "verdict (z2 is reported as one rounded double division for "
    "triage); two grouped passes, the flag join on the tiny per-type "
    "stats",
)
def q_event_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog(spark, sf_dir).events
    d = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("_day"),
    ).agg(F.count("*").alias("n_events"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = d.groupBy("event_type").agg(
        dec(F.count("*")).alias("n"),
        dec(F.sum("n_events")).alias("sy"),
        dec(F.sum(F.col("n_events") * F.col("n_events"))).alias("qy"),
    )
    dev = F.col("n") * F.col("n_events") - F.col("sy")
    var_term = F.col("n") * F.col("qy") - F.col("sy") * F.col("sy")
    return (
        d.join(s, "event_type")
        .filter(var_term != 0)
        .select(
            "event_type",
            F.col("_day").cast("string").alias("day"),
            "n_events",
            F.round(
                (dev * dev).cast("double") / var_term.cast("double"), 6
            ).alias("z2"),
            (dev * dev > 4 * var_term).alias("is_anomaly"),
        )
    )


# -- q_equidepth_histogram: 10-bucket equi-depth profile of `value` ----------
_EQUIDEPTH_SQL = """WITH b AS (
        SELECT value,
               NTILE(10) OVER (ORDER BY value, event_id) AS bucket
        FROM events)
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(value), 6) AS lo,
           ROUND(MAX(value), 6) AS hi
    FROM b GROUP BY bucket"""


@register(
    "q_equidepth_histogram",
    _EQUIDEPTH_SQL,
    doc="equi-depth (equal-count) histogram of the event value column "
    "— the profile that survives skew where equal-width bins collapse "
    "(one ntile window with a total-order tiebreak, then bucket-sized "
    "aggregation); the scale path is q_equidepth_sketch: the same "
    "result from the pre-aggregated (value, count) representation "
    "with a sharded cumsum, no row-level total order",
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = catalog(spark, sf_dir).events
    w = Window.orderBy("value", "event_id")
    return (
        ev.select("value", F.ntile(10).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
    )


# -- q_equidepth_sketch: the SAME histogram from (value,count) ---------------
@register(
    "q_equidepth_sketch",
    _EQUIDEPTH_SQL,
    doc="equi-depth histogram computed the way 100 TB requires: "
    "aggregate to distinct (value, count) first, build the value-order "
    "cumsum with a shard-major two-level numbering (shard = equal-"
    "width bin of the value, broadcast per-shard offsets — never a "
    "row-level single-partition total order), then map rank ranges to "
    "NTILE buckets in exact integer arithmetic; the oracle is the "
    "EXACT ntile SQL, proving the compressed computation reproduces "
    "the row-level one bit-for-bit",
)
def q_equidepth_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sketch import equidepth_from_counts

    ev = catalog(spark, sf_dir).events
    return equidepth_from_counts(ev, "value", k=10)


# -- q_quantile_sketch: fixed-bin mergeable histogram quantiles --------------
_QUANTILE_SKETCH_SQL = """WITH iv AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL),
    s AS (SELECT MIN(v) AS lo, MAX(v) AS hi, COUNT(*) AS n FROM iv),
    b AS (SELECT ((v - lo) * 256) // (hi - lo + 1) AS bin FROM iv, s),
    h AS (SELECT bin, COUNT(*) AS cnt FROM b GROUP BY bin),
    c AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum FROM h),
    p AS (SELECT * FROM (VALUES (1),(5),(25),(50),(75),(95),(99)) AS t(pct)),
    t AS (SELECT pct, GREATEST((pct * n + 99) // 100, 1) AS target
          FROM p, s),
    q AS (SELECT t.pct, t.target, MIN(c.bin) AS bin
          FROM t JOIN c ON c.cum >= t.target GROUP BY t.pct, t.target)
    SELECT CAST(q.pct AS INTEGER) AS pct,
           CAST(q.target AS BIGINT) AS target_rank,
           CAST(q.bin AS INTEGER) AS bin,
           CAST(s.lo + (q.bin * (s.hi - s.lo + 1) + 255) // 256
                AS DOUBLE) / 100 AS lo_est,
           CAST(s.lo + ((q.bin + 1) * (s.hi - s.lo + 1) + 255) // 256 - 1
                AS DOUBLE) / 100 AS hi_est
    FROM q, s"""


@register(
    "q_quantile_sketch",
    _QUANTILE_SKETCH_SQL,
    doc="quantile estimates from a fixed-256-bin mergeable histogram "
    "over the event value column (scaled to exact integer cents) — "
    "the bounded-state sketch family's third member next to HLL and "
    "Count-Min: min/max/count agg, one map-side-combined histogram "
    "agg (<= 256 rows per partition before the shuffle), a cumsum "
    "over that tiny table, and a percent join; each percentile is "
    "bracketed by its bin's exact integer edges, nothing data-sized "
    "ever sorts",
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sketch import quantile_sketch

    ev = catalog(spark, sf_dir).events
    return quantile_sketch(ev, "value")


# -- q_hll_by_type: per-group portable HLL distinct ---------------------------
_HLL_BY_SQL = """WITH v AS (
        SELECT event_type,
               CAST(CONCAT('0x', SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM events WHERE user_id IS NOT NULL),
    pb AS (
        SELECT event_type, h % 64 AS b,
               MAX(CASE WHEN h // 64 = 0 THEN 55
                        ELSE 55 - length(bin(h // 64)) END) AS m
        FROM v GROUP BY event_type, h % 64),
    agg AS (
        SELECT event_type,
               CAST(SUM(CAST(ROUND(POWER(2.0, -m), 18) AS DECIMAL(25,18)))
                    + CAST(64 - COUNT(*) AS DECIMAL(25,18)) AS DOUBLE) AS s,
               CAST(64 - COUNT(*) AS BIGINT) AS n_empty_buckets
        FROM pb GROUP BY event_type)
    SELECT event_type,
           CASE WHEN n_empty_buckets = 64 THEN 0.0
                ELSE ROUND(CAST(0.709 * 64 * 64 AS DOUBLE) / s, 4)
           END AS n_est,
           n_empty_buckets
    FROM agg"""


@register(
    "q_hll_by_type",
    _HLL_BY_SQL,
    doc="per-event-type HyperLogLog distinct-user estimate — COUNT("
    "DISTINCT) GROUP BY with bounded state: <=64 (bucket, max-rank) "
    "rows per group after map-side combine where the exact form "
    "carries each group's full distinct set; absent buckets enter the "
    "harmonic sum arithmetically (64 - count), no completion join",
)
def q_hll_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sketch import hll_distinct_by

    ev = catalog(spark, sf_dir).events.select(
        "event_type", F.col("user_id").cast("string").alias("user_id")
    )
    return hll_distinct_by(ev, ["event_type"], "user_id")


@register(
    "q_hll_merged_by",
    _HLL_BY_SQL,
    doc="grouped HLL merge under the oracle gate: per-event-type "
    "states built on two event shards (user_id parity) with "
    "hll_state_by, OR-combined per group with hll_merge_by (union + "
    "per-(group, bucket) max — hll_merge would collapse every group "
    "into one global state), estimated per group with hll_estimate_by "
    "— the oracle is the WHOLE-corpus per-group SQL, proving "
    "merged-per-group == rebuilt-per-group exactly; the grouped HLL "
    "twin of q_kmv_merged_by, closing the maintained-sketch family's "
    "last grouped asymmetry",
)
def q_hll_merged_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sketch import (
        hll_estimate_by,
        hll_merge_by,
        hll_state_by,
    )

    ev = catalog(spark, sf_dir).events.select(
        "event_type",
        F.col("user_id").cast("string").alias("user_id"),
        (F.col("user_id") % 2).alias("_half"),
    )
    a = hll_state_by(
        ev.filter(F.col("_half") == 0), ["event_type"], "user_id"
    )
    b = hll_state_by(
        ev.filter(F.col("_half") == 1), ["event_type"], "user_id"
    )
    return hll_estimate_by(
        hll_merge_by(a, b, group_cols=["event_type"]), ["event_type"]
    )


# -- q_quantiles_by_type: per-group fixed-bin quantile brackets ---------------
_QUANTILES_BY_SQL = """WITH iv AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL),
    s AS (SELECT event_type, MIN(v) AS lo, MAX(v) AS hi, COUNT(*) AS n
          FROM iv GROUP BY event_type),
    b AS (SELECT iv.event_type, ((v - lo) * 256) // (hi - lo + 1) AS bin
          FROM iv JOIN s USING (event_type)),
    h AS (SELECT event_type, bin, COUNT(*) AS cnt
          FROM b GROUP BY event_type, bin),
    c AS (SELECT event_type, bin,
                 SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum
          FROM h),
    p AS (SELECT * FROM (VALUES (25),(50),(75)) AS t(pct)),
    t AS (SELECT s.event_type, pct,
                 GREATEST((pct * n + 99) // 100, 1) AS target, lo, hi
          FROM s, p),
    q AS (SELECT t.event_type, t.pct, t.target, t.lo, t.hi,
                 MIN(c.bin) AS bin
          FROM t JOIN c ON c.event_type = t.event_type
                       AND c.cum >= t.target
          GROUP BY t.event_type, t.pct, t.target, t.lo, t.hi)
    SELECT event_type,
           CAST(pct AS INTEGER) AS pct,
           CAST(target AS BIGINT) AS target_rank,
           CAST(bin AS INTEGER) AS bin,
           CAST(lo + (bin * (hi - lo + 1) + 255) // 256 AS DOUBLE) / 100
               AS lo_est,
           CAST(lo + ((bin + 1) * (hi - lo + 1) + 255) // 256 - 1
                AS DOUBLE) / 100 AS hi_est
    FROM q"""


@register(
    "q_quantiles_by_type",
    _QUANTILES_BY_SQL,
    doc="per-event-type quantile brackets (p25/p50/p75) from per-group "
    "fixed-256-bin histograms — each group gets its own bin geometry "
    "so skewed groups don't flatten compact ones; per-group shuffle "
    "state bounded at 256 rows, cumsum windowed per group, exact "
    "integer bracket guarantee as q_quantile_sketch",
)
def q_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sketch import quantile_sketch_by

    ev = catalog(spark, sf_dir).events
    return quantile_sketch_by(ev, ["event_type"], "value")


# -- q_winsorize: percentile clipping via the quantile sketch -----------------
_WINSORIZE_SQL = f"""WITH qs AS ({_QUANTILE_SKETCH_SQL}),
    b AS (SELECT (SELECT lo_est FROM qs WHERE pct = 1) AS lo_clip,
                 (SELECT hi_est FROM qs WHERE pct = 99) AS hi_clip)
    SELECT event_id, value,
           LEAST(GREATEST(value, lo_clip), hi_clip) AS clipped
    FROM events, b
    WHERE value IS NOT NULL"""


@register(
    "q_winsorize",
    _WINSORIZE_SQL,
    doc="winsorization (p1/p99 percentile clipping) driven by the "
    "fixed-bin quantile sketch: clip bounds are the sketch's bracket "
    "edges (conservative by at most one bin width), collected as two "
    "scalars, applied in one zero-shuffle map projection — the "
    "outlier clip before loss scaling / aggregate stats, with no "
    "global sort anywhere",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sketch import winsorize

    ev = catalog(spark, sf_dir).events.filter(F.col("value").isNotNull())
    return winsorize(ev, "value").select("event_id", "value", "clipped")


# -- q_quantiles_merged: mergeable histogram states ---------------------------
# fixed geometry [0, 400] at scale 100 -> ilo=0, rng=40001, 256 bins
_QMERGE_SQL = """WITH iv AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL),
    b AS (SELECT LEAST(GREATEST((v * 256) // 40001, 0), 255) AS bin
          FROM iv),
    h AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY bin),
    n AS (SELECT SUM(cnt) AS n FROM h),
    c AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum FROM h),
    p AS (SELECT * FROM (VALUES (25),(50),(75)) AS t(pct)),
    t AS (SELECT pct, GREATEST((pct * n.n + 99) // 100, 1) AS target
          FROM p, n),
    q AS (SELECT t.pct, t.target, MIN(c.bin) AS bin
          FROM t JOIN c ON c.cum >= t.target GROUP BY t.pct, t.target)
    SELECT CAST(pct AS INTEGER) AS pct,
           CAST(target AS BIGINT) AS target_rank,
           CAST(bin AS INTEGER) AS bin,
           CAST((bin * 40001 + 255) // 256 AS DOUBLE) / 100 AS lo_est,
           CAST(((bin + 1) * 40001 + 255) // 256 - 1 AS DOUBLE) / 100
               AS hi_est
    FROM q"""


@register(
    "q_quantiles_merged",
    _QMERGE_SQL,
    doc="quantile histogram states as maintained artifacts: the event "
    "stream split by event_id parity, one fixed-geometry ([0,400], "
    "256-bin) state per shard, states sum-merged, quantiles estimated "
    "— the oracle computes the WHOLE-corpus histogram in one pass, "
    "proving merge-of-shard-states == rebuild bit-for-bit (the "
    "quantile companion to q_hll_merged)",
)
def q_quantiles_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sketch import (
        histogram_merge,
        histogram_state,
        quantiles_from_state,
    )

    ev = catalog(spark, sf_dir).events
    LO, HI = 0.0, 400.0
    a = histogram_state(ev.filter(F.col("event_id") % 2 == 0), "value", LO, HI)
    b = histogram_state(ev.filter(F.col("event_id") % 2 == 1), "value", LO, HI)
    return quantiles_from_state(histogram_merge(a, b), LO, HI)


# -- q_winsorize_by_type: per-group percentile clipping -----------------------
_WINSORIZE_BY_SQL = f"""WITH qs AS ({_QUANTILES_BY_SQL.replace("(25),(50),(75)", "(1),(99)")}),
    lo AS (SELECT event_type, lo_est AS lo_clip FROM qs WHERE pct = 1),
    hi AS (SELECT event_type, hi_est AS hi_clip FROM qs WHERE pct = 99)
    SELECT e.event_id, e.event_type, e.value,
           LEAST(GREATEST(e.value, lo.lo_clip), hi.hi_clip) AS clipped
    FROM events e
    JOIN lo ON lo.event_type = e.event_type
    JOIN hi ON hi.event_type = e.event_type
    WHERE e.value IS NOT NULL"""


@register(
    "q_winsorize_by_type",
    _WINSORIZE_BY_SQL,
    doc="per-event-type winsorization (p1/p99 within each type's own "
    "distribution, from the per-group fixed-bin sketch) — the "
    "per-stratum outlier clip: a global clip under mixed strata lets "
    "a heavy type's tails define every type's bounds; group-keyed "
    "bound join + zero-shuffle clip map",
)
def q_winsorize_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sketch import winsorize_by

    ev = catalog(spark, sf_dir).events.filter(F.col("value").isNotNull())
    return winsorize_by(ev, ["event_type"], "value", p_lo=1, p_hi=99).select(
        "event_id", "event_type", "value", "clipped"
    )


# -- gap-fill: dense per-type hourly series from sparse events ----------------
_GAP_FILL_SQL = """WITH ev AS (
        SELECT event_type, date_trunc('hour', ts) AS h, value FROM events),
    c AS (SELECT event_type, h, COUNT(*) AS n_events,
                 ROUND(MAX(value), 6) AS mv
          FROM ev GROUP BY event_type, h),
    span AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM ev),
    grid AS (SELECT t.event_type, g.h
             FROM (SELECT DISTINCT event_type FROM ev) t
             CROSS JOIN (SELECT unnest(generate_series(lo, hi,
                             INTERVAL 1 HOUR)) AS h FROM span) g),
    j AS (SELECT grid.event_type, grid.h, c.n_events, c.mv
          FROM grid LEFT JOIN c
            ON c.event_type = grid.event_type AND c.h = grid.h)
    SELECT event_type, h AS bucket,
           COALESCE(n_events, 0) AS n_events,
           LAST_VALUE(mv IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS max_value
    FROM j"""


@register(
    "q_gap_fill",
    _GAP_FILL_SQL,
    doc="missing-bucket materializer: sparse per-type hourly event "
    "aggregates densified onto the full (type x hour) grid - counts "
    "zero-fill, max_value carries forward (NULL before a type's first "
    "observation); drift monitors and forecast featurizers assume "
    "dense series, and raw feeds are sparse exactly where the "
    "interesting things happen (outages emit nothing); grid = one-row "
    "span broadcast onto distinct types + sequence explode, no "
    "nested-loop shapes",
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.temporal import gap_fill

    ev = catalog(spark, sf_dir).events.select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h"), "value"
    )
    out = gap_fill(
        ev,
        "h",
        ["event_type"],
        step="1 hour",
        agg_exprs={
            "n_events": F.count(F.lit(1)),
            "max_value": F.round(F.max("value"), 6),
        },
        ffill_cols=["max_value"],
    )
    return out.select("event_type", "bucket", "n_events", "max_value")


# -- q_selectivity_merged: range selectivity from merged histogram states -----
_SELECTIVITY_SQL = """WITH iv AS (
        SELECT CAST(ROUND(value * 100) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL),
    b AS (SELECT LEAST(GREATEST((v * 256) // 40001, 0), 255) AS bin
          FROM iv),
    h AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY bin),
    e AS (SELECT cnt,
                 (bin * 40001 + 255) // 256 AS lb,
                 ((bin + 1) * 40001 + 255) // 256 - 1 AS ub
          FROM h),
    o AS (SELECT cnt, lb, ub,
                 GREATEST(0, LEAST(ub, 25000) - GREATEST(lb, 5000) + 1) AS ov
          FROM e),
    agg AS (SELECT CAST(SUM(CAST(ROUND(cnt * ov / (ub - lb + 1.0), 12)
                               AS DECIMAL(38,12))) AS DOUBLE) AS est,
                   CAST(SUM(cnt) AS BIGINT) AS total
            FROM o)
    SELECT ROUND(est, 6) AS est_rows, total AS total_rows,
           ROUND(est / total, 6) AS selectivity
    FROM agg"""


@register(
    "q_selectivity_merged",
    _SELECTIVITY_SQL,
    doc="range selectivity of value IN [50, 250] from the merged "
    "fixed-geometry histogram states (per-event_id-parity shards, "
    "sum-merged) - the cost-based-optimizer statistic as a queryable "
    "maintained artifact: exact integer bin-overlap + uniform "
    "interpolation in partial bins, decimal-accumulated; the oracle "
    "computes the WHOLE-corpus histogram, proving the estimate from "
    "merged shard states == rebuild bit-for-bit",
)
def q_selectivity_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sketch import (
        histogram_merge,
        histogram_state,
        selectivity_from_state,
    )

    ev = catalog(spark, sf_dir).events
    LO, HI = 0.0, 400.0
    a = histogram_state(ev.filter(F.col("event_id") % 2 == 0), "value", LO, HI)
    b = histogram_state(ev.filter(F.col("event_id") % 2 == 1), "value", LO, HI)
    return selectivity_from_state(
        histogram_merge(a, b), LO, HI, q_lo=50.0, q_hi=250.0
    )
