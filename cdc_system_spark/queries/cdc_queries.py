"""CDC-surface queries (SURVEY §2.1-§2.6) over the derived change log.

Each reference operator gets a named, oracle-checked query. The Spark
side reuses the engine's real operators (changelog / merge /
snapshot_diff modules) wherever the shapes line up, so the oracle gate
exercises production code, not bespoke query bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_system_spark.operators.changelog import (
    change_statistics,
    change_statistics_rollup,
)
from cdc_system_spark.operators.merge import apply_changes
from cdc_system_spark.operators.snapshot_diff import snapshot_diff
from cdc_system_spark.queries.base import CDC_SQL, catalog, cdc_log, register

_B = "CAST({} AS BIGINT)"


# -- q_pending_changes: the reference hot query (cdc_system.py:209-219) ------
@register(
    "q_pending_changes",
    f"""WITH cdc AS ({CDC_SQL})
    SELECT cdc_id, operation, CAST(record_id AS BIGINT) AS record_id, new_data
    FROM cdc WHERE NOT synced ORDER BY cdc_id LIMIT 100""",
    doc="scan → filter(synced=0) → orderBy(cdc_id) → limit; TakeOrderedAndProject plan",
)
def q_pending_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = cdc_log(spark, sf_dir)
    pending = log.filter(~F.col("synced")).orderBy("cdc_id").limit(100)
    return pending.select(
        "cdc_id", "operation", F.col("record_id").cast("long").alias("record_id"), "new_data"
    )


# -- q_change_stats: A1 grouped pivot-sums (cdc_system.py:250-258) -----------
@register(
    "q_change_stats",
    f"""WITH cdc AS ({CDC_SQL})
    SELECT operation, COUNT(*) AS count,
           CAST(SUM(CASE WHEN NOT synced THEN 1 ELSE 0 END) AS BIGINT) AS pending,
           CAST(SUM(CASE WHEN synced THEN 1 ELSE 0 END) AS BIGINT) AS synced
    FROM cdc GROUP BY operation""",
)
def q_change_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return change_statistics(cdc_log(spark, sf_dir))


# -- q_rollup: A3 totals natively via rollup (cdc_system.py:363-364) ---------
@register(
    "q_rollup",
    f"""WITH cdc AS ({CDC_SQL})
    SELECT operation, COUNT(*) AS count,
           CAST(SUM(CASE WHEN NOT synced THEN 1 ELSE 0 END) AS BIGINT) AS pending,
           CAST(SUM(CASE WHEN synced THEN 1 ELSE 0 END) AS BIGINT) AS synced
    FROM cdc GROUP BY ROLLUP(operation)""",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return change_statistics_rollup(cdc_log(spark, sf_dir))


# -- q_isin_semijoin: F2/J4 mark-synced shape (cdc_system.py:238-243) --------
@register(
    "q_isin_semijoin",
    f"""WITH cdc AS ({CDC_SQL})
    SELECT cdc_id, CAST(record_id AS BIGINT) AS record_id FROM cdc
    WHERE record_id IN (
        SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 400)""",
    doc="IN-list as broadcast left-semi join (scales past literal isin)",
)
def q_isin_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    log = cdc_log(spark, sf_dir)
    ids = (
        catalog(spark, sf_dir)
        .events.filter((F.col("event_type") == "purchase") & (F.col("value") > 400))
        .select(F.col("user_id").alias("record_id"))
    )
    return (
        log.join(F.broadcast(ids).distinct(), on="record_id", how="left_semi")
        .select("cdc_id", F.col("record_id").cast("long").alias("record_id"))
    )


# -- q_from_json / q_json_extract: SF2 decode (cdc_system.py:221-228) --------
@register(
    "q_from_json",
    f"""WITH cdc AS ({CDC_SQL})
    SELECT cdc_id, CAST(json_extract(new_data, '$.k') AS BIGINT) AS k
    FROM cdc WHERE NOT synced""",
)
def q_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = T.StructType([T.StructField("k", T.LongType())])
    log = cdc_log(spark, sf_dir).filter(~F.col("synced"))
    return log.select(
        "cdc_id", F.from_json("new_data", schema).getField("k").alias("k")
    )


# -- q_to_json: SF1/P3 row-image construction (cdc_system.py:145 etc.) -------
@register(
    "q_to_json",
    """SELECT event_id,
       to_json(struct_pack(event_id := event_id, event_type := event_type,
                           user_id := user_id)) AS image
    FROM events WHERE event_id % 10 = 0""",
)
def q_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog(spark, sf_dir).events.filter(F.col("event_id") % 10 == 0)
    return ev.select(
        "event_id",
        F.to_json(F.struct("event_id", "event_type", "user_id")).alias("image"),
    )


# -- q_merge_apply: J1-J3 net-effect apply (cdc_system.py:297-350) -----------
_MERGE_SQL = f"""
WITH cdc AS ({CDC_SQL}),
changes AS (
    SELECT cdc_id, operation, CAST(record_id AS BIGINT) AS record_id,
           CAST(json_extract(new_data, '$.k') AS BIGINT) AS k
    FROM cdc),
net AS (
    SELECT record_id,
           max_by(operation, CASE WHEN operation <> 'UPDATE' THEN cdc_id END)
               AS last_exist_op,
           max_by(k, cdc_id) AS last_k
    FROM changes GROUP BY record_id),
eff AS (
    SELECT record_id,
           CASE WHEN last_exist_op = 'DELETE' THEN 'DELETE'
                WHEN last_exist_op = 'INSERT' THEN 'UPSERT'
                ELSE 'UPDATE_IF_EXISTS' END AS effect,
           last_k
    FROM net),
target AS (
    SELECT CAST(user_id AS BIGINT) AS id, CAST(user_id * 10 AS BIGINT) AS val
    FROM (SELECT DISTINCT user_id FROM events WHERE user_id % 2 = 0)),
cond_hits AS (
    SELECT e.record_id, e.last_k FROM eff e
    JOIN target t ON e.record_id = t.id
    WHERE e.effect = 'UPDATE_IF_EXISTS'),
removed AS (
    SELECT record_id FROM eff WHERE effect IN ('UPSERT', 'DELETE')
    UNION SELECT record_id FROM cond_hits),
survivors AS (
    SELECT id, val FROM target WHERE id NOT IN (SELECT record_id FROM removed)),
incoming AS (
    SELECT record_id AS id, last_k AS val FROM eff WHERE effect = 'UPSERT'
    UNION ALL
    SELECT record_id AS id, last_k AS val FROM cond_hits)
SELECT id, val FROM survivors UNION ALL SELECT id, val FROM incoming
"""


@register(
    "q_merge_apply",
    _MERGE_SQL,
    doc="full net-effect MERGE of a change batch into a target snapshot",
)
def q_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = catalog(spark, sf_dir).events
    target = (
        ev.filter(F.col("user_id") % 2 == 0)
        .select("user_id")
        .distinct()
        .select(
            F.col("user_id").cast("long").alias("id"),
            (F.col("user_id") * 10).cast("long").alias("val"),
        )
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("val", T.LongType())]
    )
    changes = cdc_log(spark, sf_dir).withColumn(
        "new",
        F.struct(
            F.col("record_id").cast("long").alias("id"),
            F.get_json_object("new_data", "$.k").cast("long").alias("val"),
        ).cast(schema),
    )
    return apply_changes(target, changes, key="id", change_key="record_id")


# -- q_snapshot_diff: DDL3-b / J5 version-based capture ----------------------
@register(
    "q_snapshot_diff",
    """WITH old AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN 'Z' ELSE o_orderstatus END
                   AS o_orderstatus,
               o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 0),
    new AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders)
    SELECT CAST(COALESCE(old.o_orderkey, new.o_orderkey) AS BIGINT) AS record_id,
           CASE WHEN old.o_orderkey IS NULL THEN 'INSERT'
                WHEN new.o_orderkey IS NULL THEN 'DELETE'
                ELSE 'UPDATE' END AS operation
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
       OR old.o_orderstatus <> new.o_orderstatus
       OR old.o_totalprice <> new.o_totalprice""",
    doc="snapshot diff = claimed version-based CDC strategy",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = catalog(spark, sf_dir).orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = orders.filter(F.col("o_orderkey") % 7 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 5 == 0, "Z").otherwise(F.col("o_orderstatus")),
    )
    diff = snapshot_diff(old, orders, key="o_orderkey")
    return diff.select(F.col("record_id"), "operation")


# -- q_count / q_filter_eq / q_project_limit: A2/F3/P2+S3 --------------------
@register("q_count", "SELECT COUNT(*) AS count FROM orders")
def q_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog(spark, sf_dir).orders.agg(F.count("*").alias("count"))


@register(
    "q_filter_eq",
    """SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000.0""",
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        catalog(spark, sf_dir)
        .customer.filter(
            (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 1000.0)
        )
        .select("c_custkey", "c_name", "c_acctbal")
    )


@register(
    "q_project_limit",
    "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 50",
    doc="P2 column-subset projection + S3 limit (made deterministic by ordering)",
)
def q_project_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog(spark, sf_dir).orders.select("o_orderkey").orderBy("o_orderkey").limit(50)


# -- SCD Type 2 history + point-in-time lookup -------------------------------
_SCD2_SQL = f"""WITH cdc AS ({CDC_SQL}),
    closed AS (
        SELECT *,
               LEAD(changed_at) OVER (
                   PARTITION BY record_id ORDER BY cdc_id) AS valid_to
        FROM cdc),
    versions AS (
        SELECT record_id, new_data AS payload, changed_at AS valid_from,
               valid_to, cdc_id
        FROM closed WHERE operation IN ('INSERT', 'UPDATE'))
    SELECT CAST(record_id AS BIGINT) AS record_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY record_id ORDER BY cdc_id) AS INTEGER) AS version,
           payload, valid_from, valid_to,
           (valid_to IS NULL) AS is_current
    FROM versions"""


@register(
    "q_scd2_history",
    _SCD2_SQL,
    doc="SCD Type 2 history from the change log: one row per record "
    "VERSION with its validity interval (closed by the next change of "
    "any kind; DELETE tombstones terminate without a new version) — "
    "one window shuffle on the key, no joins, no state",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.scd import scd2_from_log

    return scd2_from_log(cdc_log(spark, sf_dir))


_ASOF_LOOKUP_SQL = f"""WITH cdc AS ({CDC_SQL}),
    closed AS (
        SELECT *,
               LEAD(changed_at) OVER (
                   PARTITION BY record_id ORDER BY cdc_id) AS valid_to
        FROM cdc),
    hist AS (
        SELECT CAST(record_id AS BIGINT) AS record_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY record_id ORDER BY cdc_id) AS INTEGER) AS version,
               changed_at AS valid_from, valid_to
        FROM closed WHERE operation IN ('INSERT', 'UPDATE')),
    probes AS (
        SELECT CAST(user_id AS BIGINT) AS record_id, CAST(ts AS TIMESTAMP) AS ts,
               event_id
        FROM events WHERE event_id % 11 = 0)
    SELECT p.event_id, p.record_id, p.ts, h.version, h.valid_from
    FROM probes p LEFT JOIN hist h
      ON p.record_id = h.record_id
     AND h.valid_from <= p.ts
     AND (h.valid_to IS NULL OR h.valid_to > p.ts)"""


@register(
    "q_asof_lookup",
    _ASOF_LOOKUP_SQL,
    doc="point-in-time lookup against the SCD2 history: for each probe "
    "(key, ts) return the version valid AT ts — the feature-backfill / "
    "audit join; range predicate rides the key-equi join, no cross "
    "product",
)
def q_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.scd import asof_lookup, scd2_from_log

    log = cdc_log(spark, sf_dir)
    hist = scd2_from_log(log).drop("payload", "is_current")
    ev = catalog(spark, sf_dir).events
    probes = ev.filter(F.col("event_id") % 11 == 0).select(
        F.col("user_id").cast("long").alias("record_id"),
        F.col("ts"),
        "event_id",
    )
    joined = asof_lookup(hist, probes, key_col="record_id", ts_col="ts")
    return joined.select(
        "event_id", "record_id", "ts", "version", "valid_from"
    )


# -- q_log_pruned_read: the hot poll served by a maintained zone state --------
_LOG_PRUNED_SQL = """WITH mx AS (SELECT MAX(event_id) AS m FROM events),
    cdc AS (
        SELECT event_id AS cdc_id,
               CASE WHEN event_type IN ('click', 'view') THEN 'INSERT'
                    WHEN event_type IN ('purchase', 'signup') THEN 'UPDATE'
                    ELSE 'DELETE' END AS operation,
               user_id AS record_id,
               (event_id <= (SELECT (m * 3) // 4 FROM mx)) AS synced
        FROM events)
    SELECT cdc_id, operation, CAST(record_id AS BIGINT) AS record_id
    FROM cdc WHERE NOT synced ORDER BY cdc_id LIMIT 100"""


@register(
    "q_log_pruned_read",
    _LOG_PRUNED_SQL,
    doc="the reference hot poll (WHERE synced=0 ORDER BY cdc_id LIMIT "
    "n, cdc_system.py:209-216) served by a maintained log zone state "
    "(the (synced, cdc_id) covering-index analogue, "
    "cdc_system.py:129-132): on a drained log only the unsynced TAIL "
    "is pending, so the all-synced cdc_id zones convert to order-key "
    "ranges that reach the parquet scan as pushed filters and the "
    "poll never reads history; the oracle is the plain filter + "
    "top-k, so a green row proves pruned poll == full poll "
    "row-for-row; one collected max-id scalar + a <=64-row state, "
    "zero shuffles added",
)
def q_log_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.maintenance import (
        log_zone_state,
        read_pending_pruned,
    )

    ev = catalog(spark, sf_dir).events
    mx = int(ev.agg(F.max("event_id")).first()[0])
    thr = (mx * 3) // 4  # synced prefix: everything but the tail quarter
    log = ev.select(
        F.col("event_id").alias("cdc_id"),
        F.when(F.col("event_type").isin("click", "view"), "INSERT")
        .when(F.col("event_type").isin("purchase", "signup"), "UPDATE")
        .otherwise("DELETE")
        .alias("operation"),
        F.col("user_id").alias("record_id"),
        (F.col("event_id") <= thr).alias("synced"),
    )
    state = log_zone_state(log, 0, mx, 64)
    out = read_pending_pruned(log, state, 0, mx, 64, limit=100)
    return out.select(
        "cdc_id", "operation", F.col("record_id").cast("long").alias("record_id")
    )
