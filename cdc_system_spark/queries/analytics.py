"""Analytics query surface over the TPC-H-ish tables (SURVEY §7.1 M6).

Joins (broadcast dim + shuffle fact), grouped aggregations, top-k,
semi/anti joins, set operations, scalar string/date functions. Double
aggregates go through the decimal accumulator (functions.portable) so
distributed Spark sums hash-match the single-threaded DuckDB oracle
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_system_spark.functions.portable import davg, davg_sql, dsum, dsum_sql
from cdc_system_spark.queries.base import catalog, register

# -- q_pricing_summary: TPC-H Q1 shape (grouped multi-aggregate) -------------
_DISC_PRICE = "l_extendedprice * (1 - l_discount)"


@register(
    "q_pricing_summary",
    f"""SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql(_DISC_PRICE)} AS sum_disc_price,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus""",
    doc="whole-stage-codegen hash aggregate; partial+final combine",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = catalog(spark, sf_dir).lineitem
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# -- q_shipping_priority: TPC-H Q3 shape (3-way join + top-k) ----------------
@register(
    "q_shipping_priority",
    f"""SELECT CAST(l.l_orderkey AS BIGINT) AS l_orderkey,
           {dsum_sql(_DISC_PRICE)} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    doc="fact-dim join; deterministic top-k via unique-key tiebreak",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    cust = cat.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = cat.orders.filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = cat.lineitem.filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(disc_price, "revenue"))
        .select(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            "revenue",
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# -- q_local_volume: TPC-H Q5 shape (5-way join through dims) ----------------
@register(
    "q_local_volume",
    f"""SELECT n.n_name, {dsum_sql(_DISC_PRICE)} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'AMERICA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name""",
    doc="star join: every dimension broadcast, one fact shuffle for the agg",
)
def q_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    region = cat.region.filter(F.col("r_name") == "AMERICA")
    nation = cat.nation.join(
        F.broadcast(region), cat.nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cat.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(cat.supplier.select("s_suppkey", "s_nationkey")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(disc_price, "revenue"))
    )


# -- q_top_customers: revenue top-k ------------------------------------------
@register(
    "q_top_customers",
    f"""SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name,
           {dsum_sql('o.o_totalprice')} AS total_spent,
           COUNT(*) AS n_orders
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY total_spent DESC, c_custkey LIMIT 10""",
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    return (
        cat.orders.join(
            F.broadcast(cat.customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_name")
        .agg(dsum("o_totalprice", "total_spent"), F.count("*").alias("n_orders"))
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            "total_spent",
            "n_orders",
        )
        .orderBy(F.desc("total_spent"), "c_custkey")
        .limit(10)
    )


# -- q_semi_join / q_anti_join ----------------------------------------------
@register(
    "q_semi_join",
    """SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')""",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    open_orders = cat.orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return cat.customer.join(open_orders, on="c_custkey", how="left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_anti_join",
    """SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    return cat.customer.join(
        cat.orders.select(F.col("o_custkey").alias("c_custkey")),
        on="c_custkey",
        how="left_anti",
    ).select("c_custkey", "c_name")


# -- q_agg_groupby: multi-key grouped agg ------------------------------------
@register(
    "q_agg_groupby",
    f"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {dsum_sql('o_totalprice')} AS total,
           {davg_sql('o_totalprice')} AS avg_price
    FROM orders GROUP BY o_orderstatus, o_orderpriority""",
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        catalog(spark, sf_dir)
        .orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            dsum("o_totalprice", "total"),
            davg("o_totalprice", "avg_price"),
        )
    )


# -- set operations (SURVEY §2.6: planned surface) ---------------------------
@register(
    "q_union",
    """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    UNION SELECT CAST(s_nationkey AS BIGINT) FROM supplier""",
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    a = cat.customer.select(F.col("c_nationkey").cast("long").alias("nationkey"))
    b = cat.supplier.select(F.col("s_nationkey").cast("long").alias("nationkey"))
    return a.union(b).distinct()


@register(
    "q_intersect",
    """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    INTERSECT SELECT CAST(s_nationkey AS BIGINT) FROM supplier""",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    a = cat.customer.select(F.col("c_nationkey").cast("long").alias("nationkey"))
    b = cat.supplier.select(F.col("s_nationkey").cast("long").alias("nationkey"))
    return a.intersect(b)


@register(
    "q_except",
    """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    EXCEPT SELECT CAST(s_nationkey AS BIGINT) FROM supplier""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    a = cat.customer.select(F.col("c_nationkey").cast("long").alias("nationkey"))
    b = cat.supplier.select(F.col("s_nationkey").cast("long").alias("nationkey"))
    return a.subtract(b)  # EXCEPT (set semantics), not EXCEPT ALL


# -- scalar functions --------------------------------------------------------
@register(
    "q_string_funcs",
    """SELECT p_partkey,
           LOWER(p_name) AS name_lower,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           SUBSTR(p_type, 1, 5) AS type_prefix,
           CONCAT(p_brand, '#', CAST(p_size AS VARCHAR)) AS brand_size,
           REPLACE(p_name, ' ', '_') AS name_snake
    FROM part WHERE p_size >= 25""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = catalog(spark, sf_dir).part.filter(F.col("p_size") >= 25)
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
    )


@register(
    "q_date_funcs",
    """SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS order_month,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS order_quarter,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since
    FROM orders WHERE o_orderkey % 100 = 0""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = catalog(spark, sf_dir).orders.filter(F.col("o_orderkey") % 100 == 0)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
    )


@register(
    "q_case_when",
    """SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'large'
                WHEN o_totalprice > 100000 THEN 'medium'
                ELSE 'small' END AS size_class
    FROM orders WHERE o_orderkey % 50 = 0""",
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = catalog(spark, sf_dir).orders.filter(F.col("o_orderkey") % 50 == 0)
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "large")
        .when(F.col("o_totalprice") > 100000, "medium")
        .otherwise("small")
        .alias("size_class"),
    )


@register(
    "q_distinct",
    "SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog(spark, sf_dir).orders.select("o_orderpriority", "o_orderstatus").distinct()


# -- multi-level aggregation: cube / grouping sets / pivot -------------------
# (SURVEY §2.4 A3 maps the reference's manual rollup to native multi-level
# aggregates; cube/grouping-sets/pivot complete that family.)
@register(
    "q_cube",
    f"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {dsum_sql('o_totalprice')} AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    doc="cube = all 4 grouping combinations in one pass (partial-agg reuse)",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        catalog(spark, sf_dir)
        .orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("o_totalprice", "total"))
    )


@register(
    "q_grouping_sets",
    f"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {dsum_sql('o_totalprice')} AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderstatus, o_orderpriority))""",
    doc="explicit grouping sets (native, not a UNION of scans)",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        catalog(spark, sf_dir)
        .orders.groupingSets(
            [["o_orderstatus"], ["o_orderstatus", "o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(F.count("*").alias("n"), dsum("o_totalprice", "total"))
    )


@register(
    "q_pivot",
    f"""SELECT o_orderpriority,
           {dsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS O,
           {dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS F,
           {dsum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS P
    FROM orders GROUP BY o_orderpriority""",
    doc="pivot with explicit value list (no extra distinct-scan pass)",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        catalog(spark, sf_dir)
        .orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(dsum("o_totalprice"))
    )


@register(
    "q_count_distinct",
    """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus""",
    doc="exact distinct aggregate (expand+two-phase under the hood)",
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        catalog(spark, sf_dir)
        .orders.groupBy("o_orderstatus")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "q_percentiles",
    """SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75
    FROM lineitem GROUP BY l_returnflag""",
    doc="exact interpolated percentiles (sort-based, per-group)",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(F.percentile("l_extendedprice", F.lit(p)), 6).alias(name)
            for p, name in ((0.25, "p25"), (0.50, "p50"), (0.75, "p75"))
        ]
    )


@register(
    "q_scalar_subquery",
    f"""WITH t AS (SELECT {davg_sql('o_totalprice')} AS thr FROM orders)
    SELECT o_orderkey, o_totalprice FROM orders, t WHERE o_totalprice > thr""",
    doc="scalar-subquery filter: the 1-row aggregate materializes to a "
    "literal, so the comparison pushes into the parquet scan",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = catalog(spark, sf_dir).orders
    # a scalar aggregate IS a driver value; inlining it keeps the second
    # pass a plain pushable filter instead of a nested-loop join of a
    # 1-row DataFrame against the scan
    thr = orders.agg(davg("o_totalprice", "thr")).head()[0]
    return orders.filter(F.col("o_totalprice") > F.lit(thr)).select(
        "o_orderkey", "o_totalprice"
    )


@register(
    "q_salted_join",
    """SELECT e.event_id, e.user_id, c.c_name
    FROM events e JOIN customer c ON e.user_id = c.c_custkey""",
    doc="skew-salted fact-dim join: shuffles on (key, salt) so hot keys "
    "spread over salt_count reducers; result identical to the plain join",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.skew import salted_join

    cat = catalog(spark, sf_dir)
    fact = cat.events.select("event_id", "user_id")
    dim = cat.customer.select("c_custkey", "c_name")
    return salted_join(
        fact, dim, fact_key="user_id", dim_key="c_custkey",
        salt_source="event_id", salt_count=8,
    ).select("event_id", "user_id", "c_name")


# -- q_bloom_prune: portable Bloom-filter join pruning ------------------------
def _bf_bit_sql(i: int, expr: str) -> str:
    return (
        f"CAST(CONCAT('0x', SUBSTR(MD5('bf{i}:' || CAST({expr} AS VARCHAR)),"
        f" 1, 15)) AS BIGINT) % 8192"
    )


_BLOOM_SQL = f"""WITH dimk AS (
        SELECT DISTINCT c_custkey AS k FROM customer
        WHERE c_mktsegment = 'BUILDING'),
    bits AS (SELECT DISTINCT bit FROM (
        SELECT {_bf_bit_sql(0, 'k')} AS bit FROM dimk
        UNION ALL SELECT {_bf_bit_sql(1, 'k')} FROM dimk
        UNION ALL SELECT {_bf_bit_sql(2, 'k')} FROM dimk)),
    probe AS (SELECT DISTINCT o_custkey AS k FROM orders
              WHERE o_custkey IS NOT NULL),
    fan AS (
        SELECT k, {_bf_bit_sql(0, 'k')} AS bit FROM probe
        UNION ALL SELECT k, {_bf_bit_sql(1, 'k')} FROM probe
        UNION ALL SELECT k, {_bf_bit_sql(2, 'k')} FROM probe),
    hits AS (SELECT f.k, COUNT(b.bit) = 3 AS maybe
             FROM fan f LEFT JOIN bits b USING (bit) GROUP BY f.k),
    flagged AS (
        SELECT COALESCE(h.maybe, FALSE) AS maybe,
               o.o_custkey IN (SELECT k FROM dimk) AS istrue
        FROM orders o LEFT JOIN hits h ON o.o_custkey = h.k)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_fact,
           CAST(SUM(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN istrue THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true_match,
           CAST(SUM(CASE WHEN maybe AND NOT istrue THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos
    FROM flagged"""


@register(
    "q_bloom_prune",
    _BLOOM_SQL,
    doc="engine-portable Bloom-filter join pruning: the BUILDING-"
    "segment customer keys compressed to an 8192-bit md5 filter "
    "(sparse set-bit table, <=8192 rows, mergeable by union), orders "
    "probed map-side via broadcast — the shape of Spark's runtime "
    "bloom join made oracle-reproducible; report proves no false "
    "negatives (n_pass >= n_true_match) and shows the FP selectivity "
    "loss",
)
def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.bloom import bloom_prune_report

    cat = catalog(spark, sf_dir)
    dim = cat.customer.filter(F.col("c_mktsegment") == "BUILDING")
    return bloom_prune_report(cat.orders, "o_custkey", dim, "c_custkey")


# -- q_zone_pruned_read: the zone map driving an actual pruned scan -----------
_ZONE_PRUNED_SQL = """SELECT doc_id, lang, source FROM documents
    WHERE length(text) BETWEEN 100 AND 200"""


@register(
    "q_zone_pruned_read",
    _ZONE_PRUNED_SQL,
    doc="zone-map-driven pruned read: a maintained zone state over "
    "(doc_id order, text length) converts the surviving zones back to "
    "id ranges that reach the parquet scan as PUSHED filters — row "
    "groups outside them never load, and the computed length "
    "predicate (which no file stats can serve) evaluates only on "
    "survivors; the oracle is the plain filter, so a green row proves "
    "pruned scan == full scan row-for-row",
)
def q_zone_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.maintenance import (
        zone_pruned_between,
        zone_state,
    )

    docs = catalog(spark, sf_dir).documents
    geo_hi = (1 << 20) - 1
    st = zone_state(docs, "doc_id", F.length("text"), 0, geo_hi, 64)
    return zone_pruned_between(
        docs, st, "doc_id", F.length(F.col("text")), 100, 200, 0, geo_hi, 64
    ).select("doc_id", "lang", "source")


# -- q_zone_map: min/max data-skipping statistics -----------------------------
_ZONE_SQL = """WITH keyed AS (
        SELECT DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS o, o_totalprice AS v
        FROM orders WHERE o_orderdate IS NOT NULL),
    s AS (SELECT MIN(o) AS lo, MAX(o) AS hi FROM keyed)
    SELECT CAST(((o - lo) * 64) // (hi - lo + 1) AS INTEGER) AS zone,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MIN(v), 6) AS v_min,
           ROUND(MAX(v), 6) AS v_max
    FROM keyed, s
    GROUP BY ((o - lo) * 64) // (hi - lo + 1)"""


@register(
    "q_zone_map",
    _ZONE_SQL,
    doc="zone map (min/max data-skipping stats) of o_totalprice over "
    "64 order-date zones — the statistic behind parquet row-group / "
    "lake-format file pruning as a queryable artifact; near-global "
    "per-zone spans diagnose a layout that doesn't cluster the value "
    "(fix = Z-order rewrite, re-check by re-running); two collected "
    "scalar bounds + one 64-row map-side-combined agg",
)
def q_zone_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.maintenance import zone_map

    orders = catalog(spark, sf_dir).orders
    days = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    )
    return zone_map(orders, days, F.col("o_totalprice"), num_zones=64)


# -- q_fk_integrity: referential integrity of a replicated fact ---------------
_FK_SQL = """WITH fact AS (
        SELECT CASE WHEN o_orderkey % 97 = 0 THEN o_custkey + 1000000
                    ELSE o_custkey END AS k
        FROM orders),
    fk AS (SELECT k AS _k, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM fact GROUP BY k),
    dk AS (SELECT DISTINCT c_custkey AS _k, 1 AS hit FROM customer),
    fl AS (SELECT fk._k, fk.cnt, dk.hit FROM fk LEFT JOIN dk USING (_k))
    SELECT CAST(SUM(cnt) AS BIGINT) AS n_fact,
           CAST(SUM(CASE WHEN hit IS NULL THEN cnt ELSE 0 END) AS BIGINT)
               AS n_orphans,
           CAST(SUM(CASE WHEN hit IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_distinct_orphan_keys,
           ROUND(SUM(CASE WHEN hit IS NULL THEN cnt ELSE 0 END)
                 / CAST(SUM(cnt) AS DOUBLE), 6) AS orphan_fraction
    FROM fl"""


@register(
    "q_fk_integrity",
    _FK_SQL,
    doc="referential-integrity check of a replicated fact against its "
    "dimension (every ~97th order's custkey corrupted in the fixture "
    "to synthesize replication damage): orphan row/key counts + "
    "fraction — the post-replication invariant a CDC pipeline alerts "
    "on; distinct-key-sized state, the fact never shuffles on data "
    "size",
)
def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.profile import fk_orphans

    cat = catalog(spark, sf_dir)
    damaged = cat.orders.select(
        F.when(
            F.col("o_orderkey") % 97 == 0, F.col("o_custkey") + 1_000_000
        )
        .otherwise(F.col("o_custkey"))
        .alias("fk")
    )
    return fk_orphans(damaged, cat.customer, "fk", "c_custkey")


# -- q_auto_join: measured join-strategy selection, salted path ---------------
@register(
    "q_auto_join",
    """SELECT e.event_id, e.user_id, c.c_name
    FROM events e JOIN customer c ON e.user_id = c.c_custkey""",
    doc="measured join-strategy selection (join_strategy -> auto_join): "
    "thresholds pinned so the profiler MEASURES the dim over the "
    "broadcast bound and the fact key's top share over the skew "
    "threshold, forcing the salted execution path — the oracle is the "
    "PLAIN join SQL, proving the chosen physical shape is "
    "row-identical to the logical join (q_salted_join's twin, with "
    "the decision made from data instead of by the caller)",
)
def q_auto_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.skew import auto_join

    cat = catalog(spark, sf_dir)
    fact = cat.events.select("event_id", "user_id")
    dim = cat.customer.select("c_custkey", "c_name")
    return auto_join(
        fact,
        dim,
        fact_key="user_id",
        dim_key="c_custkey",
        salt_source="event_id",
        broadcast_max_rows=10,       # dims are bigger -> not broadcast
        skew_share_threshold=0.0001,  # any measured share -> salted
    ).select("event_id", "user_id", "c_name")


# -- q_bloom_semi_join: the bloom-accelerated semi join -----------------------
@register(
    "q_bloom_semi_join",
    """SELECT o.o_orderkey, o.o_custkey FROM orders o
    WHERE o.o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING')""",
    doc="bloom-accelerated LEFT SEMI join: map-side bloom pre-filter "
    "(<=8192-row broadcast) then exact verification on the surviving "
    "fraction only — the oracle is the PLAIN semi-join SQL, proving "
    "the two-phase execution is row-identical (no false negatives; "
    "false positives removed by the verify join)",
)
def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.bloom import bloom_semi_join

    cat = catalog(spark, sf_dir)
    dim = cat.customer.filter(F.col("c_mktsegment") == "BUILDING")
    return bloom_semi_join(
        cat.orders.select("o_orderkey", "o_custkey"),
        dim,
        "o_custkey",
        "c_custkey",
    )


# -- q_zone_merged: mergeable zone-map states ---------------------------------
# pinned geometry: epoch days [8000, 12000] (covers the TPC-H date
# range at every SF), 64 zones -> rng = 4001
_ZONE_MERGED_SQL = """WITH keyed AS (
        SELECT DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS o, o_totalprice AS v
        FROM orders WHERE o_orderdate IS NOT NULL)
    SELECT CAST(LEAST(GREATEST(((o - 8000) * 64) // 4001, 0), 63)
                AS INTEGER) AS zone,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MIN(v), 6) AS v_min,
           ROUND(MAX(v), 6) AS v_max
    FROM keyed
    GROUP BY LEAST(GREATEST(((o - 8000) * 64) // 4001, 0), 63)"""


@register(
    "q_zone_merged",
    _ZONE_MERGED_SQL,
    doc="zone-map states as maintained artifacts: orders split by "
    "orderkey parity (two ingest batches), one pinned-geometry "
    "([8000,12000] epoch days, 64 zones) state per batch, states "
    "merged (counts add, extrema min/max) — the oracle computes the "
    "whole-table zone map in one pass, proving merge-of-batches == "
    "rebuild; the data-skipping index maintained as data lands, "
    "completing the maintained-artifact family",
)
def q_zone_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.maintenance import zone_merge, zone_state

    orders = catalog(spark, sf_dir).orders
    days = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    )
    a = zone_state(
        orders.filter(F.col("o_orderkey") % 2 == 0),
        days, F.col("o_totalprice"), 8000, 12000, num_zones=64,
    )
    b = zone_state(
        orders.filter(F.col("o_orderkey") % 2 == 1),
        days, F.col("o_totalprice"), 8000, 12000, num_zones=64,
    )
    return zone_merge(a, b)


# -- q_bloom_merged: Bloom filters as mergeable shard artifacts ----------------
_BLOOM_MERGED_SQL = f"""WITH dimk AS (
        SELECT DISTINCT c_custkey AS k FROM customer
        WHERE c_mktsegment = 'BUILDING'),
    bits AS (SELECT DISTINCT bit FROM (
        SELECT {_bf_bit_sql(0, 'k')} AS bit FROM dimk
        UNION ALL SELECT {_bf_bit_sql(1, 'k')} FROM dimk
        UNION ALL SELECT {_bf_bit_sql(2, 'k')} FROM dimk))
    SELECT CAST(bit AS INTEGER) AS bit FROM bits"""


@register(
    "q_bloom_merged",
    _BLOOM_MERGED_SQL,
    doc="Bloom filters as maintained shard artifacts: the BUILDING-"
    "segment keys split by custkey parity, one sparse set-bit filter "
    "built per shard, filters OR-merged (union + distinct) - the "
    "oracle is the WHOLE-set filter SQL, proving merge-of-shard-"
    "filters == rebuild-from-raw bit-for-bit; completes the mergeable "
    "family (HLL / Count-Min / histogram / zone / KMV / bloom)",
)
def q_bloom_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.bloom import bloom_build, bloom_merge

    dim = catalog(spark, sf_dir).customer.filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    a = bloom_build(dim.filter(F.col("c_custkey") % 2 == 0), "c_custkey")
    b = bloom_build(dim.filter(F.col("c_custkey") % 2 == 1), "c_custkey")
    return bloom_merge(a, b)


_BLOOM_WINDOWED_SQL = f"""WITH v AS (
        SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) AS w_day,
               user_id
        FROM events WHERE user_id IS NOT NULL)
    SELECT DISTINCT w_day, CAST(bit AS INTEGER) AS bit FROM (
        SELECT w_day, {_bf_bit_sql(0, 'user_id')} AS bit FROM v
        UNION ALL SELECT w_day, {_bf_bit_sql(1, 'user_id')} FROM v
        UNION ALL SELECT w_day, {_bf_bit_sql(2, 'user_id')} FROM v)"""


@register(
    "q_bloom_windowed",
    _BLOOM_WINDOWED_SQL,
    doc="per-day Bloom membership states (w_day, bit): the batch twin "
    "of streaming.windowed_bloom_state_by — the streamed operator (a "
    "plain watermarked windowed groupBy over the k-way md5 bit "
    "explode, <=num_bits rows state per window) is proven equal to "
    "THIS shape in tests/test_streaming.py, so a green row "
    "transitively pins the streaming Bloom state under the oracle "
    "gate; completes the streaming sketch family (HLL distinct, KMV "
    "set algebra, Bloom membership)",
)
def q_bloom_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.bloom import bloom_build_by

    ev = catalog(spark, sf_dir).events.select(
        F.date_trunc("day", "ts").alias("w_day"), "user_id"
    )
    return bloom_build_by(ev, ["w_day"], "user_id")
