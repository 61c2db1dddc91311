"""Extended TPC-H-shaped query surface (reduced driver schema).

The driver's star schema drops several canonical TPC-H columns
(``partsupp`` is absent; ``lineitem`` has no receipt/commit dates or
ship modes), so each query here is the canonical *shape* re-targeted at
the columns that exist — the join/agg/subquery structure is what
matters for engine coverage, not the literal predicate.

Scale posture per query (tested on sf0.1, designed for 100 TB):
dimensions (`part`, `customer`, `supplier`, `nation`) broadcast; the
single fact shuffle is the grouped aggregation on the join key;
correlated subqueries become window functions or broadcast scalar
aggregates so no query ever shuffles the fact table twice for one
logical pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_system_spark.functions.portable import davg_sql, dsum, dsum_sql
from cdc_system_spark.queries.base import catalog, register

_DISC_PRICE = "l_extendedprice * (1 - l_discount)"


# -- q_forecast_revenue: TPC-H Q6 shape (pure scan-filter-aggregate) ---------
@register(
    "q_forecast_revenue",
    f"""SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24""",
    doc="Q6 shape: all predicates pushed to the parquet scan, scalar agg",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = catalog(spark, sf_dir).lineitem
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count("*").alias("n_items"),
        )
    )


# -- q_order_priority: TPC-H Q4 shape (EXISTS semi-join + grouped count) -----
@register(
    "q_order_priority",
    """SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority""",
    doc="Q4 shape: EXISTS → left-semi join, then grouped count",
)
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    late = cat.lineitem.select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            late,
            (late.l_orderkey == orders.o_orderkey)
            & (late.l_shipdate > F.date_add(orders.o_orderdate, 60)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# -- q_returned_items: TPC-H Q10 shape (join + group + top-k) ----------------
@register(
    "q_returned_items",
    f"""SELECT c.c_custkey, c.c_name, n.n_name,
           {dsum_sql(_DISC_PRICE)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20""",
    doc="Q10 shape: returned-item revenue per customer, TakeOrdered top-20",
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = cat.lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(cat.customer.select("c_custkey", "c_name", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(cat.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(disc_price, "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# -- q_promo_revenue: TPC-H Q14 shape (conditional-ratio aggregate) ----------
@register(
    "q_promo_revenue",
    f"""SELECT CAST(100.0 * {dsum_sql(
        f"CASE WHEN p.p_type = 'PROMO' THEN {_DISC_PRICE} ELSE 0 END")}
           / {dsum_sql(_DISC_PRICE)} AS DOUBLE) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""",
    doc="Q14 shape: broadcast part join, conditional sum ratio",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    li = cat.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = "decimal(25,6)"
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        li.join(
            F.broadcast(cat.part.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo.cast(dec)).cast("double")
                / F.sum(disc_price.cast(dec)).cast("double")
            )
            .cast("double")
            .alias("promo_pct")
        )
    )


# -- q_market_share: TPC-H Q8 shape (share-of-total per year) ----------------
@register(
    "q_market_share",
    f"""WITH volumes AS (
        SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
               CAST({_DISC_PRICE} AS DECIMAL(25,6)) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'AMERICA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
    SELECT CAST(o_year AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN supp_nation = 'BRAZIL' THEN volume ELSE 0 END)
                AS DOUBLE) / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM volumes GROUP BY o_year""",
    doc="Q8 shape: star join, share-of-total via conditional sum per year",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    region = cat.region.filter(F.col("r_name") == "AMERICA")
    cust_nation = (
        cat.nation.join(
            F.broadcast(region), cat.nation.n_regionkey == region.r_regionkey
        )
        .select(F.col("n_nationkey").alias("cn_nationkey"))
    )
    supp_nation = cat.nation.select(
        F.col("n_nationkey").alias("sn_nationkey"), F.col("n_name").alias("supp_nation")
    )
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dec = "decimal(25,6)"
    volume = disc_price.cast(dec)
    brazil = F.when(F.col("supp_nation") == "BRAZIL", volume).otherwise(
        F.lit(0).cast(dec)
    )
    return (
        cat.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(
            F.broadcast(cat.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_nationkey"), "left_semi")
        .join(
            F.broadcast(cat.supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_nationkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            brazil.alias("brazil_volume"),
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum("brazil_volume").cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
    )


# -- q_top_supplier: TPC-H Q15 shape (window max over grouped revenue) -------
@register(
    "q_top_supplier",
    f"""WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {dsum_sql(_DISC_PRICE)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)""",
    doc="Q15 shape: grouped revenue, global-max via rank window, join names",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    revenue = (
        cat.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"
            )
        )
    )
    # global max via a rank window over a single (empty) partition: the
    # grouped revenue table is |suppliers| rows — tiny relative to the
    # fact — so the single-partition window is not a scale hazard.
    top = (
        revenue.withColumn(
            "rnk", F.rank().over(Window.orderBy(F.desc("total_revenue")))
        )
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )
    return (
        top.join(
            F.broadcast(cat.supplier.select("s_suppkey", "s_name")),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


# -- q_supplier_part_count: TPC-H Q16 shape (distinct-agg over join) ---------
@register(
    "q_supplier_part_count",
    """SELECT p.p_brand, p.p_type,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 20 AND p.p_brand <> 'Brand#5'
    GROUP BY p.p_brand, p.p_type
    ORDER BY supplier_cnt DESC, p_brand, p_type LIMIT 25""",
    doc="Q16 shape: distinct aggregate per brand/type (partsupp → lineitem)",
)
def q_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    part = cat.part.filter(
        (F.col("p_size") >= 20) & (F.col("p_brand") != "Brand#5")
    ).select("p_partkey", "p_brand", "p_type")
    return (
        cat.lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
        .limit(25)
    )


# -- q_small_quantity_revenue: TPC-H Q17 shape (per-key avg threshold) -------
@register(
    "q_small_quantity_revenue",
    f"""SELECT CAST({dsum_sql('l_extendedprice')} / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN (SELECT l_partkey AS a_partkey,
                 {davg_sql('l_quantity')} AS avg_qty
          FROM lineitem GROUP BY l_partkey) a
      ON l.l_partkey = a.a_partkey
    WHERE l.l_quantity < 0.5 * a.avg_qty""",
    doc="Q17 shape: correlated avg-per-part subquery as a window function "
    "(one shuffle on l_partkey, no self-join)",
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = catalog(spark, sf_dir).lineitem.select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # The canonical plan self-joins lineitem with its per-part average;
    # a window over l_partkey computes the average in the same shuffle
    # that would feed the join's build side — one fact-table pass.
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.col("l_quantity").cast("decimal(25,6)")).over(w).cast("double")
        / F.count("l_quantity").over(w)
    ).cast("double")
    return (
        li.withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(25,6)")).cast("double")
                / 7.0
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


# -- q_large_orders: TPC-H Q18 shape (group-having feeding a join) -----------
@register(
    "q_large_orders",
    f"""SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, {dsum_sql('l.l_quantity')} AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 180)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o_orderkey LIMIT 20""",
    doc="Q18 shape: HAVING subquery as left-semi join on the grouped fact",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    li = cat.lineitem.select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("q"))
        .filter(F.col("q") > 180)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(big, li.l_orderkey == big.big_orderkey, "left_semi")
        .join(
            cat.orders.select(
                "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cat.customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


# -- q_disjunctive_revenue: TPC-H Q19 shape (OR-of-ANDs join predicate) ------
@register(
    "q_disjunctive_revenue",
    f"""SELECT {dsum_sql(_DISC_PRICE)} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)""",
    doc="Q19 shape: disjunctive mixed-side predicate over a broadcast join",
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    li = cat.lineitem.select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = cat.part.select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & (q >= 20) & (q <= 30))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(dsum(disc_price, "revenue"))
    )


# -- q_dormant_customers: TPC-H Q22 shape (scalar subquery + anti join) ------
@register(
    "q_dormant_customers",
    f"""SELECT c.c_mktsegment, COUNT(*) AS numcust,
           {dsum_sql('c.c_acctbal')} AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT {davg_sql('c_acctbal')} FROM customer
                         WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c.c_mktsegment""",
    doc="Q22 shape: broadcast scalar-avg filter + left-anti join vs recent "
    "orders (every customer has *some* order in the driver data, so the "
    "canonical no-orders-at-all predicate would select zero rows)",
)
def q_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    cust = cat.customer.select("c_custkey", "c_mktsegment", "c_acctbal")
    # scalar subquery: evaluated once and inlined as a literal — the
    # same execute-collect-substitute strategy Spark SQL uses for
    # uncorrelated scalar subqueries, and it keeps the filter pushable
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(25,6)")).cast("double")
                / F.count("c_acctbal")
            )
            .cast("double")
            .alias("avg_bal")
        )
        .head()[0]
    )
    return (
        cust.filter(F.col("c_acctbal") > F.lit(avg_bal))
        .join(
            cat.orders.filter(
                F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )


# -- q_volume_shipping: TPC-H Q7 shape (bidirectional nation-pair flow) ------
@register(
    "q_volume_shipping",
    f"""WITH flows AS (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l.l_shipdate) AS l_year,
               {_DISC_PRICE} AS volume
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    SELECT supp_nation, cust_nation, CAST(l_year AS BIGINT) AS l_year,
           {dsum_sql('volume')} AS revenue
    FROM flows GROUP BY supp_nation, cust_nation, l_year""",
    doc="Q7 shape: trade volume between a nation pair, both directions, "
    "by year; both nation dims broadcast under distinct aliases, one "
    "fact shuffle into the grouped agg",
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog(spark, sf_dir)
    n1 = c.nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = c.nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    flows = (
        c.lineitem.join(c.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        flows.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(volume, "revenue"))
    )


# -- q_product_profit: TPC-H Q9 shape (profit by nation and year) ------------
# no partsupp in the reduced schema: supply cost proxied by
# 0.5 * p_retailprice * l_quantity, keeping Q9's join/agg structure intact
_PROFIT = f"{_DISC_PRICE} - 0.5 * p.p_retailprice * l.l_quantity"


@register(
    "q_product_profit",
    f"""WITH profits AS (
        SELECT n.n_name AS nation, EXTRACT(year FROM o.o_orderdate) AS o_year,
               {_PROFIT} AS amount
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_type IN ('ECONOMY', 'PROMO'))
    SELECT nation, CAST(o_year AS BIGINT) AS o_year,
           {dsum_sql('amount')} AS profit
    FROM profits GROUP BY nation, o_year""",
    doc="Q9 shape: 5-way star join, profit by supplier nation x order "
    "year; part filter prunes the fact early via the broadcast join",
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog(spark, sf_dir)
    part = c.part.filter(F.col("p_type").isin("ECONOMY", "PROMO"))
    joined = (
        c.lineitem.join(c.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(c.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c.nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(amount, "profit"))
    )


# -- q_customer_distribution: TPC-H Q13 shape (outer join + 2-level agg) -----
@register(
    "q_customer_distribution",
    """WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count""",
    doc="Q13 shape: left-outer join with the predicate in the JOIN "
    "condition (customers with zero qualifying orders must survive "
    "with c_count=0 - a WHERE would silently drop them), then a "
    "second aggregation over the first's output",
)
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog(spark, sf_dir)
    orders = c.orders.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# -- q_waiting_suppliers: TPC-H Q21 shape (double EXISTS, rewritten) ---------
@register(
    "q_waiting_suppliers",
    """WITH per_order AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
                   AS n_ret_supp
        FROM lineitem GROUP BY l_orderkey),
    sole AS (
        SELECT DISTINCT l.l_suppkey, l.l_orderkey
        FROM lineitem l
        JOIN per_order p ON l.l_orderkey = p.l_orderkey
        WHERE l.l_returnflag = 'R' AND p.n_supp >= 2 AND p.n_ret_supp = 1)
    SELECT s.s_name, COUNT(*) AS numwait
    FROM sole JOIN supplier s ON sole.l_suppkey = s.s_suppkey
    GROUP BY s.s_name""",
    doc="Q21 shape: suppliers solely responsible for returns in "
    "multi-supplier orders. The canonical EXISTS + NOT-EXISTS pair of "
    "fact self-joins is rewritten as ONE per-order aggregation joined "
    "back - a single fact shuffle on l_orderkey instead of three",
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog(spark, sf_dir)
    li = c.lineitem
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    sole = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            per_order.filter((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1)),
            "l_orderkey",
        )
        .select("l_suppkey", "l_orderkey")
        .distinct()
    )
    return (
        sole.join(F.broadcast(c.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# -- q_shipmode_priority: TPC-H Q12 shape (fact-fact join + CASE counts) -----
@register(
    "q_shipmode_priority",
    """SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus""",
    doc="Q12 shape (l_linestatus stands in for the absent l_shipmode): "
    "the one fact-fact join in TPC-H — year filter pushed to the "
    "lineitem scan, shuffle join on orderkey, CASE-bucketed priority "
    "counts grouped on the line status",
)
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = catalog(spark, sf_dir)
    li = cat.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    # both sides are fact-sized at scale: this is TPC-H's one genuine
    # fact-fact shuffle join — no broadcast hint on purpose (AQE may
    # still pick one at small SF, which is exactly right there)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        cat.orders.select("o_orderkey", "o_orderpriority")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )
