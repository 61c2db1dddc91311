"""Bucketed-table layout: the join must be exchange-free.

The plan-level proof of the 100 TB story: two tables bucketed on the
same key with the same bucket count join WITHOUT any shuffle — no
Exchange node above either scan. Also pins content correctness and the
mismatched-bucket fallback (join still correct, exchange reappears).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_system_spark.operators.bucketing import bucketed_join, write_bucketed
from cdc_system_spark.plans import explain_str
from cdc_system_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "b_orders", "custkey", num_buckets=8,
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"),
        "b_customer", "custkey", num_buckets=8,
    )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    # force the sort-merge path so the assertion is about bucketing,
    # not about the small side getting broadcast
    with _no_broadcast(spark):
        joined = bucketed_join(spark, lt, rt, "custkey")
        plan = explain_str(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # correctness: same result as the plain parquet join
        orders = load_table(spark, sf_dir, "orders")
        customer = load_table(spark, sf_dir, "customer")
        expect = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert joined.count() == expect


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark, bucketed_tables):
    lt, _ = bucketed_tables
    cust = spark.table("b_customer").limit(1000)
    # a derived (non-bucketed) frame joins correctly but pays the exchange
    with _no_broadcast(spark):
        joined = spark.table(lt).join(cust, "custkey")
        plan = explain_str(joined)
        assert "Exchange" in plan
        assert joined.count() > 0


def test_write_bucketed_validates_args(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="num_buckets"):
        write_bucketed(orders, "b_bad", "o_custkey", num_buckets=0)


class _no_broadcast:
    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *a):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)
