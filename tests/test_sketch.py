"""Portable HyperLogLog sketch (operators/sketch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_system_spark.operators.sketch import hll_distinct


def test_hll_estimate_within_tolerance(spark):
    # 2000 distinct values: well past the small-range regime for m=64;
    # standard error 1.04/sqrt(64) ~ 13% -> assert within 3 sigma
    df = spark.range(2000).select(F.concat(F.lit("u"), "id").alias("v"))
    row = hll_distinct(df, "v").head()
    assert row["n_empty_buckets"] == 0
    assert abs(row["n_est"] - 2000) / 2000 < 0.4


def test_hll_is_layout_and_duplicate_independent(spark):
    df = spark.range(500).select(F.concat(F.lit("x"), "id").alias("v"))
    a = hll_distinct(df, "v").head()
    b = hll_distinct(df.repartition(13), "v").head()
    dup = hll_distinct(df.union(df).union(df), "v").head()  # dups don't move it
    assert a == b == dup


def test_hll_flags_small_range_and_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), ("c",), (None,)], "v string"
    )
    row = hll_distinct(df, "v").head()
    assert row["n_empty_buckets"] >= 60      # tiny cardinality flagged
    only_null = spark.createDataFrame([(None,)], "v string")
    r2 = hll_distinct(only_null, "v").head()
    assert r2["n_empty_buckets"] == 64
