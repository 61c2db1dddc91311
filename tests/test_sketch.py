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
    # zero distinct values is EXACT, not the raw estimator's ~45.38
    assert r2["n_est"] == 0.0


def test_countmin_upper_bounds_and_hits_exact(spark):
    from cdc_system_spark.operators.sketch import countmin_estimates

    docs = spark.createDataFrame(
        [(1, "a b a c a"), (2, "b c d"), (3, "")],
        "doc_id long, text string",
    )
    got = {r["term"]: r for r in
           countmin_estimates(docs, ["a", "b", "zzz"]).collect()}
    assert got["a"]["exact_count"] == 3 and got["b"]["exact_count"] == 2
    for r in got.values():                       # the CM guarantee
        assert r["est_count"] >= r["exact_count"]
    # 8 distinct tokens into 4x1024 buckets: collisions essentially
    # impossible -> estimates are exact here
    assert got["a"]["est_count"] == 3
    assert got["zzz"]["est_count"] == 0 and got["zzz"]["exact_count"] == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        countmin_estimates(docs, [])


def test_countmin_is_layout_independent(spark):
    from cdc_system_spark.operators.sketch import countmin_estimates

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} shared w{i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, countmin_estimates(docs, ["shared", "w1"]).collect()))
    b = sorted(map(tuple, countmin_estimates(docs.repartition(11), ["shared", "w1"]).collect()))
    assert a == b
