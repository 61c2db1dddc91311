"""KMV (bottom-k / theta) sketch: exact-below-saturation, estimator
accuracy, lossless merge, set algebra, and per-group states."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_system_spark.operators.sketch import (
    kmv_estimate,
    kmv_intersect,
    kmv_merge,
    kmv_state,
    kmv_state_by,
)


@pytest.fixture(scope="module")
def ints(spark):
    # 5000 distinct values — deep saturation at k = 64
    return spark.range(5000).select(F.col("id").alias("v"))


def test_exact_below_saturation(spark):
    df = spark.range(40).select(F.col("id").alias("v"))
    row = kmv_estimate(kmv_state(df, "v")).collect()[0]
    assert row["n_est"] == 40.0
    assert row["saturated"] is False


def test_empty_input(spark):
    df = spark.range(0).select(F.col("id").alias("v"))
    row = kmv_estimate(kmv_state(df, "v")).collect()[0]
    assert row["n_est"] == 0.0
    assert row["saturated"] is False


def test_nulls_ignored(spark):
    df = spark.range(30).select(
        F.when(F.col("id") < 10, F.col("id")).alias("v")
    )
    row = kmv_estimate(kmv_state(df, "v")).collect()[0]
    assert row["n_est"] == 10.0


def test_duplicates_collapse(spark):
    # 3 copies of 50 values: still exactly 50
    df = spark.range(150).select((F.col("id") % 50).alias("v"))
    row = kmv_estimate(kmv_state(df, "v")).collect()[0]
    assert row["n_est"] == 50.0


def test_saturated_estimate_accuracy(ints):
    # SE ~ 1/sqrt(k-2) ~ 13% at k=64; allow 4 sigma
    row = kmv_estimate(kmv_state(ints, "v")).collect()[0]
    assert row["saturated"] is True
    assert abs(row["n_est"] - 5000) / 5000 < 0.52


def test_higher_k_tightens(ints):
    row = kmv_estimate(kmv_state(ints, "v", k=512), k=512).collect()[0]
    assert abs(row["n_est"] - 5000) / 5000 < 0.2


def test_merge_equals_rebuild(ints):
    # shard states merged == whole-corpus state, bit-for-bit
    a = kmv_state(ints.filter("v % 3 = 0"), "v")
    b = kmv_state(ints.filter("v % 3 = 1"), "v")
    c = kmv_state(ints.filter("v % 3 = 2"), "v")
    merged = sorted(r["h"] for r in kmv_merge(a, b, c).collect())
    whole = sorted(r["h"] for r in kmv_state(ints, "v").collect())
    assert merged == whole


def test_merge_requires_states():
    with pytest.raises(ValueError):
        kmv_merge()


def test_intersect_exact_mode(spark):
    # unsaturated: the states ARE the sets, so the overlap is exact
    a = kmv_state(spark.range(0, 30).select(F.col("id").alias("v")), "v")
    b = kmv_state(spark.range(20, 50).select(F.col("id").alias("v")), "v")
    row = kmv_intersect(a, b).collect()[0]
    assert row["union_est"] == 50.0
    assert row["intersect_est"] == 10.0
    assert row["jaccard_est"] == round(10 / 50, 4)


def test_intersect_disjoint(spark):
    a = kmv_state(spark.range(0, 30).select(F.col("id").alias("v")), "v")
    b = kmv_state(spark.range(100, 130).select(F.col("id").alias("v")), "v")
    row = kmv_intersect(a, b).collect()[0]
    assert row["intersect_est"] == 0.0
    assert row["jaccard_est"] == 0.0


def test_intersect_saturated_sanity(spark):
    # |A| = |B| = 3000, |A ∩ B| = 1000: jaccard = 0.2, union = 5000
    a = kmv_state(spark.range(0, 3000).select(F.col("id").alias("v")), "v", k=256)
    b = kmv_state(
        spark.range(2000, 5000).select(F.col("id").alias("v")), "v", k=256
    )
    row = kmv_intersect(a, b, k=256).collect()[0]
    assert abs(row["union_est"] - 5000) / 5000 < 0.3
    assert 0.05 < row["jaccard_est"] < 0.45
    assert 200 < row["intersect_est"] < 2500


def test_state_by_groups_bounded_and_mergeable(spark):
    df = spark.range(2000).select(
        (F.col("id") % 4).alias("g"), F.col("id").alias("v")
    )
    states = kmv_state_by(df, ["g"], "v", k=32)
    sizes = {
        r["g"]: r["n"]
        for r in states.groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {0: 32, 1: 32, 2: 32, 3: 32}
    # merging the per-group states == the global state at the same k
    merged = kmv_merge(states.select("h"), k=32)
    whole = kmv_state(df, "v", k=32)
    assert sorted(r["h"] for r in merged.collect()) == sorted(
        r["h"] for r in whole.collect()
    )


def test_merge_by_equals_rebuild_per_group(spark):
    # the grouped merge must re-take bottom-k WITHIN each group;
    # kmv_merge would collapse all groups into one global k-row state
    from cdc_system_spark.operators.sketch import kmv_merge_by

    df = spark.range(4000).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("v")
    )
    a = kmv_state_by(df.filter("v % 2 = 0"), ["g"], "v", k=32)
    b = kmv_state_by(df.filter("v % 2 = 1"), ["g"], "v", k=32)
    merged = kmv_merge_by(a, b, group_cols=["g"], k=32)
    whole = kmv_state_by(df, ["g"], "v", k=32)
    key = lambda frame: sorted((r["g"], r["h"]) for r in frame.collect())
    assert key(merged) == key(whole)
    # group present in only one input passes through
    only_a = kmv_merge_by(
        a.filter("g = 0"), b.filter("g = 1"), group_cols=["g"], k=32
    )
    assert {r["g"] for r in only_a.select("g").distinct().collect()} == {0, 1}


def test_estimate_by_matches_scalar(spark):
    from cdc_system_spark.operators.sketch import kmv_estimate_by

    df = spark.range(3000).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("v")
    )
    grouped = {
        r["g"]: (r["n_est"], r["saturated"])
        for r in kmv_estimate_by(
            kmv_state_by(df, ["g"], "v"), ["g"]
        ).collect()
    }
    for g in range(3):
        solo = kmv_estimate(
            kmv_state(df.filter(F.col("g") == g), "v")
        ).collect()[0]
        assert grouped[g] == (solo["n_est"], solo["saturated"])
