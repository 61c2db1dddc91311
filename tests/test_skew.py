"""Salted join: row-identical to the plain join under heavy key skew."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_system_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of fact rows hit key 1
    fact = spark.createDataFrame(
        [(i, 1 if i % 10 else i % 5 + 2, f"p{i}") for i in range(1, 401)],
        "fid long, k long, payload string",
    )
    dim = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 8)], "dk long, dname string"
    )
    return fact, dim


def test_inner_equals_plain_join(skewed):
    fact, dim = skewed
    salted = salted_join(fact, dim, "k", "dk", salt_source="fid", salt_count=8)
    plain = fact.join(dim, fact["k"] == dim["dk"]).drop("dk")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_left_keeps_unmatched_fact_rows(spark, skewed):
    fact, _ = skewed
    dim = spark.createDataFrame([(1, "only1")], "dk long, dname string")
    salted = salted_join(fact, dim, "k", "dk", salt_source="fid", salt_count=4, how="left")
    assert salted.count() == fact.count()  # every fact row survives exactly once
    assert salted.filter(F.col("dname").isNull()).count() == fact.filter("k <> 1").count()


def test_rejects_unsupported_how(skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", "dk", salt_source="fid", how="full")


def test_skew_profile_ranks_hot_keys_with_shares(spark):
    from cdc_system_spark.operators.skew import skew_profile

    # key 7 dominates: 6 of 10 rows; keys 1 and 2 tie at 2 rows each
    rows = [(7,)] * 6 + [(1,)] * 2 + [(2,)] * 2
    df = spark.createDataFrame(rows, "k long")
    got = skew_profile(df, "k", top_n=2).collect()
    assert [(r["key"], r["n_rows"], r["share"]) for r in got] == [
        (7, 6, 0.6),
        (1, 2, 0.2),  # tie with key 2 broken by ascending key
    ]
    plan = skew_profile(df, "k")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # total is a collected scalar, never a join
    assert "TakeOrderedAndProject" in plan
    with pytest.raises(ValueError, match="top_n"):
        skew_profile(df, "k", top_n=0)


def test_join_strategy_flips_on_skew_and_dim_size(spark, skewed):
    from cdc_system_spark.operators.skew import join_strategy

    fact, dim = skewed
    # 1. small dim -> broadcast regardless of fact skew
    d = join_strategy(fact, dim, "k")
    assert d["strategy"] == "broadcast" and d["dim_rows"] == 7
    # 2. dim over the broadcast bound + skewed fact key -> salted
    d = join_strategy(fact, dim, "k", broadcast_max_rows=3)
    assert d["strategy"] == "salted"
    assert d["top_key"] == 1 and d["top_share"] == 0.9
    # 3. same sizes, uniform key -> plain: the decision flips on the
    # MEASURED share, not on table shapes (explicit threshold: the
    # 1/defaultParallelism default would flag even a uniform 7-key
    # split on a 32-core box, correctly — 1/7 share IS a straggler
    # at 32-way parallelism)
    uniform = fact.withColumn("k", F.col("fid") % 7 + 1)
    d = join_strategy(
        uniform, dim, "k", broadcast_max_rows=3, skew_share_threshold=0.5
    )
    assert d["strategy"] == "plain" and d["top_share"] < 0.2
    d = join_strategy(
        uniform, dim, "k", broadcast_max_rows=3, skew_share_threshold=0.01
    )
    assert d["strategy"] == "salted"


def test_auto_join_rows_identical_across_strategies(spark, skewed):
    from cdc_system_spark.operators.skew import auto_join

    fact, dim = skewed
    expect = sorted(
        map(
            tuple,
            fact.join(
                dim, fact["k"] == dim["dk"]
            ).drop("dk").collect(),
        )
    )
    # broadcast path (small dim), salted path (forced), plain (forced)
    for kw in (
        {},
        {"broadcast_max_rows": 3},  # -> salted (k is 90% skewed)
        {"broadcast_max_rows": 3, "skew_share_threshold": 0.99},  # -> plain
    ):
        got = sorted(
            map(tuple, auto_join(fact, dim, "k", "dk", **kw).collect())
        )
        assert got == expect, kw
    # broadcast path carries the hint into the physical plan
    plan = (
        auto_join(fact, dim, "k", "dk")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
