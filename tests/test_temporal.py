"""Temporal operator semantics: as-of join and bucketed range join.

Covers what the DuckDB-oracle queries can't: forward direction,
unmatched-key null fill, equal-timestamp inclusivity, and the exact
window boundary behavior of the bucketed range join (a right row at
exactly left_time - window is IN; at exactly left_time is OUT).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdc_system_spark.operators.temporal import asof_join, bucketed_range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100.0),
            (1, _ts("2024-01-01 10:00:05"), 101.0),
            (1, _ts("2024-01-01 10:00:10"), 102.0),
            (2, _ts("2024-01-01 10:00:03"), 200.0),
        ],
        "sym long, qt timestamp, price double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:04")),   # backward→100, forward→101
            (1, _ts("2024-01-01 10:00:05")),   # equal ts counts (>=) → 101
            (2, _ts("2024-01-01 10:00:00")),   # before first quote → null back
            (3, _ts("2024-01-01 10:00:00")),   # key never quoted → null
        ],
        "sym2 long, tt timestamp",
    )


def test_asof_backward(quotes, trades):
    out = asof_join(
        trades, quotes, left_time="tt", right_time="qt",
        by_left="sym2", by_right="sym", payload_cols=["qt", "price"],
    )
    got = {(r["sym2"], str(r["tt"])): r["price"] for r in out.collect()}
    assert got[(1, "2024-01-01 10:00:04")] == 100.0
    assert got[(1, "2024-01-01 10:00:05")] == 101.0  # ties match
    assert got[(2, "2024-01-01 10:00:00")] is None   # nothing earlier
    assert got[(3, "2024-01-01 10:00:00")] is None   # unmatched key
    assert out.count() == 4                          # left-join: no row loss


def test_asof_forward(quotes, trades):
    out = asof_join(
        trades, quotes, left_time="tt", right_time="qt",
        by_left="sym2", by_right="sym", payload_cols=["price"],
        direction="forward",
    )
    got = {(r["sym2"], str(r["tt"])): r["price"] for r in out.collect()}
    assert got[(1, "2024-01-01 10:00:04")] == 101.0  # next quote at :05
    assert got[(1, "2024-01-01 10:00:05")] == 101.0  # equal ts counts
    assert got[(2, "2024-01-01 10:00:00")] == 200.0
    assert got[(3, "2024-01-01 10:00:00")] is None


def test_asof_right_tie_dedup_is_deterministic(spark, trades):
    dup = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 1.0), (1, _ts("2024-01-01 10:00:00"), 9.0)],
        "sym long, qt timestamp, price double",
    )
    out = asof_join(
        trades.filter(F.col("sym2") == 1), dup,
        left_time="tt", right_time="qt",
        by_left="sym2", by_right="sym", payload_cols=["price"],
    )
    assert {r["price"] for r in out.collect()} == {9.0}  # greatest payload wins


def test_range_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 01:00:00"))], "id long, k long, lt timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:00"), "at_lower"),    # lt - window: IN
            (10, _ts("2024-01-01 00:59:59"), "inside"),      # IN
            (10, _ts("2024-01-01 01:00:00"), "at_left"),     # == lt: OUT
            (10, _ts("2023-12-31 23:59:59"), "too_old"),     # OUT
            (99, _ts("2024-01-01 00:30:00"), "wrong_key"),   # OUT
        ],
        "k2 long, rt timestamp, tag string",
    )
    out = bucketed_range_join(
        left, right, by_left="k", by_right="k2",
        left_time="lt", right_time="rt", window_seconds=3600,
    )
    assert {r["tag"] for r in out.collect()} == {"at_lower", "inside"}


def test_range_join_subsecond_precision(spark):
    # right row 0.5s before left: IN for a 1s window despite second-level buckets
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:00:01.500000"))], "id long, k long, lt timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:01.000000"), "in"),
            (10, _ts("2024-01-01 00:00:00.400000"), "out"),
        ],
        "k2 long, rt timestamp, tag string",
    )
    out = bucketed_range_join(
        left, right, by_left="k", by_right="k2",
        left_time="lt", right_time="rt", window_seconds=1,
    )
    assert {r["tag"] for r in out.collect()} == {"in"}


def test_range_join_rejects_same_time_column_name(spark):
    df = spark.createDataFrame([(1, _ts("2024-01-01 00:00:00"))], "k long, t timestamp")
    with pytest.raises(ValueError):
        bucketed_range_join(df, df, "k", "k", "t", "t", 60)
