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


def test_range_join_rejects_mixed_ntz_and_instant(spark):
    l = spark.createDataFrame([(1, _ts("2024-01-01 00:00:00"))], "k long, lt timestamp")
    r = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"))], "k2 long, rt timestamp_ntz"
    )
    with pytest.raises(ValueError):
        bucketed_range_join(l, r, "k", "k2", "lt", "rt", 60)


def _brute_force_range(left, right, window_seconds):
    """Oracle: raw theta join with the exact wall-clock predicate."""
    lo = F.col("lt") - F.expr(f"INTERVAL {window_seconds} SECONDS")
    return (
        left.crossJoin(right)
        .filter(
            (F.col("k") == F.col("k2"))
            & (F.col("rt") >= lo)
            & (F.col("rt") < F.col("lt"))
        )
    )


def test_range_join_ntz_matches_brute_force(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-06-01 00:00:30")),
            (2, 10, _ts("2024-06-01 11:59:59.750000")),
            (3, 20, _ts("2024-06-01 00:01:00")),
        ],
        "id long, k long, lt timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-06-01 00:00:00"), "a"),
            (10, _ts("2024-06-01 11:59:59.500000"), "b"),
            (10, _ts("2024-06-01 11:58:00"), "c"),
            (20, _ts("2024-06-01 00:00:59"), "d"),
            (20, _ts("2024-05-31 23:59:00"), "e"),
        ],
        "k2 long, rt timestamp_ntz, tag string",
    )
    got = bucketed_range_join(
        left, right, by_left="k", by_right="k2",
        left_time="lt", right_time="rt", window_seconds=60,
    )
    want = _brute_force_range(left, right, 60)
    key = lambda r: (r["id"], r["tag"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_range_join_ntz_across_dst_fallback(spark):
    """Wall-clock-linear bucketing for NTZ: two rows 60s apart in
    wall-clock terms straddling the America/Los_Angeles 2024-11-03
    fall-back land ~1h1m apart on the instant axis — bucketing via
    cast('timestamp') would put them 2 buckets apart and drop the pair.
    """
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        left = spark.createDataFrame(
            [(1, 10, _ts("2024-11-03 02:00:30"))], "id long, k long, lt timestamp_ntz"
        )
        right = spark.createDataFrame(
            [
                (10, _ts("2024-11-03 01:59:30"), "in_60s"),     # 60s before, IN
                (10, _ts("2024-11-03 01:10:00"), "in_51m"),     # 50m30s before, IN
                (10, _ts("2024-11-03 00:59:00"), "too_old"),    # 61m30s, OUT
            ],
            "k2 long, rt timestamp_ntz, tag string",
        )
        got = bucketed_range_join(
            left, right, by_left="k", by_right="k2",
            left_time="lt", right_time="rt", window_seconds=3600,
        )
        assert {r["tag"] for r in got.collect()} == {"in_60s", "in_51m"}
        want = _brute_force_range(left, right, 3600)
        assert sorted(r["tag"] for r in want.collect()) == ["in_51m", "in_60s"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
