"""Conflict-resolution operator semantics (reference stub
example_usage.py:236-252 made real): winner selection, manual routing,
field-level merge null handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def changes(spark):
    # key 1: three competing changes; key 2: single change
    rows = [
        (1, 10, "INSERT", (5, None)),
        (1, 20, "UPDATE", (None, 2.5)),   # touches only v
        (1, 30, "UPDATE", (7, None)),     # touches only k
        (2, 40, "INSERT", (9, 9.0)),
    ]
    return spark.createDataFrame(
        rows,
        "record_id long, cdc_id long, operation string, "
        "new struct<k: long, v: double>",
    )


def test_lww_vs_fww(changes):
    from cdc_system_spark.operators.conflicts import resolve

    lww = {r["record_id"]: r["cdc_id"] for r in resolve(changes, strategy="lww").collect()}
    fww = {r["record_id"]: r["cdc_id"] for r in resolve(changes, strategy="fww").collect()}
    assert lww == {1: 30, 2: 40}
    assert fww == {1: 10, 2: 40}
    with pytest.raises(ValueError):
        resolve(changes, strategy="merge")


def test_manual_split_routes_contested_keys(changes):
    from cdc_system_spark.operators.conflicts import split_manual

    auto, review = split_manual(changes)
    assert {r["record_id"] for r in auto.collect()} == {2}
    assert {r["cdc_id"] for r in review.collect()} == {10, 20, 30}


def test_field_merge_takes_latest_non_null_per_field(changes):
    from cdc_system_spark.operators.conflicts import field_merge

    got = {r["record_id"]: r for r in field_merge(changes).collect()}
    # k from cdc_id=30, v from cdc_id=20 — different source changes
    assert got[1]["k"] == 7 and got[1]["v"] == 2.5 and got[1]["cdc_id"] == 30
    assert got[2]["k"] == 9 and got[2]["v"] == 9.0


def test_field_merge_rejects_non_struct(spark):
    from cdc_system_spark.operators.conflicts import field_merge

    flat = spark.createDataFrame([(1, 1, "x")], "record_id long, cdc_id long, new string")
    with pytest.raises(ValueError, match="struct"):
        field_merge(flat)


def test_all_null_field_stays_null(spark):
    from cdc_system_spark.operators.conflicts import field_merge

    df = spark.createDataFrame(
        [(1, 10, (None, 1.0)), (1, 20, (None, None))],
        "record_id long, cdc_id long, new struct<k: long, v: double>",
    )
    row = field_merge(df).collect()[0]
    assert row["k"] is None and row["v"] == 1.0
