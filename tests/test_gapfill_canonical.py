"""gap_fill (missing-bucket materializer) and cluster_canonicals
(best-member selection per duplicate cluster)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdc_system_spark.operators.dedup import cluster_canonicals
from cdc_system_spark.operators.temporal import gap_fill


def _ts(h):
    return dt.datetime(2024, 1, 1, h, 0, 0)


@pytest.fixture(scope="module")
def sparse(spark):
    # group a: hours 0, 3 observed; group b: hours 2, 4 observed
    rows = [
        ("a", _ts(0), 1.0),
        ("a", _ts(0), 3.0),
        ("a", _ts(3), 7.0),
        ("b", _ts(2), 5.0),
        ("b", _ts(4), 2.0),
    ]
    return spark.createDataFrame(rows, "g string, h timestamp, v double")


def test_grid_is_dense_over_global_span(spark, sparse):
    out = gap_fill(
        sparse,
        "h",
        ["g"],
        agg_exprs={"n": F.count(F.lit(1)), "mx": F.max("v")},
        ffill_cols=["mx"],
    )
    rows = {(r["g"], r["bucket"].hour): r for r in out.collect()}
    # global span is hours 0..4 for BOTH groups
    assert sorted(rows) == [(g, h) for g in "ab" for h in range(5)]


def test_zero_fill_and_ffill(spark, sparse):
    out = gap_fill(
        sparse,
        "h",
        ["g"],
        agg_exprs={"n": F.count(F.lit(1)), "mx": F.max("v")},
        ffill_cols=["mx"],
    )
    rows = {(r["g"], r["bucket"].hour): r for r in out.collect()}
    # counts zero-fill
    assert rows[("a", 1)]["n"] == 0 and rows[("a", 0)]["n"] == 2
    # ffill carries the last observed max forward across the gap
    assert rows[("a", 1)]["mx"] == 3.0
    assert rows[("a", 2)]["mx"] == 3.0
    assert rows[("a", 3)]["mx"] == 7.0
    assert rows[("a", 4)]["mx"] == 7.0
    # before a group's first observation: honest NULL, not a fabricated 0
    assert rows[("b", 0)]["mx"] is None
    assert rows[("b", 1)]["mx"] is None
    assert rows[("b", 2)]["mx"] == 5.0


def test_non_ffill_zero_uses_column_type(spark, sparse):
    out = gap_fill(
        sparse, "h", ["g"], agg_exprs={"s": F.sum("v")}
    )
    row = {(r["g"], r["bucket"].hour): r["s"] for r in out.collect()}
    assert row[("a", 1)] == 0.0  # double zero, not a long
    assert row[("a", 0)] == 4.0


def test_canonical_picks_best_then_smaller_id(spark):
    members = spark.createDataFrame(
        [
            # cluster 1: 11 wins on score
            (1, 1, 10),
            (1, 11, 90),
            (1, 12, 40),
            # cluster 2: tie 50/50 -> smaller id 2
            (2, 2, 50),
            (2, 21, 50),
            # singleton
            (3, 3, 5),
        ],
        "cluster_id long, doc_id long, text_len int",
    )
    out = {
        r["cluster_id"]: (r["canonical_id"], r["canonical_score"], r["n_members"])
        for r in cluster_canonicals(members, "text_len").collect()
    }
    assert out == {1: (11, 90, 3), 2: (2, 50, 2), 3: (3, 5, 1)}


def test_off_grid_buckets_are_kept_not_dropped(spark, sparse):
    # step coarser than the bucket truncation: hours 1/3 sit off the
    # 2-hour grid and must appear as their own rows, never vanish
    out = gap_fill(
        sparse, "h", ["g"], step="2 hours", agg_exprs={"n": F.count(F.lit(1))}
    )
    rows = {(r["g"], r["bucket"].hour): r["n"] for r in out.collect()}
    assert rows[("a", 3)] == 1  # off-grid observation preserved
    assert rows[("a", 0)] == 2 and rows[("a", 2)] == 0
    total = sum(v for v in rows.values())
    assert total == 5  # nothing dropped, nothing double-counted


def test_unknown_ffill_col_raises(spark, sparse):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="ffill_cols"):
        gap_fill(sparse, "h", ["g"], ffill_cols=["nope"])
