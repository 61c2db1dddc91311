"""Unit semantics for the one-pass table profiler."""

from __future__ import annotations

import pytest

from cdc_system_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "a", None),
            (3, None, 30.0),
            (4, "b", 30.0),
        ],
        "id long, cat string, val double",
    )


def test_profile_counts_nulls_distincts_and_ranges(frame):
    got = {r["column_name"]: r for r in profile_table(frame).collect()}
    assert set(got) == {"id", "cat", "val"}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert got["id"]["n_non_null"] == 4 and got["id"]["n_distinct"] == 4
    assert got["cat"]["n_non_null"] == 3 and got["cat"]["n_distinct"] == 2
    assert got["val"]["n_non_null"] == 3 and got["val"]["n_distinct"] == 2
    assert got["id"]["min_value"] == "1" and got["id"]["max_value"] == "4"
    assert got["cat"]["min_value"] == "a" and got["cat"]["max_value"] == "b"


def test_profile_column_subset_and_validation(frame):
    sub = profile_table(frame, columns=["cat"]).collect()
    assert [r["column_name"] for r in sub] == ["cat"]
    with pytest.raises(ValueError, match="not in frame"):
        profile_table(frame, columns=["nope"])
    with pytest.raises(ValueError, match="at least one"):
        profile_table(frame, columns=[])


def test_profile_approx_mode_avoids_expand(frame):
    rows = {r["column_name"]: r for r in profile_table(frame, exact=False).collect()}
    # HLL is exact at these cardinalities; the contract is the switch,
    # the plan shape proves the Expand is gone
    assert rows["cat"]["n_distinct"] == 2
    exact_plan = profile_table(frame)._jdf.queryExecution().executedPlan().toString()
    approx_plan = (
        profile_table(frame, exact=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan


def test_fk_orphans_counts_and_null_keys(spark):
    from cdc_system_spark.operators.profile import fk_orphans

    fact = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (99,), (99,), (None,)], "k long"
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "dk long")
    r = fk_orphans(fact, dim, "k", "dk").head()
    # 99 (3 rows) and NULL (1 row) are orphans; keys 1, 2 match
    assert r["n_fact"] == 7
    assert r["n_orphans"] == 4
    assert r["n_distinct_orphan_keys"] == 2
    assert r["orphan_fraction"] == round(4 / 7, 6)
    # clean replica: zero everywhere
    clean = fk_orphans(fact.filter("k IN (1, 2)"), dim, "k", "dk").head()
    assert clean["n_orphans"] == 0 and clean["orphan_fraction"] == 0.0
