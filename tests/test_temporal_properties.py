"""Property-based checks for the temporal joins.

Oracles are independent implementations: ``pandas.merge_asof`` for the
as-of join (battle-tested reference semantics) and a brute-force pair
filter for the bucketed range join. Hypothesis drives the input shapes:
duplicate timestamps, empty sides, keys present on only one side,
window-boundary collisions.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_system_spark.operators.temporal import asof_join, bucketed_range_join

BASE = dt.datetime(2024, 1, 1)


def _ts_list(draw, n, max_seconds):
    return draw(
        st.lists(
            st.integers(min_value=0, max_value=max_seconds), min_size=n, max_size=n
        )
    )


@st.composite
def asof_case(draw):
    n_left = draw(st.integers(1, 25))
    n_right = draw(st.integers(0, 25))
    keys = [1, 2, 3]
    left = [
        (draw(st.sampled_from(keys)), BASE + dt.timedelta(seconds=s))
        for s in _ts_list(draw, n_left, 500)
    ]
    right = [
        (draw(st.sampled_from(keys)), BASE + dt.timedelta(seconds=s), float(i))
        for i, s in enumerate(_ts_list(draw, n_right, 500))
    ]
    return left, right


@given(asof_case())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_asof_backward_matches_pandas_merge_asof(spark, case):
    left, right = case
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, lt timestamp"
    )
    rdf = spark.createDataFrame(right, "k2 long, rt timestamp, payload double")
    got = {
        r["lid"]: r["payload"]
        for r in asof_join(
            ldf, rdf, left_time="lt", right_time="rt",
            by_left="k", by_right="k2", payload_cols=["payload"],
        ).collect()
    }

    lpd = pd.DataFrame(
        {"lid": range(len(left)), "k": [k for k, _ in left], "lt": [t for _, t in left]}
    ).sort_values("lt", kind="stable")
    rpd = (
        pd.DataFrame(right, columns=["k", "rt", "payload"])
        # our operator dedups (key, time) ties by greatest payload;
        # merge_asof takes the LAST row per (key, time) in sort order
        .sort_values(["rt", "payload"], kind="stable")
    )
    if rpd.empty:
        expect = {lid: None for lid in lpd["lid"]}
    else:
        m = pd.merge_asof(
            lpd, rpd, left_on="lt", right_on="rt", left_by="k", right_by="k",
            direction="backward", allow_exact_matches=True,
        )
        expect = {
            int(r["lid"]): (None if pd.isna(r["payload"]) else float(r["payload"]))
            for _, r in m.iterrows()
        }
    assert got == expect


@st.composite
def range_case(draw):
    n_left = draw(st.integers(1, 15))
    n_right = draw(st.integers(0, 40))
    window = draw(st.sampled_from([7, 60, 3600]))
    left = [
        (i, draw(st.integers(1, 2)), BASE + dt.timedelta(seconds=s))
        for i, s in enumerate(_ts_list(draw, n_left, 4000))
    ]
    right = [
        (draw(st.integers(1, 2)), BASE + dt.timedelta(seconds=s), float(i))
        for i, s in enumerate(_ts_list(draw, n_right, 4000))
    ]
    return left, right, window


@given(range_case())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_range_join_matches_bruteforce(spark, case):
    left, right, window = case
    ldf = spark.createDataFrame(left, "lid long, k long, lt timestamp")
    rdf = spark.createDataFrame(right, "k2 long, rt timestamp, payload double")
    got = sorted(
        (r["lid"], r["payload"])
        for r in bucketed_range_join(
            ldf, rdf, by_left="k", by_right="k2",
            left_time="lt", right_time="rt", window_seconds=window,
        ).collect()
    )
    lo = dt.timedelta(seconds=window)
    expect = sorted(
        (lid, payload)
        for lid, lk, lt in left
        for rk, rt, payload in right
        if lk == rk and (lt - lo) <= rt < lt
    )
    assert got == expect
