"""SCD Type 2 semantics: version chains, delete tombstones, and the
point-in-time lookup the history table exists for."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cdc_system_spark.operators.scd import asof_lookup, scd2_from_log


def _ts(h):
    return dt.datetime(2024, 1, 1, h, 0, 0)


def _log(spark):
    rows = [
        # key 1: insert -> update -> update (live, 3 versions)
        (1, "INSERT", 1, '{"v": "a"}', _ts(1)),
        (3, "UPDATE", 1, '{"v": "b"}', _ts(3)),
        (5, "UPDATE", 1, '{"v": "c"}', _ts(5)),
        # key 2: insert -> delete (tombstoned, 1 closed version)
        (2, "INSERT", 2, '{"v": "x"}', _ts(2)),
        (4, "DELETE", 2, None, _ts(4)),
        # key 3: single insert (live, open-ended)
        (6, "INSERT", 3, '{"v": "z"}', _ts(6)),
    ]
    return spark.createDataFrame(
        rows,
        "cdc_id long, operation string, record_id long, "
        "new_data string, changed_at timestamp",
    )


def test_scd2_versions_and_tombstones(spark):
    hist = {
        (r["record_id"], r["version"]): r
        for r in scd2_from_log(_log(spark)).collect()
    }
    assert len(hist) == 5  # 3 + 1 + 1 (DELETE emits no version)
    # key 1 chain: each version closed by the next, last one current
    assert hist[(1, 1)]["valid_to"] == _ts(3) and not hist[(1, 1)]["is_current"]
    assert hist[(1, 2)]["valid_to"] == _ts(5) and not hist[(1, 2)]["is_current"]
    assert hist[(1, 3)]["valid_to"] is None and hist[(1, 3)]["is_current"]
    # key 2: the DELETE closed the version — nothing is current
    assert hist[(2, 1)]["valid_to"] == _ts(4) and not hist[(2, 1)]["is_current"]
    # key 3: open-ended from the start
    assert hist[(3, 1)]["valid_to"] is None and hist[(3, 1)]["is_current"]


def test_asof_lookup_returns_version_valid_at_ts(spark):
    hist = scd2_from_log(_log(spark))
    probes = spark.createDataFrame(
        [
            (1, _ts(2)),   # between v1 and v2 -> v1
            (1, _ts(3)),   # exactly at v2's start -> v2 (valid_from <= ts)
            (1, _ts(23)),  # after last change -> open-ended v3
            (2, _ts(3)),   # before the delete -> v1
            (2, _ts(10)),  # after the delete -> no match
            (9, _ts(1)),   # unknown key -> no match
        ],
        "record_id long, ts timestamp",
    )
    got = {
        (r["record_id"], str(r["ts"])): r["version"]
        for r in asof_lookup(hist, probes).collect()
    }
    assert got[(1, str(_ts(2)))] == 1
    assert got[(1, str(_ts(3)))] == 2
    assert got[(1, str(_ts(23)))] == 3
    assert got[(2, str(_ts(3)))] == 1
    assert got[(2, str(_ts(10)))] is None
    assert got[(9, str(_ts(1)))] is None


# -- property: SCD2 invariants on random change logs -------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.hyp_budget import examples


@st.composite
def change_log_case(draw):
    n = draw(st.integers(1, 40))
    ops = draw(
        st.lists(
            st.sampled_from(["INSERT", "UPDATE", "DELETE"]), min_size=n, max_size=n
        )
    )
    keys = draw(
        st.lists(st.integers(min_value=1, max_value=5), min_size=n, max_size=n)
    )
    return [
        (i + 1, ops[i], keys[i], None if ops[i] == "DELETE" else f'{{"v": {i}}}',
         _ts(0) + dt.timedelta(minutes=i))
        for i in range(n)
    ]


@given(change_log_case())
@settings(
    max_examples=examples(12, 20),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_invariants_hold_on_random_logs(spark, rows):
    log = spark.createDataFrame(
        rows,
        "cdc_id long, operation string, record_id long, "
        "new_data string, changed_at timestamp",
    )
    hist = scd2_from_log(log).collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["record_id"], []).append(r)
    ops_by_key = {}
    for cdc_id, op, k, _, ts in rows:
        ops_by_key.setdefault(k, []).append((cdc_id, op, ts))
    for k, versions in by_key.items():
        versions.sort(key=lambda r: r["version"])
        k_ops = sorted(ops_by_key[k])
        # one version per INSERT/UPDATE, numbered densely from 1
        n_iu = sum(1 for _, op, _ in k_ops if op != "DELETE")
        assert [r["version"] for r in versions] == list(range(1, n_iu + 1))
        # intervals chain: each closes exactly at the next CHANGE (any op)
        # and never overlap; at most the last is current
        currents = [r for r in versions if r["is_current"]]
        assert len(currents) <= 1
        if currents:
            assert currents[0]["version"] == n_iu
            assert k_ops[-1][1] != "DELETE"
        for r in versions:
            if r["valid_to"] is not None:
                assert r["valid_from"] < r["valid_to"]
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to"] is not None and a["valid_to"] <= b["valid_from"]


@st.composite
def split_log_case(draw):
    rows = draw(change_log_case())
    cut = draw(st.integers(0, len(rows)))
    return rows[:cut], rows[cut:]


@given(split_log_case())
@settings(
    max_examples=examples(10, 15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_apply_equals_full_recompute(spark, case):
    """Replay equivalence: merging the tail batch into the head's
    history must equal recomputing from the full log."""
    from cdc_system_spark.operators.scd import scd2_apply

    head, tail = case
    schema = (
        "cdc_id long, operation string, record_id long, "
        "new_data string, changed_at timestamp"
    )
    full = scd2_from_log(spark.createDataFrame(head + tail, schema))
    hist = scd2_from_log(spark.createDataFrame(head, schema)) if head else (
        spark.createDataFrame(
            [],
            "record_id long, version int, payload string, "
            "valid_from timestamp, valid_to timestamp, is_current boolean",
        )
    )
    merged = (
        scd2_apply(hist, spark.createDataFrame(tail, schema))
        if tail
        else hist
    )
    key = lambda r: (r["record_id"], r["version"])
    a = {key(r): (r["payload"], r["valid_from"], r["valid_to"], r["is_current"])
         for r in full.collect()}
    b = {key(r): (r["payload"], r["valid_from"], r["valid_to"], r["is_current"])
         for r in merged.collect()}
    assert a == b


def test_scd2_apply_rejects_out_of_order_batch(spark):
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    from cdc_system_spark.operators.scd import scd2_apply

    schema = (
        "cdc_id long, operation string, record_id long, "
        "new_data string, changed_at timestamp"
    )
    head = spark.createDataFrame([(5, "INSERT", 1, '{"v":5}', _ts(5))], schema)
    stale = spark.createDataFrame([(6, "UPDATE", 1, '{"v":6}', _ts(3))], schema)
    hist = scd2_from_log(head)
    import pytest as _pytest

    with _pytest.raises(Exception, match="older than an.*open version|USER_RAISED"):
        scd2_apply(hist, stale).collect()
