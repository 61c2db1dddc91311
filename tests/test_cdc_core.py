"""Core CDC path tests — port of the reference's 9 test intents
(test_cdc_system.py, SURVEY §5.1) to the Spark engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_system_spark.api import CDCMonitor, CDCReplicator, CDCSystem, SnapshotTable
from cdc_system_spark.operators.changelog import change_statistics, pending_changes

TEST_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("value", T.LongType(), True),
    ]
)


@pytest.fixture()
def system(spark, tmp_path):
    sys = CDCSystem(spark, str(tmp_path), "test_table")
    sys.setup_cdc(TEST_SCHEMA, key="id")
    return sys


def _rows(spark, rows):
    return spark.createDataFrame(rows, TEST_SCHEMA)


def test_cdc_setup(system, tmp_path):
    # ≅ test_cdc_setup (test_cdc_system.py:38-48): the audit log exists (empty)
    assert system.read_log().count() == 0
    assert system.capture.path.endswith("test_table_cdc")


def test_insert_capture(spark, system):
    # ≅ test_insert_capture (test_cdc_system.py:50-64)
    system.capture.capture_insert(_rows(spark, [(1, "test1", 100)]))
    changes = system.get_pending_changes().collect()
    assert len(changes) == 1
    assert changes[0]["operation"] == "INSERT"
    assert changes[0]["new"]["name"] == "test1"
    assert changes[0]["old_data"] is None


def test_update_capture(spark, system):
    # ≅ test_update_capture (test_cdc_system.py:66-84)
    system.capture.capture_insert(_rows(spark, [(1, "test1", 100)]))
    system.capture.capture_update(
        _rows(spark, [(1, "test1", 200)]), _rows(spark, [(1, "test1", 100)])
    )
    changes = system.get_pending_changes().collect()
    assert [c["operation"] for c in changes] == ["INSERT", "UPDATE"]
    upd = changes[1]
    assert upd["old"]["value"] == 100
    assert upd["new"]["value"] == 200


def test_delete_capture(spark, system):
    # ≅ test_delete_capture (test_cdc_system.py:86-103)
    system.capture.capture_insert(_rows(spark, [(1, "test1", 100)]))
    system.capture.capture_delete(_rows(spark, [(1, "test1", 100)]))
    changes = system.get_pending_changes().collect()
    assert changes[-1]["operation"] == "DELETE"
    assert changes[-1]["old"]["name"] == "test1"
    assert changes[-1]["new_data"] is None


def test_mark_as_synced(spark, system, tmp_path):
    # ≅ test_mark_as_synced (test_cdc_system.py:105-121)
    system.capture.capture_insert(_rows(spark, [(1, "a", 1), (2, "b", 2)]))
    target = SnapshotTable(spark, str(tmp_path / "target"), TEST_SCHEMA)
    rep = CDCReplicator(system, target)
    rep.replicate_changes()
    assert system.get_pending_changes().count() == 0


def test_replication(spark, system, tmp_path):
    # ≅ test_replication (test_cdc_system.py:123-170)
    system.capture.capture_insert(_rows(spark, [(1, "test1", 100)]))
    target = SnapshotTable(spark, str(tmp_path / "target"), TEST_SCHEMA)
    n = CDCReplicator(system, target).replicate_changes()
    assert n == 1
    out = target.read().collect()
    assert len(out) == 1 and out[0]["name"] == "test1"


def test_statistics(spark, system):
    # ≅ test_statistics (test_cdc_system.py:172-198): INSERT 2, UPDATE 1, DELETE 1
    system.capture.capture_insert(_rows(spark, [(1, "a", 1), (2, "b", 2)]))
    system.capture.capture_update(_rows(spark, [(1, "a", 9)]), _rows(spark, [(1, "a", 1)]))
    system.capture.capture_delete(_rows(spark, [(2, "b", 2)]))
    stats = system.get_change_statistics()
    assert stats["INSERT"]["total"] == 2
    assert stats["UPDATE"]["total"] == 1
    assert stats["DELETE"]["total"] == 1
    assert stats["INSERT"]["pending"] == 2


def test_health_report(spark, system):
    # ≅ TestCDCMonitor.test_health_report (test_cdc_system.py:201-240)
    system.capture.capture_insert(_rows(spark, [(1, "a", 1)]))
    report = CDCMonitor(system).get_health_report()
    assert report["health_status"] == "healthy"
    assert report["pending_changes"] > 0
    assert set(report["statistics"]) == {"INSERT"}


def test_full_cdc_workflow(spark, system, tmp_path):
    # ≅ test_full_cdc_workflow (test_cdc_system.py:244-318): inserts then an
    # update replicate correctly; demo invariant replica = inserts − deletes
    # (shipped source.db/target.db ground truth, SURVEY §5.2).
    system.capture.capture_insert(
        _rows(spark, [(i, f"user{i}", i * 10) for i in range(1, 11)])
    )
    system.capture.capture_update(
        _rows(spark, [(i, f"user{i}", 999) for i in range(1, 6)]),
        _rows(spark, [(i, f"user{i}", i * 10) for i in range(1, 6)]),
    )
    system.capture.capture_delete(_rows(spark, [(9, "user9", 90), (10, "user10", 100)]))

    target = SnapshotTable(spark, str(tmp_path / "replica"), TEST_SCHEMA)
    rep = CDCReplicator(system, target)
    total = 0
    while True:
        n = rep.replicate_changes(batch_size=6)
        if n == 0:
            break
        total += n
    assert total == 17
    result = {r["id"]: r for r in target.read().collect()}
    assert len(result) == 8  # 10 inserts − 2 deletes
    assert result[1]["value"] == 999  # update propagated
    assert 9 not in result and 10 not in result


def test_pending_changes_order_and_limit(spark, system):
    # reference hot query: WHERE synced=0 ORDER BY cdc_id LIMIT n
    system.capture.capture_insert(_rows(spark, [(i, f"u{i}", i) for i in range(1, 8)]))
    got = pending_changes(system.read_log(), limit=3).collect()
    assert len(got) == 3
    ids = [r["cdc_id"] for r in got]
    assert ids == sorted(ids)


def test_replicate_retries_transient_write_failure(spark, tmp_path):
    """CDC_MAX_RETRIES/CDC_RETRY_DELAY are real here (the reference
    declares them, config.py:35-36, but never reads them)."""
    from pyspark.sql import types as T

    from cdc_system_spark.api import CDCReplicator, CDCSystem, SnapshotTable
    from cdc_system_spark.config import CDCConfig

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )

    class FlakyTable(SnapshotTable):
        def __init__(self, *a, fail_times=2, **kw):
            super().__init__(*a, **kw)
            self.attempts = 0
            self.fail_times = fail_times

        def write(self, df):
            self.attempts += 1
            if self.attempts <= self.fail_times:
                raise IOError("transient sink outage")
            super().write(df)

    cfg = CDCConfig(max_retries=3, retry_delay_seconds=0)
    system = CDCSystem(spark, str(tmp_path / "cdc"), "t", cfg)
    cap = system.setup_cdc(schema, key="id")
    cap.capture_insert(spark.createDataFrame([(1, "a"), (2, "b")], schema))
    target = FlakyTable(spark, str(tmp_path / "replica"), schema)
    rep = CDCReplicator(system, target, key="id")
    assert rep.replicate_changes() == 2
    assert target.attempts == 3  # 2 failures + 1 success
    assert target.read().count() == 2
    assert system.get_pending_changes().count() == 0  # marked only after success

    # exhausted retries propagate the error and leave changes pending
    cap.capture_insert(spark.createDataFrame([(3, "c")], schema))
    target2 = FlakyTable(
        spark, str(tmp_path / "replica"), schema, fail_times=99
    )
    rep2 = CDCReplicator(system, target2, key="id")
    import pytest as _pytest

    with _pytest.raises(IOError):
        rep2.replicate_changes()
    assert target2.attempts == cfg.max_retries + 1
    assert system.get_pending_changes().count() == 1  # nothing lost


EVOLVED_SCHEMA = T.StructType(
    TEST_SCHEMA.fields + [T.StructField("email", T.StringType(), True)]
)


def test_schema_evolution_end_to_end(spark, system, tmp_path):
    """Additive evolution mid-stream: pre-evolution rows replicate, the
    schema gains a nullable column, post-evolution captures carry it,
    and one target serves both generations (old rows read as null)."""
    target = SnapshotTable(spark, str(tmp_path / "replica"), TEST_SCHEMA)
    repl = CDCReplicator(system, target, key="id")

    system.capture.capture_insert(_rows(spark, [(1, "old", 100), (2, "old2", 200)]))
    assert repl.replicate_changes() == 2

    # ALTER TABLE ADD COLUMN email
    system.evolve_schema(EVOLVED_SCHEMA)
    target.evolve(EVOLVED_SCHEMA)

    new_rows = spark.createDataFrame([(3, "new", 300, "a@b.c")], EVOLVED_SCHEMA)
    system.capture.capture_insert(new_rows)
    # an UPDATE backfills the new column on a pre-evolution row
    upd = spark.createDataFrame([(1, "old", 100, "x@y.z")], EVOLVED_SCHEMA)
    system.capture.capture_update(upd, target.read().filter("id = 1"))
    assert repl.replicate_changes() == 2

    got = {r["id"]: (r["name"], r["value"], r["email"]) for r in target.read().collect()}
    assert got == {
        1: ("old", 100, "x@y.z"),    # backfilled by the update
        2: ("old2", 200, None),      # pre-evolution row: padded null
        3: ("new", 300, "a@b.c"),    # post-evolution insert
    }
    # old log entries decode under the evolved schema (null email)
    decoded = {
        r["record_id"]: r["new"]["email"]
        for r in system.get_pending_changes(limit=1000).collect()
    }
    assert decoded == {}  # everything synced


def test_schema_evolution_rejects_unsafe_changes(spark, system):
    with pytest.raises(ValueError, match="drop"):
        system.evolve_schema(T.StructType(TEST_SCHEMA.fields[:2]))
    with pytest.raises(ValueError, match="change"):
        changed = T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("name", T.LongType(), True),   # type change
                T.StructField("value", T.LongType(), True),
            ]
        )
        system.evolve_schema(changed)
    with pytest.raises(ValueError, match="nullable"):
        system.evolve_schema(
            T.StructType(
                TEST_SCHEMA.fields + [T.StructField("req", T.StringType(), False)]
            )
        )


def test_time_travel_and_change_feed(spark, system, tmp_path):
    """SnapshotTable versions are committed in order; read_version time
    travels, and changes_between yields the audit change set that
    transforms one version into the next (Delta CDF analogue)."""
    target = SnapshotTable(spark, str(tmp_path / "replica"), TEST_SCHEMA)
    repl = CDCReplicator(system, target, key="id")

    system.capture.capture_insert(_rows(spark, [(1, "a", 10), (2, "b", 20)]))
    repl.replicate_changes()
    system.capture.capture_update(
        _rows(spark, [(1, "a2", 11)]), target.read().filter("id = 1")
    )
    system.capture.capture_delete(_rows(spark, [(2, "b", 20)]))
    system.capture.capture_insert(_rows(spark, [(3, "c", 30)]))
    repl.replicate_changes()

    v1, v2 = target.list_versions()
    assert {r["id"] for r in target.read_version(v1).collect()} == {1, 2}
    assert {r["id"] for r in target.read_version(v2).collect()} == {1, 3}

    feed = {
        r["record_id"]: r["operation"]
        for r in target.changes_between(v1, v2, key="id").collect()
    }
    assert feed == {1: "UPDATE", 2: "DELETE", 3: "INSERT"}

    with pytest.raises(ValueError, match="unknown version"):
        target.read_version("v_nope")
    with pytest.raises(ValueError, match="newer"):
        target.changes_between(v2, v1, key="id")


def test_scd2_replicator_maintains_history(spark, system, tmp_path):
    """The history-sink replicator: two replicate rounds over captured
    changes produce the same SCD2 history as one batch recompute from
    the full log; re-replication with nothing pending is a no-op."""
    from cdc_system_spark.api import SCD2_SCHEMA, SCD2Replicator
    from cdc_system_spark.operators.scd import scd2_from_log

    hist = SnapshotTable(spark, str(tmp_path / "hist"), SCD2_SCHEMA)
    repl = SCD2Replicator(system, hist)

    system.capture.capture_insert(_rows(spark, [(1, "a", 10), (2, "b", 20)]))
    assert repl.replicate_changes() == 2
    system.capture.capture_update(
        _rows(spark, [(1, "a2", 11)]), _rows(spark, [(1, "a", 10)])
    )
    system.capture.capture_delete(_rows(spark, [(2, "b", 20)]))
    assert repl.replicate_changes() == 2
    assert repl.replicate_changes() == 0  # nothing pending

    expected = scd2_from_log(system.read_log())
    key = lambda df: {
        (r["record_id"], r["version"]): (r["valid_to"] is None, r["is_current"])
        for r in df.collect()
    }
    got = key(hist.read())
    assert got == key(expected)
    # key 1: v1 closed, v2 current; key 2: v1 closed by the delete
    assert got[(1, 1)] == (False, False)
    assert got[(1, 2)] == (True, True)
    assert got[(2, 1)] == (False, False)


def test_replication_lag_metrics(spark, system, tmp_path):
    # freshness in EVENT time, not row counts: empty log -> zeros;
    # pending-only -> age grows with capture spread, sync lag unknown;
    # after replication -> nothing pending, sync lag ~0
    import time

    from cdc_system_spark.api import SnapshotTable

    mon = CDCMonitor(system)
    lag0 = mon.get_replication_lag()
    assert lag0 == {
        "pending_changes": 0,
        "oldest_pending_age_s": 0.0,
        "last_sync_lag_s": None,
    }
    system.capture.capture_insert(_rows(spark, [(1, "a", 1)]))
    time.sleep(1.1)
    system.capture.capture_insert(_rows(spark, [(2, "b", 2)]))
    lag1 = mon.get_replication_lag()
    assert lag1["pending_changes"] == 2
    assert lag1["oldest_pending_age_s"] >= 1.0  # capture spread in event time
    assert lag1["last_sync_lag_s"] is None      # nothing ever synced
    target = SnapshotTable(
        spark, str(tmp_path / "lag_replica"), _rows(spark, [(1, "a", 1)]).schema
    )
    CDCReplicator(system, target, key="id").replicate_changes()
    lag2 = mon.get_replication_lag()
    assert lag2["pending_changes"] == 0
    assert lag2["oldest_pending_age_s"] == 0.0
    assert lag2["last_sync_lag_s"] is not None


def test_production_poll_is_pruned_by_maintained_zone_state(spark, system, tmp_path):
    # r10: the replicator's micro-batch poll runs through the maintained
    # (synced, cdc_id) zone state (capture merges it per batch, the
    # replicate rewrite refreshes it) — after a full drain the poll
    # skips every all-synced zone, a fresh capture re-arms only the
    # tail, and rows stay identical to the plain unpruned poll
    cap = system.capture
    cap.capture_insert(_rows(spark, [(i, f"u{i}", i) for i in range(1, 9)]))
    # the state exists from the FIRST capture and covers the log
    zs = cap.read_zone_state()
    assert zs is not None
    state, geo_lo, geo_hi, nz = zs
    assert nz == cap.NUM_ZONES and geo_lo <= geo_hi
    assert state.agg(F.sum("n_rows")).collect()[0][0] == 8

    target = SnapshotTable(spark, str(tmp_path / "replica"), TEST_SCHEMA)
    rep = CDCReplicator(system, target)
    assert rep.replicate_changes(batch_size=100) == 8
    # fully drained: every zone is all-synced (v_min = 1), so the
    # pruned poll returns empty WITHOUT scanning any log values
    state, *_ = cap.read_zone_state()
    assert state.filter(F.col("v_min") < 1).count() == 0
    assert system.get_pending_changes().count() == 0

    # a fresh capture re-arms only the tail zone(s)
    cap.capture_insert(_rows(spark, [(21, "u21", 21), (22, "u22", 22)]))
    state, *_ = cap.read_zone_state()
    armed = state.filter(F.col("v_min") < 1)
    assert 1 <= armed.count() <= 2
    pruned = system.get_pending_changes()
    plain = pending_changes(
        system.read_log(), row_schema=system.registry.schema("test_table")
    )
    key = lambda d: [(r["cdc_id"], r["record_id"]) for r in d.collect()]
    assert key(pruned) == key(plain)
    assert [r[1] for r in key(pruned)] == [21, 22]
    # the surviving tail-zone cdc_id range reaches the parquet scan as
    # a pushed filter — the covering-index skip, now on the PRODUCTION
    # poll path (r9 left it only on the registered query)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "cdc_id" in plan.split("PushedFilters")[1][:200]
    # drain again: end-to-end rows flowed through the pruned poll
    assert rep.replicate_changes(batch_size=100) == 2
    assert {r["id"] for r in target.read().collect()} == set(
        list(range(1, 9)) + [21, 22]
    )


def test_pruned_poll_invariant_under_random_op_sequences(spark, system, tmp_path):
    # property: after ANY interleaving of captures (insert/update/
    # delete) and partial replications, the pruned production poll
    # returns exactly the plain poll's rows — the zone state is
    # maintained by capture (superset-before-append) and refreshed by
    # replicate, so no sequence may leave it under-covering. Fixed
    # seed, bounded ops (suite budget); drives the REAL api path.
    import random

    rng = random.Random(20260816)
    target = SnapshotTable(spark, str(tmp_path / "replica"), TEST_SCHEMA)
    rep = CDCReplicator(system, target)
    live = {}
    next_id = 1
    for step in range(7):
        op = rng.choice(["insert", "insert", "update", "delete", "replicate"])
        if op == "insert":
            rows = [(next_id + i, f"u{next_id + i}", (next_id + i) * 3)
                    for i in range(rng.randint(1, 4))]
            next_id += len(rows)
            system.capture.capture_insert(_rows(spark, rows))
            live.update({r[0]: r for r in rows})
        elif op == "update" and live:
            k = rng.choice(sorted(live))
            old = live[k]
            new = (k, old[1], old[2] + 1000)
            system.capture.capture_update(_rows(spark, [new]), _rows(spark, [old]))
            live[k] = new
        elif op == "delete" and live:
            k = rng.choice(sorted(live))
            system.capture.capture_delete(_rows(spark, [live.pop(k)]))
        elif op == "replicate":
            rep.replicate_changes(batch_size=rng.randint(1, 5))
        pruned = system.get_pending_changes()
        plain = pending_changes(
            system.read_log(),
            row_schema=system.registry.schema("test_table"),
        )
        key = lambda d: [(r["cdc_id"], r["operation"], r["record_id"])
                         for r in d.collect()]
        assert key(pruned) == key(plain), f"step {step} ({op})"
    # drain fully: the replica must equal the surviving net state
    while rep.replicate_changes(batch_size=100):
        pass
    assert {r["id"]: r["value"] for r in target.read().collect()} == {
        k: v[2] for k, v in live.items()
    }
    assert system.get_pending_changes().count() == 0


def test_second_instance_sees_fresh_zone_state(spark, tmp_path):
    # r10 advisor: a reader instance whose zone cache was bootstrapped
    # BEFORE another instance appended must not prune with the stale
    # state (zones missing for the new rows) — the cache is keyed by
    # the zones file's mtime, so the writer's os.replace invalidates it
    writer = CDCSystem(spark, str(tmp_path), "test_table")
    writer.setup_cdc(TEST_SCHEMA, key="id")
    reader = CDCSystem(spark, str(tmp_path), "test_table")
    reader.setup_cdc(TEST_SCHEMA, key="id")

    writer.capture.capture_insert(_rows(spark, [(1, "a", 10)]))
    # bootstrap the reader's cache from the current state
    assert reader.get_pending_changes().count() == 1
    # another instance appends; the reader's cached state is now stale
    writer.capture.capture_insert(_rows(spark, [(2, "b", 20), (3, "c", 30)]))
    pruned = reader.get_pending_changes()
    plain = pending_changes(
        reader.read_log(), row_schema=reader.registry.schema("test_table")
    )
    key = lambda d: [(r["cdc_id"], r["record_id"]) for r in d.collect()]
    assert key(pruned) == key(plain)
    assert [r[1] for r in key(pruned)] == [1, 2, 3]
