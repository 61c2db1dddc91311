"""Runnable demo parity with the reference's ``example_usage.py``.

Three demos with the same workload and the same golden semantics as the
reference (whose shipped ``source.db``/``target.db`` pin them — SURVEY
§5.2):

* :func:`run_basic_demo` ≅ ``run_basic_demo`` (example_usage.py:114-165)
  — 10 inserts + 5 updates + 2 deletes, one replicate with batch_size=50
  → replica has **8 rows** (10 − 2), updated statuses propagate, every
  change is marked synced.
* :func:`run_continuous_sync_demo` ≅ ``run_continuous_sync_demo``
  (example_usage.py:168-233) — the same ops arriving over time, drained
  by the checkpointed streaming replicator per round (the reference's
  5 s poll loop, compressed to deterministic ``availableNow`` drains);
  a final extra drain applies nothing (restart idempotence).
* :func:`run_conflict_demo` ≅ the conflict stub (example_usage.py:236-252)
  — but real: resolves a competing-change batch under all four named
  strategies.

Run: ``python examples/demo.py`` (uses a temp dir, prints each report).
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_system_spark.api import CDCMonitor, CDCReplicator, CDCSystem, SnapshotTable
from cdc_system_spark.operators.conflicts import field_merge, resolve, split_manual
from cdc_system_spark.streaming.replicator import StreamingReplicator

#: ≅ the demo ``users`` table (example_usage.py:19-27)
USERS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("username", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)

_T0 = dt.datetime(2026, 1, 7, 16, 15, 29)  # timestamp seen in source.db


def _users(spark: SparkSession, ids: list[int], status: str = "active"):
    """≅ insert_sample_data's generated users (example_usage.py:44-55)."""
    rows = [
        (i, f"user_{i}", f"user_{i}@example.com", status, _T0 + dt.timedelta(seconds=i))
        for i in ids
    ]
    return spark.createDataFrame(rows, USERS_SCHEMA)


def _capture_demo_workload(spark: SparkSession, system: CDCSystem) -> None:
    """The golden workload: 10 inserts, 5 updates, 2 deletes
    (example_usage.py:141-143)."""
    cap = system.capture
    assert cap is not None
    inserts = _users(spark, list(range(1, 11)))
    cap.capture_insert(inserts)
    olds = _users(spark, [1, 2, 3, 4, 5])
    news = _users(spark, [1, 2, 3, 4, 5], status="updated")
    cap.capture_update(news, olds)
    cap.capture_delete(_users(spark, [9, 10]))


def run_basic_demo(spark: SparkSession, root: str) -> dict:
    """One-shot batch replication (≅ example_usage.py:114-165)."""
    system = CDCSystem(spark, root, "users")
    system.setup_cdc(USERS_SCHEMA, key="id")
    _capture_demo_workload(spark, system)

    target = SnapshotTable(spark, os.path.join(root, "users_replica"), USERS_SCHEMA)
    replicator = CDCReplicator(system, target, key="id")
    applied = replicator.replicate_changes(batch_size=50)  # demo batch size :151

    replica = target.read()
    report = CDCMonitor(system).get_health_report()
    result = {
        "changes_applied": applied,
        "replica_rows": replica.count(),
        "updated_statuses": replica.filter(F.col("status") == "updated").count(),
        "pending_after": report["pending_changes"],
        "health": report["health_status"],
    }
    # golden semantics pinned by the reference's shipped DBs (SURVEY §5.2)
    assert result["changes_applied"] == 17
    assert result["replica_rows"] == 8  # 10 inserts − 2 deletes
    assert result["updated_statuses"] == 5  # updates hit ids 1-5, deletes ids 9-10
    assert result["pending_after"] == 0  # full drain marks every change synced
    return result


def run_continuous_sync_demo(spark: SparkSession, root: str) -> dict:
    """Micro-batch streaming sync (≅ example_usage.py:168-233)."""
    system = CDCSystem(spark, root, "users")
    cap = system.setup_cdc(USERS_SCHEMA, key="id")
    target = SnapshotTable(spark, os.path.join(root, "users_replica"), USERS_SCHEMA)
    rep = StreamingReplicator(
        spark,
        cap.path,
        target,
        USERS_SCHEMA,
        key="id",
        checkpoint_path=os.path.join(root, "_checkpoint"),
        dead_letter_path=os.path.join(root, "_dead_letter"),
    )

    # ops arrive over time; each round is one poll-loop tick
    cap.capture_insert(_users(spark, list(range(1, 11))))
    rep.run_available_now()
    cap.capture_update(
        _users(spark, [1, 2, 3, 4, 5], status="updated"), _users(spark, [1, 2, 3, 4, 5])
    )
    rep.run_available_now()
    cap.capture_delete(_users(spark, [9, 10]))
    rep.run_available_now()

    rows_after_drain = target.read().count()
    # restart idempotence: a fresh drain with nothing new applies nothing
    rep.run_available_now()
    result = {
        "replica_rows": rows_after_drain,
        "replica_rows_after_redrain": target.read().count(),
        "updated_statuses": target.read().filter(F.col("status") == "updated").count(),
        **rep.progress(),
    }
    assert result["replica_rows"] == 8
    assert result["replica_rows_after_redrain"] == 8
    assert result["updated_statuses"] == 5
    return result


def run_conflict_demo(spark: SparkSession) -> dict:
    """All four named strategies, real (≅ example_usage.py:236-252 stub)."""
    image = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("status", T.StringType())]
    )
    changes = spark.createDataFrame(
        [
            (1, 100, ("A", (100, "active"))),
            (2, 100, ("B", (100, "updated"))),  # competes with cdc_id 1
            (3, 200, ("C", (200, "active"))),  # uncontested
        ],
        T.StructType(
            [
                T.StructField("cdc_id", T.LongType()),
                T.StructField("record_id", T.LongType()),
                T.StructField(
                    "payload",
                    T.StructType(
                        [T.StructField("src", T.StringType()), T.StructField("new", image)]
                    ),
                ),
            ]
        ),
    ).select("cdc_id", "record_id", "payload.src", "payload.new")

    lww = resolve(changes, strategy="lww")
    fww = resolve(changes, strategy="fww")
    auto, review = split_manual(changes)
    merged = field_merge(changes)
    result = {
        "lww_winner_key_100": lww.filter(F.col("record_id") == 100).first()["src"],
        "fww_winner_key_100": fww.filter(F.col("record_id") == 100).first()["src"],
        "auto_applicable": auto.count(),
        "needs_review": review.count(),
        "merged_rows": merged.count(),
    }
    assert result["lww_winner_key_100"] == "B"
    assert result["fww_winner_key_100"] == "A"
    assert (result["auto_applicable"], result["needs_review"]) == (1, 2)
    return result


def main() -> None:
    from cdc_system_spark.session import get_spark

    spark = get_spark(app_name="cdc-demo", master="local[8]", shuffle_partitions=8)
    with tempfile.TemporaryDirectory() as tmp:
        print("basic:", run_basic_demo(spark, os.path.join(tmp, "basic")))
        print("continuous:", run_continuous_sync_demo(spark, os.path.join(tmp, "cont")))
        print("conflicts:", run_conflict_demo(spark))
    spark.stop()


if __name__ == "__main__":
    main()
