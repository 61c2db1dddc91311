"""Capture strategies — all three the reference *claims* (config.py:47).

The reference implements only trigger-based capture (SQL triggers append
to the audit table, cdc_system.py:143-197). Spark has no triggers; the
equivalents, each emitting the same AUDIT_SCHEMA DataFrame so the
replicator is strategy-agnostic (SURVEY §2.1 DDL3, §7.1 M4):

* **LogCapture** (≅ trigger-based): writers call ``capture_*`` at write
  time; changes append to a parquet change log inside the same job that
  writes the data — the "recorded with the write" guarantee triggers
  give, minus a second mechanism.
* **timestamp_capture**: incremental filter ``changed_col > last_sync``
  — the claimed timestamp strategy.
* **snapshot_diff** (operators/snapshot_diff.py): the claimed
  version/snapshot strategy.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_system_spark.model import AUDIT_SCHEMA, ChangeOp


def as_changes(
    rows: DataFrame,
    operation: str,
    key: str,
    old_rows: DataFrame | None = None,
    base_cdc_id: int = 0,
) -> DataFrame:
    """Wrap full row images as audit-schema change rows.

    ``cdc_id`` = base + key (keys are unique within one capture call);
    for strict arrival ordering across calls, callers pass a
    monotonically increasing ``base_cdc_id`` (epoch-scaled, see
    LogCapture).
    """
    op = ChangeOp(operation).value
    img = F.to_json(F.struct(*[F.col(c) for c in rows.columns]))
    old_img = F.lit(None).cast("string")
    if old_rows is not None:
        old = old_rows.select(
            F.col(key).alias("_ok"),
            F.to_json(F.struct(*[F.col(c) for c in old_rows.columns])).alias("_old_img"),
        )
        rows = rows.join(old, rows[key] == old["_ok"], "left").drop("_ok")
        old_img = F.col("_old_img")
    if op == ChangeOp.DELETE.value:
        old_img, img = img, F.lit(None).cast("string")
    return rows.select(
        (F.lit(base_cdc_id) + F.col(key).cast("long")).alias("cdc_id"),
        F.lit(op).alias("operation"),
        F.col(key).cast("long").alias("record_id"),
        old_img.alias("old_data"),
        img.alias("new_data"),
        F.current_timestamp().alias("changed_at"),
        F.lit(False).alias("synced"),
        F.lit(None).cast("timestamp").alias("sync_timestamp"),
    )


class LogCapture:
    """Append-only parquet change log for one tracked table.

    ≅ ``setup_trigger_based_cdc`` + the three triggers
    (cdc_system.py:105-197): the log lives at ``{root}/{table}_cdc`` —
    same naming as the reference's ``{table}_cdc`` (cdc_system.py:103).
    At 100 TB the log would be partitioned by date(changed_at); appends
    are per-batch files, read via streaming file source (streaming/).
    """

    def __init__(self, spark: SparkSession, root: str, table: str, key: str = "id"):
        self.spark = spark
        self.table = table
        self.key = key
        self.path = os.path.join(root, f"{table}_cdc")
        self._epoch = 0

    def _next_base(self) -> int:
        # strictly increasing per capture call; key-space below 1e9
        # (epoch_seconds * 1e9 stays well inside int64)
        self._epoch = max(self._epoch + 1, int(time.time()))
        return self._epoch * 1_000_000_000

    def capture_insert(self, rows: DataFrame) -> None:
        self._append(as_changes(rows, "INSERT", self.key, base_cdc_id=self._next_base()))

    def capture_update(self, new_rows: DataFrame, old_rows: DataFrame) -> None:
        self._append(
            as_changes(new_rows, "UPDATE", self.key, old_rows, base_cdc_id=self._next_base())
        )

    def capture_delete(self, rows: DataFrame) -> None:
        self._append(as_changes(rows, "DELETE", self.key, base_cdc_id=self._next_base()))

    def _append(self, changes: DataFrame) -> None:
        changes.write.mode("append").parquet(self.path)

    def read_log(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], AUDIT_SCHEMA)


def timestamp_capture(
    table_df: DataFrame,
    last_sync_ts,
    key: str = "id",
    ts_col: str = "updated_at",
) -> DataFrame:
    """Timestamp-based incremental capture (claimed at config.py:47).

    Rows with ``ts_col > last_sync_ts`` become UPSERT-style changes
    (op=INSERT; timestamp capture cannot distinguish insert from update,
    nor see deletes — the documented limitation of the strategy). The
    filter pushes down to the parquet scan; with date partitioning it
    prunes partitions.
    """
    fresh = table_df.filter(F.col(ts_col) > F.lit(last_sync_ts))
    return as_changes(fresh, "INSERT", key)
