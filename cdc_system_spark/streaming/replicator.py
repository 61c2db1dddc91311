"""Streaming replication: change stream → foreachBatch → merged target.

≅ ``run_continuous_sync_demo`` (example_usage.py:168-233) re-expressed
as Structured Streaming (SURVEY §2.8 S4-S8):

* micro-batch trigger: ``processingTime`` (the reference's 5 s poll
  loop) or ``availableNow`` (the reference's final catch-up drain,
  example_usage.py:221-223)
* exactly-once: checkpoint offsets + idempotent net-effect merge —
  replaces the reference's mark-synced-before-target-commit seam, which
  could re-deliver or lose on crash (cdc_system.py:313-315, SURVEY §7.3#3)
* per-row error-skip (cdc_system.py:308-310) → dead-letter quarantine:
  rows whose JSON images fail schema decode are appended to a parquet
  sink instead of silently dropped (S7)
"""

from __future__ import annotations

import time
from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_system_spark.api import SnapshotTable
from cdc_system_spark.config import CDCConfig
from cdc_system_spark.operators.merge import apply_changes
from cdc_system_spark.streaming.source import read_change_stream


def decode_with_dead_letter(
    batch: DataFrame,
    row_schema: T.StructType,
    dead_letter_path: str | None = None,
    key: str = "id",
) -> DataFrame:
    """Decode JSON row images; quarantine undecodable non-DELETE rows.

    A non-DELETE change whose ``new_data`` fails ``from_json`` is the
    set-oriented analogue of the reference's per-row apply exception
    (cdc_system.py:308-310). PERMISSIVE-mode ``from_json`` yields an
    all-null struct (not NULL) for malformed input, so the practical
    validity test is a null decoded key — which is also exactly the
    rows the merge could not apply.
    """
    decoded = batch.withColumns(
        {
            "old": F.from_json("old_data", row_schema),
            "new": F.from_json("new_data", row_schema),
        }
    )
    bad = decoded.filter(
        (F.col("operation") != "DELETE")
        & (F.col("new").isNull() | F.col(f"new.{key}").isNull())
    )
    if dead_letter_path is not None:
        bad_rows = bad.drop("old", "new")
        bad_rows.write.mode("append").parquet(dead_letter_path)
    return decoded.join(bad.select("cdc_id"), on="cdc_id", how="left_anti")


class StreamingReplicator:
    """Continuous (or catch-up) replication of a parquet change log."""

    def __init__(
        self,
        spark: SparkSession,
        log_path: str,
        target: SnapshotTable,
        row_schema: T.StructType,
        key: str = "id",
        checkpoint_path: str | None = None,
        dead_letter_path: str | None = None,
        max_files_per_trigger: int | None = None,
        config: CDCConfig | None = None,
        on_report: Callable[[dict], None] | None = None,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.spark = spark
        self.log_path = log_path
        self.target = target
        self.row_schema = row_schema
        self.key = key
        self.checkpoint_path = checkpoint_path or log_path + "_checkpoint"
        self.dead_letter_path = dead_letter_path
        self.max_files_per_trigger = max_files_per_trigger
        self.config = config or CDCConfig()
        self.on_report = on_report
        self._clock = clock
        self._last_report: float | None = None
        self.batches_applied = 0

    def _apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        decoded = decode_with_dead_letter(
            batch, self.row_schema, self.dead_letter_path, key=self.key
        )
        if not decoded.isEmpty():
            current = self.target.read()
            merged = apply_changes(current, decoded, key=self.key, change_key="record_id")
            self.target.write(merged)
        self.batches_applied += 1
        self._maybe_report(batch_id)

    def _maybe_report(self, batch_id: int) -> None:
        """Emit a progress report at most once per
        ``config.metrics_interval_seconds`` (reference: config.py:39-40 —
        the declared metrics cadence, here driving the streaming
        monitor's report emission). The first applied batch always
        reports; later batches report only after the interval elapses,
        so a hot stream doesn't flood the sink and a quiet one still
        reports on its next batch. The report itself is metadata-cheap
        (no log rescan in the batch hot path — full health audits stay
        with CDCMonitor, run on demand)."""
        if self.on_report is None:
            return
        now = self._clock()
        interval = self.config.metrics_interval_seconds
        if self._last_report is not None and now - self._last_report < interval:
            return
        self._last_report = now
        self.on_report(
            {
                "timestamp": datetime.now(timezone.utc).isoformat(),
                "last_batch_id": batch_id,
                **self.progress(),
            }
        )

    def _writer(self):
        stream = read_change_stream(
            self.spark, self.log_path, self.max_files_per_trigger
        )
        return stream.writeStream.foreachBatch(self._apply_batch).option(
            "checkpointLocation", self.checkpoint_path
        )

    def run_available_now(self) -> None:
        """Catch-up drain (≅ final drain, example_usage.py:221-223);
        returns after all pending log files are applied."""
        q = self._writer().trigger(availableNow=True).start()
        q.awaitTermination()

    def start_continuous(self, interval: str = "5 seconds"):
        """Continuous micro-batch sync (≅ the 5 s poll loop,
        example_usage.py:191-218). Returns the StreamingQuery."""
        return self._writer().trigger(processingTime=interval).start()

    def progress(self) -> dict:
        """Streaming-side health metrics (complements monitor.py)."""
        return {
            "batches_applied": self.batches_applied,
            "checkpoint": self.checkpoint_path,
            "metrics_interval_seconds": self.config.metrics_interval_seconds,
        }
