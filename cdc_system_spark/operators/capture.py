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

    The capture path also MAINTAINS the ``(synced, cdc_id)`` zone state
    (``operators/maintenance.py log_zone_state`` — the reference's
    covering index, cdc_system.py:129-132) at ``{log}_zones``: each
    capture merges its batch's zones in BEFORE appending (a crash
    between the two leaves the state a conservative superset — extra
    claimed-pending zones cost scan bytes, never correctness), and the
    replicators call :meth:`refresh_zone_state` after their mark-synced
    full-log rewrite (an unrefreshed state is equally safe: mark_synced
    only flips 0→1, so stale ``v_min`` values only under-prune). The
    production poll (``api.py CDCSystem.get_pending_changes``) routes
    through ``read_pending_pruned`` whenever the state exists — the
    all-synced prefix of the log converts to pushed cdc_id scan ranges.
    """

    #: zone count of the maintained (synced, cdc_id) state
    NUM_ZONES = 64

    def __init__(self, spark: SparkSession, root: str, table: str, key: str = "id"):
        self.spark = spark
        self.table = table
        self.key = key
        self.path = os.path.join(root, f"{table}_cdc")
        self.zones_path = self.path + "_zones"
        self._zone_cache: tuple | None = None
        #: stat stamp (inode, mtime_ns, size) of the zones file the
        #: cache mirrors — a SECOND LogCapture over the same path (two
        #: CDCSystem handles in one process) invalidates a reader's
        #: cache when the writer's os.replace lands a new file, so a
        #: stale cache can never prune rows another instance appended
        self._zone_mtime: tuple[int, int, int] | None = None
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
        # ONE materialization feeds both the zone-state merge and the
        # data write: recomputing a non-deterministic source between
        # the two (a sample, a limit, a changing view) could persist a
        # state that under-covers the rows actually appended, breaking
        # read_pending_pruned's superset contract — so pin the batch
        # first (the replicators already persist their batches).
        changes = changes.localCheckpoint(eager=True)
        # state first, then data: the state must summarize a SUPERSET
        # of the log for pruning to stay exact (maintenance.py
        # read_pending_pruned's freshness contract)
        self._merge_zone_state(changes)
        changes.write.mode("append").parquet(self.path)

    def read_log(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], AUDIT_SCHEMA)

    # -- maintained (synced, cdc_id) zone state ------------------------------
    #
    # The state is ≤ NUM_ZONES rows, so everything except the batch
    # aggregation itself is DRIVER-side work: the merge runs in Python
    # over the cached rows and the artifact is written with pyarrow as
    # a single parquet file (Spark reads a single-file path
    # transparently) — per-capture maintenance costs ONE Spark job
    # (the batch zone aggregation), not a read-merge-collect-write
    # chain of four. The in-memory cache mirrors the file keyed by its
    # mtime: a fresh process bootstraps from disk on first use, and a
    # SECOND instance over the same path re-reads whenever another
    # writer's os.replace moved the file — stale-cache pruning cannot
    # skip rows a concurrent instance appended. (Concurrent WRITERS
    # remain single-writer-per-table, same as the log itself.)

    def _zones_stamp(self) -> tuple[int, int, int] | None:
        """(inode, mtime_ns, size) of the zones file — the cache key.
        mtime alone is NOT enough: Linux file timestamps can be
        jiffy-coarse, so two os.replace writes inside one tick would
        leave a stale cache looking fresh; every replace lands a NEW
        inode, so the triple changes on every write in practice."""
        try:
            st = os.stat(self.zones_path)
        except OSError:
            return None
        return (st.st_ino, st.st_mtime_ns, st.st_size)

    def _current_zone_state(self) -> tuple[dict, int, int, int] | None:
        """The cached state, re-read from disk whenever the zones
        file's stat stamp moved past the cached copy — the
        cross-instance staleness guard."""
        mt = self._zones_stamp()
        if self._zone_cache is not None and mt == self._zone_mtime:
            return self._zone_cache
        state = self._zone_rows_from_disk()
        self._zone_cache = state
        self._zone_mtime = mt
        return state

    def _zone_rows_from_disk(self) -> tuple[dict, int, int, int] | None:
        import pyarrow.parquet as pq

        try:
            t = pq.read_table(self.zones_path).to_pylist()
        except Exception:
            return None
        if not t:
            return None
        zones = {
            int(r["zone"]): (int(r["n_rows"]), float(r["v_min"]),
                             float(r["v_max"]))
            for r in t
        }
        r0 = t[0]
        return zones, int(r0["geo_lo"]), int(r0["geo_hi"]), int(r0["num_zones"])

    def _write_zone_state(
        self, zones: dict, geo_lo: int, geo_hi: int
    ) -> None:
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq

        ordered = sorted(zones.items())
        table = pa.table(
            {
                "zone": pa.array([z for z, _ in ordered], pa.int32()),
                "n_rows": pa.array([v[0] for _, v in ordered], pa.int64()),
                "v_min": pa.array([v[1] for _, v in ordered], pa.float64()),
                "v_max": pa.array([v[2] for _, v in ordered], pa.float64()),
                "geo_lo": pa.array([geo_lo] * len(ordered), pa.int64()),
                "geo_hi": pa.array([geo_hi] * len(ordered), pa.int64()),
                "num_zones": pa.array(
                    [self.NUM_ZONES] * len(ordered), pa.int32()
                ),
            }
        )
        if os.path.isdir(self.zones_path):  # legacy directory-form state
            shutil.rmtree(self.zones_path, ignore_errors=True)
        # the state lands BEFORE the first log append, so the table
        # root may not exist yet
        os.makedirs(os.path.dirname(self.zones_path), exist_ok=True)
        tmp = self.zones_path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, self.zones_path)
        self._zone_cache = (zones, geo_lo, geo_hi, self.NUM_ZONES)
        self._zone_mtime = self._zones_stamp()

    def read_zone_state(self):
        """``(state_df, geo_lo, geo_hi, num_zones)`` of the maintained
        zone state, or ``None`` for a log captured before this state
        existed (the poll then falls back to the plain scan). The
        ≤ NUM_ZONES-row frame materializes from the driver-side cache/
        file — reading it costs no scan job."""
        cached = self._current_zone_state()
        if cached is None:
            return None
        zones, geo_lo, geo_hi, nz = cached
        df = self.spark.createDataFrame(
            [(z, v[0], v[1], v[2]) for z, v in sorted(zones.items())],
            "zone int, n_rows long, v_min double, v_max double",
        )
        return df, geo_lo, geo_hi, nz

    def _merge_zone_state(self, batch: DataFrame) -> None:
        from cdc_system_spark.operators.maintenance import log_zone_state

        cur = self._current_zone_state()
        if cur is None:
            b = batch.agg(
                F.min("cdc_id").alias("lo"), F.max("cdc_id").alias("hi")
            ).collect()[0]
            if b["lo"] is None:
                return
            # geometry pins at the first batch; later cdc_ids beyond
            # geo_hi clamp into the top zone, whose scan span is
            # unbounded above (zone_pruned_between's edge rule) — the
            # tail just prunes less until a refresh re-pins
            geo_lo = int(b["lo"])
            geo_hi = max(int(b["hi"]), geo_lo + self.NUM_ZONES - 1)
            zones: dict = {}
        else:
            zones, geo_lo, geo_hi, _ = cur
            zones = dict(zones)
        brows = log_zone_state(
            batch, geo_lo, geo_hi, self.NUM_ZONES
        ).collect()
        for r in brows:
            z = int(r["zone"])
            n, lo, hi = int(r["n_rows"]), float(r["v_min"]), float(r["v_max"])
            if z in zones:
                on, olo, ohi = zones[z]
                zones[z] = (on + n, min(olo, lo), max(ohi, hi))
            else:
                zones[z] = (n, lo, hi)
        self._write_zone_state(zones, geo_lo, geo_hi)

    def refresh_zone_state(self) -> None:
        """Rebuild the zone state from the full log with FRESH geometry
        — for callers that just rewrote the log wholesale (the
        replicators' mark-synced rewrite): the rewrite scanned
        everything anyway, and re-pinning the geometry restores full
        pruning resolution over the drained prefix."""
        from cdc_system_spark.operators.maintenance import log_zone_state

        log = self.read_log()
        b = log.agg(
            F.min("cdc_id").alias("lo"), F.max("cdc_id").alias("hi")
        ).collect()[0]
        if b["lo"] is None:
            import shutil

            self._zone_cache = None
            self._zone_mtime = None
            shutil.rmtree(self.zones_path, ignore_errors=True)
            if os.path.exists(self.zones_path):
                os.remove(self.zones_path)
            return
        geo_lo = int(b["lo"])
        geo_hi = max(int(b["hi"]), geo_lo + self.NUM_ZONES - 1)
        rows = log_zone_state(log, geo_lo, geo_hi, self.NUM_ZONES).collect()
        zones = {
            int(r["zone"]): (int(r["n_rows"]), float(r["v_min"]),
                             float(r["v_max"]))
            for r in rows
        }
        self._write_zone_state(zones, geo_lo, geo_hi)


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
