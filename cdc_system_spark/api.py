"""Public facade mirroring the reference's class surface.

``CDCSystem`` / ``CDCReplicator`` / ``CDCMonitor`` keep the reference's
names and method signatures (cdc_system.py:92-393) so its users can
switch engines without relearning the API — but every method body is a
declarative DataFrame program, and state lives in parquet snapshots +
the append-only change log rather than SQLite tables.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_system_spark import monitor as _monitor
from cdc_system_spark.config import CDCConfig
from cdc_system_spark.model import SchemaRegistry
from cdc_system_spark.operators.capture import LogCapture
from cdc_system_spark.operators.changelog import mark_synced, pending_changes
from cdc_system_spark.operators.merge import apply_changes


class SnapshotTable:
    """A mutable table as versioned parquet snapshots (no Delta in env).

    Writes go to ``{path}/v{n}``; ``{path}/_CURRENT`` names the live
    version (write-new-then-flip ≈ atomic swap). Readers always see a
    complete snapshot. At scale this is the same pattern as
    Delta/Iceberg's version pointer, minimal edition.
    """

    def __init__(self, spark: SparkSession, path: str, schema: T.StructType):
        self.spark = spark
        self.path = path
        self.schema = schema
        os.makedirs(path, exist_ok=True)

    def _current_file(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def exists(self) -> bool:
        return os.path.exists(self._current_file())

    def read(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame([], self.schema)
        with open(self._current_file()) as f:
            version = f.readline().strip()
        df = self.spark.read.parquet(os.path.join(self.path, version))
        # Schema reconciliation: snapshots written before an additive
        # evolution lack the new columns — pad them with typed nulls so
        # every reader sees the declared schema (Delta/Iceberg read-time
        # schema projection, minimal edition). evolve() forbids drops,
        # so declared ⊇ stored always holds.
        missing = [f for f in self.schema.fields if f.name not in df.columns]
        if missing:
            df = df.select(
                "*",
                *[
                    F.lit(None).cast(f.dataType).alias(f.name)
                    for f in missing
                ],
            )
        return df.select(*[f.name for f in self.schema.fields])

    def evolve(self, new_schema: T.StructType) -> None:
        """Adopt an additively-evolved schema; existing snapshots are
        untouched and reconcile at read time (see :meth:`read`)."""
        self.schema = new_schema

    def meta(self) -> dict[str, str]:
        """Key=value metadata committed atomically with the last flip
        (empty for tables written without metadata). This is the seam a
        transactional sink needs: Delta's txnAppId/txnVersion pattern,
        minimal edition — see StreamingCorpusIngestor."""
        if not self.exists():
            return {}
        with open(self._current_file()) as f:
            lines = f.read().splitlines()
        return dict(line.split("=", 1) for line in lines[1:] if "=" in line)

    def write(self, df: DataFrame, meta: dict[str, str] | None = None) -> None:
        version = f"v{uuid.uuid4().hex[:12]}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, version))
        tmp = self._current_file() + ".tmp"
        with open(tmp, "w") as f:
            f.write(version)
            for k, v in (meta or {}).items():
                f.write(f"\n{k}={v}")
        os.replace(tmp, self._current_file())
        # commit-ordered version log — what makes time travel and the
        # change feed (changes_between) possible on plain parquet
        with open(os.path.join(self.path, "_VERSIONS"), "a") as f:
            f.write(version + "\n")

    def list_versions(self) -> list[str]:
        """Version names in commit order (oldest first)."""
        vfile = os.path.join(self.path, "_VERSIONS")
        if not os.path.exists(vfile):
            return []
        with open(vfile) as f:
            return [ln.strip() for ln in f if ln.strip()]

    def read_version(self, version: str) -> DataFrame:
        """Time travel: read a specific committed version (same
        read-time schema reconciliation as :meth:`read`)."""
        if version not in self.list_versions():
            raise ValueError(f"unknown version {version!r} for {self.path}")
        df = self.spark.read.parquet(os.path.join(self.path, version))
        missing = [f for f in self.schema.fields if f.name not in df.columns]
        if missing:
            df = df.select(
                "*",
                *[F.lit(None).cast(f.dataType).alias(f.name) for f in missing],
            )
        return df.select(*[f.name for f in self.schema.fields])

    def changes_between(
        self, from_version: str, to_version: str, key: str
    ) -> DataFrame:
        """Change data feed on plain parquet (Delta CDF analogue): the
        audit-schema change set that transforms ``from_version`` into
        ``to_version`` — what an incremental downstream consumer reads
        instead of re-diffing full snapshots itself. One full-outer
        key join (operators/snapshot_diff.py), no stored deltas.
        """
        from cdc_system_spark.operators.snapshot_diff import snapshot_diff

        versions = self.list_versions()
        if versions.index(from_version) > versions.index(to_version):
            raise ValueError(
                f"from_version {from_version!r} is newer than {to_version!r}"
            )
        return snapshot_diff(
            self.read_version(from_version), self.read_version(to_version), key=key
        )

    def destroy(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)


class CDCSystem:
    """Capture setup + change-log queries (≅ cdc_system.py:92-268)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        table_name: str,
        config: CDCConfig | None = None,
    ):
        self.spark = spark
        self.root = root
        self.table_name = table_name
        self.config = config or CDCConfig()
        self.registry = SchemaRegistry()
        self.capture: LogCapture | None = None

    def setup_cdc(self, schema: T.StructType, key: str | None = None) -> LogCapture:
        """≅ setup_trigger_based_cdc(columns) (cdc_system.py:105-141).

        Takes a typed StructType instead of a column-name list; the key
        column is explicit (default first field) — fixing the
        reference's columns[0]-vs-'id' inconsistency (SURVEY §1.3).
        """
        self.registry.register(self.table_name, schema, key)
        self.capture = LogCapture(
            self.spark, self.root, self.table_name, key=self.registry.key(self.table_name)
        )
        return self.capture

    def evolve_schema(self, new_schema: T.StructType) -> None:
        """Additive schema evolution for the tracked table (≅ what the
        reference would need on ALTER TABLE ADD COLUMN — it has no
        path for this; its triggers would silently drop the column).

        Validation + registry swap only: the change log's JSON row
        images decode under the evolved schema with nulls for the new
        columns, so history needs no rewrite, and captures after the
        evolution carry the new columns transparently. Pair with
        ``SnapshotTable.evolve`` on the target side.
        """
        self.registry.evolve(self.table_name, new_schema)

    def read_log(self) -> DataFrame:
        assert self.capture is not None, "setup_cdc first"
        return self.capture.read_log()

    def get_pending_changes(self, limit: int | None = None) -> DataFrame:
        """≅ cdc_system.py:199-231, decoded images included.

        When the capture path's maintained ``(synced, cdc_id)`` zone
        state exists (it does for any log captured by this package —
        ``LogCapture`` merges it per batch, the replicators refresh it
        per rewrite), the poll scan is PRUNED through
        ``read_pending_pruned``: all-synced cdc_id zones convert to
        pushed scan ranges, exactly what the reference's ``(synced,
        cdc_id)`` covering index buys its hot poll (cdc_system.py:
        209-216). Rows are identical to the plain filter (the
        zone_pruned_between contract); a stateless log (external
        writer) falls back to the unpruned scan.
        """
        schema = self.registry.schema(self.table_name)
        log = self.read_log()
        zs = self.capture.read_zone_state() if self.capture else None
        if zs is not None:
            from cdc_system_spark.operators.maintenance import (
                read_pending_pruned,
            )

            state, geo_lo, geo_hi, num_zones = zs
            log = read_pending_pruned(log, state, geo_lo, geo_hi, num_zones)
        return pending_changes(log, limit=limit, row_schema=schema)

    def get_change_statistics(self) -> dict[str, dict[str, int]]:
        return _monitor.get_change_statistics(self.read_log())


class CDCReplicator:
    """Batch replication source→target (≅ cdc_system.py:271-350)."""

    def __init__(self, source: CDCSystem, target: SnapshotTable, key: str | None = None):
        self.source = source
        self.target = target
        self.key = key or source.registry.key(source.table_name)

    def _with_retries(self, fn):
        """Honor the retry config the reference declares but never uses
        (config.py:35-36: CDC_MAX_RETRIES / CDC_RETRY_DELAY). Retries
        are safe here because the whole replicate step is idempotent:
        the target write is write-new-then-flip and the log is only
        flagged after the target version lands.
        """
        import time

        cfg = self.source.config
        last: Exception | None = None
        for attempt in range(cfg.max_retries + 1):
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 — deliberate catch-all boundary
                last = e
                if attempt < cfg.max_retries:
                    time.sleep(cfg.retry_delay_seconds)
        assert last is not None
        raise last

    def replicate_changes(self, batch_size: int | None = None) -> int:
        """One micro-batch: pending → net-effect merge → mark synced.

        Returns the number of changes applied (≅ cdc_system.py:279-318).
        Unlike the reference — which marks source rows synced *before*
        the target commit (cdc_system.py:313-315) — the target snapshot
        is written first, then the log flagged, so a crash re-delivers
        into an idempotent merge instead of losing changes.
        """
        batch_size = batch_size or self.source.config.batch_size
        batch = self.source.get_pending_changes(limit=batch_size)
        batch = batch.cache()
        n = batch.count()
        if n == 0:
            return 0
        current = self.target.read()
        merged = apply_changes(current, batch, key=self.key, change_key="record_id")
        self._with_retries(lambda: self.target.write(merged))

        ids = batch.select("cdc_id")
        log = self.source.read_log()
        updated = mark_synced(log, ids)
        # rewrite log snapshot-style (parquet has no in-place update)
        cap = self.source.capture
        assert cap is not None
        tmp = cap.path + ".next"
        updated.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(cap.path, ignore_errors=True)
        os.replace(tmp, cap.path)
        # re-pin the (synced, cdc_id) zone state over the rewritten log
        # so the next poll prunes the freshly-drained zones (a crash
        # before this line is safe: the old state only under-prunes)
        cap.refresh_zone_state()
        batch.unpersist()
        return n


#: output schema of operators/scd.scd2_from_log / scd2_apply
SCD2_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.LongType(), True),
        T.StructField("version", T.IntegerType(), True),
        T.StructField("payload", T.StringType(), True),
        T.StructField("valid_from", T.TimestampType(), True),
        T.StructField("valid_to", T.TimestampType(), True),
        T.StructField("is_current", T.BooleanType(), True),
    ]
)


class SCD2Replicator:
    """History-table replication: pending changes maintain an SCD Type 2
    history instead of a current-state replica — the other canonical
    CDC sink (audit trails, point-in-time joins, feature backfills).
    Same durability order as :class:`CDCReplicator`: history version
    lands first, the log is flagged after, so a crash re-delivers into
    :func:`~cdc_system_spark.operators.scd.scd2_apply`, whose
    stale-batch guard makes out-of-order redelivery loud, not corrupt.

    Requires ``changed_at`` to be monotone with ``cdc_id`` per key
    (true for capture-time stamps); violations raise at apply time.
    """

    def __init__(self, source: CDCSystem, history: SnapshotTable):
        self.source = source
        self.history = history

    def replicate_changes(self, batch_size: int | None = None) -> int:
        from cdc_system_spark.operators.scd import scd2_apply

        batch_size = batch_size or self.source.config.batch_size
        log = self.source.read_log()
        batch = (
            log.filter(~F.col("synced")).orderBy("cdc_id").limit(batch_size)
        ).cache()
        n = batch.count()
        if n == 0:
            return 0
        merged = scd2_apply(self.history.read(), batch)
        self.history.write(merged)

        updated = mark_synced(log, batch.select("cdc_id"))
        cap = self.source.capture
        assert cap is not None
        tmp = cap.path + ".next"
        updated.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(cap.path, ignore_errors=True)
        os.replace(tmp, cap.path)
        cap.refresh_zone_state()
        batch.unpersist()
        return n


class CDCMonitor:
    """≅ cdc_system.py:353-393."""

    def __init__(self, system: CDCSystem, pending_threshold: int = 1000):
        self.system = system
        self.pending_threshold = pending_threshold

    def get_health_report(self) -> dict[str, Any]:
        return _monitor.get_health_report(
            self.system.read_log(), pending_threshold=self.pending_threshold
        )

    def get_replication_lag(self) -> dict[str, Any]:
        """Event-time freshness metrics (see monitor.get_replication_lag) —
        the lag dimension the reference's count-based report lacks."""
        return _monitor.get_replication_lag(self.system.read_log())

    def print_report(self) -> None:
        _monitor.print_report(self.get_health_report())
