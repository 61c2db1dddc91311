"""Monitoring — health report over the change log.

≅ ``CDCMonitor`` (reference: cdc_system.py:353-393). One rollup
aggregation produces per-operation stats and the grand total in a single
pass; the report dict shape and the ``pending < 1000 → healthy``
threshold match ``get_health_report`` (cdc_system.py:359-376, threshold
at :373).
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame

from cdc_system_spark.operators.changelog import change_statistics_rollup


def get_change_statistics(log: DataFrame) -> dict[str, dict[str, int]]:
    """Per-operation {total, pending, synced} dict (cdc_system.py:248-268)."""
    rows = change_statistics_rollup(log).collect()
    return {
        r["operation"]: {"total": r["count"], "pending": r["pending"], "synced": r["synced"]}
        for r in rows
        if r["operation"] is not None
    }


def get_health_report(log: DataFrame, pending_threshold: int = 1000) -> dict[str, Any]:
    rows = change_statistics_rollup(log).collect()
    per_op: dict[str, dict[str, int]] = {}
    total = pending = synced = 0
    for r in rows:
        if r["operation"] is None:
            total, pending, synced = r["count"], r["pending"], r["synced"]
        else:
            per_op[r["operation"]] = {
                "total": r["count"],
                "pending": r["pending"],
                "synced": r["synced"],
            }
    return {
        "timestamp": datetime.now(timezone.utc).isoformat(),
        "total_changes": total,
        "pending_changes": pending,
        "synced_changes": synced,
        "statistics": per_op,
        "health_status": "healthy" if pending < pending_threshold else "warning",
    }


def print_report(report: dict[str, Any]) -> None:
    """Console formatting (cdc_system.py:378-393)."""
    print("=" * 50)
    print("CDC HEALTH REPORT")
    print("=" * 50)
    print(f"Timestamp: {report['timestamp']}")
    print(f"Status: {report['health_status']}")
    print(f"Total changes: {report['total_changes']}")
    print(f"Pending: {report['pending_changes']}  Synced: {report['synced_changes']}")
    for op, s in report["statistics"].items():
        print(f"  {op}: total={s['total']} pending={s['pending']} synced={s['synced']}")
    print("=" * 50)
