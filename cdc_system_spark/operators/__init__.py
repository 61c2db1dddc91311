from cdc_system_spark.operators.changelog import (
    change_statistics,
    change_statistics_rollup,
    mark_synced,
    pending_changes,
)
from cdc_system_spark.operators.merge import apply_changes, lww_reduce
from cdc_system_spark.operators.snapshot_diff import snapshot_diff

__all__ = [
    "apply_changes",
    "change_statistics",
    "change_statistics_rollup",
    "lww_reduce",
    "mark_synced",
    "pending_changes",
    "snapshot_diff",
]
