"""Shared maintenance for the indexes' persisted KMV stats states.

Both maintained indexes (:mod:`~cdc_system_spark.operators.ann_index`,
:mod:`~cdc_system_spark.operators.lsh_index`) keep a ≤ k-row KMV state
over every version ever indexed at ``{path}/stats``. The write-side
self-overwrite guard and the read-side PATH_NOT_FOUND-only bootstrap
are identical discipline in both — one copy here so a fix to either
(exception matching, checkpoint rules) cannot silently miss a module.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def write_stats_state(state: DataFrame, stats_path: str) -> None:
    """Persist a stats state, materializing first: the merge plan reads
    the very file the write replaces (the SnapshotTable self-overwrite
    guard)."""
    state.localCheckpoint(eager=True).write.mode("overwrite").parquet(stats_path)


def read_stats_state(
    spark: SparkSession, stats_path: str, bootstrap: Callable[[], DataFrame]
) -> DataFrame:
    """The maintained state, or — ONLY when the path does not exist yet
    (a pre-stats index) — the exact rebuild from ``bootstrap()``. Any
    other read failure (transient FS error, corrupt footer) raises: it
    must never silently reset a maintained artifact."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(stats_path)
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
            raise
        return bootstrap()
