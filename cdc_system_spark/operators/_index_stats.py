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


def _is_path_not_found(exc: Exception) -> bool:
    return "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc)


def driver_local_fs(spark: SparkSession) -> bool:
    """True iff Spark resolves scheme-less paths against the driver's
    local filesystem. Scheme-less paths resolve against
    ``fs.defaultFS``; on a cluster whose defaultFS is HDFS/S3A, a
    same-named directory on the driver's local disk is NOT the table
    Spark would read — the pyarrow fast paths must not read it (r12
    advisor). Any failure to read the conf answers False: the Spark
    reader is always correct, the fast path is only an optimization."""
    try:
        fs = (
            spark.sparkContext._jsc.hadoopConfiguration().get(
                "fs.defaultFS", "file:///"
            )
            or "file:///"
        )
        return fs.startswith("file:")
    except Exception:
        return False


def read_model_rows(spark: SparkSession, src: str) -> list[dict]:
    """Rows of a KB-sized MODEL table (centroids, PQ codebooks,
    geometry/prefix meta) as plain dicts.

    Probe entry points read one or more of these tables before the
    real query is even planned; fetching a few KB through
    ``spark.read.parquet(...).collect()`` costs a full distributed-job
    round-trip per table per probe — a driver-blocking scheduling
    barrier at any scale, and the dominant cost of the model reads at
    bench scale. When the artifact sits on a filesystem the driver can
    reach directly (a plain local path), read it in-process via
    pyarrow; any other scheme (s3://, hdfs://) falls back to the Spark
    reader unchanged. Contract parity with the Spark path: a MISSING
    path raises ``AnalysisException`` with PATH_NOT_FOUND semantics in
    both branches (the local branch falls through to the Spark reader,
    which raises it), so absent-tier probes keep one contract; a
    present-but-corrupt table raises in both branches and never
    silently demotes a stored tier."""
    import os

    if "://" not in src and os.path.isdir(src) and driver_local_fs(spark):
        import pyarrow.parquet as pq

        return pq.read_table(src).to_pylist()
    return [r.asDict() for r in spark.read.parquet(src).collect()]


def write_stats_state(state: DataFrame, stats_path: str) -> None:
    """Persist a stats state, materializing first: the merge plan reads
    the very file the write replaces (the SnapshotTable self-overwrite
    guard)."""
    state.localCheckpoint(eager=True).write.mode("overwrite").parquet(stats_path)


def mark_compacted(
    spark: SparkSession, marker_path: str, compacted: bool = True
) -> None:
    """Persist the one-row marker a compaction drops next to the stats
    state: after a compaction has reclaimed stale versions, the
    bootstrap rebuild (a scan of currently-STORED version keys) is no
    longer the exact "ever indexed" state — the marker makes a
    stats-less read RAISE instead of silently rebuilding a smaller,
    live-only state (the r7 advisor's finding). A full index REBUILD
    clears it (``compacted=False``): rebuild rewrites the stats to
    exactly the stored set, so the bootstrap is exact again until the
    next compaction. Written via parquet so the module stays
    FS-agnostic like every other index artifact."""
    from pyspark.sql import functions as F

    spark.range(1).select(F.lit(compacted).alias("compacted")).write.mode(
        "overwrite"
    ).parquet(marker_path)


def staleness_metric(state: DataFrame, live_keys: DataFrame) -> DataFrame:
    """One-row ``(n_ever_est, n_live, churn_est)`` from a maintained
    KMV stats state and the live version-key frame — the shared math
    behind ``lsh_index_staleness`` / ``ann_index_staleness`` (one copy,
    so the k=64 estimator constants cannot drift between the twins).
    One aggregation over a tagged union: a join of two one-row
    aggregates would plan as a CartesianProduct (the scalar×scalar
    recombination anti-pattern the plan audit rejects). ``churn_est =
    max(0, 1 - n_live/n_ever_est)`` rounded half-up at 4 decimals;
    estimator error is the KMV budget (~13% at k=64) — an unchurned
    saturated index reads a few % off zero, not exactly zero. An EMPTY
    state (an index built over an empty corpus) defines ``churn_est``
    as 0.0 — dividing by the 0.0 ever-estimate would otherwise emit
    NaN/Infinity instead of a usable metric (the r8 advisor's
    finding)."""
    from pyspark.sql import functions as F

    from cdc_system_spark.functions.portable import round_portable
    from cdc_system_spark.operators.sketch import _KMV_M

    state_rows = state.select(F.col("h").alias("_h"), F.lit(True).alias("_st"))
    live_rows = live_keys.distinct().select(
        F.lit(None).cast("long").alias("_h"), F.lit(False).alias("_st")
    )
    agg = state_rows.unionByName(live_rows).agg(
        F.count(F.when(F.col("_st"), 1)).alias("_ns"),
        F.max(F.when(F.col("_st"), F.col("_h"))).alias("_hk"),
        F.count(F.when(~F.col("_st"), 1)).alias("n_live"),
    )
    ever = (
        F.when(F.col("_ns") < 64, F.col("_ns").cast("double"))
        .otherwise(F.round(F.lit(63.0 * _KMV_M) / F.col("_hk"), 4))
    )
    return agg.select(
        ever.alias("n_ever_est"),
        "n_live",
        F.when(
            ever > 0,
            round_portable(
                F.greatest(F.lit(0.0), F.lit(1.0) - F.col("n_live") / ever),
                4,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("churn_est"),
    )


def read_stats_state(
    spark: SparkSession,
    stats_path: str,
    bootstrap: Callable[[], DataFrame],
    compacted_marker: str | None = None,
) -> DataFrame:
    """The maintained state, or — ONLY when the path does not exist yet
    (a pre-stats index) — the exact rebuild from ``bootstrap()``. Any
    other read failure (transient FS error, corrupt footer) raises: it
    must never silently reset a maintained artifact. When
    ``compacted_marker`` exists and the stats are missing, raises too:
    the rebuild would scan only the post-compaction survivors and
    silently demote EVER semantics to live-only."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(stats_path)
    except AnalysisException as exc:
        if not _is_path_not_found(exc):
            raise
    if compacted_marker is not None:
        try:
            marker = spark.read.parquet(compacted_marker)
        except AnalysisException as exc:
            if not _is_path_not_found(exc):
                raise
            marker = None
        if marker is not None and marker.filter("compacted").head() is not None:
            raise ValueError(
                f"stats state missing at {stats_path!r} but the index "
                "has been compacted since it was written: the bootstrap "
                "rebuild scans only currently-stored version keys, so "
                "it would silently lose the 'ever indexed' history. "
                "Restore the stats state from a backup, or explicitly "
                "accept live-only semantics by deleting the marker at "
                f"{compacted_marker!r} before re-reading."
            )
    return bootstrap()
