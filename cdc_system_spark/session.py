"""SparkSession factory.

One place to configure the session so every entry point (tests, bench,
driver contract) gets the same scale-ready defaults: AQE on (runtime
re-planning, skew-join handling, partition coalescing), UTC session
timezone (deterministic timestamp semantics vs external oracles), Arrow
enabled for the few pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cdc_system_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract)
    or ``local[*]``. On a real cluster the caller passes no master and the
    submit environment decides.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata stores events.ts as INT64 TIMESTAMP(NANOS), which
        # Spark 4 rejects natively; read as long, converted in the catalog.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 100 TB posture: bounded scan task size; AQE re-coalesces small ones.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # default 4 MiB open-cost quantizes small inputs into a handful of
        # splits, idling most cores (10 MB file → 3 tasks on 32 cores).
        # 256 KiB restores scan parallelism for small/medium files and is
        # inert at scale, where files dwarf the open cost. Measured ~2× on
        # every lineitem-bound query at sf0.1.
        .config("spark.sql.files.openCostInBytes", "262144")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
