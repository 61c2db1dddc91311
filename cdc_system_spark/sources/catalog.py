"""Parquet table catalog over a scale-factor directory.

The driver's test data is one parquet file per table under
``/root/testdata/sf*/`` (TESTDATA.md). This catalog is the analytics
engine's ``spark.read`` boundary — scans stay declarative so Catalyst
gets predicate pushdown / column pruning for free (verify with
``.explain``: PushedFilters + ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: Dimension tables small enough to broadcast at any realistic scale
#: (region=5 rows, nation=25 at every TPC-H SF; supplier/part grow slowly).
BROADCASTABLE = {"region", "nation", "supplier", "part"}


#: per-path SCHEMA cache (metadata only — the same category as Spark's
#: own session-level file-listing caches): the first access to a table
#: path infers its schema from the parquet footer exactly as before;
#: later accesses skip the inference round-trip (~100 ms of driver-side
#: footer reading + py4j per spark.read.parquet call, paid by EVERY
#: query construction since each builds a fresh TableCatalog). Input
#: tables are immutable for a process's lifetime; mutable index
#: artifacts (ann/lsh index tables, whose schema can change at
#: attach/compact time) deliberately do NOT use this.
_SCHEMA_CACHE: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from pyspark.sql import types as T

    path = os.path.join(sf_dir, f"{name}.parquet")
    # cache key: absolute path + mtime, so regenerating an input table
    # at the same path within a long-lived process (or a cwd change
    # aliasing two relative paths) never serves a stale schema (r12
    # advisor). A scheme'd (non-local) path gets no mtime — keyed on
    # the path alone, as before.
    try:
        key = (os.path.abspath(path), os.stat(path).st_mtime_ns)
    except OSError:
        key = (path, None)
    cached = _SCHEMA_CACHE.get(key)
    if cached is not None:
        df = spark.read.schema(cached).parquet(path)
    else:
        try:
            df = spark.read.parquet(path)
        except Exception:
            if name != "events":
                raise
            # events.ts is INT64 TIMESTAMP(NANOS), which Spark 4 rejects at
            # schema inference unless spark.sql.legacy.parquet.nanosAsLong is
            # set. The driver's verify harness supplies its OWN SparkSession
            # (no such conf), so fall back to an explicit schema that reads
            # the physical INT64 directly — works in any session.
            df = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    # ts long (nanos) → truncate to microseconds (same floor semantics as
    # DuckDB's CAST(ts_ns AS TIMESTAMP), keeping oracle parity).
    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def _events_raw_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


_EVENTS_RAW_SCHEMA = _events_raw_schema()


class TableCatalog:
    """Lazy per-table DataFrame access: ``cat.orders``, ``cat["orders"]``."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getitem__(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = load_table(self.spark, self.sf_dir, name)
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self[name]
        raise AttributeError(name)

    def register_temp_views(self) -> None:
        """Register every table as a temp view for ``spark.sql`` use."""
        for name in TABLES:
            self[name].createOrReplaceTempView(name)
