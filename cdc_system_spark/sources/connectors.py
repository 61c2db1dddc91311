"""Pluggable source/sink connectors — the reference's adapter surface.

The reference declares a ``DatabaseType`` enum {sqlite, postgresql,
mysql} and a ``DatabaseConnection`` ABC (cdc_system.py:32-36, :39-56)
but implements only SQLite. Here the adapter axis is Spark's DataSource
format string, and every declared backend is real:

* files — ``parquet`` (columnar, default), ``csv``, ``json`` (both
  with **mandatory explicit schema**: ``inferSchema`` re-reads the
  whole input — a full extra 100 TB pass — and schema drift silently
  changes types between runs);
* databases — ``jdbc`` covers the claimed PostgreSQL/MySQL surface.
  Reads parallelize only when ``partition_column`` + bounds are given
  (otherwise one executor owns the whole table — the classic JDBC
  scale trap), so this connector *requires* them unless
  ``allow_single_partition=True``.

No JDBC driver jar ships in this environment, so the JDBC path is
config-construction + validation here, exercised end-to-end only in
deployments that provide a driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class SourceFormat(str, Enum):
    """≅ reference DatabaseType (cdc_system.py:32-36), Spark-native axis."""

    PARQUET = "parquet"
    ORC = "orc"
    CSV = "csv"
    JSON = "json"
    JDBC = "jdbc"


@dataclass
class SourceConfig:
    format: SourceFormat
    #: file path/glob for file formats; JDBC URL for jdbc
    location: str
    #: required for csv/json; ignored for parquet (self-describing)
    schema: T.StructType | None = None
    #: jdbc: table or "(subquery) t"; file formats: unused
    table: str | None = None
    #: jdbc parallel-read split column (numeric/date, indexed)
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int = 8
    allow_single_partition: bool = False
    options: dict[str, str] = field(default_factory=dict)


def read_source(spark: SparkSession, cfg: SourceConfig) -> DataFrame:
    """One declarative scan per config — Catalyst keeps pushdown/pruning."""
    if cfg.format == SourceFormat.JDBC:
        return _jdbc_reader(spark, cfg)
    reader = spark.read.format(cfg.format.value).options(**cfg.options)
    if cfg.format in (SourceFormat.PARQUET, SourceFormat.ORC):
        # both are self-describing columnar formats with predicate
        # pushdown + column pruning; schema optional (enforced if given)
        if cfg.schema is not None:
            reader = reader.schema(cfg.schema)
        return reader.load(cfg.location)
    if cfg.schema is None:
        raise ValueError(
            f"{cfg.format.value} source requires an explicit schema: inferSchema "
            "costs a full extra pass over the input and drifts under dirty data"
        )
    if cfg.format == SourceFormat.CSV:
        reader = reader.option("header", cfg.options.get("header", "true"))
    return reader.schema(cfg.schema).load(cfg.location)


def _jdbc_reader(spark: SparkSession, cfg: SourceConfig) -> DataFrame:
    if not cfg.table:
        raise ValueError("jdbc source requires `table`")
    reader = (
        spark.read.format("jdbc")
        .option("url", cfg.location)
        .option("dbtable", cfg.table)
        .options(**cfg.options)
    )
    if cfg.partition_column is not None:
        if cfg.lower_bound is None or cfg.upper_bound is None:
            raise ValueError("jdbc partitioned read requires lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", cfg.partition_column)
            .option("lowerBound", str(cfg.lower_bound))
            .option("upperBound", str(cfg.upper_bound))
            .option("numPartitions", str(cfg.num_partitions))
        )
    elif not cfg.allow_single_partition:
        raise ValueError(
            "jdbc read without partition_column runs on ONE executor; pass "
            "partition_column+bounds, or allow_single_partition=True for tiny tables"
        )
    return reader.load()


def write_sink(df: DataFrame, cfg: SourceConfig, mode: str = "append") -> None:
    """Format-symmetric sink. File sinks write one directory per call;
    jdbc appends via the driver's batched inserts."""
    if cfg.format == SourceFormat.JDBC:
        if not cfg.table:
            raise ValueError("jdbc sink requires `table`")
        (
            df.write.format("jdbc")
            .option("url", cfg.location)
            .option("dbtable", cfg.table)
            .options(**cfg.options)
            .mode(mode)
            .save()
        )
        return
    writer = df.write.format(cfg.format.value).options(**cfg.options).mode(mode)
    if cfg.format == SourceFormat.CSV:
        writer = writer.option("header", "true")
    writer.save(cfg.location)
