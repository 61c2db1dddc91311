"""Connector round-trips (reference's claimed multi-backend surface,
cdc_system.py:32-36): every file format survives write→read with schema
intact; JDBC misconfiguration fails loudly instead of silently reading
on one executor."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from cdc_system_spark.sources.catalog import load_table
from cdc_system_spark.sources.connectors import (
    SourceConfig,
    SourceFormat,
    read_source,
    write_sink,
)


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


@pytest.mark.parametrize(
    "fmt",
    [SourceFormat.PARQUET, SourceFormat.ORC, SourceFormat.CSV, SourceFormat.JSON],
)
def test_file_roundtrip(spark, nation, tmp_path, fmt):
    loc = str(tmp_path / fmt.value)
    write_sink(nation, SourceConfig(format=fmt, location=loc), mode="overwrite")
    back = read_source(spark, SourceConfig(format=fmt, location=loc, schema=nation.schema))
    assert back.schema == nation.schema
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in nation.collect()
    )


def test_text_formats_require_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_source(spark, SourceConfig(format=SourceFormat.CSV, location=str(tmp_path)))


def test_jdbc_requires_partitioning(spark):
    cfg = SourceConfig(
        format=SourceFormat.JDBC, location="jdbc:postgresql://h/db", table="users"
    )
    with pytest.raises(ValueError, match="ONE executor"):
        read_source(spark, cfg)


def test_jdbc_partitioned_config_builds(spark):
    # no driver jar in this env: the reader must CONSTRUCT (options
    # validated), and then fail only at connect time
    cfg = SourceConfig(
        format=SourceFormat.JDBC,
        location="jdbc:postgresql://localhost:1/db",
        table="users",
        partition_column="id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    )
    with pytest.raises(Exception):  # connect/driver error, not ValueError
        read_source(spark, cfg).count()


def test_jdbc_bounds_validated(spark):
    cfg = SourceConfig(
        format=SourceFormat.JDBC,
        location="jdbc:mysql://h/db",
        table="users",
        partition_column="id",
    )
    with pytest.raises(ValueError, match="lower_bound"):
        read_source(spark, cfg)
