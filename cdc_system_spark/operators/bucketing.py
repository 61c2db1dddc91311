"""Bucketed-table layout: pre-shuffled storage for co-located joins.

The single biggest repeated cost in a 100 TB star/CDC workload is
re-shuffling the same fact table on the same key for every join. Spark's
answer is HASH-BUCKETED storage (`bucketBy` + `saveAsTable`): rows are
hash-partitioned on the join key AT WRITE TIME into a fixed number of
buckets, and every later equi-join (or aggregation) on that key reads
bucket-aligned splits and skips the exchange entirely — the same
contract as Hive bucketing / Iceberg `bucket(N, col)` partition
transforms.

The reference has a one-row-per-call SQLite INSERT path and never faces
this; at scale, bucketing the change log and replica on the record key
turns every merge/diff/backfill join from (shuffle both sides) into
(zero-exchange sort-merge). See tests/test_bucketing.py for the
plan-level proof (no Exchange above either scan).

Operational notes, encoded in the API:

* Both sides must agree on bucket COUNT and KEY for exchange-free
  joins (Spark requires equal counts; it cannot yet coalesce
  mismatched bucket counts on both sides).
* ``sortBy`` the key within buckets: bucket files arrive pre-sorted,
  so the sort-merge join's per-task sort is a no-op streamed merge.
* Bucket count is a layout decision: ~(table size / healthy task
  input) at write time, power of two so a future 2× rescale can
  split buckets pairwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and in-bucket sorted) on ``key``.

    Uses the session catalog's managed-table path (`saveAsTable`) —
    bucketing metadata lives in the catalog, which is what lets the
    planner prove the layout and elide exchanges. A plain
    ``.parquet(path)`` write cannot carry bucket metadata.
    """
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two same-key, same-count bucketed tables.

    With aligned bucketing the plan is a zero-exchange sort-merge join:
    each task reads bucket *i* of both tables. Broadcast is disabled
    per-join via hint-free logic: we simply join — if one side is small
    Catalyst may still broadcast, which is also exchange-free on the
    big side, so either outcome preserves the no-shuffle property.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=key, how=how)
