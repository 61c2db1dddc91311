"""Change-log queries — the reference's hot path, set-oriented.

Reference behaviors re-expressed (SURVEY.md §2.2/§2.4/§2.5):

* ``pending_changes``  ≅ ``get_pending_changes`` (cdc_system.py:199-231):
  ``SELECT * FROM {cdc} WHERE synced=0 ORDER BY cdc_id [LIMIT n]`` plus
  JSON decode of old/new row images.
* ``mark_synced``      ≅ ``mark_as_synced`` (cdc_system.py:233-246):
  semi-join of the log against a replicated-id set.
* ``change_statistics`` ≅ ``get_change_statistics`` (cdc_system.py:248-268):
  GROUP BY operation with pivoted pending/synced conditional sums.
* ``change_statistics_rollup`` ≅ the Python-side totals rollup
  (cdc_system.py:363-364), done natively with ``rollup()`` so Spark
  computes both levels in one pass (partial aggregation map-side).

Scale notes: the filter+orderBy+limit plan compiles to
TakeOrderedAndProject — a true distributed top-k (per-partition heap,
then k-way driver merge), not a global sort. At 100 TB the `synced` flag
would live as a partition column (or be retired for streaming offsets,
see streaming/), making the filter a partition-pruned scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pending_changes(
    log: DataFrame,
    limit: int | None = None,
    row_schema: T.StructType | None = None,
) -> DataFrame:
    """Oldest-first pending slice of the change log, optionally decoded.

    With ``row_schema`` the JSON row images are decoded into typed
    structs (``old`` / ``new`` columns) — the set-oriented version of the
    per-row ``json.loads`` at cdc_system.py:221-228. ``from_json`` maps
    NULL input to NULL natively (NULL old_data for INSERT, NULL new_data
    for DELETE), matching the reference's conditional decode.
    """
    df = log.filter(~F.col("synced")).orderBy("cdc_id")
    if limit is not None:
        df = df.limit(limit)
    if row_schema is not None:
        df = df.withColumns(
            {
                "old": F.from_json("old_data", row_schema),
                "new": F.from_json("new_data", row_schema),
            }
        )
    return df


def mark_synced(log: DataFrame, synced_ids: DataFrame | list[int]) -> DataFrame:
    """Return the log with ``synced``/``sync_timestamp`` set for the ids.

    Reference: ``UPDATE {cdc} SET synced=1, sync_timestamp=now WHERE
    cdc_id IN (...)`` (cdc_system.py:238-243). Small id sets use a
    literal ``isin`` (pushed to the scan); DataFrame id sets use a
    broadcast left-semi-join-shaped flag so the plan never shuffles the
    (large) log side.
    """
    if isinstance(synced_ids, DataFrame):
        flagged = (
            synced_ids.select(F.col(synced_ids.columns[0]).alias("cdc_id"))
            .distinct()
            .withColumn("_hit", F.lit(True))
        )
        out = log.join(F.broadcast(flagged), on="cdc_id", how="left")
        hit: Column = F.coalesce(F.col("_hit"), F.lit(False))
    else:
        hit = F.col("cdc_id").isin([int(i) for i in synced_ids])
        out = log
    return (
        out.withColumn("synced", F.col("synced") | hit)
        .withColumn(
            "sync_timestamp",
            F.when(hit & F.col("sync_timestamp").isNull(), F.current_timestamp()).otherwise(
                F.col("sync_timestamp")
            ),
        )
        .drop("_hit")
    )


def change_statistics(log: DataFrame) -> DataFrame:
    """Per-operation totals + pending/synced breakdown.

    Reference SQL (cdc_system.py:250-258)::

        SELECT operation, COUNT(*) as count,
               SUM(CASE WHEN synced = 0 THEN 1 ELSE 0 END) as pending,
               SUM(CASE WHEN synced = 1 THEN 1 ELSE 0 END) as synced
        FROM {cdc} GROUP BY operation
    """
    return log.groupBy("operation").agg(
        F.count("*").alias("count"),
        F.sum(F.when(~F.col("synced"), 1).otherwise(0)).alias("pending"),
        F.sum(F.when(F.col("synced"), 1).otherwise(0)).alias("synced"),
    )


def change_statistics_rollup(log: DataFrame) -> DataFrame:
    """Per-operation stats plus the all-operations total row in one pass.

    The reference computes totals in Python over A1's output
    (cdc_system.py:363-364); ``rollup`` produces both grouping levels in
    a single aggregation (operation=NULL row = grand total).
    """
    return log.rollup("operation").agg(
        F.count("*").alias("count"),
        F.sum(F.when(~F.col("synced"), 1).otherwise(0)).alias("pending"),
        F.sum(F.when(F.col("synced"), 1).otherwise(0)).alias("synced"),
    )
