"""Snapshot-diff capture — the reference's claimed "version-based" CDC.

The reference names a version/snapshot strategy (config.py:47,
README.md:14) but never implements it; its closest artifact is the
source↔target count compare at example_usage.py:98-111. The real thing
is a full outer join of two snapshots on the key:

    old-only row            → DELETE  (old image)
    new-only row            → INSERT  (new image)
    both, any column differs → UPDATE (both images)
    both, identical          → no change (dropped)

Emitted in the standard audit schema (model.AUDIT_SCHEMA) so the same
replicator consumes trigger-log, timestamp, and snapshot-diff captures
interchangeably (SURVEY §7.1 M4).

Scale: the join shuffles both snapshots on the key once; with bucketed
snapshot storage it's shuffle-free. Change detection compares structs
(one vectorized comparison), not per-column Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "id",
    emit_json_images: bool = True,
) -> DataFrame:
    """Audit-schema change set that transforms ``old`` into ``new``.

    ``cdc_id`` is the key itself — a snapshot diff has no intra-batch
    ordering and each key appears exactly once, so the key is a valid,
    deterministic, shuffle-free change ordinal (no global row_number
    window, which would single-partition at scale).
    """
    cols = [c for c in new.columns]
    o = old.select(F.col(key).alias("_k"), F.struct(*cols).alias("_old"))
    n = new.select(F.col(key).alias("_k"), F.struct(*cols).alias("_new"))

    joined = o.join(n, on="_k", how="full_outer")
    classified = joined.select(
        "_k",
        "_old",
        "_new",
        F.when(F.col("_old").isNull(), F.lit("INSERT"))
        .when(F.col("_new").isNull(), F.lit("DELETE"))
        .when(~F.col("_old").eqNullSafe(F.col("_new")), F.lit("UPDATE"))
        .alias("operation"),
    ).filter(F.col("operation").isNotNull())

    old_img = F.to_json("_old") if emit_json_images else F.col("_old").cast("string")
    new_img = F.to_json("_new") if emit_json_images else F.col("_new").cast("string")
    return classified.select(
        F.col("_k").cast("long").alias("cdc_id"),
        F.col("operation"),
        F.col("_k").cast("long").alias("record_id"),
        F.when(F.col("operation") != "INSERT", old_img).alias("old_data"),
        F.when(F.col("operation") != "DELETE", new_img).alias("new_data"),
        F.current_timestamp().alias("changed_at"),
        F.lit(False).alias("synced"),
        F.lit(None).cast("timestamp").alias("sync_timestamp"),
    )
