"""Set-oriented change application (the MERGE path).

The reference replays changes one row at a time in ``cdc_id`` order
(dispatch loop cdc_system.py:297-310; upsert :320-329, update :331-343,
delete :345-350). Sequential replay is the one thing a distributed
engine must not do; the equivalent set-oriented program reduces each
batch to its *net effect* per key, then applies it as one bulk merge.

Sequential-replay semantics being reproduced (full row images, upsert =
INSERT OR REPLACE per cdc_system.py:323, UPDATE no-ops on a missing key
per cdc_system.py:331-343):

* per key, the last INSERT/DELETE in the batch decides *existence*;
* the last change overall supplies the *image*;
* a batch of only UPDATEs applies iff the key already exists in target.

``net_effect_reduce`` computes exactly that in one window pass (single
shuffle on the key). Equivalence to row-at-a-time replay is proven by a
seeded property test (tests/test_merge.py, SURVEY §5.3#3).

Scale: the change batch is typically tiny next to the target, so the
anti/semi joins broadcast the batch side — the 100 TB target is never
shuffled. AQE picks the strategy when the batch is large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_system_spark.model import ChangeOp

_INS = ChangeOp.INSERT.value
_UPD = ChangeOp.UPDATE.value
_DEL = ChangeOp.DELETE.value


def lww_reduce(changes: DataFrame, key: str = "record_id", order: str = "cdc_id") -> DataFrame:
    """Plain last-write-wins: the single latest change row per key."""
    w = Window.partitionBy(key).orderBy(F.col(order).desc())
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def net_effect_reduce(
    changes: DataFrame, key: str = "record_id", order: str = "cdc_id"
) -> DataFrame:
    """Reduce a batch to one net-effect row per key.

    Output columns: ``key``, ``effect`` ∈ {UPSERT, DELETE, UPDATE_IF_EXISTS},
    ``new`` (image struct for non-DELETE effects), ``<order>`` (of the
    decisive change, for audit). A single hash aggregation (one shuffle,
    partial map-side combine): ``max_by`` picks both the last
    existence-determining op and the last image.
    """
    agg = changes.groupBy(key).agg(
        F.max_by("operation", F.when(F.col("operation") != _UPD, F.col(order))).alias(
            "_last_exist_op"
        ),
        F.max_by("new", F.col(order)).alias("new"),
        F.max(F.col(order)).alias(order),
    )
    return agg.select(
        F.col(key),
        F.when(F.col("_last_exist_op") == _DEL, F.lit("DELETE"))
        .when(F.col("_last_exist_op") == _INS, F.lit("UPSERT"))
        .otherwise(F.lit("UPDATE_IF_EXISTS"))
        .alias("effect"),
        "new",
        order,
    )


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    key: str = "id",
    change_key: str = "record_id",
) -> DataFrame:
    """Bulk-apply a change batch to a target snapshot; returns the new snapshot.

    ``changes`` is an audit-schema DataFrame with a typed ``new`` struct
    column (decoded row image, NULL for DELETE) whose fields match the
    target's columns. Internally net-effect-reduces, then:

    * target rows whose key is touched by UPSERT/DELETE, or by a
      matching UPDATE_IF_EXISTS → removed (anti join, batch broadcast)
    * UPSERT images → inserted
    * UPDATE_IF_EXISTS images → inserted only for keys present in target
      (semi join)
    """
    # The reduced batch feeds four branches (upserts/deletes/cond-updates/
    # removed-keys); without truncating lineage Catalyst recomputes the
    # groupBy per branch (16 shuffles at sf0.001, PLANS.md r1).
    # localCheckpoint materializes the tiny net batch once. Eager: an A/B
    # at sf0.1 (interleaved min-of-5, same session) measured eager 0.99 s
    # vs lazy 1.02 s vs cache 0.91 s — cache is fastest but pins blocks
    # until LRU eviction (a library primitive must not leak cache
    # entries); eager keeps ContextCleaner-managed cleanup and the same
    # 7-exchange plan.
    net = net_effect_reduce(changes, key=change_key).localCheckpoint(eager=True)

    upserts = net.filter(F.col("effect") == "UPSERT")
    deletes = net.filter(F.col("effect") == "DELETE")
    cond_updates = net.filter(F.col("effect") == "UPDATE_IF_EXISTS")

    # conditional updates that actually hit an existing key
    target_keys = target.select(F.col(key).alias(change_key))
    cond_hits = cond_updates.join(target_keys, on=change_key, how="left_semi")

    removed_keys = (
        upserts.select(change_key)
        .unionByName(deletes.select(change_key))
        .unionByName(cond_hits.select(change_key))
        .distinct()
        .select(F.col(change_key).alias(key))
    )
    survivors = target.join(F.broadcast(removed_keys), on=key, how="left_anti")

    incoming = upserts.unionByName(cond_hits).select(F.col("new.*"))
    return survivors.unionByName(incoming)
