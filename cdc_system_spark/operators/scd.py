"""SCD Type 2 history from a change log.

The reference's replicator produces only the CURRENT state of each row
(cdc_system.py:297-350). The other canonical CDC target is the slowly-
changing-dimension history table: one row per VERSION of each record,
with its validity interval — the shape auditing, point-in-time joins,
and ML feature backfills consume ("what did customer K look like when
order O was placed?").

``scd2_from_log`` derives the full history in one pass over the audit
log: per key, order changes by ``cdc_id`` and close each version at
the NEXT change's timestamp (any operation — an UPDATE supersedes, a
DELETE tombstones). INSERT/UPDATE rows become versions; DELETE rows
emit no version but still terminate the previous one. The final
version of a live key is open-ended (``valid_to IS NULL``,
``is_current = true``).

Scale shape: one window shuffle on the key — the same partitioning the
merge path already uses, no joins, no state. For streaming, run it
inside ``foreachBatch`` over the accumulated log or maintain the
current-row set with ``net_effect_state`` and append closed versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_log(
    log: DataFrame,
    key_col: str = "record_id",
    order_col: str = "cdc_id",
    ts_col: str = "changed_at",
    payload_col: str = "new_data",
) -> DataFrame:
    """Build the SCD2 history table from an audit-schema change log.

    Returns one row per record VERSION: ``(key, version, payload,
    valid_from, valid_to, is_current)`` — ``version`` numbers the
    surviving versions per key from 1, ``valid_to`` is the timestamp of
    the superseding change (NULL while current), ``is_current`` marks
    the live version of keys whose latest operation is not DELETE.
    """
    w = Window.partitionBy(key_col).orderBy(order_col)
    # lead() runs over ALL operations BEFORE the filter: a DELETE has no
    # version row but must still terminate the previous one. (operation
    # is not a window-partition column, so Catalyst cannot push the
    # filter below the window.)
    closed = log.withColumn("_valid_to", F.lead(ts_col).over(w)).filter(
        F.col("operation").isin("INSERT", "UPDATE")
    )
    wv = Window.partitionBy(key_col).orderBy(order_col)
    return closed.select(
        F.col(key_col),
        F.row_number().over(wv).alias("version"),
        F.col(payload_col).alias("payload"),
        F.col(ts_col).alias("valid_from"),
        F.col("_valid_to").alias("valid_to"),
        F.col("_valid_to").isNull().alias("is_current"),
    )


def asof_lookup(
    history: DataFrame,
    keys_ts: DataFrame,
    key_col: str = "record_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Point-in-time join against an SCD2 history: for each (key, ts)
    probe row, return the version valid AT ``ts`` (``valid_from <= ts <
    valid_to``; open-ended versions match any later ts). The standard
    feature-backfill / audit query the history table exists for. The
    range predicate rides a key-equi join, so the shuffle is on the key
    — never a cross product.
    """
    h = history.select(
        F.col(key_col).alias("_k"),
        *[c for c in history.columns if c != key_col],
    )
    cond = (
        (keys_ts[key_col] == h["_k"])
        & (h["valid_from"] <= keys_ts[ts_col])
        & (h["valid_to"].isNull() | (h["valid_to"] > keys_ts[ts_col]))
    )
    return keys_ts.join(h, cond, "left").drop("_k")


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    key_col: str = "record_id",
    order_col: str = "cdc_id",
    ts_col: str = "changed_at",
    payload_col: str = "new_data",
) -> DataFrame:
    """Incrementally merge a change batch into an existing SCD2 history
    — the ``foreachBatch`` maintenance path (recomputing from the full
    log is O(history); this touches only the batch's keys).

    Contract (same as Delta MERGE-based SCD2 maintenance): every batch
    change is newer than everything in ``history`` for its key. Open
    versions of affected keys close at the key's FIRST batch change;
    batch INSERT/UPDATE rows chain as new versions numbered after the
    key's existing max; a trailing DELETE leaves the key tombstoned.
    Invariant: ``scd2_apply(scd2_from_log(a), b) ==
    scd2_from_log(a ∪ b)`` — property-tested in tests/test_scd.py.

    Scale shape: one window over the batch (small), one aggregate per
    affected key, joins keyed on ``key_col``; untouched keys stream
    through the union unchanged.
    """
    w = Window.partitionBy(key_col).orderBy(order_col)
    # within-batch closing (lead BEFORE the op filter, as in scd2_from_log)
    batch = changes.withColumn("_vt", F.lead(ts_col).over(w))
    firsts = changes.groupBy(key_col).agg(F.min(ts_col).alias("_first_ts"))
    # Contract guard: a batch change OLDER than a key's open version
    # would silently interleave history backwards (seen when a logical
    # batch is split across arbitrarily-ordered micro-batches). Fail
    # loudly instead — evaluated only on affected keys' open versions.
    stale = (
        F.col("is_current")
        & F.col("_first_ts").isNotNull()
        & (F.col("_first_ts") < F.col("valid_from"))
    )
    closed = (
        history.join(F.broadcast(firsts), key_col, "left")
        .withColumn(
            "valid_to",
            F.when(
                stale,
                F.raise_error(
                    F.lit(
                        "scd2_apply: batch contains a change older than an "
                        "open version — feed batches in cdc order"
                    )
                ).cast("timestamp"),
            )
            .when(
                F.col("is_current") & F.col("_first_ts").isNotNull(),
                F.col("_first_ts"),
            )
            .otherwise(F.col("valid_to")),
        )
        .withColumn(
            "is_current", F.col("is_current") & F.col("_first_ts").isNull()
        )
        .drop("_first_ts")
    )
    base = history.groupBy(key_col).agg(F.max("version").alias("_maxv"))
    new_versions = (
        batch.filter(F.col("operation").isin("INSERT", "UPDATE"))
        .withColumn("_rk", F.row_number().over(w))
        .join(F.broadcast(base), key_col, "left")
        .select(
            F.col(key_col),
            (F.col("_rk") + F.coalesce(F.col("_maxv"), F.lit(0)))
            .cast("int")
            .alias("version"),
            F.col(payload_col).alias("payload"),
            F.col(ts_col).alias("valid_from"),
            F.col("_vt").alias("valid_to"),
            F.col("_vt").isNull().alias("is_current"),
        )
    )
    return closed.unionByName(new_versions)
