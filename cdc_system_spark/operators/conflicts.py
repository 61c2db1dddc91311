"""Conflict resolution for concurrent changes to the same key.

The reference *names* four strategies and implements none of them — its
conflict demo prints a description and returns (example_usage.py:236-252:
last-write-wins, first-write-wins, manual, merge). Here all four are
real, set-oriented, single-shuffle operators over the audit-schema
change stream:

* ``lww`` / ``fww`` — keep the latest / earliest change per key (one
  ``row_number`` window);
* ``manual`` — :func:`split_manual` separates keys with exactly one
  change (safe to auto-apply) from keys with competing changes (routed
  to a review sink, the reference's "manual resolution" queue);
* ``merge`` — :func:`field_merge` builds one image per key taking, for
  every field independently, the value from the latest change where that
  field is non-null (field-level last-writer-wins — the classic CRDT-ish
  column merge).

All four agree with external SQL semantics (``max_by``/``min_by`` with
null-condition ordering ignores null order keys in both Spark and
DuckDB), so they are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def resolve(
    changes: DataFrame,
    key: str = "record_id",
    order: str = "cdc_id",
    strategy: str = "lww",
) -> DataFrame:
    """One winning change row per key under ``lww`` or ``fww``."""
    if strategy not in ("lww", "fww"):
        raise ValueError(f"resolve() handles lww|fww, got {strategy!r}")
    ordering = F.col(order).desc() if strategy == "lww" else F.col(order).asc()
    w = Window.partitionBy(key).orderBy(ordering)
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def split_manual(
    changes: DataFrame, key: str = "record_id"
) -> tuple[DataFrame, DataFrame]:
    """(auto_applicable, needs_review): keys with a single change apply
    automatically; keys with competing changes route to review.

    One aggregation to find contested keys, then two broadcast
    semi/anti joins — the change batch is small next to the target, so
    nothing large shuffles.
    """
    contested = (
        changes.groupBy(key).agg(F.count("*").alias("_n")).filter(F.col("_n") > 1)
    ).select(key)
    auto = changes.join(F.broadcast(contested), on=key, how="left_anti")
    review = changes.join(F.broadcast(contested), on=key, how="left_semi")
    return auto, review


def field_merge(
    changes: DataFrame,
    key: str = "record_id",
    order: str = "cdc_id",
    image_col: str = "new",
) -> DataFrame:
    """Field-level LWW merge: one image per key; each field takes its
    value from the latest change where that field is non-null.

    ``image_col`` must be a struct column. Single hash aggregation —
    ``max_by(field, order-if-field-non-null)`` per field; null order
    keys are ignored by max_by, which is exactly "skip changes that
    didn't touch this field".
    """
    image_type = changes.schema[image_col].dataType
    if not isinstance(image_type, T.StructType):
        raise ValueError(f"{image_col} must be a struct column, got {image_type}")
    aggs = [
        F.max_by(
            F.col(f"{image_col}.{f.name}"),
            F.when(F.col(f"{image_col}.{f.name}").isNotNull(), F.col(order)),
        ).alias(f.name)
        for f in image_type.fields
    ]
    return changes.groupBy(key).agg(*aggs, F.max(order).alias(order))
