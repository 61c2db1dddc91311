"""Temporal join operators Spark lacks as builtins: as-of and range joins.

Both are implemented with the scale-correct shapes, not nested-loop
theta joins:

* **as-of join** — union both sides on the key, sort by time within each
  key partition, and forward-fill the right payload with
  ``last(ignorenulls)``. One shuffle on the key, one per-key sort (the
  same cost profile as a sort-merge join), zero row explosion — the
  classic point-in-time-correct join used for feature lookups ("most
  recent account state at event time"). A naive
  ``t.right_time <= t.left_time`` theta join is O(n·m) per key and dies
  at scale; this is O((n+m) log(n+m)).

* **bucketed range join** — each left row's time window overlaps a
  bounded number of fixed buckets; explode left into those buckets and
  equi-join on (key, bucket), then refine with the exact predicate.
  Catalyst executes a plain shuffled hash/sort-merge join on
  (key, bucket) — no BroadcastNestedLoopJoin, which is what Spark picks
  for raw interval predicates.

Skew note: both shapes shuffle on the join key; a hot key (one user with
millions of events) serializes in one task. AQE skew-join splits the
equi-join case; for the window-based as-of, pre-split hot keys by
salting the *right* side per salt bucket if profiling shows it.

Reference scope: arya23923/cdc-system has no joins at all (SURVEY §2.3 —
its apply loop is a per-row key probe, cdc_system.py:331-350); these
operators are part of the driver-mandated analytics surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    by_left: str,
    by_right: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Point-in-time join: for each left row, the single right row with
    the greatest ``right_time <= left_time`` (backward) or smallest
    ``right_time >= left_time`` (forward) for the same key.

    Unmatched left rows keep null payloads (left-join semantics). Right
    rows that tie on (key, time) are deduplicated deterministically
    (greatest payload struct wins) so the result is unique and
    reproducible by an external ASOF JOIN oracle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    payload = F.struct(*[F.col(c) for c in payload_cols])
    # unique (key, time) on the right: deterministic winner for ties
    r_dedup = (
        right.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(by_right, right_time).orderBy(payload.desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    r_side = r_dedup.select(
        F.col(by_right).alias("_key"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        payload.alias("_payload"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields],
    )
    l_side = left.select(
        F.col(by_left).alias("_key"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r_side.schema["_payload"].dataType).alias("_payload"),
        *left.columns,
    )
    # backward: right rows sort BEFORE left rows at equal time (<= match);
    # forward: reverse time so the same forward-fill finds the next value.
    t_order = [F.col("_t"), F.col("_is_left")]
    if direction == "forward":
        t_order = [F.col("_t").desc(), F.col("_is_left")]
    w = (
        Window.partitionBy("_key")
        .orderBy(*t_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_side.unionByName(r_side).withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_is_left") == 1).select(
        *left.columns, *[F.col(f"_match.{c}").alias(c) for c in payload_cols]
    )


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    by_left: str,
    by_right: str,
    left_time: str,
    right_time: str,
    window_seconds: int,
    closed_right: bool = False,
) -> DataFrame:
    """Interval join: pairs where ``right_time ∈ [left_time - window,
    left_time)`` (or ``(…]`` with ``closed_right``) for the same key.

    Buckets of ``window_seconds`` mean each left window spans at most two
    buckets; left explodes ×2, joins on (key, bucket) as a plain
    equi-join, then the exact predicate filters. Each right row lives in
    exactly one bucket, so no pair deduplication is needed.

    Returns the matched pairs with all left columns plus the right
    key/time and right payload columns (right columns keep their names;
    callers project/aggregate on top).
    """
    if left_time == right_time:
        raise ValueError("left_time and right_time column names must differ")
    bs = int(window_seconds)

    # The bucket axis must be LINEAR in the same terms the refine
    # predicate compares, or two rows within window_seconds of each
    # other can land >1 bucket apart and the candidate pair is silently
    # dropped. TIMESTAMP (instant) comparisons are linear in epoch
    # seconds → cast→double (keeps sub-second precision). TIMESTAMP_NTZ
    # comparisons are wall-clock → cast('timestamp') would route through
    # the session time zone, which is NON-linear across DST fall-back;
    # bucket instead on wall-clock seconds since a fixed NTZ epoch
    # (timestampdiff truncates to whole seconds, which still keeps each
    # window inside 2 adjacent buckets because bs is a whole number of
    # seconds and epochs are positive for all supported data).
    from pyspark.sql import types as T

    def _is_ntz(df: DataFrame, c: str) -> bool:
        return isinstance(df.schema[c].dataType, T.TimestampNTZType)

    l_ntz, r_ntz = _is_ntz(left, left_time), _is_ntz(right, right_time)
    if l_ntz != r_ntz:
        raise ValueError(
            "left_time and right_time must both be TIMESTAMP or both "
            "TIMESTAMP_NTZ — mixing instant and wall-clock axes makes the "
            "range predicate ill-defined"
        )

    def _axis(c: str, ntz: bool) -> Column:
        if ntz:
            return F.expr(
                f"timestampdiff(SECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', `{c}`)"
            ).cast("double")
        return F.col(c).cast("timestamp").cast("double")

    l_bucket = F.floor(_axis(left_time, l_ntz) / bs)
    r_bucket = F.floor(_axis(right_time, r_ntz) / bs)

    l_exp = left.withColumn(
        "_bucket", F.explode(F.array(l_bucket - 1, l_bucket))
    ).withColumn("_lkey", F.col(by_left))
    r_tag = right.withColumn("_bucket", r_bucket).withColumn("_rkey", F.col(by_right))

    joined = l_exp.join(
        r_tag, on=[l_exp["_lkey"] == r_tag["_rkey"], l_exp["_bucket"] == r_tag["_bucket"]]
    )
    lo = F.col(left_time) - F.expr(f"INTERVAL {bs} SECONDS")
    rt = F.col(right_time)
    in_window = (
        (rt > lo) & (rt <= F.col(left_time))
        if closed_right
        else (rt >= lo) & (rt < F.col(left_time))
    )
    return joined.filter(in_window).drop("_bucket", "_lkey", "_rkey")


def gap_fill(
    df: DataFrame,
    time_col: str,
    group_cols: list[str],
    step: str = "1 hour",
    agg_exprs: dict[str, Column] | None = None,
    ffill_cols: list[str] | None = None,
) -> DataFrame:
    """Dense per-group time series from sparse events: bucket rows to
    ``time_col`` (already truncated by the caller), aggregate per
    (group, bucket), then LEFT-join onto the complete (group × bucket)
    grid spanning the corpus's [min, max] bucket — count-like columns
    zero-fill, columns named in ``ffill_cols`` carry the last observed
    value forward (gaps before a group's first observation stay NULL,
    which is honest: nothing has been observed yet).

    Time-series consumers (drift monitors, forecast featurizers,
    anomaly scorers) assume dense series; raw CDC/event feeds are
    sparse exactly where the interesting things happen (outages emit
    nothing). This is the missing-bucket materializer.

    Scale shape: the grid is (distinct groups) × (span/step) rows —
    built with NO join at all: one per-group min/max aggregate
    (group-count-sized), a whole-frame window that spreads the global
    [min, max] onto those rows (one exchange of the group-count-sized
    frame — a constant-key equi join would constant-fold into the
    BroadcastNestedLoopJoin the plan audit forbids), then one
    ``sequence`` explode; the only data-sized shuffles are the
    per-bucket aggregation and the grid join, both on (group, bucket).
    The forward-fill window is one pass per group ordered by bucket —
    at 100 TB spans, partition the fill by (group, coarse window) and
    seed each with the previous window's closing value.

    ``agg_exprs``: output-column → aggregate expression over the
    bucket's rows (default ``{"n_events": F.count("*")}``).
    """
    agg_exprs = agg_exprs or {"n_events": F.count(F.lit(1))}
    ffill_cols = ffill_cols or []
    unknown = [c for c in ffill_cols if c not in agg_exprs]
    if unknown:
        raise ValueError(
            f"ffill_cols not in agg_exprs: {unknown} (have {list(agg_exprs)})"
        )
    bucketed = df.select(*group_cols, F.col(time_col).alias("_bucket"))
    per_bucket = (
        df.groupBy(*group_cols, F.col(time_col).alias("_bucket"))
        .agg(*[e.alias(name) for name, e in agg_exprs.items()])
        .localCheckpoint(eager=False)
    )
    gspan = bucketed.groupBy(*group_cols).agg(
        F.min("_bucket").alias("_glo"), F.max("_bucket").alias("_ghi")
    )
    w_all = Window.partitionBy(F.lit(1))
    grid = (
        gspan.withColumn("_lo", F.min("_glo").over(w_all))
        .withColumn("_hi", F.max("_ghi").over(w_all))
        .select(
            *group_cols,
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step}"))
            ).alias("_bucket"),
        )
    )
    # buckets NOT aligned to the step grid (caller truncated finer than
    # ``step``) must not vanish in the left join below — union them in
    # as their own rows, so the output is the dense grid PLUS every
    # observed off-grid bucket (for aligned callers, observed ⊆ grid
    # and this is a no-op)
    grid = grid.unionByName(
        per_bucket.select(*group_cols, "_bucket")
    ).distinct()
    out = grid.join(per_bucket, [*group_cols, "_bucket"], "left")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for name in agg_exprs:
        if name in ffill_cols:
            out = out.withColumn(name, F.last(name, ignorenulls=True).over(w))
        else:
            # zero of the column's own aggregate type, not a blind long
            zero = F.lit(0).cast(per_bucket.schema[name].dataType)
            out = out.withColumn(name, F.coalesce(F.col(name), zero))
    return out.withColumnRenamed("_bucket", "bucket")
