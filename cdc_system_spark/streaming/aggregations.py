"""Streaming analytics: watermarked windows, sessionization, dedup.

The planned event-time surface (SURVEY §2.8 S9-S10) over an events-like
stream. Each builder takes a *streaming* DataFrame and returns the
transformed streaming DataFrame — sinks/triggers are the caller's
(tests drive them with ``availableNow`` into memory sinks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_system_spark.functions.portable import dsum


def _with_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Ensure ``ts_col`` is TIMESTAMP (with local time zone).

    ``withWatermark`` rejects TIMESTAMP_NTZ
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), and the catalog's nanos→
    ``timestamp_micros`` conversion yields NTZ on Spark 4. The session
    time zone is pinned to UTC (session.py), so the NTZ→LTZ cast is a
    pure relabeling — wall-clock values are unchanged.
    """
    from pyspark.sql import types as T

    field = df.schema[ts_col] if ts_col in df.columns else None
    if field is not None and isinstance(field.dataType, T.TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling/sliding windowed counts with late-data watermark.

    Watermark bounds state: windows older than max(event time) −
    watermark are finalized and evicted — the knob that keeps a 100 TB
    stream's state store finite.
    """
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        _with_event_time(events, ts_col).withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total_value")
    )


def sessionized(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows (dynamic gap-merged state) per key."""
    return (
        _with_event_time(events, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup within the watermark horizon (S10).

    ``dropDuplicates`` keeps per-key state; the watermark bounds it —
    the streaming twin of operators/dedup.exact_dedup.
    """
    return (
        _with_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicates([*keys, ts_col])
    )


def clicks_before_purchase(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked stream-stream inner join: each purchase paired with
    the same user's clicks in the preceding ``window``.

    Both sides carry watermarks and the join condition time-bounds the
    match, so Spark can evict click state older than watermark+window —
    without the bound, stream-stream join state grows forever. The
    batch twin (same pairs, bucketed instead of stateful) is
    operators/temporal.bucketed_range_join.
    """
    events = _with_event_time(events, ts_col)
    c = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col(ts_col).alias("c_ts"),
            F.col("value").alias("c_value"),
        )
        .withWatermark("c_ts", watermark)
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.col(ts_col).alias("p_ts"))
        .withWatermark("p_ts", watermark)
    )
    return p.join(
        c,
        F.expr(
            f"c_user = user_id AND c_ts >= p_ts - INTERVAL {window} AND c_ts < p_ts"
        ),
    )


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to
    every streamed row (user → account tier, record → table metadata —
    the lookup every CDC consumer does before routing).

    Spark re-plans the static side per micro-batch, so a small dim is
    broadcast every trigger — zero state, zero watermark, and the dim
    may be swapped under the stream (the next batch sees the new
    version; classic slowly-changing-dimension behavior). This is the
    right tool when the dim fits in memory; for dim CHANGES that must
    join against in-flight events, use a stream-stream join with
    watermarks instead.

    Left join by default: a missing dim row must not drop the event
    (inner would silently discard unroutable changes — quarantine them
    downstream instead).
    """
    from pyspark.sql import functions as _F

    return stream.join(_F.broadcast(dim), on=key, how=how)


def windowed_hll_state(
    events: DataFrame,
    value_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Distinct-count HLL STATE per event-time window: ``(w_start,
    bucket, max_rank)``, <= 64 rows per window — the streaming answer
    to "distinct users per window", which with an exact distinct
    explodes state linearly in cardinality (every seen key retained per
    open window). The HLL projection (md5 bucket + rank, the
    :func:`~cdc_system_spark.operators.sketch.hll_state` construction)
    reduces each window's state to a bounded 64-row max table that the
    watermark evicts on schedule; estimates come from
    :func:`~cdc_system_spark.operators.sketch.hll_estimate` applied
    per window on the sink (or any engine — the state is the portable
    artifact, and states for the same window from different streams
    merge by per-bucket max exactly as in batch).
    """
    src = _with_event_time(events, ts_col).withWatermark(ts_col, watermark)
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashed = src.filter(F.col(value_col).isNotNull()).select(
        F.col(ts_col), h.alias("_h")
    )
    keyed = hashed.select(
        F.col(ts_col),
        F.expr("_h % 64").alias("bucket"),
        F.when(F.expr("_h div 64") == 0, F.lit(55))
        .otherwise(F.lit(55) - F.length(F.bin(F.expr("_h div 64"))))
        .alias("_rho"),
    )
    return (
        keyed.groupBy(F.window(ts_col, window).alias("w"), F.col("bucket"))
        .agg(F.max("_rho").alias("max_rank"))
        .select(F.col("w.start").alias("w_start"), "bucket", "max_rank")
    )
