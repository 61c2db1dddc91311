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


def _interval_ms(s: str) -> int:
    """Parse the interval strings Spark's ``window()`` /
    ``withWatermark`` accept — one or MORE ``"N unit"`` parts
    (``"1 hour"``, ``"1 hour 30 minutes"``, ``"2 weeks"``) — to
    milliseconds, enough to place a window's end on the event-time
    axis for state eviction. Anything else raises a ValueError naming
    the supported grammar (pre-r8 this parsed only single-part
    strings, so compound intervals Spark itself accepts crashed the
    plan build — the r7 advisor's finding)."""
    # microseconds carried at 1/1000 ms so Spark-accepted forms like
    # "100000 microseconds" parse; a sub-millisecond REMAINDER raises
    # explicitly below (the eviction math is epoch-ms — silently
    # truncating would misplace window ends)
    mult_us = {
        "microsecond": 1,
        "millisecond": 1_000,
        "second": 1_000_000,
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
        "week": 604_800_000_000,
    }
    # lower() BEFORE rstrip: "HOURS".rstrip("s") keeps its capital S
    toks = s.strip().lower().split()
    err = ValueError(
        f"unsupported interval {s!r}: expected one or more 'N unit' "
        f"parts with unit in {sorted(mult_us)} (plural accepted), "
        "each unit at most once, e.g. '1 hour 30 minutes'"
    )
    if not toks or len(toks) % 2:
        raise err
    total_us = 0
    seen: set[str] = set()
    for n, unit in zip(toks[::2], toks[1::2]):
        u = unit.rstrip("s")
        # repeated units ("1 hour 2 hours") are rejected — Spark's
        # CalendarInterval grammar treats them differently from the
        # naive sum, so accepting them here would silently diverge
        if (
            u not in mult_us
            or u in seen
            or not n.lstrip("-").isdigit()
            or int(n) < 0
        ):
            raise err
        seen.add(u)
        total_us += int(n) * mult_us[u]
    if total_us % 1_000:
        raise ValueError(
            f"interval {s!r} has a sub-millisecond remainder "
            f"({total_us} us): window eviction runs on epoch "
            "milliseconds — use a whole number of milliseconds"
        )
    return total_us // 1_000


def _require_arrow_resolvable_tz(tz: str) -> None:
    """Fail fast when the session zone would crash Spark's Arrow
    serializer mid-stream. Spark itself accepts offset forms like
    ``'GMT+08:00'`` / ``'UTC+2'`` for ``spark.sql.session.timeZone``,
    but the Python worker localizes every timestamp column crossing an
    Arrow stage via pytz/ZoneInfo, which reject those forms — so a
    stateful query that carries its watermark column (the analyzer
    requires it in the stateful input) would die inside a task with a
    bare ``UnknownTimeZoneError``. Raise at plan build instead, naming
    the IANA equivalent. Bare ``±HH:MM`` offsets are exempt — pyarrow
    parses those natively."""
    import re

    try:
        from zoneinfo import ZoneInfo

        ZoneInfo(tz)
        return
    except Exception:
        pass
    if re.fullmatch(r"[+-]\d{2}:\d{2}", tz.strip()):
        return  # pyarrow's own offset grammar
    m = re.fullmatch(r"(?:GMT|UTC)([+-])(\d{1,2})(?::?(\d{2}))?", tz.strip())
    hint = ""
    if m and m.group(3) in (None, "00"):
        inv = "-" if m.group(1) == "+" else "+"
        hint = (
            f"; e.g. set spark.sql.session.timeZone to "
            f"'Etc/GMT{inv}{int(m.group(2))}' (IANA Etc zones invert "
            f"the sign) or to the bare offset '{m.group(1)}"
            f"{int(m.group(2)):02d}:{m.group(3) or '00'}'"
        )
    raise ValueError(
        f"session timeZone {tz!r} is not resolvable by the Arrow "
        "serializer (pytz/ZoneInfo): timestamp columns crossing the "
        "stateful Arrow stage would crash at runtime — use an IANA "
        "zone or a bare ±HH:MM offset" + hint
    )


def windowed_kmv_state(
    events: DataFrame,
    value_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    k: int = 64,
) -> DataFrame:
    """Distinct-value KMV STATE per event-time window: ``(w_start, h,
    emit_seq, final)``, ≤ k ``h`` rows per window per emission — the
    set-algebra sibling of :func:`windowed_hll_state`. Where the HLL
    state answers "how many distinct per window", the KMV state also
    answers the CROSS-STREAM questions (``kmv_intersect`` of two
    streams' same-window states: how much content do two pipelines
    share this hour? ``kmv_merge`` across shards), because bottom-k
    over a hash set is a uniform sample that supports intersection.

    The ungrouped form of :func:`windowed_kmv_state_by` — all
    semantics (eviction, late-row contract, tz-independence,
    bit-for-bit batch parity) are documented and implemented there.
    """
    return windowed_kmv_state_by(
        events, [], value_col, window=window, watermark=watermark,
        ts_col=ts_col, k=k,
    )


def windowed_kmv_state_by(
    events: DataFrame,
    group_cols: list[str],
    value_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    k: int = 64,
) -> DataFrame:
    """Distinct-value KMV STATE per (group, event-time window):
    ``(*group_cols, w_start, h, emit_seq, final)``, ≤ k ``h`` rows per
    group×window per emission — the streaming twin of
    :func:`~cdc_system_spark.operators.sketch.kmv_state_by`, exactly as
    the ungrouped :func:`windowed_kmv_state` twins ``kmv_state``
    ("distinct users per event type per hour", the per-tenant /
    per-shard form of every cross-stream set-algebra question).

    Built on ``applyInPandasWithState`` keyed by (*group_cols, window
    start's JVM-computed ``unix_millis``) — the output timestamp is
    restored JVM-side AFTER the stateful operator, so the Python side
    never re-derives epoch ms from a session-tz-naive datetime and the
    eviction math is timezone-independent by construction. The
    watermark column itself must still cross the Arrow stage (the
    analyzer requires it in the stateful input), and Spark's Arrow
    serializer cannot localize timestamps under the offset-form zones
    Spark otherwise accepts (``'GMT+08:00'``, ``'UTC+2'``) — that
    engine-wide limit is converted into a clear plan-build error with
    the IANA equivalent (:func:`_require_arrow_resolvable_tz`) instead
    of a mid-stream task crash. Bottom-k is order-sensitive, so unlike
    HLL's per-bucket max it is not expressible as a bounded built-in
    aggregation; the state store holds exactly the ≤ k smallest hashes
    per open key (sorted array), each micro-batch folds its distinct
    hashes in (idempotent set union, so at-least-once replays are
    harmless), and every emission carries a monotone ``emit_seq`` —
    consumers keep the max-seq rows per key. The hash mapping is
    IDENTICAL to the batch operators (computed JVM-side before the
    Arrow stage), so a key's final streamed state equals the batch
    state over that key's rows bit-for-bit.

    State is doubly bounded: ≤ k longs per group×window by
    construction, and keys are evicted on event time — each update
    arms a timeout at window end (clamped above the current
    watermark), and once the WATERMARK passes it on a trigger without
    data for that key, the state is emitted once more with ``final =
    true`` and removed. Late-row contract (applyInPandasWithState does
    NOT pre-filter on the watermark): rows for a still-OPEN key always
    fold — even technically-late ones, which is what keeps an
    at-least-once, arbitrarily-ordered drain bit-for-bit equal to
    batch — while rows for an already-FINALIZED key are dropped
    instead of resurrecting a partial state that would shadow the
    final one. That is the finite-state contract a 100 TB stream needs
    spelled out, not implied. Group-key cardinality multiplies the
    state bound (G groups × open windows × k longs) — group on
    bounded-cardinality dimensions, the same contract as any streaming
    groupBy.
    """
    from collections.abc import Iterator
    from typing import Any

    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    win_ms = _interval_ms(window)
    _require_arrow_resolvable_tz(
        events.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
    )
    by_type = {f.name: f.dataType for f in events.schema.fields}
    missing = [g for g in group_cols if g not in by_type]
    if missing:
        raise ValueError(
            f"group_cols {missing} not in the stream schema "
            f"{sorted(by_type)}"
        )
    out_schema = T.StructType(
        [T.StructField(g, by_type[g]) for g in group_cols]
        + [
            T.StructField("w_start_ms", T.LongType()),
            T.StructField("h", T.LongType()),
            T.StructField("emit_seq", T.LongType()),
            T.StructField("final", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("hs", T.ArrayType(T.LongType())),
            T.StructField("seq", T.LongType()),
        ]
    )
    n_groups = len(group_cols)

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator["object"],
        state: GroupState,
    ) -> Iterator["object"]:
        import pandas as pd

        def emit(hs: list[int], seq: int, final: bool) -> pd.DataFrame:
            data = {
                g: pd.Series([key[i]] * len(hs))
                for i, g in enumerate(group_cols)
            }
            data["w_start_ms"] = pd.Series(
                [int(key[n_groups])] * len(hs), dtype="int64"
            )
            data["h"] = pd.Series(hs, dtype="int64")
            data["emit_seq"] = pd.Series([seq] * len(hs), dtype="int64")
            data["final"] = [final] * len(hs)
            return pd.DataFrame(data)

        if state.hasTimedOut:
            hs, seq = state.get
            state.remove()
            yield emit(list(hs), seq + 1, True)
            return

        # the last key element IS the epoch ms, computed JVM-side —
        # no tz round-trip
        win_end = int(key[n_groups]) + win_ms
        wm = state.getCurrentWatermarkMs()
        if not state.exists and wm > win_end:
            # stragglers for a key already finalized and evicted
            # (applyInPandasWithState does NOT pre-filter late rows):
            # resurrecting a partial state would shadow the final one,
            # so they drop here — the standard watermark contract
            yield emit([], 0, False).iloc[0:0]
            return

        hs, seq = (list(state.get[0]), state.get[1]) if state.exists else ([], 0)
        merged = set(hs)
        for pdf in pdfs:
            merged.update(int(x) for x in pdf["h"])
        hs = sorted(merged)[:k]
        seq += 1
        state.update((hs, seq))
        # finalize when the watermark passes window end; a key kept
        # open past its end by in-flight batches (timeouts only fire on
        # data-free triggers) re-arms just above the current watermark
        state.setTimeoutTimestamp(max(win_end, wm + 1))
        yield emit(hs, seq, False)

    src = _with_event_time(events, ts_col).withWatermark(ts_col, watermark)
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    keyed = (
        src.filter(F.col(value_col).isNotNull())
        .select(
            *[F.col(g) for g in group_cols],
            F.window(ts_col, window).alias("w"),
            h.alias("h"),
            F.col(ts_col),
        )
        # ts_col stays ONLY because the analyzer requires the
        # watermark-tagged attribute in the stateful input; the key and
        # the Python-side math are the epoch-ms long
        .select(
            *group_cols,
            F.unix_millis(F.col("w.start")).alias("w_start_ms"),
            "h",
            ts_col,
        )
    )
    state = keyed.groupBy(*group_cols, "w_start_ms").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.EventTimeTimeout
    )
    return state.select(
        *group_cols,
        F.timestamp_millis(F.col("w_start_ms")).alias("w_start"),
        "h",
        "emit_seq",
        "final",
    )


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
    open window). The ungrouped form of :func:`windowed_hll_state_by`
    (see there for the construction and state-bound discussion)."""
    return windowed_hll_state_by(
        events, [], value_col, window=window, watermark=watermark,
        ts_col=ts_col,
    )


def windowed_hll_state_by(
    events: DataFrame,
    group_cols: list[str],
    value_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Distinct-count HLL STATE per (group, event-time window):
    ``(*group_cols, w_start, bucket, max_rank)``, <= 64 rows per
    group×window — the streaming twin of
    :func:`~cdc_system_spark.operators.sketch.hll_state_by`, exactly
    as :func:`windowed_kmv_state_by` twins ``kmv_state_by`` ("distinct
    users per event type per hour"). This closes the one asymmetry in
    the streaming sketch family: KMV had scalar + grouped streaming
    forms, HLL only scalar.

    Unlike the KMV form, HLL needs no ``applyInPandasWithState``: the
    per-bucket max IS a bounded built-in aggregation, so this is a
    plain watermarked windowed ``groupBy`` — Spark's own streaming
    aggregation state holds ≤ 64 (bucket, max_rank) rows per
    group×window and evicts them when the watermark passes the window
    (exact distinct under the same groupBy would retain every seen
    key per open window instead). The md5 bucket/rank projection
    (:func:`~cdc_system_spark.operators.sketch.hll_state`
    construction) runs map-side before the aggregation, so a key's
    final streamed state equals the batch ``hll_state_by`` over that
    key's rows bit-for-bit; estimates come from
    :func:`~cdc_system_spark.operators.sketch.hll_estimate` per
    group×window on the sink, and same-window states from different
    streams merge by per-bucket max exactly as in batch. Group-key
    cardinality multiplies the state bound (G groups × open windows ×
    64 rows) — group on bounded-cardinality dimensions, the same
    contract as any streaming groupBy."""
    by_type = {f.name for f in events.schema.fields}
    missing = [g for g in group_cols if g not in by_type]
    if missing:
        raise ValueError(
            f"group_cols {missing} not in the stream schema "
            f"{sorted(by_type)}"
        )
    src = _with_event_time(events, ts_col).withWatermark(ts_col, watermark)
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashed = src.filter(F.col(value_col).isNotNull()).select(
        *group_cols, F.col(ts_col), h.alias("_h")
    )
    keyed = hashed.select(
        *group_cols,
        F.col(ts_col),
        F.expr("_h % 64").alias("bucket"),
        F.when(F.expr("_h div 64") == 0, F.lit(55))
        .otherwise(F.lit(55) - F.length(F.bin(F.expr("_h div 64"))))
        .alias("_rho"),
    )
    return (
        keyed.groupBy(
            F.window(ts_col, window).alias("w"),
            *[F.col(g) for g in group_cols],
            F.col("bucket"),
        )
        .agg(F.max("_rho").alias("max_rank"))
        .select(
            *group_cols, F.col("w.start").alias("w_start"), "bucket",
            "max_rank",
        )
    )


def windowed_bloom_state(
    events: DataFrame,
    value_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    num_bits: int = 8192,
    num_hashes: int = 3,
) -> DataFrame:
    """Membership Bloom STATE per event-time window: the ungrouped
    form of :func:`windowed_bloom_state_by` (see there)."""
    return windowed_bloom_state_by(
        events, [], value_col, window=window, watermark=watermark,
        ts_col=ts_col, num_bits=num_bits, num_hashes=num_hashes,
    )


def windowed_bloom_state_by(
    events: DataFrame,
    group_cols: list[str],
    value_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    num_bits: int = 8192,
    num_hashes: int = 3,
) -> DataFrame:
    """Membership Bloom STATE per (group, event-time window):
    ``(*group_cols, w_start, bit)``, ≤ ``num_bits`` rows per
    group×window — completes the streaming sketch family (HLL and KMV
    both have scalar + grouped windowed forms; Bloom answers the
    MEMBERSHIP question the other two cannot: "did key k appear in
    window w?", with no false negatives). Use cases: per-window
    dedup/bounce probes, "seen this hour" gates, per-day join
    pre-filters shipped to another pipeline.

    Like the HLL form — and unlike KMV's order-sensitive bottom-k —
    the set-bit table IS a bounded built-in aggregation (k-way bit
    explode + per-(group, window, bit) first-seen), so this is a
    plain watermarked windowed ``groupBy`` whose state Spark bounds
    at ≤ num_bits rows per group×window and evicts on the watermark.
    The md5 bit mapping is the batch :func:`~cdc_system_spark
    .operators.bloom.bloom_build` construction computed map-side, so
    a window's final streamed bit set equals the batch
    ``bloom_build_by`` over that window's rows exactly; same-geometry
    states merge by union + distinct (bitmap OR). In update mode a
    bit row re-emits whenever re-touched — set-bit rows are
    idempotent membership facts, so sinks dedupe by (group, w_start,
    bit) or simply overwrite. Group-key cardinality multiplies the
    state bound, the standard streaming-groupBy contract."""
    from cdc_system_spark.operators.bloom import _bit

    if num_bits < 8:
        raise ValueError(f"num_bits must be >= 8, got {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    by_type = {f.name for f in events.schema.fields}
    missing = [g for g in group_cols if g not in by_type]
    if missing:
        raise ValueError(
            f"group_cols {missing} not in the stream schema "
            f"{sorted(by_type)}"
        )
    src = _with_event_time(events, ts_col).withWatermark(ts_col, watermark)
    c = F.col(value_col)
    bits = src.filter(c.isNotNull()).select(
        *group_cols,
        F.col(ts_col),
        F.explode(
            F.array(*[_bit(i, c, num_bits) for i in range(num_hashes)])
        ).alias("bit"),
    )
    return (
        bits.groupBy(
            F.window(ts_col, window).alias("w"),
            *[F.col(g) for g in group_cols],
            F.col("bit"),
        )
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(*group_cols, F.col("w.start").alias("w_start"), "bit")
    )
