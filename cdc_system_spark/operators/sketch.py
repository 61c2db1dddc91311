"""Engine-portable cardinality sketching.

Spark's own ``approx_count_distinct`` is a HyperLogLog++ whose hash
(xxHash64 with Spark seeds) and merge internals no external engine
reproduces — fine for interactive estimates, unusable under this
package's oracle convention (every result reproducible bit-for-bit by
an independent SQL engine). ``hll_distinct`` is the portable variant:
the classic HyperLogLog estimator (Flajolet et al., AofA 2007) over the
md5-derived 60-bit hash every other portable operator here uses, with
all engine-divergence points removed — no ``ln``/``log2`` (bucket rank
via binary-string length, the small-range correction dropped), exact
powers of two rounded to a fixed scale before a decimal-accumulated
sum. The trade is documented bias at tiny cardinalities (where an exact
``COUNT(DISTINCT ...)`` is cheap anyway); at the scale where a sketch
matters the raw estimator is the estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed sketch width: 64 buckets (6 index bits of the 60-bit hash),
#: 54-bit rank field. alpha_64 = 0.709 exactly (the paper's table
#: value for m = 64 — a rational constant, no 0.7213/(1+1.079/m)
#: evaluation that engines could round differently).
_M = 64
_ALPHA_M = 0.709
_RANK_BITS = 54


def hll_distinct(
    df: DataFrame,
    value_col: str,
    decimals: int = 4,
) -> DataFrame:
    """HyperLogLog distinct-count estimate of ``value_col`` as one row
    ``(n_est, n_empty_buckets)``. Deterministic and engine-exact:
    same input ⇒ same estimate on any partitioning and in any SQL
    engine with md5 (the DuckDB oracle reproduces it bit-for-bit).

    Standard error is ~1.04/√64 ≈ 13% — the classic m = 64 trade; the
    point here is the *shape*, which is what survives 100 TB: one
    map-side projection (hash → bucket, rank), one 64-group max
    aggregation (map-side combine reduces every partition to ≤ 64
    rows, so the shuffle moves ~64 × partitions tiny rows regardless
    of input size), one 64-row fold for the harmonic sum. NULLs are
    ignored, matching ``COUNT(DISTINCT ...)``.

    Portability notes (each removes an engine-divergence point):
    ``rho`` (leading-zero rank) comes from ``length(bin(w))`` — both
    Spark and DuckDB print minimal binary — instead of ``log2``;
    ``2^-rho`` is exact in double, rounded to 18 decimals (a value
    whose decimal expansion never lands on the half-way boundary, see
    ``pagerank``'s boundary discussion) and summed through an exact
    DECIMAL accumulator; the HLL small-range linear-counting
    correction needs ``ln`` and is deliberately dropped — the raw
    estimator biases high below ~2.5·m (≈160) distinct values, where
    exact counting is the right tool anyway (``n_empty_buckets`` > 0
    flags the regime). One exception is exact and free: an EMPTY input
    (all 64 buckets empty) short-circuits to ``n_est = 0`` instead of
    the raw estimator's ≈45.38, so a caller who ignores
    ``n_empty_buckets`` never mistakes zero distinct values for a real
    estimate.
    """
    return hll_estimate(hll_state(df, value_col), decimals)


def hll_state(df: DataFrame, value_col: str) -> DataFrame:
    """The HLL sketch as a TABLE artifact: ``(bucket, max_rank)``,
    <= 64 rows — the maintained form for incremental pipelines. Build
    one per shard/partition/day, store it, and combine with
    :func:`hll_merge`: the merge of states equals the state of the
    union (max is idempotent/commutative/associative), so a corpus
    sketch never rebuilds from raw data. Absent buckets are implicit
    rank 0 (states stay sparse). The ungrouped form of
    :func:`hll_state_by` (one construction — the bit-for-bit
    state-equality contract between the scalar, grouped, and streaming
    forms is load-bearing for the oracle gate, so the md5/bucket/rank
    math exists exactly once)."""
    return hll_state_by(df, [], value_col)


def hll_state_by(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group HLL sketch as a TABLE artifact: ``(*group_cols,
    bucket, max_rank)``, <= 64 rows per group — the grouped twin of
    :func:`hll_state`, exactly as ``kmv_state_by`` twins ``kmv_state``.
    Same engine-exact md5/bucket/rank construction (so a group's state
    equals the scalar :func:`hll_state` over that group's rows
    bit-for-bit, and the streaming ``windowed_hll_state_by`` is proven
    equal to THIS shape); states stay sparse (absent buckets are
    implicit rank 0) and merge per group by union + per-(group,
    bucket) max. Map-side combine bounds the shuffle at ≤ 64 rows per
    group per partition regardless of input size."""
    h = F.conv(F.substring(F.md5(F.col(value_col)), 1, 15), 16, 10).cast(
        "long"
    )
    vals = df.select(*group_cols, h.alias("_h")).filter(
        F.col("_h").isNotNull()
    )
    bucket = F.expr("_h % 64").alias("bucket")
    w = F.expr("_h div 64")
    rho = (
        F.when(w == 0, F.lit(_RANK_BITS + 1))
        .otherwise(F.lit(_RANK_BITS + 1) - F.length(F.bin(w)))
        .alias("_rho")
    )
    return (
        vals.select(*group_cols, bucket, rho)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rho").alias("max_rank"))
    )


def hll_merge(*states: DataFrame) -> DataFrame:
    """OR-combine HLL states (union + per-bucket max) — the lossless
    merge that makes the sketch incrementally maintainable: estimate
    (merge of shard states) == estimate(whole corpus), bit-for-bit,
    proven by ``q_hll_merged``'s oracle being the WHOLE-corpus SQL.
    The ungrouped form of :func:`hll_merge_by` (one copy of the merge,
    same single-construction rule as :func:`hll_state`)."""
    return hll_merge_by(*states, group_cols=[])


def hll_merge_by(
    *states: DataFrame, group_cols: list[str]
) -> DataFrame:
    """OR-combine per-group HLL states (the :func:`hll_state_by`
    shape) WITHIN each group: union + per-(group, bucket) max — the
    grouped twin of :func:`hll_merge`, which would collapse every
    group into one global 64-bucket state. Groups absent from one
    input pass through from the other (union semantics); the merge is
    lossless, so merged-per-group == rebuilt-per-group exactly
    (``q_hll_merged_by``'s oracle is the whole-corpus per-group SQL).
    Completes the grouped maintained-sketch symmetry with
    ``kmv_merge_by``."""
    if not states:
        raise ValueError("states must be non-empty")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "bucket").agg(
        F.max("max_rank").alias("max_rank")
    )


def hll_estimate_by(
    state: DataFrame, group_cols: list[str], decimals: int = 4
) -> DataFrame:
    """Per-group ``(*group_cols, n_est, n_empty_buckets)`` from a
    grouped state table — the same exact harmonic-sum arithmetic as
    :func:`hll_distinct_by` (absent buckets contribute their
    ``2^0 = 1`` terms arithmetically: ``64 - count(present)``, never a
    per-group completion join). With :func:`hll_state_by` /
    :func:`hll_merge_by` this is the read side of the grouped
    maintained path: per-shard grouped states stored and merged, raw
    data never re-read."""
    term = F.round(F.pow(F.lit(2.0), -F.col("max_rank")), 18)
    agg = state.filter(F.col("max_rank") > 0).groupBy(*group_cols).agg(
        (
            F.sum(term.cast("decimal(25,18)"))
            + (F.lit(_M) - F.count("*")).cast("decimal(25,18)")
        )
        .cast("double")
        .alias("_s"),
        (F.lit(_M) - F.count("*")).cast("long").alias("n_empty_buckets"),
    )
    return agg.select(
        *group_cols,
        F.when(F.col("n_empty_buckets") == _M, F.lit(0.0))
        .otherwise(
            F.round(F.lit(_ALPHA_M * _M * _M) / F.col("_s"), decimals)
        )
        .alias("n_est"),
        "n_empty_buckets",
    )


def hll_estimate(state: DataFrame, decimals: int = 4) -> DataFrame:
    """One-row ``(n_est, n_empty_buckets)`` from a state table — the
    same exact harmonic-sum arithmetic as :func:`hll_distinct` (absent
    buckets contribute ``2^0 = 1`` arithmetically, as in
    :func:`hll_distinct_by`)."""
    term = F.round(F.pow(F.lit(2.0), -F.col("max_rank")), 18)
    agg = state.filter(F.col("max_rank") > 0).agg(
        (
            F.coalesce(
                F.sum(term.cast("decimal(25,18)")), F.lit(0).cast("decimal(25,18)")
            )
            + (F.lit(_M) - F.count("*")).cast("decimal(25,18)")
        )
        .cast("double")
        .alias("_s"),
        (F.lit(_M) - F.count("*")).cast("long").alias("n_empty_buckets"),
    )
    return agg.select(
        F.when(F.col("n_empty_buckets") == _M, F.lit(0.0))
        .otherwise(
            F.round(F.lit(_ALPHA_M * _M * _M) / F.col("_s"), decimals)
        )
        .alias("n_est"),
        "n_empty_buckets",
    )


#: Count-Min geometry: 4 independent md5-derived hash rows × 1024
#: buckets. Collision over-estimate per row ~ N/1024; min over 4 rows.
_CM_ROWS = 4
_CM_WIDTH = 1024


def _cm_bucket(row: int, term) -> "F.Column":
    """Bucket index of ``term`` in sketch row ``row`` — md5-derived,
    reproducible in any engine (same contract as md5_i64)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"cm{row}:"), term)), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return (h % _CM_WIDTH).cast("int")


def countmin_estimates(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Count-Min frequency estimates (Cormode & Muthukrishnan, J.Alg
    2005) for ``terms`` over the whitespace tokens of ``text_col`` —
    one row per queried term: ``(term, est_count, exact_count)``. The
    sketch guarantee holds exactly here because everything is integer:
    ``est_count >= exact_count`` always, with equality unless the term
    collides in all four rows.

    The point at 100 TB is the sketch's state bound: token counting
    normally shuffles a corpus-sized (token, 1) stream into a
    vocabulary-sized table; the Count-Min pass aggregates into a FIXED
    4×1024 table — map-side combine reduces every partition to ≤4096
    rows before the one shuffle, independent of corpus or vocabulary
    size (the same bounded-state shape as :func:`hll_distinct`). The
    queried-term lookup is a broadcast join against that tiny table.
    Deterministic md5 bucket hashes make the sketch — not just the
    query — reproducible bit-for-bit in the DuckDB oracle.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("_t")
    ).filter(F.col("_t") != "")
    est = countmin_query(countmin_state(df, text_col), terms)
    qterms = df.sparkSession.createDataFrame(
        [(t,) for t in sorted(set(terms))], "term string"
    )
    exact = (
        toks.join(
            F.broadcast(qterms.withColumnRenamed("term", "_t")), "_t"
        )
        .groupBy(F.col("_t").alias("term"))
        .agg(F.count("*").alias("_x"))
    )
    return est.join(exact, "term", "left").select(
        "term",
        "est_count",
        F.coalesce(F.col("_x"), F.lit(0).cast("long")).alias("exact_count"),
    )


#: default fixed-bin histogram width for the quantile sketch. 256 bins
#: bound the quantile bracket at range/256 while the sketch state stays
#: trivially mergeable (map-side combine reduces every partition to
#: <= 256 rows before the one shuffle, like the HLL/CMS tables above).
_QS_BINS = 256


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    percents: list[int] | tuple[int, ...] = (1, 5, 25, 50, 75, 95, 99),
    num_bins: int = _QS_BINS,
    scale: int = 100,
) -> DataFrame:
    """Quantile estimates from a fixed-bin mergeable histogram — the
    bounded-state companion to :func:`hll_distinct` / Count-Min and the
    scale path this package documents for exact-``ntile`` profiles. One
    row per requested percent: ``(pct, target_rank, bin, lo_est,
    hi_est)`` with the GUARANTEE that the exact ``pct``-th percentile
    (rank ``ceil(pct·n/100)`` in ascending order) lies in
    ``[lo_est, hi_est]`` — the bracket is a bin of the equal-width
    histogram, so its width is ``(max-min)/num_bins``.

    Everything after the raw scan is integer, hence engine-exact (the
    DuckDB oracle reproduces every row bit-for-bit):

    - values are scaled to integers first (``round(value·scale)`` —
      exact for money-like columns where ``scale`` matches the decimal
      grid, e.g. cents at the default 100);
    - bin index is ``((v-lo)·B) div (hi-lo+1)`` — pure int64 (callers
      need ``(hi-lo+1)·B < 2^63``, comfortable for any scaled domain);
    - target ranks are ``ceil`` via ``(pct·n + 99) div 100``;
    - bin edges map back exactly: bin ``b`` covers scaled values
      ``[lo + ceil(b·R/B), lo + ceil((b+1)·R/B) - 1]``, divided by
      ``scale`` only for display.

    Scale shape at 100 TB: a min/max/count agg (bounded state,
    collected as THREE scalars — the same bounded-scalar boundary as
    ``skew_profile``'s total; attaching the 1-row stats frame with a
    join instead would constant-fold into the audit-forbidden
    BroadcastNestedLoopJoin), one map-side-combined histogram agg into
    <= ``num_bins`` rows, a window cumsum over that tiny table, and a
    literal percent-struct explode — nothing data-sized ever sorts or
    gathers, and nothing joins at all. The histogram itself is
    MERGEABLE (bins are position-identical across splits), so shards
    can sketch independently and union before the cumsum. NULLs are
    ignored; an empty input yields an empty result.
    """
    if num_bins < 1:
        raise ValueError(f"num_bins must be >= 1, got {num_bins}")
    if not percents:
        raise ValueError("percents must be non-empty")
    if any(p < 1 or p > 100 for p in percents):
        raise ValueError(f"percents must be in [1, 100], got {percents}")
    from pyspark.sql import Window

    spark = df.sparkSession
    out_schema = (
        "pct int, target_rank long, bin int, lo_est double, hi_est double"
    )
    iv = df.select(
        F.round(F.col(value_col) * scale, 0).cast("long").alias("_v")
    ).filter(F.col("_v").isNotNull())
    srow = iv.agg(
        F.min("_v").alias("_lo"),
        F.max("_v").alias("_hi"),
        F.count("*").alias("_n"),
    ).collect()[0]
    if srow["_n"] == 0:
        return spark.createDataFrame([], out_schema)
    lo, hi, n = int(srow["_lo"]), int(srow["_hi"]), int(srow["_n"])
    rng, b = hi - lo + 1, num_bins
    hist = (
        iv.select(
            F.expr(f"((_v - {lo}) * {b}) div {rng}").cast("int").alias("_bin")
        )
        .groupBy("_bin")
        .agg(F.count("*").alias("_cnt"))
    )
    cum = hist.withColumn(
        "_cum",
        F.sum("_cnt").over(
            Window.partitionBy().orderBy("_bin").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    # exact ceil targets in Python ints; each cum row fans out over the
    # literal percent structs and keeps the ranks it satisfies — a
    # map + tiny agg, no join
    targets = [
        (int(p), max((p * n + 99) // 100, 1)) for p in sorted(set(percents))
    ]
    hit = (
        cum.select(
            "_bin",
            "_cum",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(p).alias("pct"),
                            F.lit(t).cast("long").alias("target_rank"),
                        )
                        for p, t in targets
                    ]
                )
            ).alias("_pt"),
        )
        .filter(F.col("_cum") >= F.col("_pt.target_rank"))
        .groupBy("_pt.pct", "_pt.target_rank")
        .agg(F.min("_bin").alias("bin"))
    )
    return hit.select(
        "pct",
        "target_rank",
        "bin",
        (
            F.expr(f"{lo} + (bin * {rng} + {b - 1}) div {b}").cast("double")
            / scale
        ).alias("lo_est"),
        (
            F.expr(f"{lo} + ((bin + 1) * {rng} + {b - 1}) div {b} - 1").cast(
                "double"
            )
            / scale
        ).alias("hi_est"),
    )


def equidepth_from_counts(
    df: DataFrame,
    value_col: str,
    k: int = 10,
    scale: int = 100,
    num_shards: int = 64,
) -> DataFrame:
    """Equi-depth (equal-count) histogram computed from the
    pre-aggregated ``(value, count)`` representation — the scale path
    the exact-``ntile`` profile (``q_equidepth_histogram``) documents.
    Output matches the exact window query bit-for-bit: one row per
    bucket ``(bucket, n, lo, hi)`` where bucket sizes follow NTILE's
    rule (the first ``n mod k`` buckets get ``ceil(n/k)`` rows) and
    ``lo``/``hi`` are the bucket's min/max value. Per-bucket extrema
    are tiebreak-independent — rows tied on value that NTILE splits
    across a boundary contribute that value to both buckets — so the
    compressed computation reproduces the row-level one exactly.

    Why it scales where ``ntile`` doesn't: the window form total-orders
    every ROW through one partition; this form aggregates to DISTINCT
    VALUES first (grid-bounded for money-like columns), then builds the
    value-order cumsum with shard-major two-level numbering (shard =
    equal-width bin of the scaled value, rank within shard, broadcast
    per-shard offsets — :func:`~cdc_system_spark.operators.sampling
    .global_shuffle`'s trick, keyed by VALUE ORDER instead of hash
    order), so the only data-sized shuffle is the ``num_shards``-way
    partition-by. Each distinct value then knows its global rank range
    ``[cum_lo, cum_hi]`` and emits one row per overlapped bucket
    (``<= k`` by construction, via an exact integer rank→bucket map) —
    a k-row broadcast equi-join, never a range join. The global
    min/max/total land as THREE collected scalars (the bounded-scalar
    boundary, as in ``skew_profile``: a 1-row stats frame attached by
    join constant-folds into the audit-forbidden
    BroadcastNestedLoopJoin).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    spark = df.sparkSession
    vc = (
        df.select(F.col(value_col).alias("_val"))
        .filter(F.col("_val").isNotNull())
        .groupBy("_val")
        .agg(F.count("*").alias("_cnt"))
        .withColumn("_v", F.round(F.col("_val") * scale, 0).cast("long"))
    )
    srow = vc.agg(
        F.min("_v").alias("_lo"),
        F.max("_v").alias("_hi"),
        F.sum("_cnt").alias("_n"),
    ).collect()[0]
    if srow["_n"] is None:
        return spark.createDataFrame(
            [], "bucket int, n bigint, lo double, hi double"
        )
    lo, hi, n = int(srow["_lo"]), int(srow["_hi"]), int(srow["_n"])
    rng = hi - lo + 1
    fl, r0 = n // k, n % k
    sharded = vc.withColumn(
        "_shard",
        F.expr(f"((_v - {lo}) * {num_shards}) div {rng}").cast("int"),
    )
    # order by (_v, _val): _v alone is NOT injective over distinct
    # values (two raw values can round to one scaled _v), and a
    # nondeterministic tie order would break the bit-for-bit NTILE
    # parity. round(value*scale) is monotone, so ties on _v are
    # value-adjacent and (_v, _val) IS exact ascending value order —
    # the same order NTILE's ORDER BY value uses.
    within = F.sum("_cnt").over(
        Window.partitionBy("_shard").orderBy("_v", "_val").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    offsets = (
        sharded.groupBy("_shard")
        .agg(F.sum("_cnt").alias("_scnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_scnt").over(
                    Window.partitionBy()
                    .orderBy("_shard")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_shard", "_offset")
    )
    ranked = (
        sharded.withColumn("_wcum", within)
        .join(F.broadcast(offsets), "_shard")
        .select(
            "_val",
            "_cnt",
            (F.col("_offset") + F.col("_wcum")).alias("_cum_hi"),
            (F.col("_offset") + F.col("_wcum") - F.col("_cnt") + 1).alias(
                "_cum_lo"
            ),
        )
    )
    # exact integer rank -> NTILE bucket: with fl = n div k, r0 = n mod
    # k, ranks 1..r0*(fl+1) live in the (fl+1)-sized buckets, the rest
    # in fl-sized ones. (fl = 0 degenerates correctly: bucket = rank.)
    def _bucket_of(rank: str) -> str:
        if fl == 0:
            return rank
        return (
            f"CASE WHEN ({rank}) <= {r0} * {fl + 1} "
            f"THEN (({rank}) - 1) div {fl + 1} + 1 "
            f"ELSE {r0} + (({rank}) - {r0 * (fl + 1)} - 1) div {fl} + 1 END"
        )

    spanned = (
        ranked.withColumn("_b1", F.expr(_bucket_of("_cum_lo")).cast("int"))
        .withColumn("_b2", F.expr(_bucket_of("_cum_hi")).cast("int"))
        .select(
            "_val",
            "_cum_lo",
            "_cum_hi",
            F.explode(F.sequence("_b1", "_b2")).alias("bucket"),
        )
    )
    # the k bucket rank ranges in exact Python ints (NTILE's rule)
    buckets = spark.createDataFrame(
        [
            (
                b_,
                (b_ - 1) * fl + min(b_ - 1, r0) + 1,
                b_ * fl + min(b_, r0),
            )
            for b_ in range(1, k + 1)
        ],
        "bucket int, _start long, _end long",
    )
    return (
        spanned.join(F.broadcast(buckets), "bucket")
        .groupBy("bucket")
        .agg(
            F.sum(
                F.least("_cum_hi", "_end")
                - F.greatest("_cum_lo", "_start")
                + 1
            ).alias("n"),
            F.round(F.min("_val"), 6).alias("lo"),
            F.round(F.max("_val"), 6).alias("hi"),
        )
    )


def hll_distinct_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    decimals: int = 4,
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate — ``COUNT(DISTINCT x)
    GROUP BY g`` replaced by bounded state per group: one row per group
    ``(*group_cols, n_est, n_empty_buckets)``, same engine-exact md5
    construction as :func:`hll_distinct` (the DuckDB oracle reproduces
    every group bit-for-bit).

    Two differences from the scalar form, both scale-motivated: the
    per-group shuffle state is ≤ 64 (bucket, max-rank) rows per group
    after map-side combine — the grouped exact count's state is the
    group's distinct-value set, unbounded; and absent buckets
    contribute their ``2^0 = 1`` harmonic terms ARITHMETICALLY
    (``64 - count(present)``) instead of via the scalar form's
    64-row completion join, which would need a per-group key
    explosion here. Groups whose values are all NULL vanish (no rows
    reach the aggregation), matching ``GROUP BY`` over the filtered
    input.
    """
    h = F.conv(F.substring(F.md5(F.col(value_col)), 1, 15), 16, 10).cast(
        "long"
    )
    vals = (
        df.select(*group_cols, h.alias("_h"))
        .filter(F.col("_h").isNotNull())
    )
    bucket = F.expr("_h % 64").alias("_b")
    w = F.expr("_h div 64")
    rho = (
        F.when(w == 0, F.lit(_RANK_BITS + 1))
        .otherwise(F.lit(_RANK_BITS + 1) - F.length(F.bin(w)))
        .alias("_rho")
    )
    per_bucket = (
        vals.select(*group_cols, bucket, rho)
        .groupBy(*group_cols, "_b")
        .agg(F.max("_rho").alias("_M"))
    )
    term = F.round(F.pow(F.lit(2.0), -F.col("_M")), 18)
    agg = per_bucket.groupBy(*group_cols).agg(
        (
            F.sum(term.cast("decimal(25,18)"))
            + (F.lit(_M) - F.count("*")).cast("decimal(25,18)")
        )
        .cast("double")
        .alias("_s"),
        (F.lit(_M) - F.count("*")).cast("long").alias("n_empty_buckets"),
    )
    return agg.select(
        *group_cols,
        F.when(F.col("n_empty_buckets") == _M, F.lit(0.0))
        .otherwise(
            F.round(F.lit(_ALPHA_M * _M * _M) / F.col("_s"), decimals)
        )
        .alias("n_est"),
        "n_empty_buckets",
    )


def quantile_sketch_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percents: list[int] | tuple[int, ...] = (25, 50, 75),
    num_bins: int = _QS_BINS,
    scale: int = 100,
) -> DataFrame:
    """Per-group quantile brackets from per-group fixed-bin histograms
    — :func:`quantile_sketch` with ``group_cols`` threaded through
    every stage: one row per (group, pct) with the same exact-integer
    bracket guarantee (the group's exact pct-th percentile lies in
    ``[lo_est, hi_est]``, bracket width = group range / ``num_bins``).

    Scale shape: per-group min/max/count agg (group-sized), one
    histogram agg with ≤ ``num_bins`` rows per group of shuffle state,
    a cumsum windowed PER GROUP over that bounded table (never a
    data-sized single partition), then the percent join. Each group
    gets its own bin geometry, so skewed groups don't flatten compact
    ones — the failure mode of one global histogram.
    """
    if num_bins < 1:
        raise ValueError(f"num_bins must be >= 1, got {num_bins}")
    if not percents:
        raise ValueError("percents must be non-empty")
    if any(p < 1 or p > 100 for p in percents):
        raise ValueError(f"percents must be in [1, 100], got {percents}")
    from pyspark.sql import Window

    iv = df.select(
        *group_cols,
        F.round(F.col(value_col) * scale, 0).cast("long").alias("_v"),
    ).filter(F.col("_v").isNotNull())
    stats = iv.groupBy(*group_cols).agg(
        F.min("_v").alias("_lo"),
        F.max("_v").alias("_hi"),
        F.count("*").alias("_n"),
    )
    # stats is group-count-sized; with the equi key present Catalyst
    # broadcasts it when small and AQE upgrades the join at runtime —
    # no hint, so a high-cardinality group column can't force an OOM
    binned = iv.join(stats, group_cols).select(
        *group_cols,
        F.expr(f"((_v - _lo) * {num_bins}) div (_hi - _lo + 1)")
        .cast("int")
        .alias("_bin"),
    )
    hist = binned.groupBy(*group_cols, "_bin").agg(F.count("*").alias("_cnt"))
    cum = hist.withColumn(
        "_cum",
        F.sum("_cnt").over(
            Window.partitionBy(*group_cols)
            .orderBy("_bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    # percents attach via a literal-array explode — never a cross join
    # (a crossJoin of even a tiny frame plans as the audit-forbidden
    # BroadcastNestedLoopJoin)
    targets = stats.select(
        *group_cols,
        F.explode(
            F.array(*[F.lit(int(p)) for p in sorted(set(percents))])
        ).alias("pct"),
        "_lo",
        "_hi",
        "_n",
    ).select(
        *group_cols,
        "pct",
        F.greatest(
            F.expr("(pct * _n + 99) div 100"), F.lit(1).cast("long")
        ).alias("target_rank"),
        "_lo",
        "_hi",
    )
    # equi join on the group key (cum is <= num_bins rows per group);
    # the rank condition lands as the join's residual filter
    hit = (
        targets.join(
            cum,
            [
                *[targets[g] == cum[g] for g in group_cols],
                cum["_cum"] >= targets["target_rank"],
            ],
        )
        .groupBy(
            *[targets[g] for g in group_cols], "pct", "target_rank", "_lo", "_hi"
        )
        .agg(F.min("_bin").alias("bin"))
    )
    r = "(_hi - _lo + 1)"
    b = num_bins
    return hit.select(
        *group_cols,
        "pct",
        "target_rank",
        "bin",
        (
            F.expr(f"_lo + (bin * {r} + {b - 1}) div {b}").cast("double")
            / scale
        ).alias("lo_est"),
        (
            F.expr(f"_lo + ((bin + 1) * {r} + {b - 1}) div {b} - 1").cast(
                "double"
            )
            / scale
        ).alias("hi_est"),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    p_lo: int = 1,
    p_hi: int = 99,
    num_bins: int = _QS_BINS,
    scale: int = 100,
) -> DataFrame:
    """Winsorization (percentile clipping) driven by the quantile
    sketch: every row gets ``clipped = least(greatest(value, lo_clip),
    hi_clip)`` where ``lo_clip`` is the LOWER bracket edge of the
    ``p_lo``-th percentile and ``hi_clip`` the UPPER bracket edge of
    the ``p_hi``-th — the standard outlier clip before loss-scaled
    training or aggregate statistics, without ever sorting the data.

    Using the bracket's outer edges makes the clip CONSERVATIVE (it
    clips at most as much as exact winsorization; the slack is one
    histogram bin ≤ range/``num_bins``) and deterministic — the
    bounds come from :func:`quantile_sketch`, so the same clip is
    engine-reproducible. Cost: the sketch passes (two aggs over
    bounded state) + one zero-shuffle map projection; the two clip
    bounds are collected scalars. NULL values pass through unclipped.
    """
    if not 1 <= p_lo < p_hi <= 100:
        raise ValueError(f"need 1 <= p_lo < p_hi <= 100, got {p_lo},{p_hi}")
    qs = {
        r["pct"]: r
        for r in quantile_sketch(
            df, value_col, percents=(p_lo, p_hi), num_bins=num_bins,
            scale=scale,
        ).collect()
    }
    if not qs:
        return df.withColumn(
            "clipped", F.col(value_col).cast("double")
        )
    lo_clip, hi_clip = qs[p_lo]["lo_est"], qs[p_hi]["hi_est"]
    # explicit NULL gate: greatest/least SKIP nulls, so without it a
    # NULL value would silently become the clip bound
    return df.withColumn(
        "clipped",
        F.when(
            F.col(value_col).isNotNull(),
            F.least(
                F.greatest(F.col(value_col).cast("double"), F.lit(lo_clip)),
                F.lit(hi_clip),
            ),
        ),
    )


def histogram_state(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    num_bins: int = _QS_BINS,
    scale: int = 100,
) -> DataFrame:
    """The quantile histogram as a MERGEABLE table artifact:
    ``(bin, cnt)``, <= ``num_bins`` + 2 rows, over an EXPLICIT
    ``[lo, hi]`` geometry — unlike :func:`quantile_sketch` (which
    derives its geometry from the global min/max and is therefore a
    one-shot), states with pinned geometry built per shard/day/
    partition merge by simple union + re-sum, so a corpus quantile
    profile is maintained incrementally, raw data never re-read
    (:func:`hll_state`'s contract for ranks, here for ranks' inverse).
    Values outside ``[lo, hi]`` clamp into the edge bins (bin 0 /
    ``num_bins - 1``), keeping counts exact for quantile purposes as
    long as ``[lo, hi]`` covers the bulk; pick bounds from a prior
    :func:`quantile_sketch` pass or domain knowledge."""
    if num_bins < 1:
        raise ValueError(f"num_bins must be >= 1, got {num_bins}")
    ilo, ihi = int(round(lo * scale)), int(round(hi * scale))
    if ihi < ilo:
        raise ValueError(f"need lo <= hi, got {lo}, {hi}")
    rng = ihi - ilo + 1
    iv = df.select(
        F.round(F.col(value_col) * scale, 0).cast("long").alias("_v")
    ).filter(F.col("_v").isNotNull())
    binned = iv.select(
        F.least(
            F.greatest(
                F.expr(f"((_v - {ilo}) * {num_bins}) div {rng}"), F.lit(0)
            ),
            F.lit(num_bins - 1),
        )
        .cast("int")
        .alias("bin")
    )
    return binned.groupBy("bin").agg(F.count("*").cast("long").alias("cnt"))


def histogram_merge(*states: DataFrame) -> DataFrame:
    """Sum-combine histogram states sharing one geometry — the
    lossless merge (counts are additive). Union + per-bin sum."""
    if not states:
        raise ValueError("states must be non-empty")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy("bin").agg(F.sum("cnt").cast("long").alias("cnt"))


def quantiles_from_state(
    state: DataFrame,
    lo: float,
    hi: float,
    percents: list[int] | tuple[int, ...] = (25, 50, 75),
    num_bins: int = _QS_BINS,
    scale: int = 100,
) -> DataFrame:
    """Quantile brackets from a (merged) histogram state — the same
    exact-integer rank → bin → edge arithmetic as
    :func:`quantile_sketch`, with the caveat that a percentile falling
    in a clamped EDGE bin brackets to that bin's nominal edges (the
    true value may lie beyond ``[lo, hi]``). Pass the build-time
    geometry; output shape matches ``quantile_sketch``."""
    if not percents:
        raise ValueError("percents must be non-empty")
    if any(p < 1 or p > 100 for p in percents):
        raise ValueError(f"percents must be in [1, 100], got {percents}")
    from pyspark.sql import Window

    ilo, ihi = int(round(lo * scale)), int(round(hi * scale))
    rng, b = ihi - ilo + 1, num_bins
    n_row = state.agg(F.sum("cnt").alias("_n")).collect()[0]
    if n_row["_n"] is None:
        return state.sparkSession.createDataFrame(
            [],
            "pct int, target_rank long, bin int, lo_est double, hi_est double",
        )
    n = int(n_row["_n"])
    targets = [
        (int(p), max((p * n + 99) // 100, 1)) for p in sorted(set(percents))
    ]
    cum = state.withColumn(
        "_cum",
        F.sum("cnt").over(
            Window.partitionBy().orderBy("bin").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    hit = (
        cum.select(
            "bin",
            "_cum",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(p).alias("pct"),
                            F.lit(t).cast("long").alias("target_rank"),
                        )
                        for p, t in targets
                    ]
                )
            ).alias("_pt"),
        )
        .filter(F.col("_cum") >= F.col("_pt.target_rank"))
        .groupBy("_pt.pct", "_pt.target_rank")
        .agg(F.min("bin").alias("bin"))
    )
    return hit.select(
        "pct",
        "target_rank",
        "bin",
        (
            F.expr(f"{ilo} + (bin * {rng} + {b - 1}) div {b}").cast("double")
            / scale
        ).alias("lo_est"),
        (
            F.expr(f"{ilo} + ((bin + 1) * {rng} + {b - 1}) div {b} - 1").cast(
                "double"
            )
            / scale
        ).alias("hi_est"),
    )


def countmin_state(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """The Count-Min sketch as a TABLE artifact: ``(r, b, n)`` over the
    fixed 4×1024 geometry — at most 4096 rows regardless of corpus or
    vocabulary size. Counts are ADDITIVE, so shard states merge by
    union + per-cell sum (:func:`countmin_merge`) and the merged state
    answers frequency queries for the union corpus exactly as a
    whole-corpus build would — the CMS member of the maintained-
    artifact family (:func:`hll_state` for cardinality,
    :func:`histogram_state` for quantiles)."""
    toks = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("_t")
    ).filter(F.col("_t") != "")
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cm_bucket(r, F.col("_t")).alias("b"),
                    )
                    for r in range(_CM_ROWS)
                ]
            )
        ).alias("c")
    ).select("c.r", "c.b")
    return cells.groupBy("r", "b").agg(F.count("*").cast("long").alias("n"))


def countmin_merge(*states: DataFrame) -> DataFrame:
    """Sum-combine Count-Min states (union + per-cell sum) — lossless:
    counts are additive, so merge-of-shards == build-from-union."""
    if not states:
        raise ValueError("states must be non-empty")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "b").agg(F.sum("n").cast("long").alias("n"))


def countmin_query(
    state: DataFrame,
    terms: list[str],
) -> DataFrame:
    """Frequency estimates for ``terms`` from a (merged) state: one row
    per term ``(term, est_count)`` = min over the 4 hash rows — the
    one-sided ``est >= exact`` guarantee holds for the union corpus the
    state describes. Broadcast lookup against the <= 4096-row state."""
    if not terms:
        raise ValueError("terms must be non-empty")
    spark = state.sparkSession
    qterms = spark.createDataFrame(
        [(t,) for t in sorted(set(terms))], "term string"
    )
    lookups = qterms.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cm_bucket(r, F.col("term")).alias("b"),
                    )
                    for r in range(_CM_ROWS)
                ]
            )
        ).alias("c"),
    ).select("term", "c.r", "c.b")
    return (
        lookups.join(F.broadcast(state), ["r", "b"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).cast("long").alias("est_count"))
    )


def winsorize_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p_lo: int = 1,
    p_hi: int = 99,
    num_bins: int = _QS_BINS,
    scale: int = 100,
) -> DataFrame:
    """Per-group winsorization: each row clipped to ITS GROUP's
    ``[p_lo, p_hi]`` percentile brackets from
    :func:`quantile_sketch_by` — the per-stratum outlier clip (a
    global clip under mixed strata lets a heavy group's tails define
    every group's bounds). Same conservative-by-one-bin contract as
    :func:`winsorize`; bounds attach via one group-keyed broadcast-
    able join (group-count-sized), the clip itself is a zero-shuffle
    map. NULL values pass through unclipped; a group whose values are
    all NULL passes through untouched (its bounds row is absent).
    """
    if not 1 <= p_lo < p_hi <= 100:
        raise ValueError(f"need 1 <= p_lo < p_hi <= 100, got {p_lo},{p_hi}")
    qs = quantile_sketch_by(
        df, group_cols, value_col, percents=(p_lo, p_hi),
        num_bins=num_bins, scale=scale,
    )
    lo_b = (
        qs.filter(F.col("pct") == p_lo)
        .select(*group_cols, F.col("lo_est").alias("_lo_clip"))
    )
    hi_b = (
        qs.filter(F.col("pct") == p_hi)
        .select(*group_cols, F.col("hi_est").alias("_hi_clip"))
    )
    out = df.join(lo_b, group_cols, "left").join(hi_b, group_cols, "left")
    return out.withColumn(
        "clipped",
        F.when(
            F.col(value_col).isNotNull(),
            F.least(
                F.greatest(
                    F.col(value_col).cast("double"),
                    F.coalesce(F.col("_lo_clip"), F.col(value_col).cast("double")),
                ),
                F.coalesce(F.col("_hi_clip"), F.col(value_col).cast("double")),
            ),
        ),
    ).drop("_lo_clip", "_hi_clip")


#: KMV hash domain: md5_i64 yields 60 bits, so hashes are uniform on
#: [0, 2^60). The unbiased distinct estimator divides this constant by
#: the k-th smallest hash — (k-1)·2^60 is exact in double for any
#: plausible k, and a single IEEE division is bit-identical across
#: engines, so the oracle reproduces estimates exactly.
_KMV_M = 2**60


def kmv_state(df: DataFrame, value_col: str, k: int = 64) -> DataFrame:
    """KMV (k-minimum-values / bottom-k theta) sketch as a TABLE
    artifact: the ``k`` smallest DISTINCT md5 hashes of ``value_col``,
    one ``(h)`` row each, ≤ k rows. The fourth maintained-sketch shape
    (HLL / Count-Min / histogram are the others) and the only one of
    the family that supports SET ALGEBRA: because the state keeps the
    actual smallest hash values, two states can be intersected
    (:func:`kmv_intersect`) — HLL states can only union.

    Scale shape: one map-side hash projection, one distinct (map-side
    combine), one TakeOrderedAndProject (per-partition top-k before the
    single ≤ k·partitions-row collect-free merge) — nothing corpus-
    sized ever moves. NULLs are ignored, matching COUNT(DISTINCT).

    Merge with :func:`kmv_merge`: k-min of distinct union of states ==
    state of the union, exactly (min is idempotent/commutative/
    associative over sets), so shard/day states combine without ever
    re-reading raw data — proven by ``q_kmv_merged``'s oracle being
    the WHOLE-corpus SQL.
    """
    h = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h")
    )
    return (
        df.select(h)
        .filter(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(*states: DataFrame, k: int = 64) -> DataFrame:
    """Combine KMV states losslessly: distinct union, re-take the k
    smallest. The merge is a VALID KMV state only at ``k`` ≤ the
    smallest k any input was built with — an input that kept only its
    bottom 32 cannot vouch for ranks 33..64 of the union, so merging
    k=32 states under the default k=64 silently skews the estimate
    upward. States carry no geometry metadata (they are bare hash
    tables), so this cannot be validated here: keep k with the stored
    artifact (the ``lsh_index`` meta pattern) and pass it explicitly,
    exactly as ``bloom_merge`` requires matching (num_bits,
    num_hashes)."""
    if not states:
        raise ValueError("states must be non-empty")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("h").limit(k)


def kmv_estimate(state: DataFrame, k: int = 64, decimals: int = 4) -> DataFrame:
    """One-row ``(n_est, saturated)`` distinct-count estimate from a
    KMV state. Below saturation (< k distinct hashes survive) the state
    IS the distinct set and the count is exact; at saturation the
    unbiased estimator ``(k-1)·2⁶⁰ / h_(k)`` applies (standard error
    ~1/√(k-2) ≈ 13% at k = 64 — the same budget as the 64-bucket HLL,
    but in a state that also supports intersection)."""
    agg = state.agg(
        F.count("*").alias("_n"), F.max("h").alias("_hk")
    )
    return agg.select(
        F.when(F.col("_n") < k, F.col("_n").cast("double"))
        .otherwise(
            F.round(F.lit(float(k - 1) * _KMV_M) / F.col("_hk"), decimals)
        )
        .alias("n_est"),
        (F.col("_n") >= k).alias("saturated"),
    )


def kmv_intersect(
    state_a: DataFrame,
    state_b: DataFrame,
    k: int = 64,
    decimals: int = 4,
) -> DataFrame:
    """Set algebra over two KMV states: one row ``(union_est,
    intersect_est, jaccard_est)`` — the theta-sketch estimator (Beyer
    et al., "On Synopses for Distinct-Value Estimation Under Multiset
    Operations", SIGMOD'07). The union sketch L = k-min of the combined
    states with threshold θ = max(L); every member of L is a uniform
    sample of the union below θ, so the fraction of L present in BOTH
    input states estimates the Jaccard similarity, and
    ``intersect_est = jaccard · union_est``. All arithmetic is exact
    integer comparison + one division — engine-portable, oracle-exact.

    Distinct-overlap questions (how much of corpus A's content is also
    in corpus B?) normally cost a corpus×corpus distinct join; two ≤
    k-row maintained states answer them in constant work.
    """
    a = state_a.select(F.col("h").alias("ha")).localCheckpoint(eager=False)
    b = state_b.select(F.col("h").alias("hb")).localCheckpoint(eager=False)
    union = (
        a.select(F.col("ha").alias("h"))
        .unionByName(b.select(F.col("hb").alias("h")))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    # membership flags via two ≤ k-row broadcast left joins, then ONE
    # aggregate computes size, threshold, and common count together —
    # no scalar×scalar recombination join in the plan
    flagged = union.join(
        F.broadcast(a), union["h"] == a["ha"], "left"
    ).join(F.broadcast(b), union["h"] == b["hb"], "left")
    agg = flagged.agg(
        F.count("*").alias("_nu"),
        F.max("h").alias("_theta"),
        F.count(
            F.when(F.col("ha").isNotNull() & F.col("hb").isNotNull(), 1)
        ).alias("_nc"),
    )
    # the two RATIO outputs round with round_portable, not F.round:
    # _nc/k is an exact binary fraction (k is a power of two), so it
    # can land EXACTLY on a decimal half-way boundary (2/64 = 0.03125)
    # where engine ROUND rules diverge — the same hazard
    # containment_pairs documents. union_est keeps F.round: a ratio of
    # 60-bit md5 integers never hits the boundary in practice (the
    # kmv_estimate/q_lsh_index_stats precedent, driver-green).
    from cdc_system_spark.functions.portable import round_portable

    return agg.select(
        F.when(F.col("_nu") < k, F.col("_nu").cast("double"))
        .otherwise(F.round(F.lit(float(k - 1) * _KMV_M) / F.col("_theta"), decimals))
        .alias("union_est"),
        round_portable(
            F.col("_nc")
            / F.when(F.col("_nu") < k, F.col("_nu")).otherwise(F.lit(k)).cast("double")
            * F.when(F.col("_nu") < k, F.col("_nu").cast("double")).otherwise(
                F.round(F.lit(float(k - 1) * _KMV_M) / F.col("_theta"), decimals)
            ),
            decimals,
        ).alias("intersect_est"),
        round_portable(
            F.col("_nc")
            / F.when(F.col("_nu") < k, F.col("_nu")).otherwise(F.lit(k)).cast("double"),
            decimals,
        ).alias("jaccard_est"),
    )


def kmv_state_by(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV states: ``(*group_cols, h)``, ≤ k rows per group.
    Combine grouped states with :func:`kmv_merge_by` (group-keyed
    bottom-k) — :func:`kmv_merge` is the UNGROUPED combiner and would
    collapse every group into one global k-row state; to feed one
    group's rows to it, filter to the group and project to ``h`` first.
    One distinct + one group-keyed window top-k; nothing corpus-sized
    moves."""
    from pyspark.sql.window import Window

    h = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h")
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        df.select(*group_cols, h)
        .filter(F.col("h").isNotNull())
        .distinct()
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def kmv_estimate_by(
    state: DataFrame,
    group_cols: list[str],
    k: int = 64,
    decimals: int = 4,
) -> DataFrame:
    """Per-group ``(*group_cols, n_est, saturated)`` from
    :func:`kmv_state_by` output — the grouped twin of
    :func:`kmv_estimate`, one map-side-combinable aggregate."""
    agg = state.groupBy(*group_cols).agg(
        F.count("*").alias("_n"), F.max("h").alias("_hk")
    )
    return agg.select(
        *group_cols,
        F.when(F.col("_n") < k, F.col("_n").cast("double"))
        .otherwise(
            F.round(F.lit(float(k - 1) * _KMV_M) / F.col("_hk"), decimals)
        )
        .alias("n_est"),
        (F.col("_n") >= k).alias("saturated"),
    )


def kmv_merge_by(
    *states: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Combine per-group KMV states (the :func:`kmv_state_by` shape)
    losslessly WITHIN each group: distinct union, then re-take the k
    smallest hashes per group key. The grouped twin of
    :func:`kmv_merge` — that one is a global bottom-k and would
    collapse all groups into a single k-row state. Groups absent from
    one input pass through from the other (union semantics), and the
    same k-discipline applies: valid only at ``k`` ≤ the smallest k any
    input was built with."""
    from pyspark.sql.window import Window

    if not states:
        raise ValueError("states must be non-empty")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        out.distinct()
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def selectivity_from_state(
    state: DataFrame,
    lo: float,
    hi: float,
    q_lo: float,
    q_hi: float,
    num_bins: int = _QS_BINS,
    scale: int = 100,
    decimals: int = 6,
) -> DataFrame:
    """Range-selectivity estimate from a (merged) histogram state — the
    optimizer-statistics use of the maintained-sketch family: one row
    ``(est_rows, total_rows, selectivity)`` estimating the fraction of
    rows with value in ``[q_lo, q_hi]``, computed from the ≤ num_bins-
    row state with exact integer bin-overlap arithmetic and uniform
    interpolation inside partial bins (the textbook equi-width
    histogram estimator every cost-based optimizer runs; here it is a
    QUERYABLE artifact over states that merge across shards/days, so
    "how selective is this predicate" never re-reads raw data).

    Deterministic and engine-exact: bin edges are the same integer
    ceil-division the quantile path uses, each bin's contribution is an
    int64 product divided once in double and rounded to 12 decimals,
    and the sum runs through an exact DECIMAL accumulator — order-
    insensitive, oracle-reproducible. Caveat shared with
    :func:`quantiles_from_state`: values beyond ``[lo, hi]`` sit
    clamped in the edge bins, so a query range reaching an edge bin
    inherits that bin's nominal-edge interpolation.
    """
    ilo, ihi = int(round(lo * scale)), int(round(hi * scale))
    iqlo, iqhi = int(round(q_lo * scale)), int(round(q_hi * scale))
    rng, b = ihi - ilo + 1, num_bins
    lb = F.lit(ilo) + F.expr(f"(bin * {rng} + {b - 1}) div {b}")
    ub = F.lit(ilo) + F.expr(f"((bin + 1) * {rng} + {b - 1}) div {b}") - 1
    ov = F.greatest(
        F.lit(0).cast("long"),
        F.least(ub, F.lit(iqhi)) - F.greatest(lb, F.lit(iqlo)) + 1,
    )
    term = F.round(
        (F.col("cnt") * ov).cast("double") / (ub - lb + 1).cast("double"), 12
    )
    agg = state.agg(
        F.coalesce(
            F.sum(term.cast("decimal(38,12)")), F.lit(0).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("_est"),
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("total_rows"),
    )
    return agg.select(
        F.round(F.col("_est"), decimals).alias("est_rows"),
        F.col("total_rows"),
        F.when(F.col("total_rows") == 0, F.lit(0.0))
        .otherwise(F.round(F.col("_est") / F.col("total_rows"), decimals))
        .alias("selectivity"),
    )
