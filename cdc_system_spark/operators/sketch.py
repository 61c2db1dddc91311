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
    flags the regime).
    """
    h = F.conv(F.substring(F.md5(F.col(value_col)), 1, 15), 16, 10).cast(
        "long"
    )
    vals = df.select(h.alias("_h")).filter(F.col("_h").isNotNull())
    bucket = F.expr("_h % 64").alias("_b")
    w = F.expr("_h div 64")
    rho = (
        F.when(w == 0, F.lit(_RANK_BITS + 1))
        .otherwise(F.lit(_RANK_BITS + 1) - F.length(F.bin(w)))
        .alias("_rho")
    )
    per_bucket = (
        vals.select(bucket, rho).groupBy("_b").agg(F.max("_rho").alias("_M"))
    )
    # all 64 buckets, absent → rank 0 (2^0 = 1 in the harmonic sum)
    buckets = df.sparkSession.range(_M).select(F.col("id").alias("_b"))
    full = buckets.join(per_bucket, "_b", "left").select(
        F.coalesce(F.col("_M"), F.lit(0)).alias("_M")
    )
    term = F.round(F.pow(F.lit(2.0), -F.col("_M")), 18)
    agg = full.agg(
        F.sum(term.cast("decimal(25,18)")).cast("double").alias("_s"),
        F.sum(F.when(F.col("_M") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_empty_buckets"),
    )
    return agg.select(
        F.round(F.lit(_ALPHA_M * _M * _M) / F.col("_s"), decimals).alias(
            "n_est"
        ),
        "n_empty_buckets",
    )
