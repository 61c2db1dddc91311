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
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("_r"),
                        _cm_bucket(r, F.col("_t")).alias("_b"),
                    )
                    for r in range(_CM_ROWS)
                ]
            )
        ).alias("c")
    ).select("c._r", "c._b")
    sketch = cells.groupBy("_r", "_b").agg(F.count("*").alias("_n"))
    spark = df.sparkSession
    qterms = spark.createDataFrame(
        [(t,) for t in sorted(set(terms))], "term string"
    )
    lookups = qterms.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("_r"),
                        _cm_bucket(r, F.col("term")).alias("_b"),
                    )
                    for r in range(_CM_ROWS)
                ]
            )
        ).alias("c"),
    ).select("term", "c._r", "c._b")
    est = (
        lookups.join(sketch, ["_r", "_b"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("_n"), F.lit(0))).alias("est_count"))
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
