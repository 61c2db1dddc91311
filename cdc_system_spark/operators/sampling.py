"""Deterministic sampling operators for corpus curation.

The reference's only sampling is demo-data ``random.randint``
(example_usage.py:49,69 — SURVEY §2.7 SF6). A training-data pipeline
needs *reproducible* sampling: same corpus + same config ⇒ same sample,
on any cluster layout, across reruns. Everything here keys off
``md5(id)`` (functions.portable.md5_i64) — engine-portable, seedable via
a salt string, and uniform across buckets, unlike ``rand()`` which
changes per task retry and per partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_system_spark.functions.portable import md5_i64

#: bucket granularity: per-mille rates
BUCKETS = 1000


def hash_bucket(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, BUCKETS) from md5(salt || id).

    md5_i64 spans 60 bits, so ``% 1000`` bias is ~2^-50 — negligible.
    Changing ``salt`` draws an independent sample (the "seed").
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_i64(F.concat(F.lit(salt), c.cast("string"))) % BUCKETS


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.1,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash
    bucket falls below its stratum's rate — e.g. downsample boilerplate
    languages/sources while keeping all of a rare one (the standard
    mixture-reweighting step before training).

    Pure map-side filter — no shuffle, no state; the filter pushes into
    the scan when ``strata_col`` is a partition column. Exact rates per
    stratum (within hash granularity), independent of row order and
    cluster layout, unlike ``df.sampleBy`` which is seed-dependent on
    partitioning.
    """
    # round, not truncate: int(0.29 * 1000) is 289 (binary float
    # 289.999...), int(round(...)) is the intended 290
    #
    # (rate-based sampling; for exact-count selection see top_k_per_stratum)
    rate_expr: Column = F.lit(int(round(default_rate * BUCKETS)))
    for value, rate in sorted(rates.items()):
        rate_expr = F.when(
            F.col(strata_col) == value, F.lit(int(round(rate * BUCKETS)))
        ).otherwise(rate_expr)
    return (
        df.withColumn("_bucket", hash_bucket(id_col, salt))
        .filter(F.col("_bucket") < rate_expr)
        .drop("_bucket")  # internal helper — callers see the input schema
    )


def top_k_per_stratum(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """EXACTLY ``k`` rows per stratum, chosen deterministically: rank by
    md5(salt||id) within each stratum and keep the top ``k`` — the
    standard way to carve a fixed-size eval/holdout set per language or
    source (rate-based sampling can't hit an exact count).

    One shuffle on the stratum key; Spark's WindowGroupLimit pushes the
    ``rank <= k`` bound below the sort so each partition keeps only k
    candidates before the exchange — the same physical shape as any
    top-k, safe at any stratum size. Ties are impossible (md5 of
    distinct ids), so the selection is unique and layout-independent.
    """
    from pyspark.sql import Window

    h = md5_i64(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic per-row Bernoulli keep with probability equal to
    the row's ``weight_col`` (clamped to [0, 1]) — quality-weighted
    downsampling, the standard soft filter between a hard quality cut
    and keeping everything (high-quality docs survive at their score's
    rate, zero-score docs drop out). Same md5-bucket determinism as
    :func:`stratified_sample`: reproducible across reruns and cluster
    layouts, seedable via ``salt``. Pure map-side filter, zero shuffle.
    """
    w = F.least(F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)), F.lit(1.0))
    return (
        df.withColumn("_bucket", hash_bucket(id_col, salt))
        .filter(F.col("_bucket") < F.round(w * BUCKETS, 0))
        .drop("_bucket")
    )
