"""Skew-aware join: explicit salting for hot keys.

A shuffled equi-join serializes each key into one reducer; a hot key (one
user producing 1% of a 100 TB fact table) turns into one straggler task.
AQE's skew-join handling splits oversized *partitions* after the fact,
but only for sort-merge joins it can see at runtime — pre-salting is the
deterministic, always-works version, and the only option when the skew
is in a key column AQE statistics miss.

``salted_join`` fans the fact side out over ``salt_count`` sub-keys
using a caller-supplied uniform column (deterministic — seeded runs and
external oracles reproduce it; ``rand()`` would not) and replicates the
dimension side once per salt via ``explode``. The join then shuffles on
(key, salt): a key that was 1 reducer becomes ``salt_count`` reducers.
Dim replication costs |dim|·S rows — the classic trade; keep S modest
(8–32) and apply only to joins profiling shows are skewed.

Result is row-identical to the unsalted join, proven by test and by the
DuckDB oracle on q_salted_join (plain join SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_source: str | Column,
    salt_count: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` shuffled on (key, salt) instead of key.

    ``salt_source``: a fact column (or Column) with uniform-ish values —
    an id, a hash input — reduced mod ``salt_count``. ``how`` supports
    ``inner`` and ``left`` (dim replication keeps left semantics: each
    fact row sees exactly one replica of its dim row). Output: all fact
    columns + dim columns except ``dim_key``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    f_salted = fact.withColumn("_salt", F.pmod(src, F.lit(salt_count)).cast("int"))
    d_replicated = dim.withColumnRenamed(dim_key, "_dk").withColumn(
        "_dsalt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(salt_count)]))
    )
    return (
        f_salted.join(
            d_replicated,
            on=[
                f_salted[fact_key] == d_replicated["_dk"],
                f_salted["_salt"] == d_replicated["_dsalt"],
            ],
            how=how,
        )
        .drop("_salt", "_dsalt", "_dk")
    )


def skew_profile(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Heavy-hitter profile of a prospective join/groupBy key: the
    ``top_n`` most frequent key values with row counts and share of
    total — the measurement the module docstring tells you to take
    before reaching for :func:`salted_join` (a key with share ≥
    1/parallelism is a straggler; salt it or let AQE split it).

    Plan shape: one map-side-combined groupBy on the key, then a
    TakeOrderedAndProject top-N — no global sort. The share
    denominator is reduced distributedly and collected as ONE scalar
    (the IVF-centroid boundary): attaching it via a constant-key join
    folds into a BroadcastNestedLoopJoin (audit-forbidden), and a
    global window would single-partition every distinct key. Ranking
    is deterministic under count ties (key-ascending tiebreak), so
    boundary keys are stable across layouts and engines.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").cast("bigint")).collect()[0][0]
    denom = F.lit(total).cast("bigint") if total else F.lit(None).cast("bigint")
    return (
        counts.withColumn("share", F.round(F.col("n_rows") / denom, 6))
        .select("key", "n_rows", "share")
        .orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(top_n)
    )


def join_strategy(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    broadcast_max_rows: int = 1_000_000,
    skew_share_threshold: float | None = None,
) -> dict:
    """Measure, then decide: ``broadcast`` | ``salted`` | ``plain`` for
    ``fact ⋈ dim`` — the profiling step :func:`skew_profile`'s
    docstring prescribes, packaged so the decision is made from
    numbers instead of folklore. Decision order:

    1. ``dim`` at or under ``broadcast_max_rows`` → **broadcast**
       (map-side, no shuffle of the fact, skew irrelevant). The row
       bound proxies Spark's byte-based autoBroadcastJoinThreshold
       with an engine-portable measure the caller can reason about.
    2. else if the fact key's heaviest value's share ≥
       ``skew_share_threshold`` (default ``1/defaultParallelism`` —
       a key at that share serializes one reducer into a straggler)
       → **salted**.
    3. else → **plain** (let AQE handle residual imbalance).

    Returns the decision plus the evidence: ``{strategy, dim_rows,
    top_key, top_share, threshold}``. Cost: one count on the dim and
    one map-side-combined top-1 profile on the fact (skipped when the
    dim broadcasts) — both trivially parallel; at 100 TB run them on
    the sample you already trust or reuse table statistics.
    """
    dim_rows = dim.count()
    if dim_rows <= broadcast_max_rows:
        return {
            "strategy": "broadcast",
            "dim_rows": dim_rows,
            "top_key": None,
            "top_share": None,
            "threshold": None,
        }
    if skew_share_threshold is None:
        skew_share_threshold = 1.0 / max(
            fact.sparkSession.sparkContext.defaultParallelism, 2
        )
    top = skew_profile(fact, fact_key, top_n=1).collect()
    top_key = top[0]["key"] if top else None
    top_share = float(top[0]["share"]) if top else 0.0
    return {
        "strategy": "salted" if top_share >= skew_share_threshold else "plain",
        "dim_rows": dim_rows,
        "top_key": top_key,
        "top_share": top_share,
        "threshold": skew_share_threshold,
    }


def auto_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_source: str | Column | None = None,
    salt_count: int = 8,
    how: str = "inner",
    broadcast_max_rows: int = 1_000_000,
    skew_share_threshold: float | None = None,
) -> DataFrame:
    """:func:`join_strategy` applied: profile the join, then execute it
    with the measured-right physical shape — ``F.broadcast`` hint for
    a small dim, :func:`salted_join` for a measured-skewed fact key,
    plain equi-join otherwise. Row-identical output across all three
    paths (column order: fact columns then dim columns minus the key),
    so callers can adopt it without semantic review; the decision
    inputs are exposed via :func:`join_strategy` for logging.

    ``salt_source`` seeds the salted path (see :func:`salted_join`);
    when omitted, the salt is md5 over the concatenated fact row —
    deterministic and uniform unless the fact is mostly duplicate
    full rows.
    """
    decision = join_strategy(
        fact, dim, fact_key, broadcast_max_rows, skew_share_threshold
    )
    if decision["strategy"] == "broadcast":
        d = dim.withColumnRenamed(dim_key, "_dk")
        return (
            fact.join(
                F.broadcast(d), fact[fact_key] == d["_dk"], how=how
            ).drop("_dk")
        )
    if decision["strategy"] == "salted":
        if salt_source is None:
            from cdc_system_spark.functions.portable import md5_i64

            salt_source = md5_i64(
                F.concat_ws("\x1f", *[F.col(c).cast("string") for c in fact.columns])
            )
        return salted_join(
            fact, dim, fact_key, dim_key, salt_source, salt_count, how
        )
    d = dim.withColumnRenamed(dim_key, "_dk")
    return fact.join(d, fact[fact_key] == d["_dk"], how=how).drop("_dk")
