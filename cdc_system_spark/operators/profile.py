"""Table profiling: per-column statistics in one aggregate pass.

The data-card / data-quality building block every warehouse exposes
(ANALYZE TABLE, dbt source freshness, Deequ profiles): null counts,
distinct cardinality, min/max per column, computed as ONE wide
aggregate over the table and unpivoted driver-free with ``stack``.
The reference has no analogue (SQLite exposes nothing beyond
``COUNT(*)``); at 100 TB this is how you decide whether a column is
joinable (cardinality), filterable (range) or broken (null rate).

Scale notes: a single ``df.agg`` pass — map-side partial aggregation,
one reduce to a single row, then a constant-size ``stack`` projection;
no per-column scans. Exact ``count_distinct`` over many columns makes
Catalyst plan an Expand (input replicated once per distinct column) —
fine for profiling runs; pass ``exact=False`` to switch to
``approx_count_distinct`` (one HLL sketch per column, no Expand) for
routine wide-table profiling. Approximate results are rows-only
checkable (engine-specific sketches), which is why the oracle-backed
query path uses ``exact=True``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``.

    Returns one row per column: ``column_name``, ``n_rows``,
    ``n_non_null``, ``n_distinct`` (exact, or HLL-approximate with
    ``exact=False``), ``min_value``/``max_value`` cast to string (cast
    profiled columns to decimal first if you need engine-portable
    float rendering).
    """
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    nd: Column = F.count_distinct if exact else F.approx_count_distinct  # type: ignore[assignment]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            nd(F.col(c)).cast("bigint").alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    stacked = ", ".join(
        f"'{c}', `__nn_{c}`, `__nd_{c}`, `__mn_{c}`, `__mx_{c}`" for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stacked}) as "
        "(column_name, n_non_null, n_distinct, min_value, max_value)",
        "__n as n_rows",
    ).select(
        "column_name", "n_rows", "n_non_null", "n_distinct",
        "min_value", "max_value",
    )


def fk_orphans(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
) -> DataFrame:
    """Referential-integrity check: one row ``(n_fact, n_orphans,
    n_distinct_orphan_keys, orphan_fraction)`` counting fact rows whose
    key has NO match in the dimension — the post-replication invariant
    a CDC pipeline verifies (a replica that dropped or reordered
    deletes shows up here before any downstream join silently loses
    rows). NULL fact keys count as orphans (they join nothing).

    Plan shape: distinct fact keys (distinct-key-sized state) LEFT
    JOIN the dimension's distinct keys, re-joined map-side to count
    rows — the fact table itself never shuffles on data size when the
    orphan-key table broadcasts back. At 100 TB run it per partition /
    per sync interval and alert on deltas, not absolutes."""
    fk = F.col(fact_key)
    fact_keys = fact.select(fk.alias("_k")).groupBy("_k").agg(
        F.count("*").cast("long").alias("_cnt")
    )
    dim_keys = dim.select(F.col(dim_key).alias("_k")).distinct().withColumn(
        "_hit", F.lit(1)
    )
    flagged = fact_keys.join(dim_keys, "_k", "left")
    return flagged.agg(
        F.sum("_cnt").cast("long").alias("n_fact"),
        F.sum(F.when(F.col("_hit").isNull(), F.col("_cnt")).otherwise(0))
        .cast("long")
        .alias("n_orphans"),
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_distinct_orphan_keys"),
        F.round(
            F.sum(F.when(F.col("_hit").isNull(), F.col("_cnt")).otherwise(0))
            / F.sum("_cnt"),
            6,
        ).alias("orphan_fraction"),
    )
