"""Driver-facing query registry.

Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
surface) is registered here as a named :class:`Query` with a PySpark
implementation and, where SQL-expressible, a DuckDB oracle SQL twin.
``__spark_entry__.py`` adapts this registry to the driver contract.
"""

from cdc_system_spark.queries.base import QUERY_REGISTRY, Query, register

# Importing the modules populates the registry. ORDER MATTERS: the
# driver's oracle gate checks the first 50 registry entries. Every
# rows-only query (no oracle) sits after slot 50 so no strong-check
# slot is wasted. All queries remain locally verified each round via
# tools/verify_local.py (report committed as VERIFY_LOCAL_r{N}.txt).
# tests/test_plans.py pins the window composition.
from cdc_system_spark.queries import windows  # noqa: E402,F401  (7)
from cdc_system_spark.queries import analytics  # noqa: E402,F401  (29)
from cdc_system_spark.queries import tpch_extra  # noqa: E402,F401  (16)
from cdc_system_spark.queries import curation  # noqa: E402,F401  (27)
from cdc_system_spark.queries import temporal  # noqa: E402,F401  (2)
from cdc_system_spark.queries import conflicts  # noqa: E402,F401  (3)
from cdc_system_spark.queries import events  # noqa: E402,F401  (19)
from cdc_system_spark.queries import cdc_queries  # noqa: E402,F401  (13)
from cdc_system_spark.queries import llm  # noqa: E402,F401  (81, all oracle-backed)
from cdc_system_spark.queries import multimodal  # noqa: E402,F401  (8)
from cdc_system_spark.queries import llm_rowsonly  # noqa: E402,F401  (5, no oracle)

# Round-8 window: the driver's CORRECTNESS gate strong-checks the
# FIRST 50 registry entries only; the window is an EXPLICIT 50-name
# list. Composition policy (standing since r4), in priority order:
#   1. every oracle-backed query that has NEVER received a driver
#      CORRECTNESS row — this round, the six round-8 additions
#      (containment-aware ingest, URL canonicalization dedup,
#      cross-index KMV overlap, index staleness, grouped windowed KMV
#      batch twin, zone-pruned read);
#   2. every query whose operator or oracle CHANGED this round:
#      q_knn_label_noise (registered form moved from 4 to 16 literal
#      centroids AND the vote winner folded into the totals
#      aggregation — both sides of the comparison changed) and
#      q_leakage_split_maintained (now reads the post-compact TRUSTED
#      signature path, assume_covered — zero corpus text access), and
#      q_kmv_intersection (the operator's ratio outputs moved to
#      round_portable with the oracle rewritten to match — the r8
#      self-review caught the oracle lagging the operator);
#   3. remaining slots re-confirm the queries with the OLDEST driver
#      evidence: ALL 39 r3-evidence names (recomputed from the seven
#      CORRECTNESS artifacts — the r7 verdict corrected the builder's
#      estimate of 36, and the full recomputed pool is pinned in
#      tests/test_plans.py::test_oldest_evidence_pool_recorded), which
#      moves the registry-wide evidence floor to r4, plus the 2
#      r4-evidence names of most operator variety (multimodal
#      near-dup, similarity-graph PageRank).
_WINDOW_R8 = [
    # -- 1. new this round, never driver-checked --
    "q_containment_ingest",
    "q_url_dedup",
    "q_index_overlap",
    "q_index_staleness",
    "q_kmv_windowed_by",
    "q_zone_pruned_read",
    # -- 2. operator or oracle changed this round --
    "q_knn_label_noise",
    "q_leakage_split_maintained",
    "q_kmv_intersection",
    # -- 3a. the COMPLETE r3-evidence pool (39) — floor moves to r4 --
    "q_agg_groupby",
    "q_anti_join",
    "q_case_when",
    "q_chunk_documents",
    "q_count_distinct",
    "q_customer_distribution",
    "q_date_funcs",
    "q_disjunctive_revenue",
    "q_distinct",
    "q_dormant_customers",
    "q_except",
    "q_forecast_revenue",
    "q_grouping_sets",
    "q_intersect",
    "q_large_orders",
    "q_local_volume",
    "q_market_share",
    "q_minhash_jaccard_est",
    "q_normalize_text",
    "q_order_priority",
    "q_percentiles",
    "q_pivot",
    "q_product_profit",
    "q_promo_revenue",
    "q_returned_items",
    "q_scalar_subquery",
    "q_semi_join",
    "q_sliding_window",
    "q_small_quantity_revenue",
    "q_string_funcs",
    "q_supplier_part_count",
    "q_top_customers",
    "q_top_supplier",
    "q_union",
    "q_volume_shipping",
    "q_waiting_suppliers",
    "q_window_lag",
    "q_window_ntile",
    "q_window_running",
    # -- 3b. r4-evidence re-confirmations (operator variety) --
    "q_image_neardup",
    "q_pagerank",
]

# the active window (rotated per round; _set_window validates it)
_WINDOW = _WINDOW_R8


def _set_window() -> None:
    """Reorder the registry: the explicit window first (in list order),
    then every other oracle-backed query (original relative order),
    then the rows-only tail. Fails loudly on typos, duplicates, or a
    rows-only query in a strong-check slot."""
    names = list(QUERY_REGISTRY)
    # hard errors, not asserts: these invariants guard the driver's
    # CORRECTNESS gate and must hold under `python -O` too
    if len(_WINDOW) != 50:
        raise ValueError(f"window has {len(_WINDOW)} slots, need 50")
    if len(set(_WINDOW)) != 50:
        raise ValueError("duplicate window entries")
    unknown = [n for n in _WINDOW if n not in QUERY_REGISTRY]
    if unknown:
        raise ValueError(f"window names not in registry: {unknown}")
    no_oracle = [n for n in _WINDOW if QUERY_REGISTRY[n].sql is None]
    if no_oracle:
        raise ValueError(
            f"rows-only queries waste oracle slots: {no_oracle}"
        )
    rest = [n for n in names if n not in set(_WINDOW)]
    ordered = (
        _WINDOW
        + [n for n in rest if QUERY_REGISTRY[n].sql is not None]
        + [n for n in rest if QUERY_REGISTRY[n].sql is None]
    )
    rotated = {n: QUERY_REGISTRY[n] for n in ordered}
    QUERY_REGISTRY.clear()
    QUERY_REGISTRY.update(rotated)


_set_window()

__all__ = ["QUERY_REGISTRY", "Query", "register"]
