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
from cdc_system_spark.queries import analytics  # noqa: E402,F401  (30)
from cdc_system_spark.queries import tpch_extra  # noqa: E402,F401  (16)
from cdc_system_spark.queries import curation  # noqa: E402,F401  (27)
from cdc_system_spark.queries import temporal  # noqa: E402,F401  (2)
from cdc_system_spark.queries import conflicts  # noqa: E402,F401  (3)
from cdc_system_spark.queries import events  # noqa: E402,F401  (20)
from cdc_system_spark.queries import cdc_queries  # noqa: E402,F401  (14)
from cdc_system_spark.queries import llm  # noqa: E402,F401  (94, all oracle-backed)
from cdc_system_spark.queries import multimodal  # noqa: E402,F401  (8)
from cdc_system_spark.queries import llm_rowsonly  # noqa: E402,F401  (9, no oracle)

# Round-13 window (optimization round — no new queries, so slots go
# to changed-operator re-confirmations and the oldest-evidence pool):
#   1. never driver-checked: NONE — every oracle-backed query has a
#      green CORRECTNESS row as of r12 (recomputed from r01-r12);
#   2. every query whose operator changed in the r13 optimization
#      round: both connected-components loops now run their rounds in
#      pairs with a fused convergence-signature action (dedup.py —
#      covers q_dup_clusters, q_dup_clusters_star, the leakage splits
#      and the curation pipeline), hamming_band_pairs defers its
#      pair-distinct behind the Hamming filter (q_simhash_neardup,
#      q_image_neardup), bigram_surprisal derives unigram counts from
#      the bigram aggregate, and spread()'s partition probe became a
#      plan-walking estimator (the ingest paths are its derived-frame
#      call sites — q_neardup_ingest, q_containment_ingest);
#   3. remaining 40 slots: the r8-evidence pool (48 names recomputed
#      from CORRECTNESS_r01-r12, re-pinned in tests/test_plans.py),
#      oldest-first = alphabetical within the round; the last 6
#      (q_volume_shipping, q_waiting_suppliers, q_window_lag,
#      q_window_ntile, q_window_running, q_zone_pruned_read) roll to
#      the round-14 window.
_WINDOW_R13 = [
    # -- 2. operator changed this round --
    "q_dup_clusters",
    "q_dup_clusters_star",
    "q_leakage_split_containment",
    "q_leakage_split_maintained",
    "q_curation_pipeline",
    "q_simhash_neardup",
    "q_image_neardup",
    "q_bigram_surprisal",
    "q_neardup_ingest",
    "q_containment_ingest",
    # -- 3. r8-evidence pool, oldest-first (alphabetical), 40 slots --
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
    "q_index_overlap",
    "q_index_staleness",
    "q_intersect",
    "q_kmv_intersection",
    "q_kmv_windowed_by",
    "q_knn_label_noise",
    "q_large_orders",
    "q_local_volume",
    "q_market_share",
    "q_minhash_jaccard_est",
    "q_normalize_text",
    "q_order_priority",
    "q_pagerank",
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
    "q_url_dedup",
]

# the active window (rotated per round; _set_window validates it)
_WINDOW = _WINDOW_R13


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
