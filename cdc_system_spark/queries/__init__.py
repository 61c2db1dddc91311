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
from cdc_system_spark.queries import analytics  # noqa: E402,F401  (21)
from cdc_system_spark.queries import tpch_extra  # noqa: E402,F401  (16)
from cdc_system_spark.queries import curation  # noqa: E402,F401  (23)
from cdc_system_spark.queries import temporal  # noqa: E402,F401  (2)
from cdc_system_spark.queries import conflicts  # noqa: E402,F401  (3)
from cdc_system_spark.queries import events  # noqa: E402,F401  (10)
from cdc_system_spark.queries import cdc_queries  # noqa: E402,F401  (13)
from cdc_system_spark.queries import llm  # noqa: E402,F401  (57, all oracle-backed)
from cdc_system_spark.queries import multimodal  # noqa: E402,F401  (7)
from cdc_system_spark.queries import llm_rowsonly  # noqa: E402,F401  (3, no oracle)

# Round-4 window rotation: swap 7 double-driver-green queries (r1+r3)
# out of the 50-slot oracle window for the 7 oracle-backed queries that
# have NEVER received a driver CORRECTNESS row (green locally every
# round, but round 3 proved local green != driver green). The two
# round-3 contract fixes (q_sequence_pack, q_substring_dedup) stay
# in-window to prove the fixes. Pairwise position swaps keep everything
# else — including the rows-only tail — exactly where it was.
_ROTATE_OUT = [
    "q_window_running",
    "q_window_lag",
    "q_window_ntile",
    "q_union",
    "q_intersect",
    "q_except",
    "q_distinct",
]
_ROTATE_IN = [
    "q_topk_per_stratum",
    "q_incremental_ingest",
    "q_weighted_sample",
    "q_simhash_neardup",
    "q_centroid_assign",
    "q_ivf_topk_exact",
    "q_resize_images",
]


# Second round-4 rotation: the 8 operators ADDED this round (semantic
# dedup, temperature mix, global shuffle, token histogram, audio
# features, contamination report, split assignment, quality cut) have
# never received a driver CORRECTNESS row. Swap them in for 8
# double-driver-green queries (green r1 AND r3) so every new operator
# gets the strong check on its first eligible round.
_ROTATE_OUT_NEW = [
    "q_cube",
    "q_grouping_sets",
    "q_pivot",
    "q_count_distinct",
    "q_percentiles",
    "q_scalar_subquery",
    "q_promo_revenue",
    "q_top_supplier",
]
_ROTATE_IN_NEW = [
    "q_semantic_dedup",
    "q_temperature_mix",
    "q_global_shuffle",
    "q_token_histogram",
    "q_audio_features",
    "q_contamination_report",
    "q_split_assign",
    "q_quality_cut",
]


# Third round-4 rotation: late-round additions (SCD2 history, as-of
# lookup, winnowing fingerprints, cluster-size profile, z-order key),
# also never driver-checked, in for 5 more r1+r3-green queries.
_ROTATE_OUT_LATE = [
    "q_sliding_window",
    "q_semi_join",
    "q_anti_join",
    "q_salted_join",
    "q_order_priority",
    "q_agg_groupby",
    "q_string_funcs",
    "q_date_funcs",
    "q_case_when",
]
_ROTATE_IN_LATE = [
    "q_scd2_history",
    "q_asof_lookup",
    "q_winnow_fingerprints",
    "q_cluster_sizes",
    "q_zorder_value",
    "q_knn_graph",
    "q_temperature_sample",
    "q_corpus_datacard",
    "q_quality_survivors",
]


# Fourth round-4 rotation: boilerplate-prefix detection (the last
# operator added this round), in for one more r1+r3-double-green.
_ROTATE_OUT_FINAL = ["q_forecast_revenue"]
_ROTATE_IN_FINAL = ["q_boilerplate"]


# Fifth round-4 rotation: six more session operators (leakage-safe
# cluster split, near-dup-aware incremental ingest + its report twin,
# quantized ANN, vocabulary coverage, embedding-space decontamination),
# in for six more r1+r3-double-green window queries.
_ROTATE_OUT_R4E = [
    "q_window_rank",
    "q_tumbling_window",
    "q_session_window",
    "q_local_volume",
    "q_top_customers",
    "q_returned_items",
    "q_market_share",
    "q_supplier_part_count",
    "q_small_quantity_revenue",
    "q_disjunctive_revenue",
    "q_dormant_customers",
    "q_volume_shipping",
    "q_product_profit",
    "q_customer_distribution",
    "q_waiting_suppliers",
    "q_large_orders",
    "q_pricing_summary",
    "q_shipping_priority",
    "q_normalize_text",
]
_ROTATE_IN_R4E = [
    "q_leakage_split",
    "q_neardup_ingest",
    "q_quantized_ann",
    "q_ingest_dup_report",
    "q_vocab_coverage",
    "q_semantic_decontaminate",
    "q_bm25",
    "q_rrf_fuse",
    "q_token_budget",
    "q_image_neardup",
    "q_oov_rate",
    "q_charset_quality",
    "q_curation_funnel",
    "q_packing_efficiency",
    "q_event_drift",
    "q_norm_gate",
    "q_bigram_surprisal",
    "q_knn_label_noise",
    "q_shipmode_priority",
]


# Sixth round-4 rotation, position fix-up: q_shipmode_priority
# registers inside tpch_extra (early import), so its insertion shifted
# the pre-rotation window by one and pushed the slot-49 occupant out.
# The R4E swap left q_normalize_text (the intended displacement, driver-
# green r1+r3) at the inherited in-window slot and q_substring_dedup
# (round-3 contract fix — MUST stay in-window) at 50. Swap them back.
_ROTATE_OUT_FIXUP = ["q_normalize_text"]
_ROTATE_IN_FIXUP = ["q_substring_dedup"]


# Seventh round-4 rotation: the last session additions (daily-volume
# OLS trend, C4 blocklist gate), never driver-checked, in for two
# r3-driver-green dedup diagnostics.
_ROTATE_OUT_LAST = ["q_minhash_jaccard_est", "q_dup_clusters_star", "q_chunk_documents"]
_ROTATE_IN_LAST = ["q_event_trend", "q_blocklist", "q_pagerank"]


def _rotate_window() -> None:
    names = list(QUERY_REGISTRY)
    for out_name, in_name in zip(
        _ROTATE_OUT
        + _ROTATE_OUT_NEW
        + _ROTATE_OUT_LATE
        + _ROTATE_OUT_FINAL
        + _ROTATE_OUT_R4E
        + _ROTATE_OUT_FIXUP
        + _ROTATE_OUT_LAST,
        _ROTATE_IN
        + _ROTATE_IN_NEW
        + _ROTATE_IN_LATE
        + _ROTATE_IN_FINAL
        + _ROTATE_IN_R4E
        + _ROTATE_IN_FIXUP
        + _ROTATE_IN_LAST,
    ):
        i, j = names.index(out_name), names.index(in_name)
        names[i], names[j] = names[j], names[i]
    rotated = {n: QUERY_REGISTRY[n] for n in names}
    QUERY_REGISTRY.clear()
    QUERY_REGISTRY.update(rotated)


_rotate_window()

__all__ = ["QUERY_REGISTRY", "Query", "register"]
