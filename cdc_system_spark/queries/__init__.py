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
from cdc_system_spark.queries import analytics  # noqa: E402,F401  (28)
from cdc_system_spark.queries import tpch_extra  # noqa: E402,F401  (16)
from cdc_system_spark.queries import curation  # noqa: E402,F401  (26)
from cdc_system_spark.queries import temporal  # noqa: E402,F401  (2)
from cdc_system_spark.queries import conflicts  # noqa: E402,F401  (3)
from cdc_system_spark.queries import events  # noqa: E402,F401  (19)
from cdc_system_spark.queries import cdc_queries  # noqa: E402,F401  (13)
from cdc_system_spark.queries import llm  # noqa: E402,F401  (74, all oracle-backed)
from cdc_system_spark.queries import multimodal  # noqa: E402,F401  (8)
from cdc_system_spark.queries import llm_rowsonly  # noqa: E402,F401  (5, no oracle)

# Round-6 window: the driver's CORRECTNESS gate strong-checks the
# FIRST 50 registry entries only; the window is an EXPLICIT 50-name
# list. Composition policy (standing since r4), in priority order:
#   1. every oracle-backed query that has NEVER received a driver
#      CORRECTNESS row (r3 proved twice that local green != driver
#      green) — after r5 closed the backlog that is only what is NEW
#      this round;
#   2. every query whose operator or oracle CHANGED this round (the
#      r5-tail advisor fixes: bloom probe rewritten to the packed-word
#      literal, near-dup ingest's within-batch band reuse, equidepth
#      secondary sort key; plus this round's assigned=/auto_cells
#      two-level surface on the cell-blocked similarity family);
#   3. remaining slots re-confirm the queries with the OLDEST driver
#      evidence — the 48 whose only green rows are r1/r2 (locally
#      re-verified every round, but rotated out of the driver gate
#      since; 35 of them fit, the 13 simplest projections wait).
_WINDOW_R6 = [
    # -- 1. new this round, never driver-checked --
    "q_leakage_split_containment",
    "q_ann_index_maintained",
    "q_lsh_index_maintained",
    "q_kmv_distinct",
    "q_kmv_merged",
    "q_kmv_intersection",
    "q_gap_fill",
    "q_cluster_canonical",
    "q_bloom_merged",
    "q_kmv_by_type",
    "q_sample_merged",
    "q_selectivity_merged",
    "q_ann_probe_maintained",
    "q_lsh_probe_maintained",
    # -- 2. operator or oracle changed this round --
    "q_bloom_prune",
    "q_bloom_semi_join",
    "q_neardup_ingest",
    "q_ingest_dup_report",
    "q_equidepth_sketch",
    "q_equidepth_histogram",
    "q_quantile_sketch",
    "q_quantiles_merged",
    "q_quantiles_by_type",
    "q_semantic_dedup",
    "q_knn_graph",
    "q_knn_label_noise",
    "q_semantic_decontaminate",
    # -- 3. oldest driver evidence (last green r1/r2) --
    "q_merge_apply",
    "q_snapshot_diff",
    "q_pending_changes",
    "q_change_stats",
    "q_rollup",
    "q_conflict_field_merge",
    "q_conflict_fww",
    "q_conflict_manual_queue",
    "q_asof_join",
    "q_range_join",
    "q_event_enrichment",
    "q_funnel",
    "q_retention_cohorts",
    "q_dedup_exact",
    "q_dup_clusters",
    "q_fuzzy_dedup",
    "q_minhash_signature",
    "q_minhash_lsh_pairs",
    "q_ngram_jaccard",
    "q_simhash",
    "q_srp_lsh_pairs",
    "q_decontaminate",
    "q_embedding_topk",
]

# the active window (rotated per round; _set_window validates it)
_WINDOW = _WINDOW_R6


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
