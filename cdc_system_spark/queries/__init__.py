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
from cdc_system_spark.queries import llm  # noqa: E402,F401  (86, all oracle-backed)
from cdc_system_spark.queries import multimodal  # noqa: E402,F401  (8)
from cdc_system_spark.queries import llm_rowsonly  # noqa: E402,F401  (5, no oracle)

# Round-9 window: the driver's CORRECTNESS gate strong-checks the
# FIRST 50 registry entries only; the window is an EXPLICIT 50-name
# list. Composition policy (standing since r4), in priority order:
#   1. every oracle-backed query that has NEVER received a driver
#      CORRECTNESS row — the round-9 additions;
#   2. every query whose operator or oracle CHANGED this round;
#   3. remaining slots re-confirm the queries with the OLDEST driver
#      evidence: the COMPLETE 30-name r4-evidence pool (recomputed
#      from the eight CORRECTNESS_r0[1-8] artifacts and pinned in
#      tests/test_plans.py::test_oldest_evidence_pool_recorded), which
#      moves the registry-wide evidence floor to r5, then r5-evidence
#      names oldest-first (alphabetical within the round) in whatever
#      slots remain.
_WINDOW_R9 = [
    # -- 1. new this round, never driver-checked --
    "q_hll_windowed_by",
    "q_hll_merged_by",
    "q_log_pruned_read",
    "q_ann_cell_skew",
    "q_pq_encode",
    "q_pq_topk",
    "q_ivfpq_topk",
    "q_bloom_windowed",
    # -- 2. operator changed this round --
    "q_leakage_split_containment",  # split closure moved to star contraction
    "q_leakage_split_maintained",   # same closure change, trusted-path form
    "q_dup_clusters_star",  # star contraction newly load-bearing (the
    # split family's default closure) — re-confirm it alongside
    "q_leakage_split",  # exact-group form, UNCHANGED (no closure) — an
    # r5-evidence re-confirmation listed here so the split family's
    # three driver rows land in the same artifact
    # -- 3a. the COMPLETE r4-evidence pool (30) — floor moves to r5 --
    "q_asof_lookup",
    "q_audio_features",
    "q_blocklist",
    "q_boilerplate",
    "q_centroid_assign",
    "q_cluster_sizes",
    "q_contamination_report",
    "q_corpus_datacard",
    "q_event_drift",
    "q_event_trend",
    "q_global_shuffle",
    "q_incremental_ingest",
    "q_ivf_topk_exact",
    "q_norm_gate",
    "q_oov_rate",
    "q_packing_efficiency",
    "q_quality_cut",
    "q_quality_survivors",
    "q_resize_images",
    "q_scd2_history",
    "q_shipmode_priority",
    "q_simhash_neardup",
    "q_split_assign",
    "q_temperature_mix",
    "q_temperature_sample",
    "q_token_budget",
    "q_token_histogram",
    "q_topk_per_stratum",
    "q_winnow_fingerprints",
    "q_zorder_value",
    # -- 3b. r5-evidence re-confirmations, oldest-first --
    "q_auto_join",
    "q_bm25",
    "q_charset_quality",
    "q_community_profile",
    "q_countmin",
    "q_countmin_merged",
    "q_curation_funnel",
    "q_curation_pipeline",
]

# the active window (rotated per round; _set_window validates it)
_WINDOW = _WINDOW_R9


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
