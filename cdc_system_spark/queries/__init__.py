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

# Round-12 window: the driver's CORRECTNESS gate strong-checks the
# FIRST 50 registry entries only; the window is an EXPLICIT 50-name
# list. Composition policy (standing since r4), in priority order:
#   1. every oracle-backed query that has NEVER received a driver
#      CORRECTNESS row — round 12 adds two (the batched stored-prefix
#      cascade and MMR over the IVF-pruned pool, the r11 verdict's
#      tasks 1-2);
#   2. every query whose operator CHANGED this round: the shared
#      pq_exact_rescore now rescores through a survivor-literal
#      pushed-down IN scan (every single-query PQ/IVFPQ form),
#      ann_prefix_topk gained the same rescore plus the per-id
#      version collapse (r11 advisor), filtered_cosine_topk's rename
#      went positional, and mmr_topk's greedy step was factored into
#      the shared _mmr_greedy — each covering query re-confirms;
#   3. remaining slots re-confirm the queries with the OLDEST driver
#      evidence: the COMPLETE 35-name r7-evidence pool (recomputed
#      from the eleven CORRECTNESS_r01-r11 artifacts, re-pinned in
#      tests/test_plans.py::test_oldest_evidence_pool_recorded),
#      which moves the registry-wide evidence floor to r8, then
#      r8-evidence names oldest-first (alphabetical within the round)
#      in the 5 slots that remain.
_WINDOW_R12 = [
    # -- 1. new this round, never driver-checked --
    "q_ann_prefix_batch",
    "q_mmr_ivf_topk",
    "q_mmr_ivf_batch",
    # -- 2. operator changed this round (survivor-literal rescore /
    #       positional rename / shared greedy step) --
    "q_ann_filtered",
    "q_ann_prefix_topk",
    "q_mmr_topk",
    "q_pq_topk",
    "q_ivfpq_topk",
    "q_ivfpq_topk_stored",
    "q_ivfpq_residual",
    "q_ivfpq_residual_stored",
    # the batch forms now pin their assignment scans to the probed
    # partitions via the materialized probe's distinct cell list
    # (_probe_many_pinned) — the equi-join alone scanned every cell
    "q_ann_topk_batch",
    "q_ivfpq_batch",
    "q_ivfpq_residual_batch",
    # -- 3a. the COMPLETE r7-evidence pool (35) — floor moves to r8 --
    "q_fingerprint",
    "q_frame_sample",
    "q_from_json",
    "q_hash_sample",
    "q_ingest_dup_report",
    "q_isin_semijoin",
    "q_kmv_merged_by",
    "q_kmv_windowed",
    "q_lang_id",
    "q_lsh_index_maintained",
    "q_lsh_index_stats",
    "q_lsh_probe_maintained",
    "q_media_byte_histogram",
    "q_media_catalog",
    "q_media_decode",
    "q_neardup_ingest",
    "q_pricing_summary",
    "q_project_limit",
    "q_quality_filter",
    "q_rarity_score",
    "q_redact_pii",
    "q_regex_extract",
    "q_repetition_filter",
    "q_salted_join",
    "q_session_window",
    "q_shipping_priority",
    "q_stratified_sample",
    "q_term_frequency",
    "q_text_quality",
    "q_tfidf",
    "q_to_json",
    "q_token_count",
    "q_tumbling_window",
    "q_weighted_sample",
    "q_window_rank",
    # -- 3b. r8-evidence re-confirmations, oldest-first --
    "q_agg_groupby",
]

# the active window (rotated per round; _set_window validates it)
_WINDOW = _WINDOW_R12


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
