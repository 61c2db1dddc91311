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

# Round-11 window: the driver's CORRECTNESS gate strong-checks the
# FIRST 50 registry entries only; the window is an EXPLICIT 50-name
# list. Composition policy (standing since r4), in priority order:
#   1. every oracle-backed query that has NEVER received a driver
#      CORRECTNESS row — round 11 adds four (metadata-filtered
#      retrieval, the Matryoshka prefix-rescore cascade, the MMR
#      diversified rerank, and the stored-prefix IVF cascade over the
#      maintained index);
#   2. every query whose operator CHANGED this round (r10 flags: none
#      — CORRECTNESS_r10 was 50/50 green): ann_index build/ingest/
#      attach gained the prefix tier, the tier-consistency checks and
#      the books-last attach ordering, so the whole maintained-ANN
#      family that exercises build+ingest(+attach) re-confirms — the
#      r10 precedent for the PQ-tier probe;
#   3. remaining slots re-confirm the queries with the OLDEST driver
#      evidence: the COMPLETE 29-name r6-evidence pool (recomputed
#      from the ten CORRECTNESS_r01-r10 artifacts, the r10 verdict's
#      pinned list, re-pinned in tests/test_plans.py::
#      test_oldest_evidence_pool_recorded), which moves the
#      registry-wide evidence floor to r7, then r7-evidence names
#      oldest-first (alphabetical within the round) in the 9 slots
#      that remain.
_WINDOW_R11 = [
    # -- 1. new this round, never driver-checked --
    "q_ann_filtered",
    "q_matryoshka_topk",
    "q_mmr_topk",
    "q_ann_prefix_topk",
    # -- 2. operator changed this round (maintained-ANN ingest/attach) --
    "q_ann_index_maintained",
    "q_ann_probe_maintained",
    "q_ann_topk_batch",
    "q_ann_cell_skew",
    "q_ivfpq_topk_stored",
    "q_ivfpq_batch",
    "q_ivfpq_residual_stored",
    "q_ivfpq_residual_batch",
    # -- 3a. the COMPLETE r6-evidence pool (29) — floor moves to r7 --
    "q_embedding_topk",
    "q_equidepth_histogram",
    "q_equidepth_sketch",
    "q_event_enrichment",
    "q_funnel",
    "q_fuzzy_dedup",
    "q_gap_fill",
    "q_kmv_by_type",
    "q_kmv_distinct",
    "q_kmv_merged",
    "q_knn_graph",
    "q_merge_apply",
    "q_minhash_lsh_pairs",
    "q_minhash_signature",
    "q_ngram_jaccard",
    "q_pending_changes",
    "q_quantile_sketch",
    "q_quantiles_by_type",
    "q_quantiles_merged",
    "q_range_join",
    "q_retention_cohorts",
    "q_rollup",
    "q_sample_merged",
    "q_selectivity_merged",
    "q_semantic_decontaminate",
    "q_semantic_dedup",
    "q_simhash",
    "q_snapshot_diff",
    "q_srp_lsh_pairs",
    # -- 3b. r7-evidence re-confirmations, oldest-first --
    "q_array_ops",
    "q_bigram_surprisal",
    "q_bpe_token_count",
    "q_containment_maintained",
    "q_containment_pairs",
    "q_count",
    "q_cube",
    "q_drop_contained",
    "q_filter_eq",
]

# the active window (rotated per round; _set_window validates it)
_WINDOW = _WINDOW_R11


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
