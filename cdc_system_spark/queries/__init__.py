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
from cdc_system_spark.queries import llm  # noqa: E402,F401  (77, all oracle-backed)
from cdc_system_spark.queries import multimodal  # noqa: E402,F401  (8)
from cdc_system_spark.queries import llm_rowsonly  # noqa: E402,F401  (5, no oracle)

# Round-7 window: the driver's CORRECTNESS gate strong-checks the
# FIRST 50 registry entries only; the window is an EXPLICIT 50-name
# list. Composition policy (standing since r4), in priority order:
#   1. every oracle-backed query that has NEVER received a driver
#      CORRECTNESS row (r3 proved twice that local green != driver
#      green) — this round, the maintained-containment pair and the
#      index-health stats query;
#   2. every query whose operator or oracle CHANGED this round: the
#      whole containment family (now servable from the maintained LSH
#      signature table), every lsh_index/ann_index consumer (stored
#      n_sh column + stats-state writes landed on their build/ingest
#      paths), and the six queries whose oracles got the r6-tail
#      ROUND→FLOOR half-up rewrite, which r6 deliberately deferred to
#      this window (the advisor called that out — they go FIRST among
#      the changed set);
#   3. remaining slots re-confirm the queries with the OLDEST driver
#      evidence — this closes the r1/r2-only pool COMPLETELY (the
#      last 25 such queries all fit), so after this round no
#      oracle-backed query's latest driver evidence predates r3; the
#      tail picks the r3-evidence queries of most operator variety.
_WINDOW_R7 = [
    # -- 1. new this round, never driver-checked --
    "q_containment_maintained",
    "q_leakage_split_maintained",
    "q_lsh_index_stats",
    "q_kmv_merged_by",
    "q_ann_topk_batch",
    "q_kmv_windowed",
    # -- 2a. oracle changed late in r6 (FLOOR rewrite), deferred here --
    "q_text_quality",
    "q_quality_filter",
    "q_bpe_token_count",
    "q_weighted_sample",
    "q_bigram_surprisal",
    "q_containment_pairs",
    # -- 2b. operator changed this round (containment signature reuse;
    #        index builds now store n_sh + write stats states) --
    "q_drop_contained",
    "q_leakage_split_containment",
    "q_lsh_index_maintained",
    "q_lsh_probe_maintained",
    "q_neardup_ingest",
    "q_ingest_dup_report",
    "q_ann_index_maintained",
    "q_ann_probe_maintained",
    # -- 3a. oldest driver evidence (last green r1/r2) — closes the pool --
    "q_array_ops",
    "q_count",
    "q_filter_eq",
    "q_fingerprint",
    "q_frame_sample",
    "q_from_json",
    "q_hash_sample",
    "q_isin_semijoin",
    "q_lang_id",
    "q_media_byte_histogram",
    "q_media_catalog",
    "q_media_decode",
    "q_project_limit",
    "q_rarity_score",
    "q_redact_pii",
    "q_regex_extract",
    "q_repetition_filter",
    "q_stratified_sample",
    "q_term_frequency",
    "q_tfidf",
    "q_to_json",
    "q_token_count",
    # -- 3b. r3-evidence re-confirmations (variety: flagship TPC-H,
    #        windows, OLAP cube family, skew join, LSH estimate, star CC) --
    "q_pricing_summary",
    "q_shipping_priority",
    "q_window_rank",
    "q_session_window",
    "q_tumbling_window",
    "q_cube",
    "q_salted_join",
    "q_dup_clusters_star",
]

# the active window (rotated per round; _set_window validates it)
_WINDOW = _WINDOW_R7


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
