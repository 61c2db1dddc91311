"""Physical-plan audits: the 100 TB posture, enforced in CI.

Every registered query's plan must be free of CartesianProduct and
BroadcastNestedLoopJoin (the re-read-one-side-per-row shapes); headline
queries additionally prove broadcast dimension joins, parquet filter
pushdown, and whole-stage codegen coverage.
"""

from __future__ import annotations

import pytest

from cdc_system_spark.plans import audit_plan, plan_features
from cdc_system_spark.queries import QUERY_REGISTRY


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    return {name: q.fn(spark, sf_dir) for name, q in QUERY_REGISTRY.items()}


#: the rounds the oldest-evidence pool is pinned AGAINST. The r8
#: version of this test globbed ALL CORRECTNESS artifacts, so the pin
#: self-expired the moment the driver delivered the next round's file
#: (the r8 verdict's "What's wrong" #1). The pool is pinned as of a
#: NAMED artifact set — delivery of CORRECTNESS_r12.json (or later)
#: cannot change the recompute; the r13 session re-pins from r1-r12.
_POOL_ROUNDS = range(1, 12)

#: the oldest-evidence pool, RECOMPUTED from the eleven committed
#: CORRECTNESS_r01-r11.json artifacts at round-12 start — 35 names
#: whose latest driver-green row is round 7 (the r6 floor cleared in
#: r11: the complete 29-name r6 pool re-confirmed, 50/50 green).
#: _WINDOW_R12 re-confirms these oldest-first after the round-12
#: additions and changed-operator re-confirmations.
R7_EVIDENCE_POOL = {
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
}


def test_oldest_evidence_pool_recorded():
    """The recorded pool matches the artifacts it is pinned against
    (r1-r11 by name — NOT a bare glob, which made the r8 pin expire
    the moment the next driver artifact landed). A checkout missing
    any pinned artifact skips the recompute but still pins the size."""
    import json
    import os

    assert len(R7_EVIDENCE_POOL) == 35
    here = os.path.dirname(__file__)
    arts = [os.path.join(here, "..", f"CORRECTNESS_r{r:02d}.json")
            for r in _POOL_ROUNDS]
    if not all(os.path.exists(p) for p in arts):
        pytest.skip("pinned driver artifacts not in this checkout")
    latest: dict[str, int] = {}
    for rnd, p in zip(_POOL_ROUNDS, arts):
        for name, v in json.load(open(p)).items():
            ok = (v.get("rows_match") and v.get("schema_match")
                  and v.get("hash_match") and not v.get("err"))
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    assert not {n for n, r in latest.items() if r <= 6}, \
        "r6 floor regressed — an artifact changed under the pin"
    recomputed = {n for n, r in latest.items() if r == 7}
    assert recomputed == R7_EVIDENCE_POOL


def test_oracle_window_composition():
    """The driver's CORRECTNESS gate checks only the FIRST 50 registry
    entries. The window is now an explicit list (queries/__init__.py
    ``_WINDOW_R12``) whose invariants ``_set_window`` already enforces
    at import; here we pin the POLICY content: everything never
    driver-checked sits inside, as does everything whose operator
    changed this round (the survivor-literal rescore, the positional
    rename, the shared greedy step, the batch partition pruning), the
    COMPLETE recomputed r7-evidence pool (35 names — the floor moves
    to r8), and no rows-only query wastes a strong-check slot."""
    names = list(QUERY_REGISTRY)
    window = set(names[:50])
    rows_only = [n for n in names[:50] if QUERY_REGISTRY[n].sql is None]
    assert rows_only == [], f"rows-only queries waste oracle slots: {rows_only}"
    must_cover = {
        # new in round 12, never driver-checked:
        "q_ann_prefix_batch",
        "q_mmr_ivf_topk",
        "q_mmr_ivf_batch",
        # operator changed in round 12: pq_exact_rescore went
        # survivor-literal (every single-query PQ/IVFPQ form),
        # ann_prefix_topk gained the same rescore + per-id version
        # collapse, filtered_cosine_topk's rename went positional,
        # mmr_topk's greedy step was factored into _mmr_greedy:
        "q_ann_filtered",
        "q_ann_prefix_topk",
        "q_mmr_topk",
        "q_pq_topk",
        "q_ivfpq_topk",
        "q_ivfpq_topk_stored",
        "q_ivfpq_residual",
        "q_ivfpq_residual_stored",
        # and the batch forms gained probed-cell partition pruning
        # (_probe_many_pinned):
        "q_ann_topk_batch",
        "q_ivfpq_batch",
        "q_ivfpq_residual_batch",
    } | R7_EVIDENCE_POOL
    missing = must_cover - window
    assert not missing, f"rotated out of the oracle window: {sorted(missing)}"


def test_oracle_backed_outputs_are_flat(plans):
    """The driver's row canonicalizer hashes raw values and dies on
    nested columns (round-3 ``q_substring_dedup``: ``array<bigint>`` →
    ``unhashable type: 'list'``). No oracle-backed query may emit
    array/struct/map output — join/format to flat columns instead."""
    from pyspark.sql import types as T

    bad = {}
    for name, q in QUERY_REGISTRY.items():
        if q.sql is None:
            continue  # rows-only queries never reach the canonicalizer
        nested = [
            f.name
            for f in plans[name].schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if nested:
            bad[name] = nested
    assert not bad, f"oracle-backed queries emit nested columns: {bad}"


def test_no_scale_hazard_nodes_anywhere(plans):
    dirty = {name: f for name, df in plans.items() if (f := audit_plan(df))}
    assert not dirty, f"scale-hazard plan nodes: {dirty}"


def test_dim_joins_broadcast(plans):
    # TPC-H Q3/Q5 shapes: small dims must broadcast, not shuffle the fact
    for name in ("q_shipping_priority", "q_local_volume", "q_top_customers"):
        f = plan_features(plans[name])
        assert f["broadcast_hash_joins"] >= 1, f"{name}: no broadcast join\n{f['text']}"


def test_filters_reach_parquet_scan(plans):
    for name in ("q_pricing_summary", "q_shipping_priority", "q_filter_eq"):
        f = plan_features(plans[name])
        assert f["scans_with_pushed_filters"] >= 1, f"{name}: no PushedFilters\n{f['text']}"


def test_hot_paths_stay_in_codegen(plans):
    for name in ("q_pricing_summary", "q_agg_groupby", "q_window_rank"):
        f = plan_features(plans[name], with_codegen=True)
        assert f["codegen_spans"] >= 1, f"{name}: no WholeStageCodegen\n{f['text']}"


def test_python_only_where_intended(plans):
    # Pandas/Arrow stages belong ONLY to the multimodal queries and the
    # grouped-map normalization; every relational/text/dedup path must
    # stay JVM-side.
    pandas_ok = {
        "q_media_decode",
        "q_media_byte_histogram",
        "q_frame_sample",
        "q_resize_images",
        "q_group_normalize",
        "q_ivf_topk",
        "q_ivf_kmeans_topk",
        # SRP-LSH scores candidate buckets with vectorized numpy inside
        # applyInPandas — the bucket-local all-pairs dot products are the
        # one place Arrow batching beats exploded JVM array math.
        "q_srp_lsh_pairs",
        # audio feature extraction is the multimodal decode path: bytes
        # -> windowed PCM features via numpy per Arrow batch
        "q_audio_features",
        # frame fingerprints ride the frame_sample Arrow pass (byte
        # slicing + hashing per frame window)
        "q_scene_changes",
        # the production C=sqrt(n) path assigns cells with the
        # vectorized numpy argmax (auto_cells) — the intended Arrow use
        "q_knn_label_noise_auto",
        # probe tables inline-assign uncovered live rows via the same
        # vectorized numpy pass — the plan carries that Arrow branch
        # (empty at runtime in a well-maintained pipeline)
        "q_ann_probe_maintained",
        # NOTE round 12: the batched IVF/IVFPQ/prefix forms' shared
        # _probe_many Arrow stage no longer appears in their FINAL
        # plans — _probe_many_pinned executes it eagerly
        # (localCheckpoint) so its distinct cells can prune the
        # assignment scan; the returned plan is JVM-only, the stronger
        # property, so those queries sit in the ==0 branch below.
        # Batched MMR keeps an IN-PLAN Arrow stage: the DISTRIBUTED
        # greedy step (applyInPandas per qid group — the scale-correct
        # home for the inherently sequential per-query selection)
        "q_mmr_ivf_batch",
    }
    for name, df in plans.items():
        f = plan_features(df)
        if name in pandas_ok:
            assert f["python_stages"] >= 1, f"{name} lost its mapInPandas stage"
        else:
            assert f["python_stages"] == 0, f"{name}: unexpected Python stage\n{f['text']}"


def test_projection_prunes_columns(plans):
    # q_top_customers projects a few customer columns; ReadSchema must shrink
    text = plan_features(plans["q_top_customers"])["text"]
    scans = [ln for ln in text.splitlines() if "ReadSchema" in ln]
    assert scans and all("c_acctbal" not in ln for ln in scans), text
