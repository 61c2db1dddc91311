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
#: NAMED artifact set — delivery of CORRECTNESS_r13.json (or later)
#: cannot change the recompute; the r14 session re-pins from r1-r13.
_POOL_ROUNDS = range(1, 13)

#: the oldest-evidence pool, RECOMPUTED from the twelve committed
#: CORRECTNESS_r01-r12.json artifacts at round-13 start — 48 names
#: whose latest driver-green row is round 8 (the r7 floor cleared in
#: r12: the complete 35-name r7 pool re-confirmed, 50/50 green).
#: _WINDOW_R13 re-confirms these oldest-first after the ten
#: changed-operator re-confirmations; the 6 names past slot 50
#: (q_volume_shipping .. q_zone_pruned_read, alphabetically last)
#: roll to the round-14 window.
R8_EVIDENCE_POOL = {
    "q_anti_join",
    "q_case_when",
    "q_chunk_documents",
    "q_containment_ingest",
    "q_count_distinct",
    "q_customer_distribution",
    "q_date_funcs",
    "q_disjunctive_revenue",
    "q_distinct",
    "q_dormant_customers",
    "q_except",
    "q_forecast_revenue",
    "q_grouping_sets",
    "q_image_neardup",
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
    "q_volume_shipping",
    "q_waiting_suppliers",
    "q_window_lag",
    "q_window_ntile",
    "q_window_running",
    "q_zone_pruned_read",
}

#: pool names that did NOT fit the 50-slot window this round (the
#: alphabetical tail); the round-14 rotation re-confirms these first
_POOL_ROLLED_TO_R14 = {
    "q_volume_shipping",
    "q_waiting_suppliers",
    "q_window_lag",
    "q_window_ntile",
    "q_window_running",
    "q_zone_pruned_read",
}


def test_oldest_evidence_pool_recorded():
    """The recorded pool matches the artifacts it is pinned against
    (r1-r12 by name — NOT a bare glob, which made the r8 pin expire
    the moment the next driver artifact landed). A checkout missing
    any pinned artifact skips the recompute but still pins the size."""
    import json
    import os

    assert len(R8_EVIDENCE_POOL) == 48
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
    assert not {n for n, r in latest.items() if r <= 7}, \
        "r7 floor regressed — an artifact changed under the pin"
    recomputed = {n for n, r in latest.items() if r == 8}
    assert recomputed == R8_EVIDENCE_POOL


def test_oracle_window_composition():
    """The driver's CORRECTNESS gate checks only the FIRST 50 registry
    entries. The window is an explicit list (queries/__init__.py
    ``_WINDOW_R13``) whose invariants ``_set_window`` already enforces
    at import; here we pin the POLICY content: every query whose
    operator changed in the r13 optimization round sits inside (the
    paired-round CC loops, the deferred Hamming distinct, the derived
    unigram counts, the spread estimator's derived-frame call sites),
    the recomputed r8-evidence pool fills every remaining slot
    oldest-first (42 of 48 fit; the named alphabetical tail rolls to
    r14), and no rows-only query wastes a strong-check slot."""
    names = list(QUERY_REGISTRY)
    window = set(names[:50])
    rows_only = [n for n in names[:50] if QUERY_REGISTRY[n].sql is None]
    assert rows_only == [], f"rows-only queries waste oracle slots: {rows_only}"
    changed_r13 = {
        # both CC loops run paired rounds with a fused signature action:
        "q_dup_clusters",
        "q_dup_clusters_star",
        "q_leakage_split_containment",
        "q_leakage_split_maintained",
        "q_curation_pipeline",
        # hamming_band_pairs defers its distinct behind the filter:
        "q_simhash_neardup",
        "q_image_neardup",
        # unigram counts derived from the bigram aggregate:
        "q_bigram_surprisal",
        # spread()'s plan-walking estimator (derived-frame ingest paths):
        "q_neardup_ingest",
        "q_containment_ingest",
    }
    must_cover = changed_r13 | (R8_EVIDENCE_POOL - _POOL_ROLLED_TO_R14)
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
