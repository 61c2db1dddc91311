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


#: the oldest-evidence pool, RECOMPUTED from the seven committed
#: CORRECTNESS_r*.json artifacts at round-8 start (the r7 verdict's
#: task 2: pin the recomputed list, not the builder's estimate —
#: r7 SURVEY said 36, the artifacts say 39). Every name's latest
#: driver-green row is round 3; _WINDOW_R8 re-confirms ALL of them,
#: moving the registry-wide evidence floor to r4.
R3_EVIDENCE_POOL = {
    "q_agg_groupby", "q_anti_join", "q_case_when", "q_chunk_documents",
    "q_count_distinct", "q_customer_distribution", "q_date_funcs",
    "q_disjunctive_revenue", "q_distinct", "q_dormant_customers",
    "q_except", "q_forecast_revenue", "q_grouping_sets", "q_intersect",
    "q_large_orders", "q_local_volume", "q_market_share",
    "q_minhash_jaccard_est", "q_normalize_text", "q_order_priority",
    "q_percentiles", "q_pivot", "q_product_profit", "q_promo_revenue",
    "q_returned_items", "q_scalar_subquery", "q_semi_join",
    "q_sliding_window", "q_small_quantity_revenue", "q_string_funcs",
    "q_supplier_part_count", "q_top_customers", "q_top_supplier",
    "q_union", "q_volume_shipping", "q_waiting_suppliers",
    "q_window_lag", "q_window_ntile", "q_window_running",
}


def test_oldest_evidence_pool_recorded():
    """The recorded pool matches the artifacts when they are present
    (the repo ships all seven CORRECTNESS files; a checkout without
    them skips the recompute but still pins the list's size)."""
    import glob
    import json
    import os

    assert len(R3_EVIDENCE_POOL) == 39
    arts = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                         "CORRECTNESS_r0*.json")))
    if len(arts) < 7:
        pytest.skip("driver artifacts not in this checkout")
    latest: dict[str, int] = {}
    for p in arts:
        rnd = int(p.rsplit("_r", 1)[1].split(".")[0])
        for name, v in json.load(open(p)).items():
            ok = (v.get("rows_match") and v.get("schema_match")
                  and v.get("hash_match") and not v.get("err"))
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    recomputed = {n for n, r in latest.items() if r == 3}
    assert recomputed == R3_EVIDENCE_POOL


def test_oracle_window_composition():
    """The driver's CORRECTNESS gate checks only the FIRST 50 registry
    entries. The window is now an explicit list (queries/__init__.py
    ``_WINDOW_R8``) whose invariants ``_set_window`` already enforces
    at import; here we pin the POLICY content: everything never
    driver-checked sits inside, as does everything whose operator or
    oracle changed this round, the COMPLETE recomputed r3-evidence
    pool (39 names — the floor moves to r4), and no rows-only query
    wastes a strong-check slot."""
    names = list(QUERY_REGISTRY)
    window = set(names[:50])
    rows_only = [n for n in names[:50] if QUERY_REGISTRY[n].sql is None]
    assert rows_only == [], f"rows-only queries waste oracle slots: {rows_only}"
    must_cover = {
        # new in round 8, never driver-checked:
        "q_containment_ingest",
        "q_url_dedup",
        "q_index_overlap",
        "q_index_staleness",
        "q_kmv_windowed_by",
        "q_zone_pruned_read",
        # operator or oracle changed in round 8 (C=16 literal
        # centroids + vote winner folded into the totals aggregation;
        # the maintained split moved to the trusted signature path):
        "q_knn_label_noise",
        "q_leakage_split_maintained",
        "q_kmv_intersection",
    } | R3_EVIDENCE_POOL
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
        # batch IVF probe selection is the same vectorized-numpy Arrow
        # pass as the assignment side (literal-key DataFrame joins
        # constant-fold into the forbidden BNLJ; literal explode stops
        # scaling at C = sqrt(n))
        "q_ann_topk_batch",
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
