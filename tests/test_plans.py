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
        "q_group_normalize",
        "q_ivf_topk",
        "q_ivf_kmeans_topk",
        # SRP-LSH scores candidate buckets with vectorized numpy inside
        # applyInPandas — the bucket-local all-pairs dot products are the
        # one place Arrow batching beats exploded JVM array math.
        "q_srp_lsh_pairs",
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
