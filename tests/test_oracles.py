"""Every oracle SQL must parse and plan in DuckDB — a seconds-fast
guard that catches SQL typos/renames without spinning up Spark (the
full value comparison runs in tools/verify_local.py and the driver)."""

from __future__ import annotations

import duckdb
import pytest

from cdc_system_spark.queries import QUERY_REGISTRY
from cdc_system_spark.sources.catalog import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_every_oracle_sql_plans(con):
    bad = {}
    for name, q in QUERY_REGISTRY.items():
        if q.sql is None:
            continue
        try:
            con.execute(f"EXPLAIN {q.sql}")
        except Exception as e:  # noqa: BLE001 — collecting all failures
            bad[name] = str(e).splitlines()[0]
    assert not bad, f"oracle SQL fails to plan: {bad}"


def test_oracle_count_matches_registry():
    oracle_backed = [n for n, q in QUERY_REGISTRY.items() if q.sql is not None]
    rows_only = [n for n, q in QUERY_REGISTRY.items() if q.sql is None]
    # rows-only queries are a deliberate, enumerated exception
    assert rows_only == [
        "q_ivf_topk",
        "q_group_normalize",
        "q_ivf_kmeans_topk",
        # round 7: ANN index-health stats — the version key JSON-renders
        # the vector, Spark-internal; pytest parity + the oracle-backed
        # LSH twin (q_lsh_index_stats) carry the proof
        "q_ann_index_stats",
        # round 5: the corpus-scaled label-noise path — centroids are
        # data-dependent, so no literal-SQL oracle is possible
        "q_knn_label_noise_auto",
        # round 10: the IVFPQ recall diagnostics — the recall surface
        # is a data-dependent composition of the whole stack (a
        # literal oracle would be the IVFPQ SQL x grid x queries);
        # arithmetic numpy-pinned in tests/test_ann_index.py
        "q_pq_recall",
        "q_pq_recall_residual",
        # round 11: base-vs-Lloyd-refined books A/B and the refined-
        # books stored probe — refined centroids are data-dependent
        # (the q_knn_label_noise_auto precedent); monotonicity and
        # stored-tier parity pinned in tests/test_ann_index.py
        "q_pq_recall_refined",
        "q_ivfpq_residual_refined",
        # round 12: the prefix-tier recall evaluator — same
        # data-dependent-composition reasoning as its PQ twins; the
        # cascade itself is oracle-pinned by q_ann_prefix_topk and
        # the full-knob saturation is pytest-pinned
        "q_prefix_recall",
    ]
    assert len(oracle_backed) + len(rows_only) == len(QUERY_REGISTRY)
