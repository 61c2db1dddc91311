"""The shipped demos run end-to-end and reproduce the reference's
golden semantics (example_usage.py:114-252; SURVEY §5.2: replica = 8
rows, updated statuses propagate, all changes synced after drain).
The demos assert internally; tests just drive them and spot-check."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from examples.demo import run_basic_demo, run_conflict_demo, run_continuous_sync_demo


def test_basic_demo(spark, tmp_path):
    result = run_basic_demo(spark, str(tmp_path / "basic"))
    assert result == {
        "changes_applied": 17,
        "replica_rows": 8,
        "updated_statuses": 5,
        "pending_after": 0,
        "health": "healthy",
    }


def test_continuous_sync_demo(spark, tmp_path):
    result = run_continuous_sync_demo(spark, str(tmp_path / "cont"))
    assert result["replica_rows"] == 8
    assert result["replica_rows_after_redrain"] == 8
    assert result["updated_statuses"] == 5


def test_conflict_demo(spark):
    result = run_conflict_demo(spark)
    assert result["lww_winner_key_100"] == "B"
    assert result["fww_winner_key_100"] == "A"
    assert result["merged_rows"] == 2


def test_corpus_pipeline_demo(spark, tmp_path):
    from examples.corpus_pipeline import run_corpus_pipeline_demo

    report = run_corpus_pipeline_demo(spark, str(tmp_path / "cp"))
    assert report["corpus"][1].endswith("today")
    assert report["overlap_est"] >= 1.0
    assert report["index_dropped"] >= 1
