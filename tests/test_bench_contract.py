"""The driver-facing bench output contract (r5 regression: the single
all-detail final line outgrew the driver's 2000-char stdout tail and
BENCH_r05.json came back unparseable). Pure-python — no Spark."""

import json

import bench


def test_compact_line_under_cap_for_current_headline():
    # the 75-name round-11 headline no longer fits the cap whole: the
    # fold must engage (smallest minima into "other"), keep the GREAT
    # MAJORITY of names (the driver's cross-round shared set), and
    # preserve the total. Uniform timings = worst case for the fold
    # (every fold choice is a tie); realistic runs fold fewer names.
    timings = {name: 3.141 for name in bench.HEADLINE}
    line = bench._compact_line(sum(timings.values()), timings, 99.9, 0.1)
    assert len(line) <= bench._LINE_CAP
    rec = json.loads(line)
    assert rec["metric"] == "headline_queries_total"
    kept = set(rec["queries"]) - {"other"}
    assert kept <= set(bench.HEADLINE)
    assert len(kept) >= 50, f"fold kept only {len(kept)} names"
    assert abs(rec["value"] - sum(timings.values())) < 0.5
    assert abs(sum(rec["queries"].values()) - rec["value"]) < 0.5


def test_compact_line_folds_rather_than_exceeding_cap():
    # pathological growth: 200 long-named queries cannot fit — the
    # smallest minima fold into "other" and the line still parses
    timings = {f"q_very_long_headline_query_name_{i:03d}": 0.01 * (i + 1)
               for i in range(200)}
    total = sum(timings.values())
    line = bench._compact_line(total, timings, total, 0.1)
    assert len(line) <= bench._LINE_CAP
    rec = json.loads(line)
    assert rec["queries_omitted"] > 0
    assert "other" in rec["queries"]
    # folding preserves the total within rounding slack
    assert abs(sum(rec["queries"].values()) - total) < 0.01 * len(timings)
    # the LARGEST minima survive by name (what cross-round reads need)
    kept = set(rec["queries"]) - {"other"}
    assert "q_very_long_headline_query_name_199" in kept


def test_regression_baseline_loads_latest_committed_local():
    name, rec = bench._load_prev()
    # the repo carries committed BENCH_LOCAL_r*.json records
    assert name is not None and name.startswith("BENCH_LOCAL_r")
    mins = rec.get("queries", {})
    assert mins and all(isinstance(v, float) for v in mins.values())
    # r8 adjudication inputs: the baseline's medians ride along
    assert rec.get("queries_median")


def test_headline_names_all_registered():
    from cdc_system_spark.queries import QUERY_REGISTRY

    missing = [n for n in bench.HEADLINE if n not in QUERY_REGISTRY]
    assert not missing


def test_compact_line_carries_cpu_calibration():
    # r10 verdict task 3: the driver archives only the compact line,
    # and every drift adjudication hinges on the calibration — the two
    # floats must survive in the driver-parsed record, inside the cap
    timings = {name: 3.141 for name in bench.HEADLINE}
    cal = {"python_sec": 0.412, "jvm_hash_sec": 0.271}
    line = bench._compact_line(sum(timings.values()), timings, 99.9, 0.1, cal)
    assert len(line) <= bench._LINE_CAP
    rec = json.loads(line)
    assert rec["cal_py"] == 0.412 and rec["cal_jvm"] == 0.271


def test_ingest_gates_are_drift_relative():
    # r10 verdict task 1: the pinned gates scale with the same run's
    # measured same-kernel family drift, and the family excludes the
    # gated queries themselves (a gated regression must not loosen its
    # own gate). The r10 driver reading (4.47 s on a box whose family
    # drifted ~1.26x vs the gate box) adjudicates INSIDE the
    # driver-form gate under this rule.
    assert bench._INGEST_GATE_BASE["q_neardup_ingest"] == 3.6
    assert bench._INGEST_GATE_BASE["q_containment_ingest"] == 4.5
    assert not set(bench._INGEST_GATE_BASE) & set(bench._INGEST_GATE_FAMILY)
    assert set(bench._INGEST_GATE_FAMILY) <= set(bench.HEADLINE)
    driver_gate = 4.0  # the committed base's driver-form headroom
    assert 4.47 <= driver_gate * 1.26
