"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (two layers — the r5 lesson, where the single
all-detail final line outgrew the driver's 2000-char stdout tail and
BENCH_r05.json came back unparseable):

- the FULL record (per-query minima AND medians at 3 decimals, totals,
  regression flags vs the last committed BENCH_LOCAL_r*.json) is
  WRITTEN to $SPARK_GRAFT_BENCH_OUT (default ``BENCH_FULL.json`` in the
  repo root) and also printed on its own stdout line ABOVE the final
  line, for humans and committed-artifact diffing. Every flag carries
  a machine-readable ``adjudication`` ("confirmed-regression" when the
  median exceeds the 1.3x gate too, "box-drift" when the median
  contradicts the min), and the record carries the git heads plus the
  source files changed since the baseline's commit — a stranger can
  adjudicate a flag from the artifact alone (r7 verdict task 1);
- the LAST stdout line — the only thing the driver parses — is a
  compact JSON guaranteed < 1800 chars: ``{"metric", "value" (= total
  of per-query minima), "unit", "queries" (per-query minima only, 2
  decimals), "median_total", "sf"}``. If a future headline-list growth
  would push it past the cap, the smallest minima are summed into
  ``"other"`` and counted in ``"queries_omitted"`` rather than ever
  exceeding the cap.

Each query is executed to completion via a noop-format write: every
output column is actually computed (a bare count() lets Catalyst prune
the projections, so map-heavy queries would measure ~nothing — rounds
1-2 under-measured exactly those), while results stay distributed — no
driver collect in the timed path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_system_spark.queries import QUERY_REGISTRY  # noqa: E402
from cdc_system_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q_pricing_summary",
    "q_shipping_priority",
    "q_local_volume",
    "q_top_customers",
    "q_merge_apply",
    "q_snapshot_diff",
    "q_window_rank",
    "q_session_window",
    "q_tumbling_window",
    "q_dedup_exact",
    "q_minhash_lsh_pairs",
    "q_simhash",
    "q_embedding_topk",
    "q_text_quality",
    "q_frame_sample",
    "q_asof_join",
    "q_range_join",
    "q_forecast_revenue",
    "q_returned_items",
    "q_market_share",
    "q_large_orders",
    "q_srp_lsh_pairs",
    "q_funnel",
    "q_retention_cohorts",
    # round-2 corpus-curation additions
    "q_tfidf",
    "q_repetition_filter",
    "q_decontaminate",
    # round-3 additions: the composed pipeline + passage dedup + chunking
    "q_curation_pipeline",
    "q_substring_dedup",
    "q_chunk_documents",
    # round-4 additions: semantic dedup, training order, fingerprints,
    # SCD2 history (cross-round comparisons use the shared subset)
    "q_semantic_dedup",
    "q_global_shuffle",
    "q_winnow_fingerprints",
    "q_scd2_history",
    # round-4 session additions: batch-vs-corpus LSH admission,
    # quantized ANN, embedding decontamination, vocab coverage
    "q_neardup_ingest",
    "q_quantized_ann",
    "q_semantic_decontaminate",
    "q_vocab_coverage",
    "q_image_neardup",
    "q_bm25",
    # late round-4 additions: perplexity-proxy quality, label noise,
    # blocklist gate, similarity-graph PageRank, Q12 fact-fact join
    "q_bigram_surprisal",
    "q_knn_label_noise",
    "q_blocklist",
    "q_pagerank",
    "q_shipmode_priority",
    # round-5 additions: the bounded-state sketch family (scalar,
    # grouped, merged-state), bloom pruning, zone maps, covariance
    "q_quantile_sketch",
    "q_equidepth_sketch",
    "q_hll_distinct",
    "q_hll_by_type",
    "q_quantiles_by_type",
    "q_hll_merged",
    "q_quantiles_merged",
    "q_bloom_prune",
    "q_zone_map",
    "q_embedding_cov",
    "q_winsorize",
    # literal-4-cell q_knn_label_noise (above) is the oracle-parity
    # form; this is the corpus-scaled production path (C = sqrt(n))
    "q_knn_label_noise_auto",
    # round-6 addition: containment-aware leakage-safe split (pair
    # gen -> connected components -> group-keyed assignment)
    "q_leakage_split_containment",
    # round-8 additions (r7 verdict task 3): the MAINTAINED-index forms
    # next to their from-scratch twins — the headline should time the
    # plan you'd run at 100x, not only the inline recompute
    "q_leakage_split_maintained",
    "q_ann_topk_batch",
    "q_kmv_windowed",
    # round-9 addition (r8 verdict task 6): the containment-admission
    # ingest path next to q_neardup_ingest — correctness went green in
    # r8 but it had no committed perf line; its gate is pinned in
    # BENCH_NOTES_r09.md alongside q_neardup_ingest's
    "q_containment_ingest",
    # round-9 late additions: the PQ ANN tier (ADC over codes only)
    # and its IVF composition — the plans the 100 TB retrieval path
    # actually runs; first committed solo lines in BENCH_NOTES_r09.md
    "q_pq_topk",
    "q_ivfpq_topk",
    # round-10 additions: the STORED-codes IVFPQ (encode-at-ingest —
    # stage 2 reads code columns, never derives them) next to the
    # in-plan q_ivfpq_topk twin, and the batched form (three queries,
    # one plan, per-query in-plan LUTs) — the probe-time saving and
    # the amortized-retrieval plan respectively
    "q_ivfpq_topk_stored",
    "q_ivfpq_batch",
    # and the residual-encoded IVFADC (per-cell LUTs over
    # v - centroid(cell) codes) — the FAISS-shaped capstone, plus its
    # encode-at-attach/ingest stored form
    "q_ivfpq_residual",
    "q_ivfpq_residual_stored",
    "q_ivfpq_residual_batch",
    # round-11 additions: the stored-codes probe on the LLOYD-REFINED
    # residual books (same plan physics as q_ivfpq_residual_stored —
    # the line proves refinement is free at probe time, while
    # q_pq_recall_refined shows what it buys in recall), plus the two
    # new retrieval primitives: metadata-filtered top-k and the
    # Matryoshka prefix-rescore cascade
    "q_ivfpq_residual_refined",
    "q_ann_filtered",
    "q_matryoshka_topk",
    "q_mmr_topk",
    # and the stored-prefix IVF cascade over the maintained index (the
    # Matryoshka saving made real at the storage layer: the coarse scan
    # reads vec_id + pvec only — ReadSchema pinned in tests)
    "q_ann_prefix_topk",
    # round-12 additions (r11 verdict tasks 1-2): the BATCHED
    # stored-prefix cascade (three queries share one probe/coarse/
    # rescore plan — amortization vs 3x q_ann_prefix_topk) and MMR
    # with its pool stage pruned by the maintained IVF index (the last
    # retrieval path that read every vector byte, removed)
    "q_ann_prefix_batch",
    "q_mmr_ivf_topk",
    "q_mmr_ivf_batch",
    # round-12 additions (r11 verdict task 6): the weighted/temperature
    # sampling family's sf0.1 lines next to the stratified form's —
    # driver-green since r7/r9 but never benched
    "q_weighted_sample",
    "q_temperature_mix",
    "q_temperature_sample",
    "q_quality_cut",
]


#: compact-final-line budget: the driver captures the last 2000 chars
#: of stdout; stay comfortably under it
_LINE_CAP = 1800

#: a regression flag requires BOTH >1.3x relative AND more than this
#: many seconds of absolute min increase (see the adjudication comment
#: in main) — sub-second queries wobble past a pure ratio gate on
#: scheduler noise alone
_MIN_FLAG_DELTA = 0.25

#: pinned gates for the two hash-kernel-bound ingest-admission queries
#: (committed-record form; the driver form adds the same ~1.1x headroom
#: as always: 4.0 and 5.0). The gates are DRIFT-RELATIVE (r10 verdict
#: task 1): the r10 driver read q_neardup_ingest 4.47 > the absolute
#: 4.0 gate on a measurably 1.26x-slower box — an absolute gate
#: false-alarms every round the box drifts. The scaler is the SAME
#: RUN's measured drift over the pinned same-kernel family below
#: (min-sum ratio vs the pinned gate-frame minima, gated queries
#: excluded),
#: not the cpu_calibration probe: round 11 measured the 0.3 s jvm_hash
#: probe swinging 0.131-1.192 s across one idle day on this
#: virtualized box while 20-minute query aggregates moved ±10% — an
#: instantaneous probe cannot represent the window the gated queries
#: ran in, but their own family can. The probes stay in the record as
#: box-state evidence.
_INGEST_GATE_BASE = {"q_neardup_ingest": 3.6, "q_containment_ingest": 4.5}

#: the gate-scaling family: hash/shingle-kernel-bound headline queries,
#: all present since r4 (stable cross-round), excluding the gated
#: queries themselves — the r10 NOTES' family-split analysis, automated.
#: Values = each query's min in the GATE-DERIVATION record
#: (BENCH_LOCAL_r10, the frame the 3.6/4.5 bases were pinned in): the
#: drift scaler divides this run's family minima by THESE constants,
#: not by whatever BENCH_LOCAL is latest — otherwise every committed
#: baseline rotation would silently re-anchor the gates to a new box
#: frame and the pinned bases would mean something different each round
_INGEST_GATE_FAMILY = {
    "q_minhash_lsh_pairs": 1.460,
    "q_srp_lsh_pairs": 1.208,
    "q_tfidf": 1.051,
    "q_substring_dedup": 1.044,
    "q_curation_pipeline": 4.692,
    "q_semantic_dedup": 1.743,
    "q_winnow_fingerprints": 0.458,
}


def _load_prev() -> tuple[str | None, dict]:
    """The LATEST committed BENCH_LOCAL_r*.json record — the
    regression-gate baseline (driver BENCH_r* files are a different
    machine; the committed locals are same-box controlled runs)."""
    import glob
    import re

    best: tuple[int, str] | None = None
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "BENCH_LOCAL_r*.json")):
        m = re.search(r"BENCH_LOCAL_r(\d+)", os.path.basename(path))
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), path)
    if best is None:
        return None, {}
    try:
        with open(best[1]) as f:
            return os.path.basename(best[1]), json.load(f)
    except (OSError, ValueError):
        return None, {}


def _git(*args: str) -> str:
    import subprocess

    try:
        return subprocess.run(
            ["git", *args],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=30,
        ).stdout.strip()
    except Exception:
        return ""


def _compact_line(total: float, timings: dict[str, float],
                  median_total: float, sf: float,
                  cpu_cal: dict | None = None) -> str:
    """The driver-parsed final line: minima at 2 decimals, hard-capped
    at _LINE_CAP chars by folding the SMALLEST minima into "other".
    Carries the cpu_calibration floats (r10 verdict task 3: the whole
    drift-adjudication framework hinges on them, and BENCH_r10's
    2000-char tail lost the full record's copy — two floats fit the
    budget, so the DRIVER-ARCHIVED line self-adjudicates)."""
    mins2 = {k: round(v, 2) for k, v in timings.items()}
    omitted = 0
    while True:
        rec = {
            "metric": "headline_queries_total",
            "value": round(total, 2),
            "unit": "sec",
            "queries": mins2,
            "median_total": round(median_total, 2),
            "sf": sf,
        }
        if cpu_cal:
            rec["cal_py"] = cpu_cal.get("python_sec")
            rec["cal_jvm"] = cpu_cal.get("jvm_hash_sec")
        if omitted:
            rec["queries_omitted"] = omitted
        line = json.dumps(rec, separators=(",", ":"))
        if len(line) <= _LINE_CAP or len(mins2) <= 1:
            return line
        # fold the smallest remaining min into "other"
        smallest = min(
            (k for k in mins2 if k != "other"), key=lambda k: mins2[k]
        )
        mins2["other"] = round(mins2.get("other", 0.0) + mins2.pop(smallest), 2)
        omitted += 1


def _maintenance_timings(spark, sf_dir: str) -> tuple[dict, dict]:
    """Index-MAINTENANCE cost trend line (round-7 addition): build /
    incremental-ingest / probe for the two maintained indexes, timed
    with the same 3-run min+median discipline as the headline queries.
    These are writers, so they are not registry queries and stay out of
    the driver-parsed compact line; they live in the committed full
    record, where ``flagged_regressions`` covers them with the same
    1.3x machine gate — a maintenance-cost regression now trips the
    same wire a query regression does.
    """
    import shutil
    import tempfile

    from cdc_system_spark.operators import ann_index as AI
    from cdc_system_spark.operators import lsh_index as LI
    from cdc_system_spark.queries.base import catalog

    docs = catalog(spark, sf_dir).documents.select("doc_id", "text")
    emb = catalog(spark, sf_dir).embeddings
    base = tempfile.mkdtemp(prefix="bench_maint_")

    # (name, setup(path) -> None, timed(path) -> needs-materialization)
    def lsh_setup_part(p):
        LI.lsh_index_build(docs.filter("doc_id % 10 <> 0"), p)

    def ann_setup_part(p):
        AI.ann_index_build(emb.filter("vec_id % 10 <> 0"), p)

    def ann_pq_setup_part(p):
        # the FULL-tier index (raw PQ codes at build + residual codes
        # at attach): its ingest encodes code0..3 AND rcode0..3 in the
        # batch map pass — the deliberate encode-at-ingest cost the r10
        # driver record flagged as a regression ON THE TIER-FREE LINE
        # (same name, heavier index). Splitting the lines makes the
        # trade adjudicable: m_ann_index_ingest stays comparable to the
        # r9 baseline, THIS line carries the tier cost, and the
        # q_ivfpq_topk_stored / q_ivfpq_residual_stored headline lines
        # next to it show the ~3x probe-side payback.
        from cdc_system_spark.operators.similarity import pq_codebooks

        part = emb.filter("vec_id % 10 <> 0")
        AI.ann_index_build(part, p, pq_books=pq_codebooks(part, m=4, k=8))
        AI.ann_index_attach_residual_pq(spark, p, m=4, k=8)

    actions = [
        ("m_lsh_index_build", None, lambda p: LI.lsh_index_build(docs, p)),
        (
            "m_lsh_index_ingest",
            lsh_setup_part,
            lambda p: LI.lsh_index_ingest(docs.filter("doc_id % 10 = 0"), p),
        ),
        (
            "m_lsh_index_probe",
            lambda p: LI.lsh_index_build(docs, p),
            lambda p: [
                t.write.format("noop").mode("overwrite").save()
                for t in LI.lsh_index_probe_tables(spark, p, docs)
            ],
        ),
        ("m_ann_index_build", None, lambda p: AI.ann_index_build(emb, p)),
        (
            "m_ann_index_ingest",
            ann_setup_part,
            lambda p: AI.ann_index_ingest(emb.filter("vec_id % 10 = 0"), p),
        ),
        (
            "m_ann_pq_index_ingest",
            ann_pq_setup_part,
            lambda p: AI.ann_index_ingest(emb.filter("vec_id % 10 = 0"), p),
        ),
        (
            "m_ann_index_probe",
            lambda p: AI.ann_index_build(emb, p),
            lambda p: AI.ann_index_probe_tables(spark, p, emb)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        ),
    ]
    mins: dict[str, float] = {}
    meds: dict[str, float] = {}
    try:
        for name, setup, timed in actions:
            runs = []
            for i in range(3):
                path = os.path.join(base, f"{name}_{i}")
                if setup is not None:
                    setup(path)
                t0 = time.perf_counter()
                timed(path)
                runs.append(time.perf_counter() - t0)
            runs.sort()
            mins[name] = round(runs[0], 3)
            meds[name] = round(runs[1], 3)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return mins, meds


def _wide_crossover_timings(spark) -> tuple[dict, dict]:
    """The compressed-tier SCAN-BYTE crossover, measured (r11 verdict
    task 3): at sf0.1 the 2000×64-float embeddings table is far too
    small for IO to matter — the stored-prefix cascade's extra stage
    costs more than its 16/64 byte saving buys
    (BENCH_NOTES_r11: q_ann_prefix_topk 1.22 s vs 0.51 s full-vector),
    so the 100 TB posture rested on a ReadSchema argument alone. This
    fixture makes the regime where vectors dominate IO: a
    deterministic pseudo-random ``SPARK_GRAFT_WIDE_N`` (default
    400 000) × d=512-float corpus (xxhash64-derived, synthesized like
    the multimodal fixtures — no RNG, same bytes every round),
    ONE maintained index carrying the prefix (16 dims) AND PQ (m=4
    stored codes) tiers, and the three probe plans on the SAME cells:

    - ``m_wide_full_probe`` — ann_index_topk: nprobe/C of the corpus
      at 512 floats/row;
    - ``m_wide_prefix_probe`` — ann_prefix_topk: the coarse pass reads
      (id, pvec) = 16/512 of the vector bytes, full floats for the
      k·f survivors only;
    - ``m_wide_pq_probe`` — ivfpq_topk over stored codes: 4 ints/row
      for the ADC ranking, floats for survivors.

    Same 3-run min+median discipline as the headline queries; the
    one-time corpus synth + build is reported as
    ``m_wide_index_build`` (single-run, like shared_index_builds).
    Set SPARK_GRAFT_WIDE_N=0 to skip (local iteration)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cdc_system_spark.operators import ann_index as AI
    from cdc_system_spark.operators.similarity import pq_codebooks

    n = int(os.environ.get("SPARK_GRAFT_WIDE_N", "400000"))
    if n <= 0:
        return {}, {}
    d, cells, nprobe, k = 512, 16, 4, 10
    base = tempfile.mkdtemp(prefix="bench_wide_")
    idx = os.path.join(base, "idx")
    try:
        t0 = time.perf_counter()
        # r13 (measurement-method change, noted in OPTIMIZATION_r13.md
        # with the old numbers kept): the synthesized corpus used to be
        # written to parquet (~800 MB) and read back before the build —
        # a fixture-setup round-trip that dominated m_wide_index_build
        # without being part of what the line exists to trend (the
        # BUILD cost at vectors-dominate-IO scale). The synth now
        # materializes ONCE via eager localCheckpoint and feeds the
        # codebook training + build directly; the synthesized float32
        # values are bit-identical to the old parquet round-trip (the
        # expression already cast to array<float>), and the three
        # PROBE lines — the crossover measurement itself — read the
        # same built index either way, their timing path unchanged.
        emb = (
            spark.range(0, n, 1, 32)
            .select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(d - 1)),
                    lambda j: (
                        ((F.xxhash64(F.col("id") * d + j) % 2001) + 2001)
                        % 2001
                        - 1000
                    ).cast("float")
                    / 1000.0,
                )
                .cast("array<float>")
                .alias("embedding"),
            )
            .localCheckpoint(eager=True)
        )
        books = pq_codebooks(emb, m=4, k=8)
        AI.ann_index_build(
            emb, idx, num_centroids=cells, pq_books=books, prefix_dims=16
        )
        build_s = round(time.perf_counter() - t0, 3)
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
        ]
        probes = [
            (
                "m_wide_full_probe",
                lambda: AI.ann_index_topk(spark, idx, qv, k=k, nprobe=nprobe),
            ),
            (
                "m_wide_prefix_probe",
                lambda: AI.ann_prefix_topk(
                    spark, idx, qv, k=k, nprobe=nprobe, rescore_factor=4
                ),
            ),
            (
                "m_wide_pq_probe",
                lambda: AI.ivfpq_topk(
                    spark, idx, None, qv, k=k, nprobe=nprobe, rescore_factor=4
                ),
            ),
        ]
        mins = {"m_wide_index_build": build_s}
        meds = {"m_wide_index_build": build_s}
        for name, fn in probes:
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            runs.sort()
            mins[name] = round(runs[0], 3)
            meds[name] = round(runs[1], 3)
        return mins, meds
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _cpu_calibration(spark) -> dict:
    """Deterministic box-speed probes, recorded in every committed
    record so cross-round drift is MEASURED, not inferred: rounds 8-10
    each spent a verdict task adjudicating whether a 1.1-1.2x
    round-over-round shift was box or code, via leave-one-out drift
    over the shared query set — which works, but only relative to the
    previous record's (unknown) box state. Two absolute references:

    - ``python_sec``: fixed 2M-iteration pure-Python LCG+xor loop —
      single-core interpreter/CPU-frequency speed;
    - ``jvm_hash_sec``: min-of-3 of a fixed 200M-row whole-stage-
      codegen xxhash64 aggregation on all cores — the JVM hash
      throughput the minhash/shingle family (the queries that drift
      the most) is actually bound by.

    Same numbers on two boxes ⇒ a query delta is code. A family delta
    tracking ``jvm_hash_sec`` ⇒ box. ~2 s total, untimed-path only.
    """
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    h = 0
    for i in range(2_000_000):
        h = (h * 6364136223846793005 + i) & ((1 << 64) - 1)
        h ^= h >> 29
    py_sec = round(time.perf_counter() - t0, 3)
    jvm_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).select(
            F.xxhash64("id").alias("h")
        ).agg(F.max("h")).collect()
        jvm_runs.append(time.perf_counter() - t0)
    # writer-path probe (round 12): the maintenance actions are parquet
    # WRITERS, and r12 measured the box's write path degrading ~1.4x
    # while the compute families sat flat (cross-tree A/B: r11 code on
    # the same day read the same elevated maintenance numbers) — a
    # compute-family drift cannot adjudicate a writer-family flag, so
    # the record needs its own write reference: a fixed 5M-row
    # hash-column parquet write, min-of-3
    import shutil
    import tempfile

    wr_base = tempfile.mkdtemp(prefix="bench_cal_wr_")
    wr_runs = []
    try:
        for i in range(3):
            t0 = time.perf_counter()
            spark.range(0, 5_000_000, 1, 32).select(
                "id", F.xxhash64("id").alias("h")
            ).write.mode("overwrite").parquet(f"{wr_base}/{i}")
            wr_runs.append(time.perf_counter() - t0)
    finally:
        shutil.rmtree(wr_base, ignore_errors=True)
    return {
        "python_sec": py_sec,
        "jvm_hash_sec": round(min(jvm_runs), 3),
        "parquet_write_sec": round(min(wr_runs), 3),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # one untimed warmup query to absorb JVM/codegen startup
    QUERY_REGISTRY["q_count"].fn(spark, sf_dir).collect()

    cal_start = _cpu_calibration(spark)

    # the maintained-index queries share ONE process-local build
    # (queries/_maintained.py) that otherwise lands inside whichever
    # maintained query's FIRST timed draw runs first — min-of-3 drops
    # it from minima but it distorts that query's median and hides the
    # amortized cost. Build it here, timed, and attribute it as its
    # own m_* line (the r8 verdict: the shared-build cost must be
    # visible in the artifact, not folded into a query's noise).
    from cdc_system_spark.queries._maintained import (
        shared_ann_index,
        shared_ann_pq_index,
        shared_ann_prefix_index,
        shared_ann_rpq_index,
        shared_ann_rpq_refined_index,
        shared_lsh_index,
    )

    t0 = time.perf_counter()
    shared_lsh_index(spark, sf_dir)
    shared_query_builds = {
        "m_shared_lsh_index_build": round(time.perf_counter() - t0, 3)
    }
    t0 = time.perf_counter()
    shared_ann_index(spark, sf_dir)
    shared_query_builds["m_shared_ann_index_build"] = round(
        time.perf_counter() - t0, 3
    )
    t0 = time.perf_counter()
    shared_ann_pq_index(spark, sf_dir)
    shared_query_builds["m_shared_ann_pq_index_build"] = round(
        time.perf_counter() - t0, 3
    )
    t0 = time.perf_counter()
    shared_ann_rpq_index(spark, sf_dir)
    shared_query_builds["m_shared_ann_rpq_index_build"] = round(
        time.perf_counter() - t0, 3
    )
    t0 = time.perf_counter()
    shared_ann_rpq_refined_index(spark, sf_dir)
    shared_query_builds["m_shared_ann_rpq_refined_index_build"] = round(
        time.perf_counter() - t0, 3
    )
    t0 = time.perf_counter()
    shared_ann_prefix_index(spark, sf_dir)
    shared_query_builds["m_shared_ann_prefix_index_build"] = round(
        time.perf_counter() - t0, 3
    )

    # three timed runs per query; report BOTH the min and the median.
    # min = steady-state engine throughput, not one-time plan
    # compilation / codegen / Python-worker startup or transient
    # machine load (at real scale those constants amortize to nothing;
    # at sf0.1 they would swamp the signal). median = the variance
    # control: a min that the median contradicts by >1.5x flags a
    # noisy box, so cross-round comparisons (BENCH_r{N} vs r{N-1})
    # read minima and use medians to adjudicate "regression or noise"
    # — the r4 lesson, where single-run artifacts disagreed with
    # same-session A/Bs two rounds running.
    def _time_runs(name: str, n: int) -> list[float]:
        fn = QUERY_REGISTRY[name].fn
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return runs

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        runs = sorted(_time_runs(name, 3))
        all_runs[name] = runs
        timings[name] = round(runs[0], 3)
        medians[name] = round(runs[1], 3)

    # retry pass: a query whose 3-run min would trip the flag gate vs
    # the committed baseline gets 3 MORE runs before anything is
    # recorded — min/median over all 6. One noisy draw then cannot
    # masquerade as a regression (observed r8: three same-code solo
    # runs within two hours each flagged a DIFFERENT disjoint set of
    # sub-2 s queries at 1.3-1.5x; every flag vanished on retry),
    # while a REAL regression survives 6 runs just as it survives 3.
    # Cost is paid only on suspects — a clean run adds zero work.
    prev_name, prev_rec = _load_prev()  # loaded ONCE, reused by the gate
    probe_mins = dict(prev_rec.get("queries", {}))
    retried = []
    for name in HEADLINE:
        pm = probe_mins.get(name)
        if not pm or pm <= 0:
            continue
        if timings[name] > 1.3 * pm and timings[name] - pm > _MIN_FLAG_DELTA:
            runs = sorted(all_runs[name] + _time_runs(name, 3))
            all_runs[name] = runs
            timings[name] = round(runs[0], 3)
            # LOWER median ((n-1)//2) — the same rule the 3-run path
            # applies (runs[1]), so retried and non-retried queries
            # feed the next round's med_ratio input consistently
            medians[name] = round(runs[(len(runs) - 1) // 2], 3)
            retried.append(name)

    # the gated ingest queries get the same benefit-of-the-doubt pass
    # against their DRIFT-SCALED gate: these two are orchestration-
    # heavy (streaming foreachBatch cycles), measurably noisier than
    # their hash-kernel family on a throttled box (r11 first runs:
    # 3.23 s and 5.12 s for the same code four hours apart), so a
    # breach must survive 6 runs exactly as a regression flag must
    def _family_drift() -> float:
        shared_f = [n for n in _INGEST_GATE_FAMILY if timings.get(n)]
        if not shared_f:
            return 1.0
        return round(
            sum(timings[n] for n in shared_f)
            / sum(_INGEST_GATE_FAMILY[n] for n in shared_f),
            3,
        )

    gate_drift = _family_drift()
    for name, base in _INGEST_GATE_BASE.items():
        if float(sf) != 0.1:
            break  # gates (and their retry) are pinned at sf0.1 only
        if name in timings and timings[name] > round(base * gate_drift, 3):
            runs = sorted(all_runs[name] + _time_runs(name, 3))
            all_runs[name] = runs
            timings[name] = round(runs[0], 3)
            medians[name] = round(runs[(len(runs) - 1) // 2], 3)
            if name not in retried:
                retried.append(name)

    total = round(sum(timings.values()), 3)
    median_total = round(sum(medians.values()), 3)

    maint_mins, maint_meds = _maintenance_timings(spark, sf_dir)
    # the wide-embedding crossover lines ride the maintenance dicts so
    # next round's 1.3x gate covers them automatically
    wide_mins, wide_meds = _wide_crossover_timings(spark)
    maint_mins.update(wide_mins)
    maint_meds.update(wide_meds)

    # machine-checkable regression gate vs the last committed
    # same-box record: new min > 1.3x old min -> flagged (headline
    # queries and maintenance actions alike). Each flag ALSO carries a
    # machine-readable adjudication (the r7 verdict's task 1: the r7
    # driver artifact shipped 3 flags a stranger could not tell apart
    # from real regressions without reading the bench notes):
    #   "confirmed-regression" — the MEDIAN exceeds 1.3x too AND the
    #     query's ratio still exceeds 1.3x after dividing out the
    #     RUN-WIDE shift, computed LEAVE-ONE-OUT (the shared-query
    #     min-sum ratio with the candidate excluded from both sums —
    #     a time-dominant query that genuinely regresses would
    #     otherwise inflate the very drift it is normalized by and
    #     mask its own flag). Minima dodge transient load, medians
    #     dodge one-off stalls, and the drift normalization dodges the
    #     failure mode both miss: a uniformly slow box shifts min AND
    #     median together on UNTOUCHED queries (seen in r7 run A at
    #     1.18x and again in r8 run A at 1.09x).
    #   "box-drift" — anything else: the signature of load, not code.
    # plus the changed-source evidence: files under cdc_system_spark/
    # touched since the baseline record's commit.
    #
    # Material-delta floor: a ratio trip whose ABSOLUTE min increase
    # stays under _MIN_FLAG_DELTA seconds is still RECORDED, with
    # adjudication "below-delta-floor" (r8 silently skipped these; the
    # r8 advisor: a genuine 3x on a 0.2 s query must leave evidence in
    # the artifact). It just never escalates to confirmed-regression
    # and does not earn the retry pass — sub-second queries trip a
    # pure ratio gate on ~0.1 s of scheduler noise (observed r8: four
    # 0.3-0.5 s sketch queries flagged 1.3-1.4x between two same-code
    # solo runs two hours apart), while a REAL 1.3x on any query that
    # matters clears 0.25 s easily.
    prev_mins = dict(prev_rec.get("queries", {}))
    prev_mins.update(prev_rec.get("maintenance", {}))
    prev_meds = dict(prev_rec.get("queries_median", {}))
    prev_meds.update(prev_rec.get("maintenance_median", {}))
    gated = dict(timings)
    gated.update(maint_mins)
    meds_all = dict(medians)
    meds_all.update(maint_meds)
    # the baseline commit: recorded in the baseline from r8 on; for
    # older baselines, the commit that last touched the baseline file
    baseline_head = prev_rec.get("git_head") or (
        _git("log", "-1", "--format=%H", "--", prev_name) if prev_name else ""
    )
    changed_src = (
        _git(
            "diff", "--name-only", baseline_head, "HEAD", "--",
            "cdc_system_spark", "__spark_entry__.py",
        ).splitlines()
        if baseline_head
        else None
    )
    shared = [n for n in gated if n in prev_mins and prev_mins[n] > 0]
    sum_now = sum(gated[n] for n in shared)
    sum_prev = sum(prev_mins[n] for n in shared)
    global_drift = round(sum_now / sum_prev, 3) if shared else 1.0

    def _drift_excluding(name: str) -> float:
        # leave-one-out: a time-dominant query that genuinely regresses
        # inflates the very drift it is normalized by, masking its own
        # flag — exclude the candidate from both sums
        if len(shared) <= 1 or name not in prev_mins:
            return 1.0
        d = (sum_now - gated[name]) / (sum_prev - prev_mins[name])
        return round(d, 3)
    flagged = {}
    for name in gated:
        if name not in prev_mins or prev_mins[name] <= 0:
            continue
        if gated[name] <= 1.3 * prev_mins[name]:
            continue
        med, pmed = meds_all.get(name), prev_meds.get(name)
        med_ratio = (
            round(med / pmed, 2) if med and pmed and pmed > 0 else None
        )
        ratio = round(gated[name] / prev_mins[name], 2)
        loo_drift = _drift_excluding(name)
        excess = round(ratio / max(loo_drift, 1.0), 2)
        flagged[name] = {
            "min": gated[name],
            "prev_min": prev_mins[name],
            "ratio": ratio,
            "median": med,
            "prev_median": pmed,
            "median_ratio": med_ratio,
            "drift_excluding_self": loo_drift,
            "drift_normalized_ratio": excess,
            "adjudication": (
                # a sub-floor absolute delta is ratio-only wobble on a
                # sub-second query — RECORDED with its own adjudication
                # (not silently skipped: the r8 advisor's finding — a
                # genuine 3x regression on a 0.2 s query must still
                # leave evidence in the committed artifact)
                "below-delta-floor"
                if gated[name] - prev_mins[name] <= _MIN_FLAG_DELTA
                else "confirmed-regression"
                if med_ratio is not None and med_ratio > 1.3 and excess > 1.3
                else "box-drift"
            ),
        }

    # calibration is probed at START and END and the record keeps the
    # per-probe MIN: the box's demonstrated capability. The first r11
    # run read jvm_hash 1.192 at start while the very queries it was
    # meant to adjudicate ran at 0.967x of baseline — a transient at
    # startup (JIT/neighbor load) poisoning a 0.3 s kernel; the
    # end-of-run probe catches it, and a box that is GENUINELY slow is
    # slow at both ends. Both raw probes stay in the record so a
    # start/end disagreement is itself visible evidence.
    cal_end = _cpu_calibration(spark)
    cpu_cal = {
        "python_sec": min(cal_start["python_sec"], cal_end["python_sec"]),
        "jvm_hash_sec": min(
            cal_start["jvm_hash_sec"], cal_end["jvm_hash_sec"]
        ),
        "start": cal_start,
        "end": cal_end,
    }

    # the drift-relative ingest-gate check, adjudicated IN the
    # artifact (r10 verdict task 1): effective gate = pinned base x
    # this run's measured same-kernel family drift vs the pinned
    # gate-frame minima (see _INGEST_GATE_FAMILY). A breach survived
    # the 6-run retry pass above. Bases and frame are sf0.1 numbers:
    # at any other SF the family drift conflates scale with box (the
    # gated queries carry fixed orchestration cost the family lacks),
    # so off-frame runs record "skipped", never a fake verdict.
    if float(sf) == 0.1:
        ingest_gates = {
            name: {
                "min": timings.get(name),
                "base_gate": base,
                "family_drift": gate_drift,
                "effective_gate": round(base * gate_drift, 3),
                "pass": (
                    timings.get(name) is not None
                    and timings[name] <= round(base * gate_drift, 3)
                ),
            }
            for name, base in _INGEST_GATE_BASE.items()
        }
    else:
        ingest_gates = {"skipped": f"gates pinned at sf=0.1, run is sf={sf}"}

    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "median_total": median_total,
        "maintenance": maint_mins,
        "maintenance_median": maint_meds,
        # single-run (first-use amortized cost, not a steady-state
        # trend line — excluded from the 1.3x gate for that reason)
        "shared_index_builds": shared_query_builds,
        "sf": float(sf),
        "regression_baseline": prev_name,
        "retried_queries": retried,
        "global_drift_ratio": global_drift,
        "cpu_calibration": cpu_cal,
        "ingest_gates": ingest_gates,
        "git_head": _git("rev-parse", "HEAD") or None,
        "baseline_git_head": baseline_head or None,
        "source_files_changed_since_baseline": (
            changed_src[:50] if changed_src is not None else None
        ),
        "flagged_regressions": flagged,
    }
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_FULL.json"),
    )
    with open(out_path, "w") as f:
        json.dump(full, f, indent=1)
    # full record above, compact driver-parsed line LAST
    print(json.dumps(full))
    print(_compact_line(total, timings, median_total, float(sf), cpu_cal))
    spark.stop()


if __name__ == "__main__":
    main()
