"""Maintained ANN index artifact: build/ingest/load parity with the
ad-hoc recompute path, replay idempotence, and static partition
pruning on probes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_system_spark.operators import ann_index as AI
from cdc_system_spark.operators import similarity as S
from cdc_system_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def pq_idx(spark, emb, tmp_path_factory):
    """Shared READ-ONLY 4-cell PQ-tier index over the full corpus —
    one build serves the round-10 IVFPQ tests (suite-budget
    consolidation: five separate builds cost ~40 s; tests that mutate
    or need a build/ingest split still build their own)."""
    from cdc_system_spark.operators.similarity import pq_codebooks

    path = str(tmp_path_factory.mktemp("pqidx") / "idx")
    books = pq_codebooks(emb, m=4, k=8)
    AI.ann_index_build(emb, path, num_centroids=4, pq_books=books)
    return path, books


def _asg_map(df):
    return {r["vec_id"]: r["centroid_id"] for r in df.collect()}


def test_build_matches_adhoc_auto_cells(spark, emb, tmp_path):
    # index built over the same corpus with the default C must agree
    # with auto_cells row for row — the contract that makes `assigned=`
    # a pure skip-the-recompute substitution
    path = str(tmp_path / "idx")
    n = AI.ann_index_build(emb, path)
    assert n == emb.count()
    _, maintained = AI.ann_index_load(spark, path)
    adhoc = S.auto_cells(emb)
    assert _asg_map(maintained) == _asg_map(adhoc)


def test_incremental_ingest_matches_frozen_recompute(spark, emb, tmp_path):
    # build on 70%, ingest the rest: maintained == one-shot assignment
    # of the FULL corpus against the frozen centroid table (centroids
    # do not move on ingest — that is the artifact's whole point)
    path = str(tmp_path / "idx")
    base = emb.filter("vec_id < 350")
    rest = emb.filter("vec_id >= 350")
    AI.ann_index_build(base, path)
    admitted = AI.ann_index_ingest(rest, path)
    assert admitted == rest.count()
    centroids, maintained = AI.ann_index_load(spark, path)
    recomputed = S.assign_with_centroids(emb, centroids).withColumnRenamed(
        "cell_id", "centroid_id"
    )
    assert _asg_map(maintained) == _asg_map(recomputed)


def test_ingest_replay_is_idempotent(spark, emb, tmp_path):
    path = str(tmp_path / "idx")
    base = emb.filter("vec_id < 400")
    batch = emb.filter("vec_id >= 400")
    AI.ann_index_build(base, path)
    assert AI.ann_index_ingest(batch, path) == batch.count()
    assert AI.ann_index_ingest(batch, path) == 0  # redelivery: no-op
    _, maintained = AI.ann_index_load(spark, path)
    assert maintained.count() == emb.count()
    assert maintained.select("vec_id").distinct().count() == emb.count()


def test_topk_many_exact_at_full_probe(spark, emb, tmp_path):
    # batch top-k over the maintained index: at nprobe = C every cell
    # is probed, so each query's result must equal the exact
    # brute-force cosine_topk for that vector; at nprobe < C results
    # stay <= k per query and are a subset of the probed cells
    path = str(tmp_path / "idx")
    AI.ann_index_build(emb, path, num_centroids=8)
    qids = [0, 7, 23]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    full = AI.ann_index_topk_many(spark, path, queries, k=10, nprobe=8)
    got = {
        q: [(r["vec_id"], r["cos_sim"]) for r in full.filter(F.col("qid") == q)
            .orderBy(F.desc("cos_sim"), "vec_id").collect()]
        for q in qids
    }
    for q in qids:
        qv = list(emb.filter(F.col("vec_id") == q).head()["embedding"])
        exact = [
            (r["vec_id"], r["cos_sim"])
            for r in S.cosine_topk(emb, qv, k=10).collect()
        ]
        assert got[q] == exact, q
    pruned = AI.ann_index_topk_many(spark, path, queries, k=10, nprobe=2)
    per_q = {
        r["qid"]: r["n"]
        for r in pruned.groupBy("qid").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_q) == set(qids) and all(n <= 10 for n in per_q.values())


def test_stats_state_maintained_equals_rebuilt(spark, emb, tmp_path):
    # the ≤64-row KMV health state merged across build + ingest must
    # equal the state rebuilt from the stored version keys, and the
    # estimate row must be readable without scanning assignments
    from cdc_system_spark.operators.sketch import kmv_state

    path = str(tmp_path / "idx")
    AI.ann_index_build(emb.filter("vec_id % 3 <> 0"), path, num_centroids=8)
    AI.ann_index_ingest(emb.filter("vec_id % 3 = 0"), path)
    state = AI.ann_index_stats_state(spark, path)
    assert state.count() <= 64
    stored_vkeys = spark.read.parquet(f"{path}/assignments").select("_vkey")
    rebuilt = kmv_state(stored_vkeys, "_vkey")
    key = lambda df: sorted(r["h"] for r in df.collect())
    assert key(state) == key(rebuilt)
    est = AI.ann_index_stats(spark, path).head()
    assert est["n_est"] > 0
    # replayed ingest adds no versions — state unchanged (merge is
    # idempotent set union)
    AI.ann_index_ingest(emb.filter("vec_id % 3 = 0"), path)
    assert key(AI.ann_index_stats_state(spark, path)) == key(rebuilt)
    # post-compaction a stats-less read raises instead of silently
    # rebuilding live-only (r7 advisor finding — the LSH twin test
    # covers the rebuild-clears-marker half)
    import shutil

    import pytest as _pytest

    AI.ann_index_compact(spark, path, emb.filter("vec_id % 3 <> 0"))
    assert key(AI.ann_index_stats_state(spark, path)) == key(rebuilt)
    shutil.rmtree(tmp_path / "idx" / "stats")
    with _pytest.raises(ValueError, match="ever indexed"):
        AI.ann_index_stats_state(spark, path)


def test_semantic_dedup_accepts_maintained_assignment(spark, emb, tmp_path):
    path = str(tmp_path / "idx")
    AI.ann_index_build(emb, path)
    _, maintained = AI.ann_index_load(spark, path)
    via_index = S.semantic_dedup(emb, threshold=0.9, assigned=maintained)
    recomputed = S.semantic_dedup(emb, threshold=0.9)
    assert sorted(map(tuple, via_index.collect())) == sorted(
        map(tuple, recomputed.collect())
    )


def test_knn_graph_and_label_noise_accept_maintained_assignment(
    spark, emb, tmp_path
):
    path = str(tmp_path / "idx")
    AI.ann_index_build(emb, path)
    _, maintained = AI.ann_index_load(spark, path)
    g1 = S.knn_graph(emb, k=2, assigned=maintained)
    g2 = S.knn_graph(emb, k=2)
    assert sorted(map(tuple, g1.collect())) == sorted(map(tuple, g2.collect()))
    n1 = S.knn_label_noise(emb, k=3, assigned=maintained)
    n2 = S.knn_label_noise(emb, k=3)
    assert sorted(map(tuple, n1.collect())) == sorted(map(tuple, n2.collect()))


def test_decontaminate_accepts_maintained_assignment(spark, emb, tmp_path):
    path = str(tmp_path / "idx")
    AI.ann_index_build(emb, path)
    centroids, maintained = AI.ann_index_load(spark, path)
    bench = emb.filter("vec_id % 37 = 0").select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    d1 = S.semantic_decontaminate(
        emb, bench, threshold=0.95, assigned=maintained, centroids=centroids
    )
    d2 = S.semantic_decontaminate(emb, bench, threshold=0.95)
    assert sorted(map(tuple, d1.collect())) == sorted(map(tuple, d2.collect()))
    with pytest.raises(ValueError, match="centroids"):
        S.semantic_decontaminate(emb, bench, assigned=maintained)


def test_probe_topk_prunes_partitions_and_is_exact_at_full_probe(
    spark, emb, tmp_path
):
    path = str(tmp_path / "idx")
    AI.ann_index_build(emb, path, num_centroids=8)
    qv = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]

    # static pruning: the probe plan carries a literal partition filter
    probe = AI.ann_index_topk(spark, path, qv, k=5, nprobe=2)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [centroid_id" in plan.replace("\n", " ") or (
        "centroid_id" in plan and "IN (" in plan.upper()
    )
    rows = probe.collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["cos_sim"] == 1.0

    # probing ALL cells makes IVF exact: matches brute-force top-k
    full = AI.ann_index_topk(spark, path, qv, k=10, nprobe=8)
    brute = S.cosine_topk(emb, qv, k=10)
    assert [r["vec_id"] for r in full.collect()] == [
        r["vec_id"] for r in brute.collect()
    ]


def test_probe_tables_follow_live_corpus(spark, emb, tmp_path):
    # re-embeddings and deletions: probe tables must equal a one-shot
    # frozen-centroid assignment of the CURRENT corpus, with stale
    # versions invisible and unseen rows assigned inline
    from cdc_system_spark.operators.ann_index import (
        ann_index_compact,
        ann_index_probe_tables,
    )
    from cdc_system_spark.operators.similarity import _assign_vectorized
    from cdc_system_spark.functions.portable import spread

    path = str(tmp_path / "idx")
    AI.ann_index_build(emb.filter("vec_id % 10 <> 0"), path, num_centroids=8)
    # current corpus: some rows deleted, some re-embedded (reversed
    # vector), some never indexed (the % 10 == 0 slice)
    current = (
        emb.filter("vec_id % 7 <> 0")
        .withColumn(
            "embedding",
            F.when(F.col("vec_id") % 5 == 0, F.reverse("embedding")).otherwise(
                F.col("embedding")
            ),
        )
    )
    # ingest the re-embedded rows (same ids, new vectors: must append)
    reemb = current.filter("vec_id % 5 = 0")
    assert AI.ann_index_ingest(reemb, path) == reemb.count()
    # re-delivery of the same re-embedded batch: no-op
    assert AI.ann_index_ingest(reemb, path) == 0

    got = ann_index_probe_tables(spark, path, current)
    from cdc_system_spark.operators.ann_index import _load_cents

    expect = _assign_vectorized(
        spread(current), _load_cents(spark, path), "vec_id", "embedding"
    ).withColumnRenamed("cell_id", "centroid_id")
    assert _asg_map(got) == _asg_map(expect)
    assert got.count() == current.count()

    # compaction keeps exactly the live pairs
    kept, dropped = ann_index_compact(spark, path, current)
    assert kept == ann_index_probe_tables(spark, path, current).count() - (
        current.join(
            AI.ann_index_load(spark, path)[1].select("vec_id", "embedding"),
            ["vec_id", "embedding"],
            "left_anti",
        ).count()
    )
    assert dropped >= 1
    # probe tables unchanged by compaction
    assert _asg_map(ann_index_probe_tables(spark, path, current)) == _asg_map(expect)


def test_ingest_dedups_within_batch(spark, emb, tmp_path):
    # a batch that re-delivers the same (id, vec) row twice must index
    # it ONCE (the lsh_index within-batch version dedup, here for
    # vectors) — otherwise topk returns one id in two k-slots
    path = str(tmp_path / "idx")
    AI.ann_index_build(emb.filter("vec_id >= 100"), path, num_centroids=4)
    batch = emb.filter("vec_id < 10")
    doubled = batch.unionByName(batch)
    assert AI.ann_index_ingest(doubled, path) == batch.count()
    _, asg = AI.ann_index_load(spark, path)
    assert asg.filter("vec_id < 10").count() == batch.count()


def test_compact_to_empty_does_not_brick_the_index(spark, emb, tmp_path):
    # whole corpus re-embedded before re-ingest: compact keeps nothing,
    # but the index must stay loadable and ingestable
    from cdc_system_spark.operators.ann_index import ann_index_compact

    path = str(tmp_path / "idx")
    AI.ann_index_build(emb.limit(50), path, num_centroids=4)
    reembedded = emb.limit(50).withColumn("embedding", F.reverse("embedding"))
    kept, dropped = ann_index_compact(spark, path, reembedded)
    assert kept == 0 and dropped == 50
    _, asg = AI.ann_index_load(spark, path)  # must not raise
    assert asg.count() == 0
    assert AI.ann_index_ingest(reembedded, path) == 50
    after = AI.ann_index_load(spark, path)[1]
    assert after.count() == 50
    # the canonical partitioned layout is restored: every row carries a
    # non-null centroid_id and probe tables still match a recompute
    assert after.filter("centroid_id IS NULL").count() == 0
    from cdc_system_spark.operators.ann_index import ann_index_probe_tables

    assert ann_index_probe_tables(spark, path, reembedded).count() == 50


def test_ann_index_staleness_metric(spark, emb, tmp_path):
    # the ANN twin of lsh_index_staleness: ever-vs-live churn within
    # the KMV budget, and EVER state survives compaction
    path = str(tmp_path / "idx")
    AI.ann_index_build(emb, path, num_centroids=8)
    row = AI.ann_index_staleness(spark, path, emb).head()
    assert row["n_live"] == emb.count() and row["churn_est"] <= 0.05
    # re-embed 1/5 of the vectors (new versions; old ones go stale)
    reemb = emb.filter("vec_id % 5 = 0").withColumn(
        "embedding", F.transform("embedding", lambda x: (x * F.lit(2.0)).cast("float"))
    )
    AI.ann_index_ingest(reemb, path)
    live = emb.filter("vec_id % 5 <> 0").unionByName(reemb)
    row2 = AI.ann_index_staleness(spark, path, live).head()
    true_churn = 1 - live.count() / (emb.count() + reemb.count())
    assert row2["n_live"] == live.count()
    assert abs(row2["churn_est"] - true_churn) < 0.10
    AI.ann_index_compact(spark, path, live)
    assert AI.ann_index_staleness(spark, path, live).head() == row2


def test_cell_skew_profile_counts_and_empty_cells(spark, emb, tmp_path):
    # occupancy profile: per-cell counts sum to the corpus, shares sum
    # to ~1, EMPTY cells appear with 0/0.0 rows (the starved-cell
    # recall signal), and occ_ratio is count * C / total
    path = str(tmp_path / "idx")
    AI.ann_index_build(emb, path, num_centroids=4)
    prof = AI.ann_cell_skew(spark, path).collect()
    assert len(prof) == 4  # every centroid has a row, occupied or not
    total = emb.count()
    assert sum(r["n_vecs"] for r in prof) == total
    assert abs(sum(r["share"] for r in prof) - 1.0) < 1e-5
    for r in prof:
        assert r["occ_ratio"] == pytest.approx(
            r["n_vecs"] * 4 / total, abs=1e-6
        )
    # assignments= override: a single-cell restriction skews the
    # profile exactly as given (the probe_tables live-filter hookup)
    _, asg = AI.ann_index_load(spark, path)
    one_cell = asg.filter(F.col("centroid_id") == prof[0]["centroid_id"])
    prof2 = {
        r["centroid_id"]: r
        for r in AI.ann_cell_skew(spark, path, assignments=one_cell).collect()
    }
    assert len(prof2) == 4
    n0 = one_cell.count()
    assert prof2[prof[0]["centroid_id"]]["n_vecs"] == n0
    assert prof2[prof[0]["centroid_id"]]["occ_ratio"] == pytest.approx(4.0)
    empties = [r for r in prof2.values() if r["n_vecs"] == 0]
    assert len(empties) == 3 and all(r["share"] == 0.0 for r in empties)


def test_ivfpq_full_probe_equals_pq_and_finds_exact_match(spark, emb, tmp_path):
    # IVF x PQ composition: at nprobe = C (no cell pruning) the result
    # must equal plain pq_topk over the whole corpus (the candidate
    # relations coincide); at nprobe=2 a query vector present in the
    # corpus lands in its own probed cell and rescores to cos 1.0 first
    from cdc_system_spark.operators.similarity import pq_codebooks, pq_topk

    path = str(tmp_path / "idx")
    AI.ann_index_build(emb, path, num_centroids=4)
    books = pq_codebooks(emb, m=4, k=8)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 7).head()["embedding"]]
    rows = lambda df: [
        (r["vec_id"], r["adc_dist"], r["cos_sim"]) for r in df.collect()
    ]
    full = AI.ivfpq_topk(spark, path, books, qv, k=5, nprobe=4)
    flat = pq_topk(emb, books, qv, k=5)
    assert rows(full) == rows(flat)
    pruned = AI.ivfpq_topk(spark, path, books, qv, k=5, nprobe=2)
    got = rows(pruned)
    assert got[0][0] == 7 and got[0][2] == 1.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="nprobe"):
        AI.ivfpq_topk(spark, path, books, qv, k=5, nprobe=0)


def test_pq_tier_stored_codes_equal_derived(spark, emb, tmp_path):
    # encode-at-ingest: an index built with pq_books stores code0..3
    # next to the assignments for BOTH the build and ingest portions,
    # and they must equal pq_encode of the same vectors (one shared
    # pq_code_columns expression — this pins that the two forms cannot
    # drift); ivfpq_topk(books=None) over the stored codes must equal
    # the in-plan derive form row for row
    from cdc_system_spark.operators.similarity import pq_codebooks, pq_encode

    path = str(tmp_path / "idx")
    books = pq_codebooks(emb, m=4, k=8)
    base = emb.filter("vec_id % 3 <> 0")
    rest = emb.filter("vec_id % 3 = 0")
    AI.ann_index_build(base, path, num_centroids=8, pq_books=books)
    assert AI.ann_index_ingest(rest, path) == rest.count()
    assert AI.ann_index_books(spark, path) == books
    _, asg = AI.ann_index_load(spark, path)
    code_cols = ["code0", "code1", "code2", "code3"]
    assert all(c in asg.columns for c in code_cols)
    stored = {
        r["vec_id"]: tuple(r[c] for c in code_cols) for r in asg.collect()
    }
    derived = {
        r["vec_id"]: tuple(r[c] for c in code_cols)
        for r in pq_encode(emb, books).collect()
    }
    assert stored == derived
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 7).head()["embedding"]]
    rows = lambda df: [
        (r["vec_id"], r["adc_dist"], r["cos_sim"]) for r in df.collect()
    ]
    got_stored = AI.ivfpq_topk(spark, path, None, qv, k=5, nprobe=2)
    got_derived = AI.ivfpq_topk(spark, path, books, qv, k=5, nprobe=2)
    assert rows(got_stored) == rows(got_derived)
    # the stored ADC stage never projects the vector column: the scan
    # reads id + codes (+ the partition col) — the m-bytes/row claim
    plan = (
        got_stored._jdf.queryExecution().executedPlan().toString()
    )
    assert "ReadSchema" in plan


def test_ivfpq_topk_stored_requires_pq_tier(spark, emb, tmp_path):
    path = str(tmp_path / "idx")
    AI.ann_index_build(emb, path, num_centroids=4)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    with pytest.raises(ValueError, match="PQ tier"):
        AI.ivfpq_topk(spark, path, None, qv, k=5, nprobe=2)


def test_ivfpq_recall_grid_matches_numpy_truth(spark, emb, pq_idx):
    # the recall diagnostic's arithmetic, pinned against an independent
    # numpy brute force: per (nprobe, rescore_factor, qid) the reported
    # recall must equal |ivfpq_topk ids ∩ numpy exact top-k ids| / k,
    # and a full-probe generous-rescore config must reach 1.0
    import numpy as np

    from cdc_system_spark.functions.portable import round_portable_py

    path, _ = pq_idx
    k = 10
    qids = [0, 7]
    queries = emb.filter(F.col("vec_id").isin(*qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    # (4, 60): full probe + corpus-covering rescore (k*60 >= n) is
    # guaranteed exact — the grid's sanity anchor
    grid = [(1, 1), (2, 3), (4, 6), (4, 60)]
    got = {
        (r["nprobe"], r["rescore_factor"], r["qid"]): (
            r["n_truth"], r["n_hit"], r["recall_at_k"]
        )
        for r in AI.ivfpq_recall(
            spark, path, queries, grid=grid, k=k
        ).collect()
    }
    assert len(got) == len(grid) * len(qids)
    # numpy ground truth under the identical rounded-6 + id tiebreak
    data = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    for qid in qids:
        q = data[qid]
        qn = np.linalg.norm(q) or 1.0
        sims = sorted(
            (
                (-round_portable_py(
                    float(v @ q / ((np.linalg.norm(v) or 1.0) * qn)), 6
                ), vid)
                for vid, v in data.items()
            )
        )[:k]
        truth_ids = {vid for _, vid in sims}
        for nprobe, rf in grid:
            approx_ids = {
                r["vec_id"]
                for r in AI.ivfpq_topk(
                    spark, path, None, [float(x) for x in q],
                    k=k, nprobe=nprobe, rescore_factor=rf,
                ).collect()
            }
            n_truth, n_hit, recall = got[(nprobe, rf, qid)]
            assert n_truth == k
            assert n_hit == len(approx_ids & truth_ids)
            assert recall == round_portable_py(n_hit / k, 6)
        # recall is monotone in rescore_factor at fixed nprobe (the
        # candidate set only grows and the rescore is exact over it);
        # a corpus-covering rescore (k*60 >= n) is guaranteed exact —
        # while the intermediate configs' sub-1.0 readings are the
        # diagnostic's whole point: m=4/k=8 ADC at rf=6 measurably
        # misses, and this query is what tells the operator that
        assert got[(4, 60, qid)][2] >= got[(4, 6, qid)][2]
        assert got[(4, 60, qid)][2] == 1.0
    with pytest.raises(ValueError, match="grid"):
        AI.ivfpq_recall(spark, path, queries, grid=[], k=k)


def test_ivfpq_topk_many_matches_single_query_form(spark, emb, pq_idx):
    # the batched stored-code form must agree with the single-query
    # ivfpq_topk per query (same probe convention via the shared
    # _probe_many/_probe_cells tie-break, same LUT arithmetic, same
    # rescore ordering), and stored == derived within the batch too
    path, books = pq_idx
    qids = [0, 7, 23]
    queries = emb.filter(F.col("vec_id").isin(*qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    batch = AI.ivfpq_topk_many(
        spark, path, queries, k=5, nprobe=2, rescore_factor=3
    )
    got = {}
    for r in batch.collect():
        got.setdefault(r["qid"], []).append(
            (r["vec_id"], r["adc_dist"], r["cos_sim"])
        )
    assert set(got) == set(qids)
    for qid in qids:
        qv = [float(x) for x in
              emb.filter(F.col("vec_id") == qid).head()["embedding"]]
        single = [
            (r["vec_id"], r["adc_dist"], r["cos_sim"])
            for r in AI.ivfpq_topk(
                spark, path, None, qv, k=5, nprobe=2, rescore_factor=3
            ).collect()
        ]
        assert sorted(got[qid]) == sorted(single), qid
    derived = AI.ivfpq_topk_many(
        spark, path, queries, k=5, nprobe=2, rescore_factor=3, books=books
    )
    got_d = {}
    for r in derived.collect():
        got_d.setdefault(r["qid"], []).append(
            (r["vec_id"], r["adc_dist"], r["cos_sim"])
        )
    assert {q: sorted(v) for q, v in got_d.items()} == {
        q: sorted(v) for q, v in got.items()
    }
    with pytest.raises(ValueError, match="rescore_factor"):
        AI.ivfpq_topk_many(spark, path, queries, k=5, rescore_factor=0)


def test_ivfpq_residual_books_and_exactness(spark, emb, pq_idx):
    # residual codebooks: deterministic base = the k smallest-id stored
    # rows' (v - centroid(cell)) subvectors — pinned against an
    # independent numpy recompute; at full probe + corpus-covering
    # rescore the residual IVFADC degenerates to exact top-k
    import numpy as np

    path, _ = pq_idx
    books = AI.pq_residual_codebooks(spark, path, m=4, k=8)
    cents = {cid: np.asarray(v) for cid, v in
             [(r["cell_id"], [float(x) for x in r["cvec"]])
              for r in spark.read.parquet(f"{path}/centroids").collect()]}
    _, asg = AI.ann_index_load(spark, path)
    rows = sorted(
        ((r["vec_id"], np.asarray([float(x) for x in r["embedding"]]),
          r["centroid_id"]) for r in asg.collect()),
    )[:8]
    for j in range(4):
        for c, (_, vec, cid) in enumerate(rows):
            res = vec - cents[cid]
            expect = [float(x) for x in res[j * 16:(j + 1) * 16]]
            assert books[j][c] == pytest.approx(expect, abs=0), (j, c)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 7).head()["embedding"]]
    n = emb.count()
    rf = -(-n // 10) + 1  # k*rf >= corpus: rescore covers everything
    got = [
        (r["vec_id"], r["cos_sim"])
        for r in AI.ivfpq_residual_topk(
            spark, path, qv, k=10, nprobe=4, rescore_factor=rf
        ).collect()
    ]
    exact = [
        (r["vec_id"], r["cos_sim"])
        for r in S.cosine_topk(emb, qv, k=10).collect()
    ]
    assert got == exact
    # residual ADC at the default budget still puts the query's own
    # vector first (cos 1.0 — it encodes to its own codes' cell)
    first = AI.ivfpq_residual_topk(
        spark, path, qv, k=5, nprobe=2, rescore_factor=3
    ).head()
    assert first["vec_id"] == 7 and first["cos_sim"] == 1.0
    with pytest.raises(ValueError, match="nprobe"):
        AI.ivfpq_residual_topk(spark, path, qv, k=5, nprobe=0)
    with pytest.raises(ValueError, match="query dim"):
        AI.ivfpq_residual_topk(spark, path, qv[:10], k=5)


def test_ivfpq_recall_residual_mode_parity(spark, emb, pq_idx):
    # residual=True evaluates ivfpq_residual_topk under the same truth
    # and arithmetic: reported n_hit must equal the direct
    # intersection for each config, and a full-probe corpus-covering
    # config reads 1.0 exactly as in the raw tier
    path, _ = pq_idx
    k = 10
    queries = emb.filter(F.col("vec_id").isin(0, 7)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    n = emb.count()
    rf_full = -(-n // k) + 1
    grid = [(2, 3), (4, rf_full)]
    got = {
        (r["nprobe"], r["rescore_factor"], r["qid"]): (
            r["n_hit"], r["recall_at_k"]
        )
        for r in AI.ivfpq_recall(
            spark, path, queries, grid=grid, k=k, residual=True
        ).collect()
    }
    assert len(got) == 4
    res_books = AI.pq_residual_codebooks(spark, path, m=4, k=8)
    truth = {
        r["qid"]: {x["vec_id"] for x in AI.ann_index_topk_many(
            spark, path, queries.filter(F.col("qid") == r["qid"]),
            k=k, nprobe=4,
        ).collect()}
        for r in queries.select("qid").collect()
    }
    for qid in (0, 7):
        qv = [float(x) for x in
              emb.filter(F.col("vec_id") == qid).head()["embedding"]]
        direct = {
            r["vec_id"]
            for r in AI.ivfpq_residual_topk(
                spark, path, qv, k=k, nprobe=2, rescore_factor=3,
                books=res_books,
            ).collect()
        }
        assert got[(2, 3, qid)][0] == len(direct & truth[qid])
        assert got[(4, rf_full, qid)][1] == 1.0


def test_residual_stored_codes_equal_derived(spark, emb, tmp_path):
    # encode-at-attach/ingest for the residual tier: attach rewrites
    # the build portion with rcode0..3 and ingest encodes the batch's
    # — both must equal the derive path (same books), pinned by the
    # stored==derived query parity and a numpy spot check
    import numpy as np

    path = str(tmp_path / "idx")
    base = emb.filter("vec_id % 3 <> 0")
    rest = emb.filter("vec_id % 3 = 0")
    AI.ann_index_build(base, path, num_centroids=8)
    res_books = AI.ann_index_attach_residual_pq(spark, path, m=4, k=8)
    assert AI.ann_index_books(spark, path, residual=True) == res_books
    assert AI.ann_index_ingest(rest, path) == rest.count()
    _, asg = AI.ann_index_load(spark, path)
    rcode_cols = [f"rcode{j}" for j in range(4)]
    assert all(c in asg.columns for c in rcode_cols)
    assert asg.count() == emb.count()
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 7).head()["embedding"]]
    rows = lambda df: [
        (r["vec_id"], r["adc_dist"], r["cos_sim"]) for r in df.collect()
    ]
    got_stored = AI.ivfpq_residual_topk(
        spark, path, qv, k=5, nprobe=2, rescore_factor=3, stored=True
    )
    got_derived = AI.ivfpq_residual_topk(
        spark, path, qv, k=5, nprobe=2, rescore_factor=3, books=res_books
    )
    assert rows(got_stored) == rows(got_derived)
    # numpy spot check on 5 rows spanning both portions: stored rcodes
    # == argmin over rounded residual subspace distances
    from cdc_system_spark.functions.portable import round_portable_py

    cents = {r["cell_id"]: [float(x) for x in r["cvec"]]
             for r in spark.read.parquet(f"{path}/centroids").collect()}
    sample = asg.filter(F.col("vec_id").isin(1, 2, 3, 6, 9)).collect()
    assert len(sample) == 5
    for r in sample:
        res = np.asarray([float(x) for x in r["embedding"]]) - np.asarray(
            cents[r["centroid_id"]]
        )
        for j in range(4):
            dists = [
                (round_portable_py(
                    float(((res[j * 16:(j + 1) * 16]
                            - np.asarray(res_books[j][c])) ** 2).sum()), 6
                ), c)
                for c in range(8)
            ]
            assert r[f"rcode{j}"] == min(dists)[1], (r["vec_id"], j)
    with pytest.raises(ValueError, match="books=None"):
        AI.ivfpq_residual_topk(
            spark, path, qv, k=5, stored=True, books=res_books
        )


def test_residual_stored_requires_tier(spark, emb, tmp_path):
    path = str(tmp_path / "idx")
    AI.ann_index_build(emb, path, num_centroids=4)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    with pytest.raises(ValueError, match="residual-PQ tier"):
        AI.ivfpq_residual_topk(spark, path, qv, k=5, stored=True)


def test_ivfpq_residual_batch_matches_single(spark, emb, tmp_path):
    # the batched residual form (per-(query, cell) in-plan LUTs over
    # stored rcodes) must agree with the single-query stored form per
    # query, and reject misuse
    path = str(tmp_path / "idx")
    AI.ann_index_build(emb, path, num_centroids=4)
    AI.ann_index_attach_residual_pq(spark, path, m=4, k=8)
    qids = [0, 7, 23]
    queries = emb.filter(F.col("vec_id").isin(*qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    batch = AI.ivfpq_topk_many(
        spark, path, queries, k=5, nprobe=2, rescore_factor=3,
        residual=True,
    )
    got = {}
    for r in batch.collect():
        got.setdefault(r["qid"], []).append(
            (r["vec_id"], r["adc_dist"], r["cos_sim"])
        )
    assert set(got) == set(qids)
    for qid in qids:
        qv = [float(x) for x in
              emb.filter(F.col("vec_id") == qid).head()["embedding"]]
        single = [
            (r["vec_id"], r["adc_dist"], r["cos_sim"])
            for r in AI.ivfpq_residual_topk(
                spark, path, qv, k=5, nprobe=2, rescore_factor=3,
                stored=True,
            ).collect()
        ]
        assert sorted(got[qid]) == sorted(single), qid
    with pytest.raises(ValueError, match="books=None"):
        AI.ivfpq_topk_many(
            spark, path, queries, k=5, residual=True,
            books=[[[0.0] * 16] * 8] * 4,
        )
    # an index without the tier refuses loudly
    bare = str(tmp_path / "bare")
    AI.ann_index_build(emb, bare, num_centroids=4)
    with pytest.raises(ValueError, match="residual-PQ tier"):
        AI.ivfpq_topk_many(spark, bare, queries, k=5, residual=True)


def test_residual_refined_codebooks_reduce_quantization_error(
    spark, emb, tmp_path
):
    # r10 verdict task 5: Lloyd refinement for the RESIDUAL books must
    # not increase total residual quantization error (k-means
    # monotonicity) — the production-path check the oracle can't make,
    # mirroring test_pq_refined_codebooks_reduce_quantization_error
    import numpy as np

    path = str(tmp_path / "idx")
    AI.ann_index_build(emb, path, num_centroids=8)
    cents = {r["cell_id"]: np.asarray([float(x) for x in r["cvec"]])
             for r in spark.read.parquet(f"{path}/centroids").collect()}
    _, asg = AI.ann_index_load(spark, path)
    rows = (
        asg.orderBy("vec_id")
        .limit(200)
        .select("embedding", "centroid_id")
        .collect()
    )
    data = np.asarray([
        [float(x) for x in r["embedding"]] - cents[r["centroid_id"]]
        for r in rows
    ])

    def err(books):
        total = 0.0
        for j, bcents in enumerate(books):
            pts = data[:, j * 16:(j + 1) * 16]
            c = np.asarray(bcents)
            d2 = ((pts[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            total += float(d2.min(axis=1).sum())
        return total

    base = AI.pq_residual_codebooks(spark, path, m=4, k=8)
    refined = AI.pq_residual_codebooks(
        spark, path, m=4, k=8, refine_iters=5, sample_cap=200
    )
    assert err(refined) <= err(base) + 1e-9
    assert refined != base  # the refinement actually moved centroids


def test_recall_residual_books_none_evaluates_stored_tier(
    spark, emb, tmp_path
):
    # r10 advisor: on an index WITH a stored residual tier,
    # ivfpq_recall(residual=True, books=None) must measure the books
    # production serves (stored=True path), not freshly retrained
    # derive-form books — pin it with REFINED stored books, whose
    # codes differ from the base derive-form ones
    path = str(tmp_path / "idx")
    AI.ann_index_build(emb, path, num_centroids=8)
    AI.ann_index_attach_residual_pq(spark, path, m=4, k=8, refine_iters=3)
    queries = emb.filter(F.col("vec_id").isin(0, 7)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    got = {
        (r["nprobe"], r["rescore_factor"], r["qid"]): r["n_hit"]
        for r in AI.ivfpq_recall(
            spark, path, queries, grid=[(2, 3)], k=10, residual=True
        ).collect()
    }
    truth = {
        qid: {x["vec_id"] for x in AI.ann_index_topk_many(
            spark, path, queries.filter(F.col("qid") == qid),
            k=10, nprobe=8,
        ).collect()}
        for qid in (0, 7)
    }
    for qid in (0, 7):
        qv = [float(x) for x in
              emb.filter(F.col("vec_id") == qid).head()["embedding"]]
        stored_hits = {
            r["vec_id"]
            for r in AI.ivfpq_residual_topk(
                spark, path, qv, k=10, nprobe=2, rescore_factor=3,
                stored=True,
            ).collect()
        }
        assert got[(2, 3, qid)] == len(stored_hits & truth[qid])


def test_ingest_rejects_half_attached_tier(spark, emb, tmp_path):
    # r10 advisor: a crash mid-attach (rcode columns without books —
    # the only order the books-last attach can leave) must make the
    # next ingest fail LOUDLY, not append mixed-schema files
    import shutil

    path = str(tmp_path / "idx")
    base = emb.filter("vec_id % 3 <> 0")
    rest = emb.filter("vec_id % 3 = 0")
    AI.ann_index_build(base, path, num_centroids=4)
    AI.ann_index_attach_residual_pq(spark, path, m=4, k=8)
    # simulate the crash window: assignments carry rcodes, books gone
    shutil.rmtree(f"{path}/codebooks_res")
    with pytest.raises(ValueError, match="residual-PQ tier"):
        AI.ann_index_ingest(rest, path)
    # re-running attach repairs the index; ingest proceeds
    AI.ann_index_attach_residual_pq(spark, path, m=4, k=8)
    assert AI.ann_index_ingest(rest, path) == rest.count()


def test_ingest_rejects_books_without_code_columns(spark, emb, tmp_path):
    # the raw-tier mirror: books present but a code-less assignment
    # table (a crashed build) must also fail loudly at ingest
    import shutil

    from cdc_system_spark.operators.similarity import pq_codebooks

    path = str(tmp_path / "idx")
    plain = str(tmp_path / "plain")
    base = emb.filter("vec_id % 3 <> 0")
    rest = emb.filter("vec_id % 3 = 0")
    AI.ann_index_build(base, path, num_centroids=4,
                       pq_books=pq_codebooks(base, m=4, k=8))
    AI.ann_index_build(base, plain, num_centroids=4)
    # simulate: books written, assignment rewrite never landed
    shutil.rmtree(f"{path}/assignments")
    shutil.copytree(f"{plain}/assignments", f"{path}/assignments")
    with pytest.raises(ValueError, match="PQ tier"):
        AI.ann_index_ingest(rest, path)


def test_prefix_tier_build_ingest_and_probe(spark, emb, tmp_path):
    # the Matryoshka prefix tier: pvec materializes at build AND ingest
    # (literal truncation of the stored vector), the coarse probe scan
    # reads ONLY (vec_id, pvec) — the prefix/d scan-bytes saving — and
    # a corpus-covering rescore window degenerates to the exact IVF
    # top-k (prefix only gates entry to the rescore)
    path = str(tmp_path / "idx")
    base = emb.filter("vec_id % 3 <> 0")
    rest = emb.filter("vec_id % 3 = 0")
    AI.ann_index_build(base, path, num_centroids=4, prefix_dims=16)
    assert AI.ann_index_prefix_dims(spark, path) == 16
    assert AI.ann_index_ingest(rest, path) == rest.count()
    _, asg = AI.ann_index_load(spark, path)
    rows = asg.filter(F.col("vec_id").isin(1, 3, 6)).collect()
    assert len(rows) == 3  # spans build (1) and ingest (3, 6) portions
    for r in rows:
        assert [float(x) for x in r["pvec"]] == [
            float(x) for x in r["embedding"][:16]
        ]
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 7).head()["embedding"]]
    n_cell = asg.count()
    full = AI.ann_prefix_topk(
        spark, path, qv, k=10, nprobe=4, rescore_factor=-(-n_cell // 10)
    )
    exact = AI.ann_index_topk(spark, path, qv, k=10, nprobe=4)
    assert [(r["vec_id"], r["cos_sim"]) for r in full.collect()] == [
        (r["vec_id"], r["cos_sim"]) for r in exact.collect()
    ]
    # the coarse stage's scan projects id + pvec, never the floats
    # (pinned on the split-out coarse frame — ann_prefix_topk executes
    # it eagerly before the survivor-literal rescore)
    import re

    from pyspark.sql import functions as SF

    probed = AI._probe_cells(spark, path, qv, 2)
    pruned = AI.ann_index_load(spark, path)[1].filter(
        F.col("centroid_id").isin(probed)
    )
    qp = SF.array(*[SF.lit(float(x)) for x in qv[:16]])
    coarse_plan = (
        AI._prefix_coarse(pruned, qp, 20, "vec_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    schemas = re.findall(r"ReadSchema: (\S+)", coarse_plan)
    assert any("pvec" in s and "embedding" not in s for s in schemas), schemas
    # the rescore scan reads floats through a pushed-down id IN filter
    # (row-group skipping: survivor-proportional bytes, never the
    # cells'), and never touches pvec
    tight = AI.ann_prefix_topk(spark, path, qv, k=5, nprobe=2)
    plan = tight._jdf.queryExecution().executedPlan().toString()
    rschemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert any("embedding" in s and "pvec" not in s for s in rschemas), rschemas
    assert re.search(r"PushedFilters: \[.*In\(vec_id", plan), plan
    assert len(tight.collect()) == 5


def test_prefix_tier_consistency_and_validations(spark, emb, tmp_path):
    import shutil

    path = str(tmp_path / "idx")
    base = emb.filter("vec_id % 3 <> 0")
    rest = emb.filter("vec_id % 3 = 0")
    AI.ann_index_build(base, path, num_centroids=4, prefix_dims=16)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    # crash window: pvec columns present, meta table gone -> loud
    shutil.rmtree(f"{path}/prefix_meta")
    with pytest.raises(ValueError, match="prefix tier"):
        AI.ann_index_ingest(rest, path)
    with pytest.raises(ValueError, match="no prefix tier"):
        AI.ann_prefix_topk(spark, path, qv, k=5)
    # a tier-less index rejects the probe; bad params reject loudly
    plain = str(tmp_path / "plain")
    AI.ann_index_build(base, plain, num_centroids=4)
    with pytest.raises(ValueError, match="no prefix tier"):
        AI.ann_prefix_topk(spark, plain, qv, k=5)
    with pytest.raises(ValueError, match="prefix_dims"):
        AI.ann_index_build(base, str(tmp_path / "bad"), prefix_dims=0)
    pfx = str(tmp_path / "pfx2")
    AI.ann_index_build(base, pfx, num_centroids=4, prefix_dims=16)
    with pytest.raises(ValueError, match="k, nprobe"):
        AI.ann_prefix_topk(spark, pfx, qv, k=0)
    with pytest.raises(ValueError, match="query dim"):
        AI.ann_prefix_topk(spark, pfx, qv[:8], k=5)


def test_prefix_dims_wider_than_vectors_rejected(spark, emb, tmp_path):
    # r11 advisor: an oversized prefix_dims would silently store a
    # d-wide pvec (F.slice truncates) while prefix_meta recorded the
    # larger width — every legitimate d-dim query then rejects with a
    # confusing "query dim shorter than prefix tier". Build validates
    # against the vector dim (free, from the collected centroid rows);
    # ingest mirrors the check against a corrupted meta table.
    base = emb.filter("vec_id % 3 <> 0")
    rest = emb.filter("vec_id % 3 = 0")
    with pytest.raises(ValueError, match="exceeds vector dim"):
        AI.ann_index_build(base, str(tmp_path / "bad"), num_centroids=4,
                           prefix_dims=70)
    path = str(tmp_path / "idx")
    AI.ann_index_build(base, path, num_centroids=4, prefix_dims=16)
    # corrupt the meta to claim a wider tier than the vectors carry
    spark.createDataFrame([(70,)], "prefix_dims int").write.mode(
        "overwrite"
    ).parquet(f"{path}/prefix_meta")
    with pytest.raises(ValueError, match="exceeds vector dim"):
        AI.ann_index_ingest(rest, path)


def test_prefix_topk_multiversion_ids_collapse(spark, emb, tmp_path):
    # r11 advisor: ingest dedups on (id, vector) — a re-embedded id
    # coexists with its stale version until compaction, so the prefix
    # cascade's rescore join could emit v² rows per id and duplicated
    # ids could crowd distinct results out of the final top-k. The
    # per-id collapse keeps the output unique and deterministic.
    path = str(tmp_path / "idx")
    AI.ann_index_build(emb, path, num_centroids=4, prefix_dims=16)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 7).head()["embedding"]]
    base_top = AI.ann_prefix_topk(spark, path, qv, k=10, nprobe=4).collect()
    # re-embed the current top hits: same ids, perturbed vectors — the
    # old versions stay behind as stale rows in the same cells
    hot = [r["vec_id"] for r in base_top[:3]]
    re_emb = (
        emb.filter(F.col("vec_id").isin(hot))
        .select("vec_id",
                F.transform("embedding", lambda x: x * F.lit(1.1))
                .cast("array<float>").alias("embedding"))
    )
    assert AI.ann_index_ingest(re_emb, path) == 3
    rows = AI.ann_prefix_topk(spark, path, qv, k=10, nprobe=4).collect()
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids)) == 10
    # deterministic across repeated probes even with versions live
    again = AI.ann_prefix_topk(spark, path, qv, k=10, nprobe=4).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in rows] == [
        (r["vec_id"], r["cos_sim"]) for r in again
    ]


def test_ann_prefix_topk_many_matches_single_query_form(spark, emb, tmp_path):
    # the batched cascade must be ROW-IDENTICAL per query to the
    # single-query ann_prefix_topk on the same index — probe ties,
    # coarse prefix ranking, rescore and version collapse all shared
    path = str(tmp_path / "idx")
    AI.ann_index_build(emb.filter("vec_id % 3 <> 0"), path,
                       num_centroids=8, prefix_dims=16)
    AI.ann_index_ingest(emb.filter("vec_id % 3 = 0"), path)
    qids = [0, 7, 23]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    batch = AI.ann_prefix_topk_many(
        spark, path, queries, k=10, nprobe=2, rescore_factor=4
    ).collect()
    got: dict[int, list] = {}
    for r in batch:
        got.setdefault(r["qid"], []).append(
            (r["vec_id"], r["prefix_sim"], r["cos_sim"])
        )
    for rows in got.values():
        rows.sort(key=lambda t: (-t[2], t[0]))
    for qid in qids:
        qv = [float(x) for x in
              emb.filter(F.col("vec_id") == qid).head()["embedding"]]
        single = [
            (r["vec_id"], r["prefix_sim"], r["cos_sim"])
            for r in AI.ann_prefix_topk(
                spark, path, qv, k=10, nprobe=2, rescore_factor=4
            ).collect()
        ]
        assert got[qid] == single, qid
    # guards: tier-less index and bad params reject loudly
    plain = str(tmp_path / "plain")
    AI.ann_index_build(emb.filter("vec_id % 3 <> 0"), plain, num_centroids=4)
    with pytest.raises(ValueError, match="no prefix tier"):
        AI.ann_prefix_topk_many(spark, plain, queries)
    with pytest.raises(ValueError, match="k, nprobe"):
        AI.ann_prefix_topk_many(spark, path, queries, k=0)


def test_ann_mmr_topk_full_probe_equals_brute_mmr(spark, emb, tmp_path):
    # probing every cell degenerates the IVF pool to the corpus-wide
    # cosine top-pool, so the whole cascade — selection order included
    # — must equal the brute-force mmr_topk (shared _mmr_greedy)
    path = str(tmp_path / "idx")
    AI.ann_index_build(emb.filter("vec_id % 3 <> 0"), path, num_centroids=8)
    AI.ann_index_ingest(emb.filter("vec_id % 3 = 0"), path)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 7).head()["embedding"]]
    got = AI.ann_mmr_topk(
        spark, path, qv, k=5, pool=20, nprobe=8, lam=0.7
    ).collect()
    want = S.mmr_topk(emb, qv, k=5, pool=20, lam=0.7).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # pruned probe still returns k rows in selection order
    pruned = AI.ann_mmr_topk(spark, path, qv, k=5, pool=20, nprobe=2).collect()
    assert [r["sel_rank"] for r in pruned] == [1, 2, 3, 4, 5]
    # the rank-1 pick is pure relevance: the probed cells' best hit
    assert pruned[0]["vec_id"] == 7 and pruned[0]["cos_sim"] == 1.0
    with pytest.raises(ValueError, match="pool >= k"):
        AI.ann_mmr_topk(spark, path, qv, k=6, pool=5)
    with pytest.raises(ValueError, match="nprobe"):
        AI.ann_mmr_topk(spark, path, qv, k=2, pool=5, nprobe=0)


def test_ann_mmr_topk_multiversion_pool_dedup(spark, emb, tmp_path):
    # a re-ingested id (stale version alive pre-compaction) must not
    # occupy two pool slots or be selected twice
    path = str(tmp_path / "idx")
    AI.ann_index_build(emb, path, num_centroids=4)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 7).head()["embedding"]]
    base = AI.ann_mmr_topk(spark, path, qv, k=5, pool=10, nprobe=4).collect()
    hot = [r["vec_id"] for r in base[:2]]
    re_emb = (
        emb.filter(F.col("vec_id").isin(hot))
        .select("vec_id",
                F.transform("embedding", lambda x: x * F.lit(1.05))
                .cast("array<float>").alias("embedding"))
    )
    assert AI.ann_index_ingest(re_emb, path) == 2
    rows = AI.ann_mmr_topk(spark, path, qv, k=5, pool=10, nprobe=4).collect()
    ids = [r["vec_id"] for r in rows]
    assert len(ids) == len(set(ids)) == 5


def test_ann_mmr_topk_many_matches_single_query_form(spark, emb, tmp_path):
    # the batched MMR must be ROW-IDENTICAL per query to the
    # single-query ann_mmr_topk: same probe, same pruned pool, same
    # shared greedy (here run distributed via applyInPandas)
    path = str(tmp_path / "idx")
    AI.ann_index_build(emb.filter("vec_id % 3 <> 0"), path, num_centroids=8)
    AI.ann_index_ingest(emb.filter("vec_id % 3 = 0"), path)
    qids = [0, 7, 23]
    queries = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    batch = AI.ann_mmr_topk_many(
        spark, path, queries, k=5, pool=20, nprobe=2, lam=0.7
    ).collect()
    got: dict[int, list] = {}
    for r in batch:
        got.setdefault(r["qid"], []).append(
            (r["sel_rank"], r["vec_id"], r["cos_sim"], r["mmr_score"])
        )
    for rows in got.values():
        rows.sort()
    for qid in qids:
        qv = [float(x) for x in
              emb.filter(F.col("vec_id") == qid).head()["embedding"]]
        single = [
            tuple(r)
            for r in AI.ann_mmr_topk(
                spark, path, qv, k=5, pool=20, nprobe=2, lam=0.7
            ).collect()
        ]
        assert got[qid] == single, qid
    with pytest.raises(ValueError, match="pool >= k"):
        AI.ann_mmr_topk_many(spark, path, queries, k=6, pool=5)


def test_ann_prefix_recall_saturates_at_full_knobs(spark, emb, tmp_path):
    # shared-skeleton sanity: at nprobe=C with a corpus-covering
    # rescore window the cascade IS brute force, so recall == 1.0;
    # tighter knobs stay in [0, 1] and a tier-less index rejects
    path = str(tmp_path / "idx")
    AI.ann_index_build(emb.filter("vec_id % 3 <> 0"), path,
                       num_centroids=4, prefix_dims=16)
    AI.ann_index_ingest(emb.filter("vec_id % 3 = 0"), path)
    queries = emb.filter(F.col("vec_id").isin(0, 7)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    n_cell = AI.ann_index_load(spark, path)[1].count()
    rows = AI.ann_prefix_recall(
        spark, path, queries, grid=[(4, -(-n_cell // 10)), (1, 1)], k=10
    ).collect()
    by = {(r["nprobe"], r["rescore_factor"], r["qid"]): r for r in rows}
    assert len(rows) == 4
    for qid in (0, 7):
        full = by[(4, -(-n_cell // 10), qid)]
        assert full["recall_at_k"] == 1.0 and full["n_truth"] == 10
        tight = by[(1, 1, qid)]
        assert 0.0 <= tight["recall_at_k"] <= 1.0
    plain = str(tmp_path / "plain")
    AI.ann_index_build(emb, plain, num_centroids=4)
    with pytest.raises(ValueError, match="no prefix tier"):
        AI.ann_prefix_recall(spark, plain, queries, grid=[(1, 1)])
