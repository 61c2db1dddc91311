"""Process-local shared builds for the maintained-index queries.

Four LSH queries (`q_lsh_index_maintained`, `q_containment_maintained`,
`q_leakage_split_maintained`, `q_lsh_index_stats`) and two ANN queries
(`q_ann_index_maintained`, `q_ann_index_stats`) perform the IDENTICAL
build-on-2/3 + ingest-1/3 sequence under the default geometry before
reading the artifact. Rebuilding per query is pure duplication — and it
is also the WRONG model: the whole point of a maintained artifact is
that queries share it. The memo here is deliberately process-local
(first use in any process always rebuilds), so a stale on-disk index
left by an older code version can never serve a newer process — the
cross-run staleness hazard that rules out a mtime/exists check.

The two MUTATION-gate queries (`q_ann_probe_maintained`,
`q_lsh_probe_maintained`) do NOT share these paths: they ingest edits
and deletions, and `q_lsh_index_maintained` reads the RAW version table
(stale rows included), which a shared mutated index would pollute.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import SparkSession

_BUILT: set[str] = set()


def _tag(sf_dir: str) -> str:
    return sf_dir.rstrip("/").rsplit("/", 1)[-1]


def shared_lsh_index(spark: SparkSession, sf_dir: str) -> str:
    """Path of the shared default-geometry LSH index over ``documents``
    (built on ``doc_id % 3 <> 0``, ingested ``% 3 = 0``), built at most
    once per process."""
    from cdc_system_spark.operators import lsh_index as LI
    from cdc_system_spark.queries.base import catalog

    path = f"{tempfile.gettempdir()}/lshidx_q_{_tag(sf_dir)}"
    if path not in _BUILT:
        docs = catalog(spark, sf_dir).documents
        LI.lsh_index_build(docs.filter("doc_id % 3 <> 0"), path)
        LI.lsh_index_ingest(docs.filter("doc_id % 3 = 0"), path)
        _BUILT.add(path)
    return path


def shared_ann_index(spark: SparkSession, sf_dir: str) -> str:
    """Path of the shared 8-centroid ANN index over ``embeddings``
    (built on ``vec_id % 3 <> 0``, ingested ``% 3 = 0``), built at most
    once per process."""
    from cdc_system_spark.operators import ann_index as AI
    from cdc_system_spark.queries.base import catalog

    path = f"{tempfile.gettempdir()}/annidx_q_{_tag(sf_dir)}"
    if path not in _BUILT:
        emb = catalog(spark, sf_dir).embeddings
        AI.ann_index_build(emb.filter("vec_id % 3 <> 0"), path, num_centroids=8)
        AI.ann_index_ingest(emb.filter("vec_id % 3 = 0"), path)
        _BUILT.add(path)
    return path


def shared_ann_pq_index(spark: SparkSession, sf_dir: str) -> str:
    """Path of the shared 8-centroid ANN index WITH the PQ tier: base
    codebooks (m=4, k=8 — deterministic first-8-by-id over the FULL
    corpus, matching the oracle's ``cb`` CTE) attached at build, so
    ``code0..code3`` are written encode-at-ingest for both the build
    (``vec_id % 3 <> 0``) and ingest (``% 3 = 0``) portions. Serves
    the stored-codes IVF×PQ query; kept separate from
    :func:`shared_ann_index` so the PQ-less index queries keep their
    exact assignment schema."""
    from cdc_system_spark.operators import ann_index as AI
    from cdc_system_spark.operators.similarity import pq_codebooks
    from cdc_system_spark.queries.base import catalog

    path = f"{tempfile.gettempdir()}/annidx_pq_{_tag(sf_dir)}"
    if path not in _BUILT:
        emb = catalog(spark, sf_dir).embeddings
        books = pq_codebooks(emb, m=4, k=8)
        AI.ann_index_build(
            emb.filter("vec_id % 3 <> 0"), path, num_centroids=8,
            pq_books=books,
        )
        AI.ann_index_ingest(emb.filter("vec_id % 3 = 0"), path)
        _BUILT.add(path)
    return path


def shared_ann_rpq_index(spark: SparkSession, sf_dir: str) -> str:
    """Path of the shared 8-centroid ANN index with the RESIDUAL-PQ
    tier: built on ``vec_id % 3 <> 0``, residual codebooks attached
    (deterministic base = the build portion's 8 smallest-id rows'
    ``v − centroid(cell)`` subvectors — trained at attach time, so on
    the data indexed so far, matching the oracle's build-portion
    ``rbase``), then ``% 3 = 0`` ingested WITH residual codes encoded
    in the ingest map pass. Serves the stored-codes IVFADC query."""
    from cdc_system_spark.operators import ann_index as AI
    from cdc_system_spark.queries.base import catalog

    path = f"{tempfile.gettempdir()}/annidx_rpq_{_tag(sf_dir)}"
    if path not in _BUILT:
        emb = catalog(spark, sf_dir).embeddings
        AI.ann_index_build(emb.filter("vec_id % 3 <> 0"), path, num_centroids=8)
        AI.ann_index_attach_residual_pq(spark, path, m=4, k=8)
        AI.ann_index_ingest(emb.filter("vec_id % 3 = 0"), path)
        _BUILT.add(path)
    return path


def shared_lsh_slice_indexes(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Paths of two shared LSH indexes over OVERLAPPING corpus slices
    (A = even ids, B = ids divisible by 3 — overlap = multiples of 6),
    for the cross-index set-algebra queries: each index's maintained
    ≤64-row KMV stats state composes via ``kmv_intersect`` to estimate
    content overlap with no corpus scan. Built at most once per
    process, same staleness reasoning as :func:`shared_lsh_index`."""
    from cdc_system_spark.operators import lsh_index as LI
    from cdc_system_spark.queries.base import catalog

    pa = f"{tempfile.gettempdir()}/lshidx_qa_{_tag(sf_dir)}"
    pb = f"{tempfile.gettempdir()}/lshidx_qb_{_tag(sf_dir)}"
    if pa not in _BUILT:
        docs = catalog(spark, sf_dir).documents
        LI.lsh_index_build(docs.filter("doc_id % 2 = 0"), pa)
        LI.lsh_index_build(docs.filter("doc_id % 3 = 0"), pb)
        _BUILT.add(pa)
    return pa, pb


def shared_churned_lsh_index(spark: SparkSession, sf_dir: str) -> str:
    """Path of a shared LSH index with DETERMINISTIC churn: built on
    the full corpus, then ingested with EDITED versions of every 10th
    doc — the originals become stale stored versions (the UPDATE
    leftover shape), so the ever-indexed estimate exceeds the live
    count by ~10%. Feeds the staleness/churn metric query; cached
    per process like the other shared builds."""
    from pyspark.sql import functions as F

    from cdc_system_spark.operators import lsh_index as LI
    from cdc_system_spark.queries.base import catalog

    path = f"{tempfile.gettempdir()}/lshidx_qc_{_tag(sf_dir)}"
    if path not in _BUILT:
        docs = catalog(spark, sf_dir).documents.select("doc_id", "text")
        LI.lsh_index_build(docs, path)
        edited = docs.filter("doc_id % 10 = 0").select(
            "doc_id", F.concat(F.col("text"), F.lit(" EDITED")).alias("text")
        )
        LI.lsh_index_ingest(edited, path)
        _BUILT.add(path)
    return path


def churned_corpus(spark: SparkSession, sf_dir: str):
    """The LIVE corpus matching :func:`shared_churned_lsh_index`: every
    10th doc carries its edited text (the original version is stale)."""
    from pyspark.sql import functions as F

    from cdc_system_spark.queries.base import catalog

    docs = catalog(spark, sf_dir).documents.select("doc_id", "text")
    return docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0, F.concat(F.col("text"), F.lit(" EDITED"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def shared_ann_rpq_refined_index(spark: SparkSession, sf_dir: str) -> str:
    """Path of the shared residual-PQ index with LLOYD-REFINED books
    (``refine_iters=5`` over a ≤2048-row residual sample) — the
    production counterpart of :func:`shared_ann_rpq_index`'s
    deterministic base books: same geometry, same stored-codes probe
    plan, better codebooks. Serves the refined-probe bench line and
    the base-vs-refined recall A/B (r10 verdict task 5/6)."""
    from cdc_system_spark.operators import ann_index as AI
    from cdc_system_spark.queries.base import catalog

    path = f"{tempfile.gettempdir()}/annidx_rpqr_{_tag(sf_dir)}"
    if path not in _BUILT:
        emb = catalog(spark, sf_dir).embeddings
        AI.ann_index_build(emb.filter("vec_id % 3 <> 0"), path, num_centroids=8)
        AI.ann_index_attach_residual_pq(spark, path, m=4, k=8, refine_iters=5)
        AI.ann_index_ingest(emb.filter("vec_id % 3 = 0"), path)
        _BUILT.add(path)
    return path


def shared_ann_prefix_index(spark: SparkSession, sf_dir: str) -> str:
    """Path of the shared 8-centroid ANN index with the MATRYOSHKA
    prefix tier (``prefix_dims=16``): built on ``vec_id % 3 <> 0``,
    ``% 3 = 0`` ingested WITH the stored ``pvec`` column materialized
    in the ingest map pass. Serves the prefix-cascade probe query —
    build- and ingest-written prefixes both under the oracle."""
    from cdc_system_spark.operators import ann_index as AI
    from cdc_system_spark.queries.base import catalog

    path = f"{tempfile.gettempdir()}/annidx_pfx_{_tag(sf_dir)}"
    if path not in _BUILT:
        emb = catalog(spark, sf_dir).embeddings
        AI.ann_index_build(
            emb.filter("vec_id % 3 <> 0"), path, num_centroids=8,
            prefix_dims=16,
        )
        AI.ann_index_ingest(emb.filter("vec_id % 3 = 0"), path)
        _BUILT.add(path)
    return path
