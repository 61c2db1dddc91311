"""End-to-end corpus curation: the composed training-data pipeline.

A real 100 TB training-data run is not one operator — it is a fixed
sequence of them, each stage shrinking the corpus the next stage sees:

    exact dedup → near-dup clustering (MinHash-LSH) → repetition/quality
    filter → benchmark decontamination → stratified sampling

:func:`curate_corpus` composes the production operators from
``operators/dedup.py``, ``operators/text.py`` and
``operators/sampling.py`` into that sequence. Composition is exactly
where cross-operator interface drift shows up (a column renamed, a
survivor set keyed differently), so the composed pipeline is registered
as an oracle-checked query (``q_curation_pipeline``) alongside the
single-operator checks.

Scale shape (the reason the stage ORDER is fixed): exact dedup is the
cheapest pass (one hash-groupBy) and runs first to shrink everything
downstream; LSH clustering runs on exact-survivors only; the per-row
filters (repetition, n-token gate) are zero-shuffle map passes; the
decontamination probe broadcasts the tiny benchmark gram set; the final
sample is a map-side hash filter. Every inter-stage handoff is a
``doc_id`` semi join — no stage rewrites another's columns.

Substring-level dedup (:func:`substring_duplicate_passages`) is the
modern-pipeline companion: repeated *passages* (boilerplate headers,
license blocks) recur across otherwise-distinct documents and survive
both exact and near-dup doc-level dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_system_spark.operators.dedup import (
    duplicate_clusters,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    token_ngrams,
)
from cdc_system_spark.operators.sampling import stratified_sample
from cdc_system_spark.operators.text import repetition_signals
from cdc_system_spark.functions.portable import spread


def curation_stages(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    strata_col: str = "lang",
    rates: dict[str, float] | None = None,
    default_rate: float = 0.1,
    salt: str = "s1",
    min_tokens: int = 5,
    shingle_k: int = 7,
    num_perms: int = 16,
    rows_per_band: int = 4,
    decontam_n: int = 5,
    survivor: str = "min_id",
) -> dict[str, DataFrame]:
    """Run the full curation sequence; returns every stage's survivor
    frame keyed by stage name (``input`` → ``exact_dedup`` →
    ``neardup_clusters`` → ``quality_filters`` → ``decontaminated`` →
    ``sampled``). :func:`curate_corpus` returns just the final frame;
    :func:`curation_funnel` counts each stage — the retention readout a
    curation run reports.

    Stages (each a ``doc_id`` semi join against the previous survivor
    set, so the input schema passes through unchanged):

    1. exact dedup — min-id survivor per ``md5(text)``
    2. near-dup clustering — MinHash-LSH pairs → connected components;
       keep only each cluster's canonical doc (``doc_id == cluster_id``)
    3. repetition + length filter — Gopher-style ``keep`` verdict AND
       ``>= min_tokens`` whitespace tokens
    4. decontamination — drop docs sharing any token ``decontam_n``-gram
       with the benchmark set
    5. stratified sampling — deterministic md5-bucket mixture reweighting
    """
    # 1. exact dedup (survivor ids only — exact_dedup returns one row
    # per content hash with the min id). c1 feeds THREE downstream plan
    # branches (minhash signatures, the cluster-survivor semi join, and
    # through c2 the filter stages); without lineage truncation each
    # branch re-runs the scan + md5 groupBy + semi join. The checkpoint
    # materializes the survivor set once — it is corpus-shaped rows, the
    # same data every branch must read anyway.
    exact_ids = exact_dedup(corpus, text_col, id_col).select(id_col)
    c1 = corpus.join(exact_ids, id_col, "left_semi").localCheckpoint(eager=False)

    # 2. near-dup canonical survivors
    sigs = minhash_signatures(c1, text_col, id_col, k=shingle_k, num_perms=num_perms)
    pairs = lsh_candidate_pairs(
        sigs, id_col, num_perms=num_perms, rows_per_band=rows_per_band
    )
    clusters = duplicate_clusters(c1, pairs, id_col)
    if survivor == "quality":
        # keep each cluster's highest-quality doc instead of the min-id
        # canonical (near-dups differ in truncation/boilerplate — the
        # best copy is free corpus quality); one extra window shuffle
        from cdc_system_spark.operators.dedup import quality_survivors
        from cdc_system_spark.operators.text import text_quality

        scores = text_quality(c1, text_col, id_col).select(
            id_col, "quality_score"
        )
        canonical = quality_survivors(clusters, scores, id_col).select(id_col)
    elif survivor == "min_id":
        canonical = clusters.filter(
            F.col(id_col) == F.col("cluster_id")
        ).select(id_col)
    else:
        raise ValueError(f"survivor must be 'min_id' or 'quality', got {survivor!r}")
    # c2 feeds the repetition fold AND the length filter — truncate once
    c2 = c1.join(canonical, id_col, "left_semi").localCheckpoint(eager=False)

    # 3. per-row filters: repetition verdict + minimum length.
    # The lineage barrier before the filter matters: filtering directly
    # on `keep` lets Catalyst push the predicate — and with it the whole
    # repetition fold — below spread()'s repartition into the scan
    # stage, which on an under-split input runs the CPU-heavy fold at
    # file parallelism (measured 7 s vs 0.7 s at sf0.1). The checkpoint
    # pins the fold at cluster parallelism; its output is per-doc floats,
    # so the materialization is trivially small.
    rep_keep = (
        repetition_signals(c2, text_col, id_col)
        .localCheckpoint(eager=False)
        .filter(F.col("keep"))
        .select(id_col)
    )
    long_enough = spread(c2).filter(
        F.size(F.split(F.col(text_col), " ")) >= min_tokens
    )
    c3 = long_enough.join(rep_keep, id_col, "left_semi")

    # 4. benchmark decontamination (broadcast gram probe + anti join)
    from cdc_system_spark.operators.dedup import decontaminate

    c4 = decontaminate(c3, benchmark, text_col, id_col, n=decontam_n)

    # 5. deterministic mixture reweighting
    c5 = stratified_sample(
        c4,
        strata_col,
        rates if rates is not None else {"en": 0.5, "de": 0.2},
        default_rate=default_rate,
        id_col=id_col,
        salt=salt,
    )
    return {
        "input": corpus,
        "exact_dedup": c1,
        "neardup_clusters": c2,
        "quality_filters": c3,
        "decontaminated": c4,
        "sampled": c5,
    }


#: funnel stage order (dict order above is authoritative; this pins it)
CURATION_STAGES = (
    "input",
    "exact_dedup",
    "neardup_clusters",
    "quality_filters",
    "decontaminated",
    "sampled",
)


def curate_corpus(corpus: DataFrame, benchmark: DataFrame, **kwargs) -> DataFrame:
    """Run the full curation sequence; returns the curated corpus rows
    (the ``sampled`` stage of :func:`curation_stages` — see there for
    the stage list and the scale rationale of the fixed order)."""
    return curation_stages(corpus, benchmark, **kwargs)["sampled"]


def curation_funnel(
    corpus: DataFrame, benchmark: DataFrame, **kwargs
) -> DataFrame:
    """Per-stage survivor counts of the curation pipeline — the
    retention funnel every curation run reports (how much each stage
    removed is the first sanity check on thresholds: a stage dropping
    90% or 0% is usually misconfigured).

    Each stage is one count aggregate over a frame the pipeline already
    materializes (the handoff checkpoints), so the funnel costs one
    extra reduce per stage, not a recompute; output is 6 rows.
    """
    stages = curation_stages(corpus, benchmark, **kwargs)
    counts = None
    for idx, name in enumerate(CURATION_STAGES, start=1):
        # global agg (not groupBy on literals): an emptied-out stage
        # must still report its 0 row
        row = stages[name].agg(F.count("*").alias("n_docs")).select(
            F.lit(idx).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col("n_docs"),
        )
        counts = row if counts is None else counts.unionByName(row)
    return counts


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into overlapping fixed-token windows — the
    standard pre-tokenization chunking step (RAG indexing, long-doc
    training prep). Output: one row per (doc, chunk) with the chunk
    text and its token count.

    Pure per-row builtins: token split → windowed ``slice`` over a
    generated index sequence → explode. Zero shuffle, stays in
    whole-stage codegen; the 1→N fan-out is a Generate node riding the
    scan, so at 100 TB chunking is free next to the IO it shares.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    w = F.split(F.col(text_col), " ")
    n = F.size(w)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1).cast("long")).otherwise(
        F.ceil((n - chunk_tokens) / F.lit(float(stride))) + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice(w, (i * stride + 1).cast("int"), chunk_tokens)
            ).alias("chunk_text"),
            F.size(F.slice(w, (i * stride + 1).cast("int"), chunk_tokens))
            .cast("long")
            .alias("n_chunk_tokens"),
        ),
    )
    return spread(df).select(
        F.col(id_col), F.explode(chunks).alias("c")
    ).select(id_col, "c.chunk_idx", "c.chunk_text", "c.n_chunk_tokens")


def sequence_pack(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ctx_tokens: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """Assign every document its position in packed fixed-length
    training sequences: concatenate docs in id order within a shard,
    cut the token stream every ``ctx_tokens``, and report which
    sequence range each doc lands in — the bookkeeping a sequence-
    packing data loader needs (which docs co-occupy a context window,
    where each doc's tokens start).

    Sharded by ``doc_id % n_shards`` ON PURPOSE: a single global
    ordered cumulative sum is one total order — one reducer's worth of
    window state at 100 TB. Per-shard running sums shuffle once on the
    shard key and scale with executor count; packers do exactly this
    (pack per input shard, never globally).
    """
    w = F.split(F.col(text_col), " ")
    shard = (F.col(id_col) % n_shards).cast("int")
    from pyspark.sql import Window

    win = Window.partitionBy("shard").orderBy(id_col)
    toks = spread(df).select(
        F.col(id_col), shard.alias("shard"), F.size(w).cast("long").alias("n_tokens")
    )
    cum = toks.withColumn("_cum", F.sum("n_tokens").over(win))
    start = F.col("_cum") - F.col("n_tokens")
    return cum.select(
        id_col,
        "shard",
        "n_tokens",
        start.alias("start_tok"),
        F.expr(f"(_cum - n_tokens) div {ctx_tokens}").alias("seq_first"),
        F.expr(f"(_cum - 1) div {ctx_tokens}").alias("seq_last"),
    )


def incremental_ingest(
    corpus: DataFrame,
    incoming: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    survivors: DataFrame | None = None,
) -> DataFrame:
    """Incrementally admit a new document batch into a curated corpus:
    drop incoming docs whose content hash already exists in the corpus,
    exact-dedup within the batch (min-id survivor), then UPSERT the
    remainder by ``id_col`` — the CDC-shaped maintenance path of a
    training corpus (this engine's change-capture surface delivers
    ``incoming``; this operator is the merge policy for it).

    Upsert, not append: a CDC-delivered UPDATE arrives as an existing
    ``doc_id`` with changed text. It passes the content-hash anti join
    (the text is new), so appending would yield two corpus rows with
    the same id — breaking the id-keyed invariant every downstream
    operator (clustering, survivor semi joins, id joins) assumes. The
    admitted batch therefore REPLACES any same-id corpus row; an
    unchanged re-delivery (same id, same text) is dropped by the hash
    anti join and the corpus row survives untouched.

    Scale shape: the corpus side is reduced to its DISTINCT content
    hashes before the content join, so that anti join moves hash-width
    rows, not documents; the id-keyed replacement anti join has the
    tiny admitted batch (one sync interval's worth) on its build side,
    so it broadcasts. A production deployment keeps the corpus hash set
    as a maintained table (the reference's audit-table pattern) instead
    of recomputing — the join shapes are identical.

    ``survivors`` (optional) short-circuits the dedup stages with a
    PRECOMPUTED :func:`ingest_survivors` frame — for callers that need
    the surviving subset themselves before the merge (the streaming
    ingestor indexes exactly the rows that LAND, so the maintained
    index never holds a version the corpus dropped).
    """
    deduped = (
        ingest_survivors(corpus, incoming, text_col, id_col)
        if survivors is None
        else survivors
    )
    kept = corpus.join(deduped.select(id_col), id_col, "left_anti")
    return kept.unionByName(deduped)


def ingest_survivors(
    corpus: DataFrame,
    incoming: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The subset of ``incoming`` that :func:`incremental_ingest` will
    actually land in the corpus: rows surviving the cross-id
    content-hash anti join (content already in the corpus under ANY
    id drops — even when an upstream fuzzy gate's degenerate LSH
    bucket suppressed the candidate pair) and the within-batch exact
    dedup (min-id survivor). Factored out so consumers that must act
    on exactly-what-lands (index maintenance, per-batch stats) share
    one definition with the merge instead of re-deriving it."""
    corpus_hashes = corpus.select(
        F.md5(F.col(text_col)).alias("_h")
    ).distinct()
    fresh = (
        incoming.withColumn("_h", F.md5(F.col(text_col)))
        .join(corpus_hashes, "_h", "left_anti")
        .drop("_h")
    )
    batch_ids = exact_dedup(fresh, text_col, id_col).select(id_col)
    return fresh.join(batch_ids, id_col, "left_semi")


def substring_duplicate_passages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
    max_posting: int = 1000,
) -> DataFrame:
    """Repeated-passage detection: token ``n``-grams occurring in
    ``min_docs``+ distinct documents, with the doc list per passage —
    the suffix-array-lite substring dedup pass (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", uses
    true suffix arrays; sorted n-gram postings approximate it at fixed
    ``n``) that catches boilerplate headers and license blocks doc-level
    dedup misses.

    Shape at 100 TB: per-doc gram dedup happens INSIDE the row
    (``array_distinct`` before the explode — cross-doc repeats are
    different rows by construction, so no ``(gram, doc)`` distinct
    shuffle exists at all); then one shuffle on gram builds the posting
    list. ``max_posting`` caps
    degenerate grams (the LSH ``max_bucket`` guard applied to postings):
    a gram in everything ("all rights reserved") would otherwise carry
    an unbounded doc array to one reducer; real pipelines drop those as
    stop-passages, same effect. Postings are sorted (numerically, before
    joining) so output is deterministic, and emitted as a comma-joined
    STRING — flat column types only, so sinks and row canonicalizers
    never see a nested array.
    """
    gd = spread(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(token_ngrams(text_col, n))).alias("passage"),
    )
    return (
        gd.groupBy("passage")
        .agg(
            F.count("*").alias("n_docs"),
            F.array_join(
                F.sort_array(F.collect_list(id_col)).cast("array<string>"), ","
            ).alias("doc_ids"),
        )
        .filter(
            (F.col("n_docs") >= min_docs) & (F.col("n_docs") <= max_posting)
        )
    )


def neardup_ingest(
    corpus: DataFrame,
    incoming: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_perms: int = 16,
    rows_per_band: int = 4,
    max_bucket: int = 1000,
    shingle_k: int = 7,
    allow_same_id: bool = False,
    within_batch: bool = True,
    corpus_sigs: DataFrame | None = None,
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """Admit only incoming docs that are NOT near-duplicates of the
    existing corpus: MinHash both sides, LSH-probe the corpus's band
    table with the batch's bands (batch×corpus candidates only — never
    corpus×corpus), reject candidates whose signature-agreement Jaccard
    estimate reaches ``threshold``. The fuzzy companion to
    :func:`incremental_ingest` (which only stops EXACT re-deliveries):
    a CDC-fed training corpus otherwise accretes lightly-edited copies
    of pages it already has.

    ``within_batch=True`` (default) additionally dedups the admitted
    batch AGAINST ITSELF: two near-duplicate fresh docs arriving in the
    same micro-batch both pass the corpus probe (neither is in the
    corpus yet), so without this pass the near-dup pair accretes — only
    the later EXACT-dup catch in :func:`incremental_ingest` would stop
    identical twins. The rule is :func:`~cdc_system_spark.operators
    .similarity.semantic_dedup`'s GREEDY pair-drop: a batch doc is
    dropped iff ANY smaller-id corpus-surviving batch doc estimates
    Jaccard ≥ ``threshold`` with it — whether or not that smaller-id
    doc is itself dropped by the same pass. (In a chain A~B, B~C with
    A≁C, C is dropped because of B even though B falls to A: stricter
    than a transitive-survivor rule, deterministic, and single-pass —
    a survivor-aware rule would need iterative reprocessing.) Cost is
    batch-sized only: the batch band table built for the corpus probe
    is exploded ONCE and reused here; candidate pairs are restricted to
    corpus-surviving ids on both sides, so bucket caps apply over the
    full-batch band population (the same table the probe — and the
    registered oracle — uses).

    Scale shape: at 100 TB the corpus signatures and band table are
    maintained artifacts (built once, stored bucketed on the band key,
    updated as batches are admitted) — each sync interval computes
    signatures for one batch only and probes. That artifact is
    :mod:`~cdc_system_spark.operators.lsh_index`: pass its loaded
    tables as ``corpus_sigs``/``corpus_bands`` and the corpus text is
    never read, never shingled, never hashed here — the probe's only
    corpus-sized work is the band join against the stored postings.
    When they are omitted, both sides are computed inline; the join
    shapes are identical either way. The Jaccard estimate reads
    signatures only (no text re-shuffle); ``max_bucket`` caps
    degenerate corpus band buckets exactly as in
    :func:`~cdc_system_spark.operators.dedup.lsh_candidate_pairs`.
    The two frames must come from an index built with THIS call's
    ``shingle_k``/``num_perms``/``rows_per_band`` (``lsh_index_load``
    validates the stored geometry).

    ``allow_same_id=True`` ignores candidate pairs whose two sides
    carry the SAME id: a CDC UPDATE is usually a light edit of its own
    corpus row — near-dup by construction — and must still replace it.
    The streaming ingest path sets this; batch admission of fresh-id
    batches leaves it off.

    Returns the admitted incoming rows (input schema, unchanged).
    """
    from cdc_system_spark.operators.dedup import (
        _band_table,
        lsh_cross_pairs,
        minhash_jaccard_estimate,
    )

    # the batch signature frame feeds THREE consumers (corpus probe,
    # estimate, within-batch pass): checkpoint it so the shingle +
    # 16-perm MinHash computation runs once instead of being re-derived
    # inside every join arm (lazy - materializes at first action)
    sig_in = minhash_signatures(
        incoming, text_col, id_col, k=shingle_k, num_perms=num_perms
    ).localCheckpoint(eager=False)
    sig_corpus = (
        corpus_sigs
        if corpus_sigs is not None
        else minhash_signatures(
            corpus, text_col, id_col, k=shingle_k, num_perms=num_perms
        )
    )
    # one band explode for BOTH LSH passes (corpus probe + within-batch)
    bands_in = _band_table(
        sig_in, id_col, num_perms, rows_per_band
    ).localCheckpoint(eager=False)
    cand = lsh_cross_pairs(
        sig_in,
        sig_corpus,
        id_col=id_col,
        num_perms=num_perms,
        rows_per_band=rows_per_band,
        max_bucket=max_bucket,
        bands_a=bands_in,
        bands_b=corpus_bands,
    )
    if allow_same_id:
        cand = cand.filter(F.col("id1") != F.col("id2"))
    # id1 is always the batch doc, id2 the corpus doc (lsh_cross_pairs
    # order); distinct frames per side so a shared id value (CDC UPDATE
    # re-using its doc_id) can't cross-match
    est = minhash_jaccard_estimate(
        sig_in, cand, id_col=id_col, num_perms=num_perms, sigs2=sig_corpus
    )
    rejected = (
        est.filter(F.col("est_jaccard") >= threshold)
        .select(F.col("id1").alias(id_col))
        .distinct()
    )
    admitted = incoming.join(rejected, id_col, "left_anti")
    if not within_batch:
        return admitted
    # two consumers below (survivor filter + the final anti join): cut
    # the corpus-probe lineage once
    admitted = admitted.localCheckpoint(eager=False)
    # within-batch pass: near-dup pairs AMONG corpus-survivors (both
    # sides fresh, so the corpus probe saw neither). The band table and
    # signatures are REUSED from the corpus probe — candidates come
    # from the full-batch bands (caps over the same population the
    # probe and the oracle use) and are then restricted to survivor
    # ids on both sides; id1 < id2 by lsh_candidate_pairs
    # construction — drop the larger id of each estimating pair
    # (greedy smaller-id rule, as in semantic_dedup).
    from cdc_system_spark.operators.dedup import lsh_candidate_pairs

    adm_ids = admitted.select(id_col).distinct()
    cand_in = (
        lsh_candidate_pairs(
            sig_in,
            id_col=id_col,
            num_perms=num_perms,
            rows_per_band=rows_per_band,
            max_bucket=max_bucket,
            bands=bands_in,
        )
        .join(adm_ids.select(F.col(id_col).alias("id1")), "id1", "left_semi")
        .join(adm_ids.select(F.col(id_col).alias("id2")), "id2", "left_semi")
    )
    est_in = minhash_jaccard_estimate(
        sig_in, cand_in, id_col=id_col, num_perms=num_perms
    )
    dropped_in = (
        est_in.filter(F.col("est_jaccard") >= threshold)
        .select(F.col("id2").alias(id_col))
        .distinct()
    )
    return admitted.join(dropped_in, id_col, "left_anti")


def neardup_ingest_report(
    corpus: DataFrame,
    incoming: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perms: int = 16,
    rows_per_band: int = 4,
    max_bucket: int = 1000,
    shingle_k: int = 7,
) -> DataFrame:
    """Observability twin of :func:`neardup_ingest`: instead of
    filtering, report each batch doc's BEST corpus match — (batch id,
    matched corpus id, Jaccard estimate) for every batch doc that hit
    any LSH candidate. This is what you look at BEFORE choosing the
    admission threshold (the est distribution tells you where the
    near-dup cliff sits for your corpus), and what an audit log keeps
    per rejected doc.

    Same plan as the filter form up to the estimate; the argmax is one
    window over the candidate-pair-sized frame (≪ corpus), best match
    tie-broken by corpus id.
    """
    from pyspark.sql import Window

    from cdc_system_spark.operators.dedup import (
        lsh_cross_pairs,
        minhash_jaccard_estimate,
    )

    sig_in = minhash_signatures(
        incoming, text_col, id_col, k=shingle_k, num_perms=num_perms
    )
    sig_corpus = minhash_signatures(
        corpus, text_col, id_col, k=shingle_k, num_perms=num_perms
    )
    cand = lsh_cross_pairs(
        sig_in,
        sig_corpus,
        id_col=id_col,
        num_perms=num_perms,
        rows_per_band=rows_per_band,
        max_bucket=max_bucket,
    )
    est = minhash_jaccard_estimate(
        sig_in, cand, id_col=id_col, num_perms=num_perms, sigs2=sig_corpus
    )
    w = Window.partitionBy("id1").orderBy(
        F.desc("est_jaccard"), F.asc("id2")
    )
    return (
        est.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            F.col("id1").alias(id_col),
            F.col("id2").alias("best_match"),
            "est_jaccard",
        )
    )


def containment_ingest(
    corpus: DataFrame,
    incoming: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    shingle_k: int = 7,
    num_perms: int = 16,
    max_bucket: int = 1000,
    allow_same_id: bool = False,
    within_batch: bool = True,
    corpus_signatures: DataFrame | None = None,
) -> DataFrame:
    """Admit only incoming docs that are NOT (estimated) CONTAINED in
    an existing corpus doc — the asymmetric companion to
    :func:`neardup_ingest`. Jaccard admission misses exactly the
    quoted-subset case (a document pasted inside a much longer corpus
    page has tiny Jaccard — the union is the big page — but
    containment ≈ 1, Broder SEQUENCES '97); this gate rejects an
    incoming doc when ``est_containment >= threshold`` against a
    corpus doc whose shingle set is AT LEAST as large (``n_sh_batch <=
    n_sh_corpus``): the batch doc is the subset, the corpus copy is
    the superset that keeps the quote's context. A batch doc that
    CONTAINS a smaller corpus doc is admitted — it brings new content;
    reclaiming the now-redundant corpus subset is a
    :func:`~cdc_system_spark.operators.dedup.drop_contained`
    compaction, not an admission decision (admission must never mutate
    corpus rows it did not receive a change for).

    Same integer-exact estimate as
    :func:`~cdc_system_spark.operators.dedup.containment_pairs`
    (``m·(n1+n2) / ((P+m)·min(n1,n2))``), same 1-row-band geometry
    (a contained pair's Jaccard is small by construction — the
    symmetric 4-row bands would filter out exactly the pairs this gate
    exists to catch), batch×corpus candidates only.

    ``within_batch=True`` additionally drops quoted-subset pairs
    ARRIVING TOGETHER (neither side in the corpus yet): among
    corpus-surviving batch docs, each qualifying pair drops its
    smaller-``n_sh`` side (ties: the larger id) — the
    :func:`~cdc_system_spark.operators.dedup.drop_contained` rule,
    greedy single-pass like ``neardup_ingest``'s.

    ``corpus_signatures`` (optional): a ``(id_col, h0..h{p-1}, n_sh)``
    frame — the :func:`~cdc_system_spark.operators.lsh_index
    .lsh_index_signature_tables` shape — so the corpus side reads the
    MAINTAINED MinHash artifact: no corpus text pass at all (the
    live-filtered load costs one md5 pass over corpus BYTES, the
    post-compact ``assume_covered`` load costs zero). The 1-row band
    probe is derived from the stored per-perm values per batch — an
    index-sized column explode, no text; at 100 TB cadence that
    derivation is itself worth persisting, but it is already
    text-free. ``allow_same_id=True`` ignores same-id pairs (a CDC
    UPDATE truncating its own row to a subset must still replace it).

    Returns the admitted incoming rows (input schema, unchanged).
    """
    from cdc_system_spark.functions.portable import round_portable
    from cdc_system_spark.operators.dedup import _band_table, lsh_cross_pairs

    sig_in = minhash_signatures(
        incoming, text_col, id_col, k=shingle_k, num_perms=num_perms,
        with_count=True,
    ).localCheckpoint(eager=False)
    sig_corpus = (
        corpus_signatures
        if corpus_signatures is not None
        else minhash_signatures(
            corpus, text_col, id_col, k=shingle_k, num_perms=num_perms,
            with_count=True,
        )
    )
    # one band explode per side at the containment geometry (1-row
    # bands); the batch table is reused by the within-batch pass
    bands_in = _band_table(sig_in, id_col, num_perms, 1).localCheckpoint(
        eager=False
    )
    # dedup_pairs=False on BOTH passes: the candidate sets here are
    # 1-row-band collisions (multi-million rows at sf0.1); the distinct
    # used to run before the selective containment filter, exchanging
    # the whole set. The rejected/dropped ID sets below apply their own
    # distinct, so deferring it keeps the raw collisions map-side end
    # to end — identical admitted rows (est is a pure pair function).
    cand = lsh_cross_pairs(
        sig_in,
        sig_corpus,
        id_col=id_col,
        num_perms=num_perms,
        rows_per_band=1,
        max_bucket=max_bucket,
        bands_a=bands_in,
        dedup_pairs=False,
    )
    if allow_same_id:
        cand = cand.filter(F.col("id1") != F.col("id2"))

    p = F.lit(num_perms)

    def _containment(est: DataFrame) -> DataFrame:
        m = sum(
            F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
            for i in range(num_perms)
        )
        return est.withColumn("_m", m.cast("long")).select(
            "id1",
            "id2",
            "n_sh1",
            "n_sh2",
            round_portable(
                (F.col("_m") * (F.col("n_sh1") + F.col("n_sh2")))
                / ((p + F.col("_m")) * F.least("n_sh1", "n_sh2")).cast(
                    "double"
                ),
                6,
            ).alias("est_containment"),
        )

    ha = sig_in.select(
        F.col(id_col).alias("id1"),
        F.col("n_sh").alias("n_sh1"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(num_perms)],
    )
    hb = sig_corpus.select(
        F.col(id_col).alias("id2"),
        F.col("n_sh").alias("n_sh2"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(num_perms)],
    )
    scored = _containment(cand.join(ha, "id1").join(hb, "id2"))
    rejected = (
        scored.filter(
            (F.col("est_containment") >= threshold)
            & (F.col("n_sh1") <= F.col("n_sh2"))
        )
        .select(F.col("id1").alias(id_col))
        .distinct()
    )
    admitted = incoming.join(rejected, id_col, "left_anti")
    if not within_batch:
        return admitted
    admitted = admitted.localCheckpoint(eager=False)
    adm_ids = admitted.select(id_col).distinct()
    cand_in = (
        lsh_candidate_pairs(
            sig_in,
            id_col=id_col,
            num_perms=num_perms,
            rows_per_band=1,
            max_bucket=max_bucket,
            bands=bands_in,
            dedup_pairs=False,
        )
        .join(adm_ids.select(F.col(id_col).alias("id1")), "id1", "left_semi")
        .join(adm_ids.select(F.col(id_col).alias("id2")), "id2", "left_semi")
    )
    ha2 = sig_in.select(
        F.col(id_col).alias("id1"),
        F.col("n_sh").alias("n_sh1"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(num_perms)],
    )
    hb2 = sig_in.select(
        F.col(id_col).alias("id2"),
        F.col("n_sh").alias("n_sh2"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(num_perms)],
    )
    est_in = _containment(cand_in.join(ha2, "id1").join(hb2, "id2"))
    dropped_in = (
        est_in.filter(F.col("est_containment") >= threshold)
        .select(
            F.when(F.col("n_sh1") < F.col("n_sh2"), F.col("id1"))
            .when(F.col("n_sh2") < F.col("n_sh1"), F.col("id2"))
            .otherwise(F.greatest("id1", "id2"))
            .alias(id_col)
        )
        .distinct()
    )
    return admitted.join(dropped_in, id_col, "left_anti")


def packing_efficiency(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ctx_tokens: int = 256,
    n_shards: int = 8,
) -> DataFrame:
    """Per-shard efficiency readout of :func:`sequence_pack`: how full
    the packed context windows are (``fill_ratio``), how many docs
    straddle a sequence boundary (``n_spanning`` — each straddle is a
    truncation or a cross-doc attention leak depending on the loader),
    and the sequence count. THE number a packing config is judged by:
    low fill wastes compute, high spanning wastes documents.

    One aggregate over the pack bookkeeping (shard-keyed, map-side
    combined); output is ``n_shards`` rows.
    """
    packed = sequence_pack(df, text_col, id_col, ctx_tokens, n_shards)
    agg = packed.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.max("seq_last") + 1).alias("n_seqs"),
        F.sum(
            F.when(F.col("seq_last") > F.col("seq_first"), 1).otherwise(0)
        ).alias("n_spanning"),
    )
    return agg.select(
        "shard",
        "n_docs",
        "n_tokens",
        "n_seqs",
        F.round(
            F.col("n_tokens") / (F.col("n_seqs") * F.lit(ctx_tokens)), 6
        ).alias("fill_ratio"),
        "n_spanning",
    )
