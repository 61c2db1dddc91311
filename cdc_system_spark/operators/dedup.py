"""Deduplication operators for large-scale training-data pipelines.

Five dedup families, all pure DataFrame builtins (no Python UDFs — the
hot path stays in whole-stage codegen):

* exact (hash-groupBy)
* MinHash signatures + LSH banding (shingle → minhash → band → bucket join)
* SimHash (bitwise majority of token hashes)
* n-gram Jaccard verification (exact set overlap on candidate pairs)
* embedding-cosine near-dup lives in operators/similarity.py

Hashes are md5-derived (functions.portable.md5_i64) so every step is
reproducible by an external SQL oracle — and md5 is stable across
cluster restarts, unlike a seeded murmur.

Scale notes: everything here is shuffle-on-key (shingle, band-key) with
map-side partial aggregation; LSH banding turns the O(n²) pair problem
into per-bucket joins. Skewed buckets (a shingle appearing in every
doc) are the classic hazard — ``lsh_candidate_pairs`` caps bucket size
to sidestep degenerate buckets, same as a salting guard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_system_spark.functions.portable import md5_i64, round_portable, shingles, spread

#: universal-hash parameters for MinHash permutations: perm_i(h) =
#: (A[i]·h + B[i]) mod P over h = md5_i64(shingle) mod P. P < 2^31 keeps
#: A·h inside int64 in every engine (DuckDB BIGINT errors on overflow,
#: Spark wraps — staying under the limit sidesteps both).
MINHASH_P = 2_147_483_647
MINHASH_A = [(1_103_515_245 * (i + 1) + 12_345) % MINHASH_P for i in range(16)]
MINHASH_B = [(98_765_431 * (i + 1) + 7) % MINHASH_P for i in range(16)]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One survivor (min id) per exact content hash.

    GROUP BY md5(text) — a single shuffle with partial aggregation; at
    100 TB this is the cheapest dedup and always runs first to shrink
    input for the fuzzier passes.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perms: int = 8,
    with_count: bool = False,
) -> DataFrame:
    """Per-doc MinHash signature: int64 columns ``h0..h{p-1}`` (plus
    ``n_sh``, the distinct-shingle count, when ``with_count`` — the
    containment family's denominator, computed in the SAME projection
    so the shingle array is built once, not re-derived by a second
    text pass).

    Each shingle is md5-hashed ONCE; the p permutations are cheap
    universal-hash rearrangements (A·h+B mod P) folded in a single
    ``aggregate`` pass over the shingle array — zero explode, zero
    shuffle, and the md5 subtree appears exactly once in the plan.
    (p separate ``array_min(transform(...))`` columns would each
    re-inline the hashing lambda: Catalyst's subexpression elimination
    does not reach inside higher-order-function lambdas, making the
    naive form p× slower. Measured: 16 perms over sf0.1 went 50s → 2s.)
    """
    # SQL-text build of the signature fold (the _dot_sqls rationale in
    # operators/similarity.py: a p-perm fold built through the Column
    # API costs ~0.5-1.5 s of py4j round-trips per query; the parsed
    # tree is value-identical — integer md5/mod arithmetic throughout,
    # parity pinned by test_minhash_sql_parity)
    from cdc_system_spark.functions.portable import quote_sql

    c = quote_sql(text_col)
    n = f"greatest(length({c}) - {k - 1}, 1)"
    sh_sql = f"transform(sequence(1, {n}), i -> substr({c}, i, {k}))"
    hs_sql = (
        f"transform({sh_sql}, s -> "
        f"CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)"
        f" % {MINHASH_P}L)"
    )
    zero_sql = "named_struct(" + ",".join(
        f"'h{i}', {MINHASH_P}L" for i in range(num_perms)
    ) + ")"
    merge_sql = "(acc, h) -> named_struct(" + ",".join(
        f"'h{i}', least(acc.h{i},"
        f" (h * {MINHASH_A[i]}L + {MINHASH_B[i]}L) % {MINHASH_P}L)"
        for i in range(num_perms)
    ) + ")"
    cols = [
        F.col(id_col),
        F.expr(f"aggregate({hs_sql}, {zero_sql}, {merge_sql})").alias("_sig"),
    ]
    if with_count:
        cols.append(
            F.expr(f"CAST(size(array_distinct({sh_sql})) AS BIGINT)").alias(
                "n_sh"
            )
        )
    sig = spread(df).select(*cols).localCheckpoint(eager=False)
    out = [
        F.col(id_col),
        *[F.col(f"_sig.h{i}").alias(f"h{i}") for i in range(num_perms)],
    ]
    if with_count:
        out.append(F.col("n_sh"))
    return sig.select(*out)


def _band_key_cols(rows_per_band: int) -> list[str]:
    return ["band_idx"] + [f"k{j}" for j in range((rows_per_band + 1) // 2)]


def _band_table(
    sigs: DataFrame,
    id_col: str,
    num_perms: int,
    rows_per_band: int,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exploded LSH band-key table (id, band_idx, k0, k1, …).

    Band keys are NUMERIC: each pair of consecutive signature columns
    packs losslessly into one int64 (``h·2³¹ + h'`` — exact because
    every minhash is < P < 2³¹, and the product stays under 2⁶²), so a
    ``rows_per_band=4`` band is two int64 key columns. Int64 keys hash,
    compare, and shuffle several× cheaper than the equivalent
    ``concat_ws`` strings (measured ~20% off the end-to-end query) and
    stay collision-free, unlike a mod-P fold.
    """
    n_bands = num_perms // rows_per_band

    def band_keys(b: int) -> list[str]:
        cols = [f"`h{b * rows_per_band + r}`" for r in range(rows_per_band)]
        keys = []
        for j in range(0, rows_per_band, 2):
            k = (
                f"{cols[j]} * 2147483648L + {cols[j + 1]}"
                if j + 1 < rows_per_band
                else cols[j]
            )
            keys.append(f"'k{j // 2}', {k}")
        return keys

    # SQL-text build (see minhash_signatures): value-identical int64
    # packing, one parse instead of ~6 py4j calls per band
    bands = F.expr(
        "array("
        + ",".join(
            "named_struct('band_idx', "
            + ", ".join([str(b)] + band_keys(b))
            + ")"
            for b in range(n_bands)
        )
        + ")"
    )
    key_cols = _band_key_cols(rows_per_band)
    return sigs.select(
        F.col(id_col), *extra_cols, F.explode(bands).alias("b")
    ).select(id_col, *extra_cols, *[f"b.{c}" for c in key_cols])


def lsh_cross_pairs(
    sigs_a: DataFrame,
    sigs_b: DataFrame,
    id_col: str = "doc_id",
    num_perms: int = 16,
    rows_per_band: int = 4,
    max_bucket: int = 1000,
    bands_a: DataFrame | None = None,
    bands_b: DataFrame | None = None,
    dedup_pairs: bool = True,
) -> DataFrame:
    """Cross-frame LSH candidates: (id1 ∈ A, id2 ∈ B) pairs sharing ≥1
    band — near-dup detection of a NEW batch against an EXISTING corpus
    without recomputing (or comparing within) either side. The
    incremental form of :func:`lsh_candidate_pairs`: at 100 TB the
    corpus band table is a maintained artifact (computed once, stored
    bucketed on the band key), and each sync interval only builds the
    batch's bands and probes — batch×corpus candidates only, never
    corpus×corpus.

    ``max_bucket`` caps the CORPUS side per band key (degenerate
    boilerplate buckets would otherwise match every batch doc against
    an unbounded posting list). Output: distinct (id1, id2), id1 from
    ``sigs_a`` (the batch), id2 from ``sigs_b`` (the corpus).

    ``bands_a`` / ``bands_b`` (optional) supply PREBUILT band tables
    (the :func:`_band_table` shape) so a caller running several LSH
    passes over the same signatures — e.g. ``neardup_ingest``'s corpus
    probe + within-batch pass — explodes each side once instead of per
    pass; this is also exactly how a maintained corpus band-table
    artifact plugs in at scale.
    """
    key_cols = _band_key_cols(rows_per_band)
    a = (
        bands_a
        if bands_a is not None
        else _band_table(sigs_a, id_col, num_perms, rows_per_band)
    ).select(*key_cols, F.col(id_col).alias("id1"))
    b = (
        bands_b
        if bands_b is not None
        else _band_table(sigs_b, id_col, num_perms, rows_per_band)
    ).localCheckpoint(eager=False)
    bucket_sizes = b.groupBy(*key_cols).agg(F.count("*").alias("_n"))
    bounded = b.join(
        bucket_sizes.filter(F.col("_n") <= max_bucket).drop("_n"),
        on=key_cols,
        how="left_semi",
    ).select(*key_cols, F.col(id_col).alias("id2"))
    raw = a.join(bounded, on=key_cols).select("id1", "id2")
    # dedup_pairs=False: defer the distinct to a consumer whose
    # selective filter + own dedup make it redundant (see
    # lsh_candidate_pairs)
    return raw.distinct() if dedup_pairs else raw


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_perms: int = 16,
    rows_per_band: int = 4,
    max_bucket: int = 1000,
    bands: DataFrame | None = None,
    dedup_pairs: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing ≥1 LSH band.
    ``bands`` (optional) supplies a prebuilt band table (see
    :func:`lsh_cross_pairs`) so the explode runs once across passes.

    ``dedup_pairs=False`` skips the final ``distinct()`` — the RAW
    band collisions, one row per (pair, agreeing band). For a consumer
    that applies a SELECTIVE per-pair filter and then dedups survivors
    itself (the containment-threshold path), deduplicating first means
    a full exchange of the multi-million-row candidate set just to
    drop rows a map-side filter would have killed; deferring it keeps
    the big set map-side end to end (guide §2: shuffle fewer bytes).

    Band keys are NUMERIC: each pair of consecutive signature columns
    packs losslessly into one int64 (``h·2³¹ + h'`` — exact because
    every minhash is < P < 2³¹, and the product stays under 2⁶²), so a
    ``rows_per_band=4`` band is two int64 key columns. Int64 keys hash,
    compare, and shuffle several× cheaper than the equivalent
    ``concat_ws`` strings (measured ~20%% off the end-to-end query) and
    stay collision-free, unlike a mod-P fold. Explode to
    (band_idx, k0, k1), self-join per bucket, ``id1 < id2``.

    ``max_bucket`` drops degenerate buckets (boilerplate shingles
    shared by everything) — at scale those would otherwise produce
    quadratic pair blowup; real pipelines handle them with
    stopword-shingle filtering, same effect.
    """
    key_cols = _band_key_cols(rows_per_band)
    exploded = (
        bands
        if bands is not None
        else (
            _band_table(sigs, id_col, num_perms, rows_per_band)
            # signature computation is the expensive subtree and feeds
            # three plan branches (bucket sizes, both join sides) —
            # truncate the lineage so it runs once, not per branch
            .localCheckpoint(eager=False)
        )
    )
    # cap degenerate buckets
    bucket_sizes = exploded.groupBy(*key_cols).agg(F.count("*").alias("_n"))
    bounded = exploded.join(
        bucket_sizes.filter(F.col("_n") <= max_bucket).drop("_n"),
        on=key_cols,
        how="left_semi",
    )
    a = bounded.select(*key_cols, F.col(id_col).alias("id1"))
    b = bounded.select(*key_cols, F.col(id_col).alias("id2"))
    raw = (
        a.join(b, on=key_cols)
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
    )
    return raw.distinct() if dedup_pairs else raw


def minhash_jaccard_estimate(
    sigs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    num_perms: int = 16,
    sigs2: DataFrame | None = None,
) -> DataFrame:
    """Per-pair Jaccard estimate from signature agreement: the fraction
    of MinHash permutations on which the two docs collide (an unbiased
    estimator of shingle-set Jaccard). The standard cheap middle step
    between LSH candidate generation and exact rescoring — at 100 TB
    you threshold on this before paying for any exact set overlap.

    Shape: the pair table (bounded by LSH candidate volume ≪ corpus)
    joins the signature table twice with the big side scanned in place.
    No forced broadcast hint: candidate volume is data-dependent (a
    degenerate corpus can blow past the broadcast threshold), so the
    join strategy is left to the optimizer — AQE still picks a runtime
    broadcast whenever the pair side is actually small.

    ``sigs2`` (optional) supplies the ``id2`` side from a DIFFERENT
    signature frame — the cross-frame form used by batch-vs-corpus
    ingest, where the two sides may legitimately share id values (a CDC
    UPDATE re-uses its doc_id) and a unioned frame would cross-match.
    """
    ha = sigs.select(
        F.col(id_col).alias("id1"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(num_perms)],
    )
    hb = (sigs2 if sigs2 is not None else sigs).select(
        F.col(id_col).alias("id2"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(num_perms)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(num_perms)
    )
    cand = ha.join(pairs, "id1")  # stays pair-sized
    return hb.join(cand, "id2").select(
        "id1",
        "id2",
        F.round(matches / F.lit(float(num_perms)), 6).alias("est_jaccard"),
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """Per-doc SimHash: bit b is the majority vote of token-hash bit b.

    Token hash = md5-derived int64; the per-bit ±1 sums are one grouped
    aggregation over exploded tokens (single shuffle on doc id).
    Hamming-close simhashes ⇒ similar token multisets.
    """
    from cdc_system_spark.functions.portable import md5_i64

    # no spread() here: the explode multiplies rows ~50× and the groupBy
    # shuffles to cluster parallelism anyway; pre-shuffling the small doc
    # set only adds a stage (measured slower at sf0.1).
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).withColumn("th", md5_i64(F.col("tok")))
    bit_sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    fold = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        fold = term if fold is None else fold + term
    return bit_sums.select(F.col(id_col), fold.cast("long").alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    n_bands: int = 4,
    max_hamming: int = 2,
) -> DataFrame:
    """Near-dup candidate pairs by SimHash hamming distance — the
    pigeonhole-banded companion to MinHash-LSH (Manku et al., WWW'07
    use the same split-the-fingerprint trick): two fingerprints within
    ``max_hamming`` bits must agree exactly on at least one of
    ``n_bands`` disjoint bit bands when ``max_hamming < n_bands``, so
    banding finds every such pair without an all-pairs scan.

    Shape: one grouped pass for fingerprints (shuffle on doc id),
    explode to (band_idx, band_value) — int keys — bucket self-join,
    then an exact ``bit_count(xor)`` rescore of candidates only. Same
    quadratic-blowup story as MinHash-LSH: a degenerate band value is
    bounded by the band width (2^band_bits buckets spread uniformly for
    hash-like fingerprints).
    """
    sim = simhash(df, text_col, id_col, bits=bits)
    return hamming_band_pairs(
        sim, "simhash", id_col, bits=bits, n_bands=n_bands, max_hamming=max_hamming
    )


def hamming_band_pairs(
    sig: DataFrame,
    sig_col: str,
    id_col: str = "doc_id",
    bits: int = 32,
    n_bands: int = 4,
    max_hamming: int = 2,
) -> DataFrame:
    """Pigeonhole-banded Hamming near-dup pairs over ANY integer
    fingerprint column (SimHash, image dHash, audio fingerprints): two
    fingerprints within ``max_hamming`` bits must agree exactly on at
    least one of ``n_bands`` disjoint bit bands when ``max_hamming <
    n_bands`` — the Manku WWW'07 split applied to whatever produced the
    bits. Exact ``bit_count(xor)`` rescore of candidates only.
    """
    if bits % n_bands != 0:
        raise ValueError(
            f"bits ({bits}) must divide evenly into n_bands ({n_bands}) "
            "disjoint bit bands"
        )
    if not 0 <= max_hamming < n_bands:
        raise ValueError(
            f"max_hamming ({max_hamming}) must satisfy 0 <= max_hamming < "
            f"n_bands ({n_bands}); the pigeonhole completeness guarantee "
            "(every pair within max_hamming agrees on >= 1 band) only "
            "holds when the bands outnumber the tolerated bit flips"
        )
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    sim = sig.localCheckpoint(eager=False)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftright(sig_col, band_bits * b)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = sim.select(
        F.col(id_col), F.col(sig_col).alias("_sig"), F.explode(bands).alias("b")
    ).select(id_col, "_sig", "b.band_idx", "b.val")
    a = exploded.select(
        "band_idx", "val", F.col(id_col).alias("id1"), F.col("_sig").alias("s1")
    )
    b = exploded.select(
        "band_idx", "val", F.col(id_col).alias("id2"), F.col("_sig").alias("s2")
    )
    cand = (
        a.join(b, on=["band_idx", "val"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "s1", "s2")
    )
    ham = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
    # distinct DEFERRED behind the selective Hamming filter (the r12
    # containment-pairs lesson, guide §2.3): the raw multi-band
    # collisions stay map-side — their only exchange is the dedup of
    # the few survivors, not of every (pair, agreeing band) row.
    # Identical pair set: the fingerprints (and hence ``hamming``) are
    # pure per-id values, so every duplicate of a pair carries the same
    # hamming and filter-then-distinct ≡ distinct-then-filter.
    return (
        cand.filter(ham <= max_hamming)
        .select("id1", "id2", ham.cast("int").alias("hamming"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact token-n-gram Jaccard for pairs above ``threshold``.

    Distinct n-grams per doc → self-join on gram (the candidate
    generator) → shared counts vs set sizes. O(pairs-sharing-a-gram),
    not O(n²); in a production pipeline this runs *after* LSH banding as
    the verification step — composable here the same way.

    Gram construction goes through :func:`token_ngrams`, whose
    ``n_tok >= n`` guard matters under Spark 4's default ANSI mode: an
    unguarded ``element_at`` past the array end (any doc shorter than
    ``n`` tokens) aborts the whole job with INVALID_ARRAY_INDEX — and
    short docs are routine in real corpora. Short docs simply produce
    no grams, matching the SQL oracle's ``range`` semantics.
    """
    # per-doc gram dedup rides inside the row (array_distinct before the
    # explode): no (doc, gram) distinct shuffle — cross-doc repeats are
    # separate rows by construction
    grams = spread(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(token_ngrams(F.col(text_col), n))).alias("gram"),
    ).localCheckpoint(eager=False)  # feeds sizes + both join sides
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = grams.select(F.col(id_col).alias("id1"), "gram")
    b = grams.select(F.col(id_col).alias("id2"), "gram")
    shared = (
        a.join(b, on="gram")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("shared"))
    )
    s1 = sizes.select(F.col(id_col).alias("id1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col(id_col).alias("id2"), F.col("sz").alias("sz2"))
    return (
        shared.join(s1, "id1")
        .join(s2, "id2")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared") / (F.col("sz1") + F.col("sz2") - F.col("shared")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def duplicate_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components over a near-dup pair graph → cluster ids.

    The last step of every dedup pipeline: candidate pairs (from LSH /
    Jaccard / SRP) form an undirected graph; each component is one
    duplicate group, labeled by its minimum ``doc_id`` (the canonical
    survivor). Docs in no pair become singleton clusters of themselves.

    Min-label propagation runs ONLY over nodes that touch a candidate
    pair — the pair graph is bounded by LSH candidate volume, orders of
    magnitude smaller than the corpus, so each round shuffles the tiny
    node set, never the 100 TB doc table (propagating labels for every
    document, the naive formulation, is a corpus-wide shuffle *per
    iteration*). Docs in no pair get their singleton label via one final
    broadcast-able left join. Each round every node takes the min label
    in its neighborhood; converges in O(component diameter) rounds — for
    dup graphs that is small (near-cliques). ``localCheckpoint``
    truncates lineage per round so plans stay flat. At extreme scale the
    same loop upgrades to the large-star/small-star optimization
    (Kiveris et al., "Connected Components in MapReduce", SOCC'14)
    without changing callers.
    """
    edges = pairs.select(F.col("id1").alias("a"), F.col("id2").alias("b"))
    edges = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=False)
    # both directions are present, so "a" alone covers every graph node.
    # Seed each node with min(self, min neighbor) — one grouped pass
    # that IS the first propagation round, so near-clique dup graphs
    # (the common case) converge at the first convergence check.
    labels = (
        edges.groupBy(F.col("a").alias("node"))
        .agg(F.least(F.min("b"), F.col("a")).alias("lbl"))
        .localCheckpoint(eager=False)
    )
    def _sig_agg(frame: DataFrame, tag: int) -> DataFrame:
        return frame.agg(
            F.lit(tag).alias("_r"),
            F.count("*").alias("n"),
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s"),
        )

    def _collect_sigs(*frames: DataFrame) -> list[tuple]:
        """(count, label-sum) signature of each frame, ONE driver
        action for all of them: the serial cost of a propagation round
        is the blocking collect, not the tiny agg, so fusing K rounds'
        signatures (and the lazy-checkpoint materializations they
        trigger) into one action halves the per-round driver barriers
        (guide §2.6 — the r13 optimization; r12 had already fused each
        round's two jobs into one)."""
        agg = _sig_agg(frames[0], 0)
        for i, f in enumerate(frames[1:], start=1):
            agg = agg.unionAll(_sig_agg(f, i))
        rows = {r["_r"]: (r["n"], r["s"]) for r in agg.collect()}
        return [rows[i] for i in range(len(frames))]

    def _round(lbls: DataFrame) -> DataFrame:
        neighbor = (
            edges.join(lbls, edges.a == lbls.node)
            .select(F.col("b").alias("node"), F.col("lbl"))
        )
        return (
            lbls.union(neighbor).groupBy("node").agg(F.min("lbl").alias("lbl"))
        ).localCheckpoint(eager=False)

    # Min-propagation is monotone: a node's label never increases, so
    # the label multiset changed iff its sum decreased — (count, sum)
    # equality between consecutive rounds IS convergence, and one extra
    # round past convergence is a no-op (per-node monotone + equal sum
    # ⇒ per-node equal), so rounds can run in PAIRS with a single
    # fused signature action covering both (plus, on the first pass,
    # the seed's own signature — three aggs, one driver barrier).
    prev_sig = None
    it = 0
    while it < max_iters:
        if max_iters - it == 1:
            # odd tail: never exceed max_iters rounds (capped-graph
            # outputs must stay bit-identical to the unpaired loop)
            l1 = _round(labels)
            if prev_sig is None:
                prev_sig, s1 = _collect_sigs(labels, l1)
            else:
                (s1,) = _collect_sigs(l1)
            labels = l1
            it += 1
            if s1 == prev_sig:
                break
            prev_sig = s1
            continue
        l1 = _round(labels)
        l2 = _round(l1)
        if prev_sig is None:
            s0, s1, s2 = _collect_sigs(labels, l1, l2)
            prev_sig = s0
        else:
            s1, s2 = _collect_sigs(l1, l2)
        it += 2
        labels = l2
        if s1 == prev_sig or s2 == s1:
            # converged at l1 (then l2 == l1 by idempotence) or at l2
            break
        prev_sig = s2
    node_labels = labels.select(
        F.col("node").alias(id_col), F.col("lbl").alias("_lbl")
    )
    return docs.select(id_col).join(node_labels, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("_lbl"), F.col(id_col)).alias("cluster_id"),
    )


def star_contraction_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the scale upgrade over min-label propagation:
    converges in O(log² n) rounds on ANY graph shape (propagation needs
    O(diameter) rounds, which a long chain of near-dups can stretch),
    and every round is two grouped passes over the edge set.

    * large-star: every node links its larger neighbors to the minimum
      of its neighborhood — ``(v, m)`` for v ∈ Γ(u), v > u, with
      m = min(Γ(u) ∪ {u})
    * small-star: every node links its smaller-or-equal neighbors and
      itself to that minimum

    Both are windowed min + filter — no neighbor lists are ever
    collected, so hub nodes (a passage shared by millions of docs)
    cost a shuffle, not a single-task array. Same output contract as
    :func:`duplicate_clusters`: every doc labeled with its component's
    min id, singletons labeling themselves.
    """
    from pyspark.sql import Window

    def large_star(ed: DataFrame) -> DataFrame:
        # neighborhoods are over the SYMMETRIC relation — re-symmetrize
        # every round (the stored set is directed after small-star).
        # No distinct() anywhere in this pass: the window MIN is
        # duplicate-insensitive and small_star's round-final distinct
        # dedups the output set — each intermediate distinct was a full
        # (u,v) exchange per round buying nothing (r12 optimization:
        # 6 → 3 shuffles per contraction round, same edge sets).
        sym = ed.union(
            ed.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
        return (
            sym.withColumn("m", m)
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )

    def small_star(ed: DataFrame) -> DataFrame:
        # orient max→min, then link every neighbor (all ≤ u) and u
        # itself to the neighborhood minimum; duplicates ride through
        # the duplicate-insensitive window MIN and die at the round's
        # one final distinct below
        oriented = ed.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        m = F.min("v").over(Window.partitionBy("u"))
        with_m = oriented.withColumn("m", m)
        nbrs = with_m.filter(F.col("v") != F.col("m")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        self_link = with_m.select("u", F.col("m").alias("v"))
        return nbrs.union(self_link).filter(F.col("u") != F.col("v")).distinct()

    edges = (
        pairs.select(
            F.greatest("id1", "id2").alias("u"), F.least("id1", "id2").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _sig_agg(frame: DataFrame, tag: int) -> DataFrame:
        # order-insensitive edge-set signature: count + sum of a
        # portable pair hash. Decimal accumulator: a long sum of 60-bit
        # hashes overflows (ANSI aborts); decimal(38,0) is exact at any
        # edge count.
        return frame.select(
            F.lit(tag).alias("_r"),
            F.count("*").alias("n"),
            F.sum(
                md5_i64(F.concat_ws("|", "u", "v")).cast("decimal(38,0)")
            ).alias("h"),
        )

    def _collect_sigs(*frames: DataFrame) -> list[tuple]:
        agg = _sig_agg(frames[0], 0)
        for i, f in enumerate(frames[1:], start=1):
            agg = agg.unionAll(_sig_agg(f, i))
        rows = {r["_r"]: (r["n"], r["h"]) for r in agg.collect()}
        return [rows[i] for i in range(len(frames))]

    def _round(ed: DataFrame) -> DataFrame:
        # LAZY checkpoint: the fused convergence-signature action below
        # is the first (and only driver-blocking) action over it
        return small_star(large_star(ed)).localCheckpoint(eager=False)

    # Contraction rounds run in PAIRS with one fused signature action
    # per pair (guide §2.6, the r13 optimization — r12 had already cut
    # each round to a single job): convergence means the edge set is a
    # fixed point of the round function, so detecting it one round late
    # computes one extra round over the already-contracted (smallest)
    # edge set and returns the identical fixed point, while every pair
    # saves a blocking driver round-trip.
    prev_sig = None
    it = 0
    while it < max_iters:
        if max_iters - it == 1:
            # odd tail: never exceed max_iters rounds (capped-graph
            # outputs must stay identical to the unpaired loop)
            edges = _round(edges)
            (cur,) = _collect_sigs(edges)
            it += 1
            if cur == prev_sig:
                break
            prev_sig = cur
            continue
        e1 = _round(edges)
        e2 = _round(e1)
        s1, s2 = _collect_sigs(e1, e2)
        it += 2
        edges = e2
        if s1 == prev_sig or s2 == s1:
            # converged at e1 (then e2 == e1: a fixed point maps to
            # itself) or at e2
            break
        prev_sig = s2
    # after convergence every edge is (node, component_min); group-min
    # rather than assuming perfect star shape at the iteration cap
    roots = edges.groupBy("u").agg(F.min("v").alias("_lbl")).select(
        F.col("u").alias(id_col), F.col("_lbl")
    )
    return docs.select(id_col).join(roots, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("_lbl"), F.col(id_col)).alias("cluster_id"),
    )


def token_ngrams(col: Column | str, n: int = 5) -> Column:
    """Array of token n-grams (space-joined) of a text column.

    Documents with fewer than ``n`` tokens yield an empty array (no
    partial grams — a shorter document cannot contain a full n-gram).
    """
    from pyspark.sql import functions as F  # local: keep module top slim

    c = F.col(col) if isinstance(col, str) else col
    w = F.split(c, " ")
    n_tok = F.size(w)
    return F.when(
        n_tok >= n,
        F.transform(
            F.sequence(F.lit(1), n_tok - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: drop corpus documents sharing any token
    ``n``-gram with a benchmark/eval set — the standard train/test-
    overlap scrub (GPT-3 appendix C / PaLM §B use 8-13-gram variants).

    Shape for 100 TB corpus vs KB-MB benchmark: the benchmark's distinct
    gram set is tiny → broadcast; the corpus explodes to (doc, gram) and
    probes it map-side (broadcast left-semi), so the only wide exchange
    is the distinct on contaminated ids — bounded by the hit count, not
    the corpus. The corpus-side anti join then removes hit docs; the
    contaminated-id set is small by construction, so AQE broadcasts it.
    """
    bench_grams = (
        benchmark.select(F.explode(token_ngrams(text_col, n)).alias("gram"))
        .distinct()
    )
    corpus_grams = spread(corpus).select(
        F.col(id_col), F.explode(token_ngrams(text_col, n)).alias("gram")
    )
    contaminated = (
        corpus_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .select(id_col)
        .distinct()
    )
    return corpus.join(contaminated, id_col, "left_anti")


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Per-document benchmark-overlap diagnostic — the report a curator
    reads before choosing the :func:`decontaminate` policy (drop-all is
    right for exact eval leakage; a ratio threshold is right when
    benchmarks quote common boilerplate). One row per corpus doc that
    shares ≥1 token ``n``-gram with the benchmark: how many of its
    distinct grams are contaminated and the contaminated fraction.

    Same 100 TB shape as :func:`decontaminate`: benchmark grams are
    tiny → broadcast inner join probes them map-side; grams are
    deduped *inside the row* (``array_distinct`` before explode) so the
    per-doc aggregation shuffles only hit grams, never the corpus.
    """
    grams = F.array_distinct(token_ngrams(text_col, n))
    per_doc = spread(corpus).select(
        F.col(id_col),
        F.size(grams).alias("n_grams"),
        F.explode(grams).alias("gram"),
    )
    bench_grams = (
        benchmark.select(F.explode(token_ngrams(text_col, n)).alias("gram"))
        .distinct()
    )
    return (
        per_doc.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col, "n_grams")
        .agg(F.count("*").alias("n_contaminated"))
        .select(
            id_col,
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_contaminated").cast("long").alias("n_contaminated"),
            F.round(F.col("n_contaminated") / F.col("n_grams"), 6).alias(
                "contaminated_ratio"
            ),
        )
    )


def quality_survivors(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """Quality-aware duplicate-survivor selection: keep each cluster's
    HIGHEST-scoring document (rounded-score desc, id asc tiebreak) —
    what production dedup does instead of the min-id convention
    (near-duplicates differ in truncation/boilerplate; keeping the
    best-quality copy is free corpus quality). ``clusters`` is the
    (id, cluster_id) labeling from :func:`duplicate_clusters` /
    :func:`star_contraction_clusters`; ``scores`` maps id → score.

    One window shuffle on the cluster key; singleton clusters pass
    through (every doc appears in ``clusters``, labeled by itself when
    unpaired).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        clusters.join(scores.select(id_col, score_col), id_col)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, "cluster_id", score_col)
    )


def lsh_recall_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    k: int = 7,
    num_perms: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH-configuration recall diagnostic: what fraction of the TRUE
    near-duplicate pairs (exact token-``n``-gram Jaccard ≥ ``threshold``,
    via :func:`ngram_jaccard_pairs`' inverted-index join — no all-pairs)
    does the MinHash-LSH banding (``num_perms``/``rows_per_band``)
    actually surface? One row: n_true, n_caught, recall (null when no
    true pairs exist). This is how you tune band geometry before
    trusting a dedup run.

    100 TB shape: the exact-truth pass is the expensive half (its
    gram join grows with shared-gram volume) — run the report on a
    hash-sampled subset (``docs.filter(md5-bucket)``) at full scale;
    recall is a ratio, so a uniform sample estimates it unbiased.
    """
    truth = ngram_jaccard_pairs(docs, text_col, id_col, n, threshold).select(
        "id1", "id2"
    )
    sigs = minhash_signatures(
        docs, text_col, id_col, k=k, num_perms=num_perms
    )
    cand = lsh_candidate_pairs(
        sigs, id_col, num_perms=num_perms, rows_per_band=rows_per_band
    ).withColumn("_hit", F.lit(1))
    return (
        truth.join(cand, ["id1", "id2"], "left")
        .agg(
            F.count("*").alias("n_true"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias("n_caught"),
        )
        .select(
            "n_true",
            "n_caught",
            F.round(
                F.col("n_caught") / F.expr("nullif(n_true, 0)"), 6
            ).alias("recall"),
        )
    )


def cross_source_dup_matrix(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source duplication matrix: for each unordered source pair,
    how many near-duplicate doc pairs straddle it — the governance
    diagnostic that surfaces mirrored/scraped-twice sources (a large
    off-diagonal cell means two "different" sources are the same crawl)
    and inflated-diagonal sources (internal boilerplate/templating).

    ``pairs`` is any candidate pair table (``id1``/``id2``, e.g. from
    :func:`lsh_candidate_pairs` or :func:`simhash_neardup_pairs`); the
    source pair is canonicalized least/greatest so the matrix is
    unordered.

    Scale shape: two key joins against the narrow (id, source)
    projection — the corpus side prunes to two columns at the scan, and
    the joins carry only the pair table (LSH-capped, orders of
    magnitude smaller than the corpus). No broadcast hint on the pair
    side: candidate volume is data-dependent (see
    minhash_jaccard_estimate's gating) — AQE picks when it fits.
    """
    src = docs.select(F.col(id_col), F.col(source_col))
    s1 = src.select(
        F.col(id_col).alias("id1"), F.col(source_col).alias("_s1")
    )
    s2 = src.select(
        F.col(id_col).alias("id2"), F.col(source_col).alias("_s2")
    )
    return (
        pairs.select("id1", "id2")
        .join(s1, "id1")
        .join(s2, "id2")
        .groupBy(
            F.least("_s1", "_s2").alias("src_a"),
            F.greatest("_s1", "_s2").alias("src_b"),
        )
        .agg(F.count("*").alias("n_pairs"))
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 7,
    num_perms: int = 16,
    rows_per_band: int = 1,
    signatures: DataFrame | None = None,
    min_containment: float | None = None,
) -> DataFrame:
    """Asymmetric near-dup detection: per LSH candidate pair, the
    estimated CONTAINMENT of the smaller shingle set in the larger —
    ``|A∩B| / min(|A|,|B|)`` — alongside the symmetric Jaccard
    estimate. Jaccard misses exactly the pairs curation most wants
    caught at scale: a document quoted inside a much longer one has
    tiny Jaccard (union is huge) but containment ≈ 1 (Broder's
    resemblance-vs-containment distinction, SEQUENCES '97).

    Engine-exact by integer construction: the signature match count
    ``m`` (0..num_perms) and the per-doc distinct-shingle counts are
    integers, so both outputs are single double divisions of identical
    integers — ``est_jaccard = m/num_perms`` and, substituting the
    Jaccard-to-intersection identity ``|A∩B| = J(|A|+|B|)/(1+J)``
    with ``J = m/P``: ``est_containment =
    m·(n1+n2) / ((P+m)·min(n1,n2))``. No intermediate float ever
    rounds.

    ``rows_per_band`` defaults to 1 (16 single-permutation bands),
    NOT the symmetric-dedup default of 4: a contained pair's Jaccard
    is small by construction (the union is the big document), so
    multi-row bands — collision probability J^rows — would filter out
    exactly the pairs this operator exists to find. Single-row bands
    recall P(candidate) = 1-(1-J)^16 ≈ 98% at J = 0.25. The trade is
    larger buckets; ``lsh_candidate_pairs``' ``max_bucket`` cap is the
    guard, as everywhere.

    Scale shape: shingle counts are a zero-shuffle projection riding
    the scan; candidates come from the bucketed LSH banding (never
    all-pairs); the estimate joins move pair-sized frames against
    in-place signature/count tables, same contract as
    :func:`minhash_jaccard_estimate`.

    ``signatures`` (optional): a precomputed ``(id_col, h0..h{p-1},
    n_sh)`` frame — the
    :func:`~cdc_system_spark.operators.lsh_index.lsh_index_signature_tables`
    shape — skips BOTH text passes (the MinHash sign and the distinct-
    shingle count), so the maintained index pays the per-doc hash work
    once instead of every containment call. Output is row-identical to
    the inline recompute when the frame is faithful to (k, num_perms);
    ``docs`` text is never read in that mode.
    """
    if signatures is None:
        signatures = minhash_signatures(
            docs, text_col, id_col, k=k, num_perms=num_perms, with_count=True
        )
    sigs = signatures.select(
        F.col(id_col), *[F.col(f"h{i}") for i in range(num_perms)]
    )
    counts = signatures.select(F.col(id_col), F.col("n_sh"))
    # with a threshold, pairs stay RAW (one row per agreeing band) and
    # the distinct moves BEHIND the selective filter: the est joins are
    # broadcast-able signature lookups, so the multi-million-row
    # candidate set never crosses an exchange before 99%+ of it dies
    # map-side (measured at sf0.1: the 5.35M-pair distinct was the
    # query's largest shuffle; survivors are ~41k rows). est is a pure
    # function of the pair, so the deferred distinct yields the
    # identical pair set.
    pairs = lsh_candidate_pairs(
        sigs,
        id_col,
        num_perms=num_perms,
        rows_per_band=rows_per_band,
        dedup_pairs=min_containment is None,
    )
    ha = sigs.select(
        F.col(id_col).alias("id1"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(num_perms)],
    )
    hb = sigs.select(
        F.col(id_col).alias("id2"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(num_perms)],
    )
    m = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(num_perms)
    )
    scored = (
        hb.join(ha.join(pairs, "id1"), "id2")
        .select("id1", "id2", m.cast("long").alias("_m"))
        .join(counts.select(F.col(id_col).alias("id1"), F.col("n_sh").alias("n_sh1")), "id1")
        .join(counts.select(F.col(id_col).alias("id2"), F.col("n_sh").alias("n_sh2")), "id2")
    )
    p = F.lit(num_perms)
    out = scored.select(
        "id1",
        "id2",
        "n_sh1",
        "n_sh2",
        F.round(F.col("_m") / p.cast("double"), 6).alias("est_jaccard"),
        # round_portable, not F.round: unlike est_jaccard (m/16, exact
        # in <= 4 decimals), this rational can land exactly on a 1e-6
        # half-way boundary where engine ROUND rules diverge (observed
        # at sf0.1: 7 of 5.35M pairs)
        round_portable(
            (F.col("_m") * (F.col("n_sh1") + F.col("n_sh2")))
            / ((p + F.col("_m")) * F.least("n_sh1", "n_sh2")).cast("double"),
            6,
        ).alias("est_containment"),
    )
    if min_containment is not None:
        # the deferred distinct: every duplicate of a pair carries the
        # same est values, so a full-row distinct over the filtered
        # survivors equals filter-after-distinct row for row
        out = out.filter(
            F.col("est_containment") >= min_containment
        ).distinct()
    return out


def drop_contained(
    docs: DataFrame,
    threshold: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 7,
    num_perms: int = 16,
    rows_per_band: int = 1,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """The curation action on :func:`containment_pairs`: remove each
    document whose shingle set is (estimated) contained in a larger
    document at ≥ ``threshold`` — keeps the superset copy, which is
    what subset dedup wants (the quote's context survives; pure exact
    dup ties, equal sizes, keep the smaller id). Returns surviving
    rows with the input schema unchanged.

    One pair-sized reduction to the drop-id set, then a corpus anti
    join — the same shape every survivor operator here uses.
    ``signatures`` forwards to :func:`containment_pairs` (maintained-
    index reuse — no per-call text pass).
    """
    # threshold pushed inside the generator: candidate dedup runs over
    # the filtered survivors, not the raw candidate set (identical
    # pair set — see containment_pairs.min_containment)
    hits = containment_pairs(
        docs, text_col, id_col, k, num_perms, rows_per_band,
        signatures=signatures, min_containment=threshold,
    )
    drop = hits.select(
        F.when(F.col("n_sh1") < F.col("n_sh2"), F.col("id1"))
        .when(F.col("n_sh2") < F.col("n_sh1"), F.col("id2"))
        .otherwise(F.greatest("id1", "id2"))
        .alias(id_col)
    ).distinct()
    return docs.join(drop, id_col, "left_anti")


def cluster_canonicals(
    members: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Best-member canonical selection per duplicate cluster: one row
    ``(cluster_id, canonical_id, canonical_score, n_members)`` — the
    member with the HIGHEST ``score_col`` wins, ties to the smaller id.

    :func:`duplicate_clusters` labels each component by its minimum id,
    which answers "which group?" but not "which copy to KEEP": real
    curation keeps the best copy (longest text, highest quality score,
    newest crawl), not the one that happened to get the smallest id.
    Input is the cluster labeling joined to a per-doc score — e.g.
    ``duplicate_clusters(...)`` ⋈ ``text_quality(...)``.

    One window rank + one group count over the labeling (cluster-keyed
    shuffles of an id/score projection, nothing text-sized); singleton
    clusters pass through as their own canonicals.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(cluster_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        members.select(cluster_col, id_col, score_col)
        .withColumn("_rk", F.row_number().over(w))
        .withColumn(
            "n_members", F.count(F.lit(1)).over(Window.partitionBy(cluster_col))
        )
        .filter(F.col("_rk") == 1)
        .select(
            F.col(cluster_col),
            F.col(id_col).alias("canonical_id"),
            F.col(score_col).alias("canonical_score"),
            F.col("n_members"),
        )
    )
