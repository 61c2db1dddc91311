"""Deterministic sampling operators for corpus curation.

The reference's only sampling is demo-data ``random.randint``
(example_usage.py:49,69 — SURVEY §2.7 SF6). A training-data pipeline
needs *reproducible* sampling: same corpus + same config ⇒ same sample,
on any cluster layout, across reruns. Everything here keys off
``md5(id)`` (functions.portable.md5_i64) — engine-portable, seedable via
a salt string, and uniform across buckets, unlike ``rand()`` which
changes per task retry and per partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_system_spark.functions.portable import md5_i64

#: bucket granularity: per-mille rates
BUCKETS = 1000


def hash_bucket(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, BUCKETS) from md5(salt || id).

    md5_i64 spans 60 bits, so ``% 1000`` bias is ~2^-50 — negligible.
    Changing ``salt`` draws an independent sample (the "seed").
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_i64(F.concat(F.lit(salt), c.cast("string"))) % BUCKETS


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.1,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash
    bucket falls below its stratum's rate — e.g. downsample boilerplate
    languages/sources while keeping all of a rare one (the standard
    mixture-reweighting step before training).

    Pure map-side filter — no shuffle, no state; the filter pushes into
    the scan when ``strata_col`` is a partition column. Exact rates per
    stratum (within hash granularity), independent of row order and
    cluster layout, unlike ``df.sampleBy`` which is seed-dependent on
    partitioning.
    """
    # round, not truncate: int(0.29 * 1000) is 289 (binary float
    # 289.999...), int(round(...)) is the intended 290
    #
    # (rate-based sampling; for exact-count selection see top_k_per_stratum)
    rate_expr: Column = F.lit(int(round(default_rate * BUCKETS)))
    for value, rate in sorted(rates.items()):
        rate_expr = F.when(
            F.col(strata_col) == value, F.lit(int(round(rate * BUCKETS)))
        ).otherwise(rate_expr)
    return (
        df.withColumn("_bucket", hash_bucket(id_col, salt))
        .filter(F.col("_bucket") < rate_expr)
        .drop("_bucket")  # internal helper — callers see the input schema
    )


def top_k_per_stratum(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """EXACTLY ``k`` rows per stratum, chosen deterministically: rank by
    md5(salt||id) within each stratum and keep the top ``k`` — the
    standard way to carve a fixed-size eval/holdout set per language or
    source (rate-based sampling can't hit an exact count).

    One shuffle on the stratum key; Spark's WindowGroupLimit pushes the
    ``rank <= k`` bound below the sort so each partition keeps only k
    candidates before the exchange — the same physical shape as any
    top-k, safe at any stratum size. Ties are impossible (md5 of
    distinct ids), so the selection is unique and layout-independent.
    """
    from pyspark.sql import Window

    h = md5_i64(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def split_assign(
    df: DataFrame,
    splits: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test split assignment: each row gets a
    ``split`` label from contiguous hash-bucket ranges (e.g. train
    [0,980), val [980,990), test [990,1000)) — the standard holdout
    carving for training data. Keyed on md5(salt||id), so membership is
    stable across reruns, cluster layouts, and corpus growth (a doc's
    split never changes when other docs are added — the property that
    keeps eval sets uncontaminated as the corpus evolves). Map-only,
    zero shuffle; ``salt`` draws an independent partition.

    ``splits`` maps label → fraction (must sum to ≤ 1; any remainder
    falls into the LAST label, so the default 0.98/0.01/0.01 is exact).
    Iteration order of the dict defines the bucket ranges.
    """
    splits = splits or {"train": 0.98, "val": 0.01, "test": 0.01}
    if not splits:
        raise ValueError("splits must contain at least one label")
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    expr: Column | None = None
    edge = 0
    labels = list(splits)
    for label, frac in splits.items():
        edge += int(round(frac * BUCKETS))
        cond = F.col("_bucket") < F.lit(min(edge, BUCKETS))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(
            cond, F.lit(label)
        )
    assert expr is not None
    expr = expr.otherwise(F.lit(labels[-1]))
    return (
        df.withColumn("_bucket", hash_bucket(id_col, salt))
        .withColumn("split", expr)
        .drop("_bucket")
    )


def quality_percentile_filter(
    df: DataFrame,
    score_col: str,
    strata_col: str,
    min_percentile: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep rows at or above the ``min_percentile`` of ``score_col``
    WITHIN their stratum — "cut the bottom 20% per language", the
    relative form of a quality filter. An absolute threshold cuts
    whole low-scoring languages; the percentile cut removes each
    stratum's own worst tail, which is what mixture-balanced curation
    wants.

    Exact ``percent_rank`` (not approx quantiles): deterministic,
    oracle-checkable, and one shuffle on the stratum key — the same
    window shape as top-k, safe at any stratum size. Ties broken by
    ``id_col`` so the kept set is unique and layout-independent.
    """
    if not 0.0 <= min_percentile <= 1.0:
        raise ValueError(f"min_percentile must be in [0, 1], got {min_percentile}")
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_pr", F.percent_rank().over(w))
        .filter(F.col("_pr") >= min_percentile)
        .drop("_pr")
    )


def temperature_mix(
    df: DataFrame,
    strata_col: str = "lang",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled mixture weights per stratum (language /
    source / domain): sampling probability ∝ n_s^α — the standard
    multilingual rebalancing (α=1 keeps natural proportions, α→0
    approaches uniform; mT5/XLM-R train at α≈0.3–0.7). Returns one row
    per stratum with its doc count, normalized mixture ``weight`` and
    the integer ``quota`` of documents a same-size resampled corpus
    would draw from it.

    One map-side-combined groupBy over the corpus; the normalization
    window runs on the strata-sized aggregate (|strata| rows — single
    partition by construction, never data-sized). α=0.5 uses ``sqrt``
    (IEEE correctly-rounded, bit-identical across engines); other α go
    through ``pow``. The weight sum is decimal-accumulated (see
    functions.portable.dsum) so the normalization is order-insensitive.
    """
    from pyspark.sql import Window

    scaled = (
        F.sqrt(F.col("n_docs").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
    )
    counts = (
        df.groupBy(strata_col)
        .agg(F.count("*").alias("n_docs"))
        .withColumn("_w", F.round(scaled, 6))
    )
    w = Window.partitionBy()
    return (
        counts.withColumn(
            "_wsum", F.sum(F.col("_w").cast("decimal(25,6)")).over(w).cast("double")
        )
        .withColumn("_ntot", F.sum("n_docs").over(w))
        .select(
            strata_col,
            "n_docs",
            F.round(F.col("_w") / F.col("_wsum"), 6).alias("weight"),
            F.round(F.col("_w") / F.col("_wsum") * F.col("_ntot"), 0)
            .cast("bigint")
            .alias("quota"),
        )
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str = "lang",
    alpha: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Execute the :func:`temperature_mix` rebalancing: deterministically
    select each stratum's ``quota`` documents (md5-rank order, seedable
    via ``salt``), producing a same-size corpus whose mixture follows
    n^α. Head strata downsample to their quota; tail strata keep
    everything (a quota above the stratum size selects all rows —
    upsampling/repetition is a separate epoch-level decision).

    Plan: the strata-sized quota table broadcasts onto a per-stratum
    md5-rank window — one window shuffle on the stratum key, the same
    shape as :func:`top_k_per_stratum` but with a data-driven k.
    """
    from pyspark.sql import Window

    quotas = temperature_mix(df, strata_col, alpha).select(strata_col, "quota")
    w = Window.partitionBy(strata_col).orderBy(
        md5_i64(F.concat(F.lit(salt), F.col(id_col).cast("string"))).asc(),
        F.col(id_col).asc(),
    )
    return (
        df.join(F.broadcast(quotas), strata_col)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("quota"))
        .drop("_rk", "quota")
    )


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "",
    num_shards: int = 64,
) -> DataFrame:
    """Deterministic global training order WITHOUT a global sort: every
    row gets a dense ``global_pos`` in [1, N] drawn from md5(salt||id)
    — the example-shuffling pass before sequence packing. Same order on
    any cluster layout; ``salt`` draws an independent permutation.

    A naive ``ROW_NUMBER() OVER (ORDER BY md5)`` funnels the corpus
    through ONE partition — the canonical scale-killer. Instead:
    shard-major two-level numbering (shard = key % S, rank within
    shard, plus broadcast per-shard offsets), so the only data-sized
    shuffle is the S-way window partition-by; the offset table is S
    rows. Equivalent to ``ROW_NUMBER() OVER (ORDER BY key % S, key,
    id)``. At 100 TB, S scales with the cluster (shards stay ~N/S
    rows); the offset table stays tiny.
    """
    from pyspark.sql import Window

    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    key = md5_i64(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    keyed = df.withColumn("_key", key).withColumn(
        "_shard", F.col("_key") % num_shards
    )
    within = F.row_number().over(
        Window.partitionBy("_shard").orderBy("_key", id_col)
    )
    offsets = (
        keyed.groupBy("_shard")
        .agg(F.count("*").alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.partitionBy()
                    .orderBy("_shard")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_shard", "_offset")
    )
    return (
        keyed.withColumn("_within", within)
        .join(F.broadcast(offsets), "_shard")
        .withColumn("global_pos", F.col("_offset") + F.col("_within"))
        .drop("_key", "_shard", "_within", "_offset")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic per-row Bernoulli keep with probability equal to
    the row's ``weight_col`` (clamped to [0, 1]) — quality-weighted
    downsampling, the standard soft filter between a hard quality cut
    and keeping everything (high-quality docs survive at their score's
    rate, zero-score docs drop out). Same md5-bucket determinism as
    :func:`stratified_sample`: reproducible across reruns and cluster
    layouts, seedable via ``salt``. Pure map-side filter, zero shuffle.
    """
    w = F.least(F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)), F.lit(1.0))
    return (
        df.withColumn("_bucket", hash_bucket(id_col, salt))
        # floor(x+0.5), not F.round: score*1000 lands exactly on .5
        # whenever the 6-dp score ends in 0005 — the same engine-rule
        # divergence functions.portable.round_portable documents
        .filter(F.col("_bucket") < F.floor(w * BUCKETS + F.lit(0.5)))
        .drop("_bucket")
    )


def write_training_shards(
    df: DataFrame,
    out_path: str,
    num_files: int = 64,
    id_col: str = "doc_id",
    salt: str = "",
    shuffle_shards: int = 64,
) -> None:
    """Materialize the corpus as training shards: rows land in
    ``num_files`` contiguous-range files following the deterministic
    :func:`global_shuffle` order, sorted within each file, so a trainer
    streaming shard files in position order reads exactly the shuffled
    order. The standard last step before tokenization/packing;
    re-running with the same salt reproduces the identical layout on
    any cluster.

    ``num_files`` (output layout) is independent of ``shuffle_shards``
    (the permutation's internal two-level numbering — changing it
    changes the permutation, so it is pinned by default).
    ``repartitionByRange`` on the position samples range bounds — no
    single-task sort, no driver collection.
    """
    ordered = global_shuffle(
        df, id_col=id_col, salt=salt, num_shards=shuffle_shards
    )
    (
        ordered.repartitionByRange(num_files, "global_pos")
        .sortWithinPartitions("global_pos")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    splits: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Train/val/test split that can never leak a duplicate across the
    boundary: the split bucket is keyed on the row's duplicate-GROUP id,
    not its own id, so every copy (and near-copy) of a document lands in
    the same split. Per-doc hashing (:func:`split_assign`) silently puts
    two copies of the same page on both sides of the train/test line —
    the classic eval-contamination bug duplicate-aware splitting exists
    to prevent (cf. the dedup motivation in Lee et al. 2022).

    ``clusters`` is an optional (id, ``cluster_col``) frame from the
    near-dup pipeline (``duplicate_clusters`` /
    ``star_contraction_clusters``); rows absent from it are singletons
    and key off their own id. With ``clusters=None`` the group is the
    exact-content group (min id per ``md5(text)``) — the zero-config
    form.

    Scale shape: the exact-content form is one window shuffle on the
    content hash (same shape as exact dedup); the clusters form is a
    left join against a pair-graph-sized frame (≪ corpus, AQE
    broadcasts it when small). The split assignment itself stays
    map-only.
    """
    from pyspark.sql import Window

    if clusters is None:
        w = Window.partitionBy(F.md5(F.col(text_col)))
        grouped = df.withColumn("group_id", F.min(id_col).over(w))
    else:
        c = clusters.select(
            F.col(id_col), F.col(cluster_col).alias("_grp")
        )
        grouped = (
            df.join(c, id_col, "left")
            .withColumn("group_id", F.coalesce(F.col("_grp"), F.col(id_col)))
            .drop("_grp")
        )
    return split_assign(grouped, splits, id_col="group_id", salt=salt)


def containment_safe_split(
    df: DataFrame,
    threshold: float = 0.8,
    k: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    salt: str = "",
    signatures: DataFrame | None = None,
    closure: str = "star",
) -> DataFrame:
    """:func:`leakage_safe_split` with CONTAINMENT-aware grouping: the
    duplicate graph is built from asymmetric containment pairs
    (:func:`~cdc_system_spark.operators.dedup.containment_pairs`, the
    Broder resemblance-vs-containment estimate), not just symmetric
    near-duplicates — so a quoted SUBSET document (low Jaccard to the
    page that contains it, high containment) can never straddle the
    train/test boundary either. The classic residual leak of
    Jaccard-grouped splitting: the eval answer is a paragraph of a
    training page; symmetric similarity misses it, containment
    catches it.

    Composition (each piece independently oracle-checked): containment
    pairs at ``threshold`` → connected components
    (:func:`~cdc_system_spark.operators.dedup.duplicate_clusters`) →
    group-keyed :func:`split_assign`. Scale shape inherited from the
    pieces: banded candidate generation (never all-pairs), pair-graph-
    sized CC rounds, map-only assignment.

    ``signatures`` (optional, the
    :func:`~cdc_system_spark.operators.lsh_index.lsh_index_signature_tables`
    ``(id, h0.., n_sh)`` shape) forwards to :func:`containment_pairs`:
    the split then derives its pair graph from the MAINTAINED MinHash
    artifact instead of re-shingling the corpus per call — the
    dominant cost of this operator at corpus scale.

    ``closure`` picks the connected-components algorithm: ``"star"``
    (default) = :func:`~cdc_system_spark.operators.dedup.star_contraction_clusters`,
    ``"lp"`` = :func:`~cdc_system_spark.operators.dedup.duplicate_clusters`.
    Both label every component by its min id, so the split output is
    identical; star contraction halved the closure stage in the r9
    sf0.1 profile (3.4 vs 6.7 s on a 41k-edge containment graph — LP
    pays one corpus-node-set shuffle per propagation round, star's
    rounds are edge-sized and converge in O(log² n)) and is the safer
    shape at 100 TB, where a chained containment graph can stretch
    LP's round count to the component diameter.
    """
    from cdc_system_spark.operators.dedup import (
        containment_pairs,
        duplicate_clusters,
        star_contraction_clusters,
    )

    if closure not in ("star", "lp"):
        raise ValueError(f"closure must be 'star' or 'lp', got {closure!r}")
    # min_containment pushes the threshold INSIDE the pair generator:
    # the candidate distinct then runs over the ~0.8%% of collisions
    # that survive the filter instead of the full multi-million-row
    # candidate set (see containment_pairs — identical pair set)
    pairs = containment_pairs(
        df, k=k, text_col=text_col, id_col=id_col, rows_per_band=1,
        signatures=signatures, min_containment=threshold,
    )
    cluster_fn = (
        star_contraction_clusters if closure == "star" else duplicate_clusters
    )
    clusters = cluster_fn(df, pairs.select("id1", "id2"), id_col=id_col)
    return leakage_safe_split(
        df,
        clusters=clusters,
        text_col=text_col,
        id_col=id_col,
        splits=splits,
        salt=salt,
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    strata_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Select documents per stratum until a TOKEN budget is filled:
    walk each stratum in deterministic md5 order and keep the greedy
    prefix whose cumulative token count stays within ``budget_tokens``.
    Training runs are budgeted in tokens, not documents — a doc-count
    quota (:func:`temperature_sample`) over-draws strata with long
    documents; this is the token-exact form. (The doc that would cross
    the budget is excluded — under-fill by at most one document.)

    One window shuffle on the stratum key, the same shape as
    :func:`top_k_per_stratum`; the cumulative sum stays inside each
    stratum partition. Deterministic and layout-independent: md5 order
    with id tiebreak, integer token counts (exact cumsum, no float
    accumulation), seedable via ``salt``.
    """
    from pyspark.sql import Window

    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    key = md5_i64(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    w = (
        Window.partitionBy(strata_col)
        .orderBy(key.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
    )


def bottomk_sample(df: DataFrame, k: int, id_col: str = "doc_id") -> DataFrame:
    """Fixed-SIZE deterministic uniform sample: the ``k`` rows whose
    md5(id) hashes are smallest (ties to the smaller id). The
    maintained-artifact sibling of :func:`hash_bucket` sampling —
    a hash-threshold filter gives a fixed RATE; bottom-k gives a fixed
    BUDGET (the always-fresh inspection sample, eval slice, or stats
    panel that must stay ~k rows as the corpus grows).

    Mergeable like the KMV sketch it generalizes (bottom-k over hashes,
    carrying the full row as payload): bottom-k of a UNION of shard
    samples == bottom-k of the union of shards, exactly — so per-shard/
    per-day samples combine without re-reading raw data, proven by
    ``q_sample_merged``'s oracle being the WHOLE-corpus SQL. Uniform
    because md5 is uniform on ids; deterministic because nothing is
    seeded by time or partitioning.

    Plan shape: one map-side hash projection + TakeOrderedAndProject
    (per-partition top-k before a k·partitions-row merge) — nothing
    corpus-sized moves.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = md5_i64(F.col(id_col).cast("string"))
    return (
        df.withColumn("_bk", h)
        .orderBy("_bk", id_col)
        .limit(k)
        .drop("_bk")
    )
