"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-ratio heuristic), quality scoring, token
counting, and document fingerprinting — all pure ``pyspark.sql.functions``
expressions (array ops on the split-token array; no explode except where
aggregation requires it, no Python UDFs), so they run inside
whole-stage codegen and are SQL-oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cdc_system_spark.functions.portable import round_portable, spread

#: tiny English function-word list for the language heuristic
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def normalize_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Curation-standard text normalization: lowercase, collapse
    whitespace runs to single spaces, trim — the canonical form every
    hash-based dedup pass should run on (otherwise "Foo  bar" and
    "foo bar" hash apart). ASCII whitespace class so Java and RE2 engines
    agree byte-for-byte. Zero-shuffle map pass inside codegen.
    """
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "[ \\t\\n\\r]+", " ")
    )
    return spread(df).select(
        F.col(id_col),
        norm.alias("norm_text"),
        (norm != F.col(text_col)).alias("changed"),
    )


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + distinct-token count per document."""
    w = _tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(w).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct_tokens"),
    )


#: BPE-ish pre-tokenizer: letter runs, digit runs, punctuation runs —
#: the split GPT-style BPE applies before merges. ASCII classes only so
#: Java (Spark) and RE2 (DuckDB) regex engines agree exactly.
BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def subword_token_count(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Tokenizer-style counts: BPE-ish regex pre-tokens per document.

    ``regexp_extract_all`` runs JVM-side inside codegen — no UDF. The
    4/3 heuristic (chars-per-token ≈ 4 for English; tokens ≈ words ×
    4/3) gives the standard budget estimate used when a real tokenizer
    is unavailable at pipeline speed.
    """
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), 0)
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_pretokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_pretokens"),
        F.ceil(F.length(F.col(text_col)) / 4.0).cast("long").alias("est_bpe_tokens"),
    )


def text_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality features: length, token stats, stopword ratio, score.

    The score formula is arbitrary-but-fixed (length saturation ×
    lexical diversity × stopword presence) — the point is the *shape*:
    a single projection computing all features in one pass.
    """
    w = _tokens(text_col)
    n_tok = F.size(w)
    n_stop = F.size(F.filter(w, lambda t: t.isin(EN_STOPWORDS)))
    n_distinct = F.size(F.array_distinct(w))
    stop_ratio = n_stop.cast("double") / n_tok
    diversity = n_distinct.cast("double") / n_tok
    len_sat = F.least(F.length(F.col(text_col)).cast("double") / 500.0, F.lit(1.0))
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        # round_portable: ratio/score values can land exactly on a
        # 1e-6 half-way boundary, where F.round and a SQL oracle's
        # ROUND disagree by one ulp (observed at sf0.1)
        round_portable(stop_ratio, 6).alias("stopword_ratio"),
        round_portable(diversity, 6).alias("diversity"),
        round_portable(
            len_sat * diversity * (F.lit(0.5) + stop_ratio), 6
        ).alias("quality_score"),
    )


def lang_id(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.03,
) -> DataFrame:
    """n-gram-free language heuristic: stopword ratio ⇒ 'en' vs 'unk'.

    A real pipeline swaps in a fastText-style model via pandas_udf; the
    Spark plumbing (projection shape, threshold gate) stays identical.
    """
    w = _tokens(text_col)
    ratio = F.size(F.filter(w, lambda t: t.isin(EN_STOPWORDS))).cast("double") / F.size(w)
    return df.select(
        F.col(id_col),
        F.round(ratio, 6).alias("stopword_ratio"),
        F.when(ratio >= threshold, "en").otherwise("unk").alias("predicted_lang"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: full-content md5 + min-token-hash.

    ``min_token_hash`` is a 1-permutation MinHash over the token set —
    a cheap order-invariant sketch that survives token reordering,
    where the md5 changes on any byte edit. Both are engine-portable.
    """
    w = _tokens(text_col)
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("content_md5"),
        F.array_min(F.transform(w, lambda t: F.md5(t))).alias("min_token_hash"),
    )


def term_frequency(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt_buckets: int = 16,
) -> DataFrame:
    """Corpus-wide term counts with explicit skew salting.

    Token frequency is Zipfian: the hot tokens ("the", boilerplate)
    concentrate in a handful of reducers and serialize the job at scale.
    Two-phase aggregation splits every token across ``salt_buckets``
    deterministic salts (doc id modulo — reproducible, unlike rand()):
    partial counts per (token, salt) spread the hot keys across the
    cluster; the final per-token sum combines ``salt_buckets`` rows per
    token, which is trivially small. Result is identical to a plain
    GROUP BY — only the shuffle distribution changes.

    (AQE skew handling covers *joins*; aggregation skew still needs this
    manual split.)
    """
    toks = df.select(
        (F.col(id_col) % salt_buckets).alias("_salt"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    )
    partial = toks.groupBy("token", "_salt").agg(F.count("*").alias("_n"))
    return partial.groupBy("token").agg(F.sum("_n").alias("n"))


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Per-document top-k terms by TF-IDF — the classic relevance/
    keyword-extraction primitive over a training corpus.

    IDF is the *rational* variant ``(N+1)/(df+1)`` rather than
    ``ln((N+1)/(df+1))``: monotone in the same direction (ranking is
    unchanged for fixed tf), but free of transcendental functions, so
    Spark (Java Math) and any SQL oracle (libm) produce bit-identical
    doubles — IEEE division and multiplication are correctly rounded,
    ``ln`` is not guaranteed to the last ulp across engines. Swap in
    ``F.ln`` for production ranking across mixed tf.

    Shape: explode → (doc, term) counts [1 shuffle, map-side combine] →
    df per term from the already-unique (doc, term) frame [1 shuffle on
    term; partial agg absorbs Zipf skew] → broadcast join back → top-k
    window per doc (WindowGroupLimit prunes below-top-k rows before the
    shuffle).
    """
    toks = spread(df).select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    # tf feeds both the df-count branch and the final join; checkpoint
    # so the explode+groupBy runs once, not per branch
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf")).localCheckpoint(
        eager=False
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    # Corpus cardinality is a pipeline-level statistic (same class as
    # broadcast model parameters): read it once with a metadata-cheap
    # count and fold it as a literal. Joining a 1-row frame instead
    # plans BroadcastNestedLoopJoin (Catalyst constant-folds any
    # literal join key), which the plan audit forbids as a hazard class.
    n_docs = df.count()
    scored = tf.join(F.broadcast(dfreq), "term").withColumn(
        "tfidf",
        F.round(
            F.col("tf") * (F.lit(float(n_docs + 1)) / (F.col("df") + 1)),
            6,
        ),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select(id_col, "term", "tf", F.col("df").alias("doc_freq"), "tfidf", "rk")
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_top_2gram_frac: float = 0.08,
    max_dup_word_frac: float = 0.75,
) -> DataFrame:
    """Gopher-style repetition filters: duplicate-word fraction, most-
    frequent-2-gram fraction, symbol ratio, and the keep/drop verdict —
    the standard "repetitious document" cut in LLM data pipelines
    (Rae et al. 2021 §A1.3 uses the same signal family).

    Entirely per-row builtins — the top-2-gram frequency folds over the
    *sorted* gram array counting the longest equal run (``aggregate``
    with a (prev, run, best) struct accumulator), so there is **zero
    explode and zero shuffle**: at 100 TB this is a pure map stage
    inside whole-stage codegen.
    """
    w = _tokens(text_col)
    n_tok = F.size(w)
    dup_word = F.round(
        F.lit(1.0) - F.size(F.array_distinct(w)).cast("double") / n_tok, 6
    )
    grams = F.when(
        n_tok >= 2,
        F.transform(
            F.sequence(F.lit(1), n_tok - 1),
            lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, g):
        run = F.when(acc["prev"].eqNullSafe(g), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            g.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    max_gram = F.aggregate(F.array_sort(grams), acc0, step, lambda acc: acc["best"])
    n_grams = F.size(grams)
    top2 = F.when(n_grams > 0, F.round(max_gram.cast("double") / n_grams, 6)).otherwise(
        F.lit(0.0)
    )
    # Empty documents are routine in real web corpora; under Spark 4's
    # default ANSI mode a bare division would abort the whole job with
    # DIVIDE_BY_ZERO on the first zero-length text, so gate explicitly.
    n_chars = F.length(F.col(text_col))
    symbol_ratio = F.when(
        n_chars > 0,
        F.round(
            F.length(F.regexp_replace(F.col(text_col), "[A-Za-z0-9 ]", "")).cast(
                "double"
            )
            / n_chars,
            6,
        ),
    ).otherwise(F.lit(0.0))
    # CPU-bound per-row fold: decouple task count from input split count
    return spread(df).select(
        F.col(id_col),
        dup_word.alias("dup_word_frac"),
        top2.alias("top_2gram_frac"),
        symbol_ratio.alias("symbol_ratio"),
        (
            (dup_word <= max_dup_word_frac) & (top2 <= max_top_2gram_frac)
        ).alias("keep"),
    )


#: ASCII-only patterns so Java (Spark) and RE2-ish (DuckDB) engines
#: agree byte-for-byte; real pipelines extend the list (IBAN, SSN, ...)
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII scrub: replace email addresses and phone-like digit runs with
    placeholder tokens, reporting per-doc redaction counts — the
    standard privacy pass before a corpus ships to training.

    Pure per-row ``regexp_replace``/``regexp_extract_all`` inside
    codegen: zero shuffle, linear scan, trivially 100 TB-safe. Phones
    are counted on the *email-redacted* text — the same string the
    phone replacement runs on — so ``n_phones`` always equals the
    number of ``<PHONE>`` tokens in ``clean_text`` (a 9+-digit run
    inside an email's local/domain part is an email, not a phone).
    """
    t = F.col(text_col)
    emailless = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    n_emails = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(emailless, F.lit(PII_PHONE_RE), F.lit(0)))
    clean = F.regexp_replace(emailless, PII_PHONE_RE, "<PHONE>")
    return spread(df).select(
        F.col(id_col),
        clean.alias("clean_text"),
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        (n_emails + n_phones > 0).alias("had_pii"),
    )


def token_histogram(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 16,
) -> DataFrame:
    """Corpus length profile: fixed-width histogram of per-document
    token counts — the first thing a data curator plots (truncation
    budget, packing efficiency, outlier docs). One row per non-empty
    bucket: doc count, total tokens, and each bucket's share of docs.

    Fixed-width buckets (not quantiles) deliberately: exact, mergeable
    across corpus shards by plain addition, and oracle-checkable —
    approx-percentile sketches are none of these. One map-side-combined
    groupBy; the share window runs over the histogram itself (bounded
    by max_tokens/width rows, never data-sized). The share is an exact
    bigint/bigint division in double — engine-identical.
    """
    from pyspark.sql import Window

    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    n_tok = F.size(_tokens(text_col)).cast("long")
    hist = (
        df.select(F.floor(n_tok / width).cast("long").alias("bucket"), n_tok.alias("_n"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"), F.sum("_n").alias("n_tokens"))
    )
    w = Window.partitionBy()
    return hist.withColumn(
        "share", F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6)
    ).select(
        "bucket",
        (F.col("bucket") * width).alias("lo_tokens"),
        "n_docs",
        "n_tokens",
        "share",
    )


def rarity_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-statistics quality score: mean token rarity, where
    rarity(token) = 1 / corpus_frequency — a transcendental-free proxy
    for the unigram-LM surprisal filters used by CCNet-style pipelines
    (docs of only ultra-common tokens score near 0; docs with rare
    vocabulary score high).

    Engine-exact by construction: each reciprocal is one IEEE division
    rounded to 6 decimals, then summed through an exact DECIMAL
    accumulator — no float-summation order sensitivity, no ln().

    Shape: ONE exploded-token frame, localCheckpoint'ed so the explode
    runs once, feeds BOTH the corpus-frequency branch (salted two-phase
    agg, same skew treatment as :func:`term_frequency`) and the per-doc
    scoring join — without the checkpoint each branch re-explodes the
    corpus and the plan doubles to ~8 shuffles (same fix as
    :func:`tfidf_top_terms`).
    """
    toks = (
        spread(df)
        .select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .localCheckpoint(eager=False)
    )
    partial = toks.groupBy("token", (F.col(id_col) % 16).alias("_salt")).agg(
        F.count("*").alias("_n")
    )
    freq = partial.groupBy("token").agg(F.sum("_n").alias("n"))
    rarity = F.round(F.lit(1.0) / F.col("n"), 6)
    per_doc = (
        toks.join(F.broadcast(freq), "token")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(rarity.cast("decimal(25,6)")).alias("_rsum"),
        )
    )
    return per_doc.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.round(F.col("_rsum").cast("double") / F.col("n_tokens"), 6).alias(
            "mean_rarity"
        ),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 7,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03 — the MOSS
    algorithm): hash every char ``k``-shingle, then keep the minimum
    hash of each sliding ``window`` of consecutive shingle hashes,
    deduplicated. Guarantees: any shared substring of length
    ``k + window - 1`` produces at least one shared fingerprint, and
    the selected set is position-robust (insertions far away don't
    change local fingerprints) — the property raw min-token-hash
    (:func:`fingerprint`) lacks. Output is one row per (doc,
    fingerprint): the posting shape an overlap index consumes.

    Density is ~2/(window+1) of shingle count, so the explode is
    bounded; everything before it is a zero-shuffle per-row pipeline of
    builtins (shingle → md5-int64 → windowed array_min → distinct),
    engine-portable for the oracle.
    """
    from cdc_system_spark.functions.portable import md5_i64, shingles

    if k < 1 or window < 1:
        raise ValueError(f"k and window must be >= 1, got k={k}, window={window}")
    # The shingle-hash array MUST land in its own projection: higher-
    # order functions run outside codegen with no common-subexpression
    # elimination, so referencing the `transform(shingles, md5)`
    # expression from inside the window lambda re-evaluates the ENTIRE
    # md5 array per reference — measured 38 s at sf0.1; with the
    # materialized column + least() over positional lookups (no
    # per-window slice allocation) the same result takes 0.4 s.
    # CollapseProject keeps the split because `hs` is non-cheap and
    # multiply-referenced. try_element_at returns null past the end
    # (the single short-doc window) and least() skips nulls, matching
    # the oracle's truncated list_min.
    hs_df = spread(df).select(
        F.col(id_col),
        F.transform(shingles(F.col(text_col), k), md5_i64).alias("_hs"),
    )
    hs = F.col("_hs")
    n = F.size(hs)
    if window == 1:
        mins = hs  # every element is its own window
    else:
        mins = F.transform(
            F.sequence(F.lit(1), F.greatest(n - (window - 1), F.lit(1))),
            lambda i: F.least(
                *[F.try_element_at(hs, i + j) for j in range(window)]
            ),
        )
    return hs_df.select(
        F.col(id_col),
        F.explode(F.array_distinct(mins)).alias("fp"),
    )


def boilerplate_prefixes(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    prefix_chars: int = 30,
    min_share: float = 0.1,
) -> DataFrame:
    """Boilerplate detection: fixed-length text prefixes that repeat
    across a meaningful share of one source's documents — the signature
    of injected headers/navigation/license banners (the C4/RefinedWeb
    boilerplate-stripping pass starts from exactly this table; the
    cleaner then strips or drops flagged docs).

    One map-side-combined groupBy on (source, prefix); the per-source
    share denominator is a strata-sized aggregate broadcast back. At
    100 TB the group count is bounded by distinct (source, prefix)
    pairs — boilerplate concentrates, long-tail prefixes die in the
    partial aggregation.
    """
    if prefix_chars < 1:
        raise ValueError(f"prefix_chars must be >= 1, got {prefix_chars}")
    if not 0.0 < min_share <= 1.0:
        raise ValueError(f"min_share must be in (0, 1], got {min_share}")
    pref = F.substring(F.col(text_col), 1, prefix_chars)
    counts = (
        df.select(F.col(source_col).alias("source"), pref.alias("prefix"))
        .groupBy("source", "prefix")
        .agg(F.count("*").alias("n_docs"))
    )
    totals = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("_total")
    )
    return (
        counts.join(F.broadcast(totals), "source")
        .withColumn("share", F.round(F.col("n_docs") / F.col("_total"), 6))
        .filter(F.col("share") >= min_share)
        .select("source", "prefix", "n_docs", "share")
    )


def line_dedup(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_share: float = 0.1,
    sep: str = "\n",
) -> DataFrame:
    """Line-wise deduplication (the RefinedWeb/C4 cleaning pass):
    drop every line that appears in at least ``min_share`` of a
    source's documents — repeated lines at that frequency are
    navigation, cookie banners, footers, not content. Documents are
    reassembled from their surviving lines in original order; a
    ``changed`` flag records which docs lost lines.

    Scale shape: one explode → (source, line) count-distinct agg →
    anti join → per-doc ordered reassembly (sort_array over
    (pos, line) structs — no window, no global sort). The flagged-line
    table is data-dependent (unlike prefix detection a doc has many
    lines), so no broadcast hint — AQE decides. Reassembly state is
    bounded per doc, never per source.
    """
    if not 0.0 < min_share <= 1.0:
        raise ValueError(f"min_share must be in (0, 1], got {min_share}")
    lines = df.select(
        F.col(id_col),
        F.col(source_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    freq = (
        lines.groupBy(source_col, "line")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    )
    totals = df.groupBy(source_col).agg(F.count("*").alias("_total"))
    flagged = (
        freq.join(totals, source_col)
        .filter(F.round(F.col("n_docs") / F.col("_total"), 6) >= min_share)
        .select(source_col, "line")
    )
    kept = lines.join(flagged, [source_col, "line"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("_new_text")
    )
    return (
        df.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.col(source_col),
            F.coalesce(F.col("_new_text"), F.lit("")).alias(text_col),
            (
                F.coalesce(F.col("_new_text"), F.lit("")) != F.col(text_col)
            ).alias("changed"),
        )
    )


def strip_boilerplate(
    df: DataFrame,
    flagged: DataFrame | None = None,
    source_col: str = "source",
    text_col: str = "text",
    prefix_chars: int = 30,
    min_share: float = 0.1,
) -> DataFrame:
    """Apply half of the C4-style boilerplate pass: remove flagged
    repeated prefixes from each document (detection is
    :func:`boilerplate_prefixes`; pass its output as ``flagged`` to
    reuse it, else it is computed here with the same parameters).

    A doc is stripped iff its (source, first-``prefix_chars``) pair is
    flagged: the prefix is cut and the remainder left-trimmed; a
    ``stripped`` boolean records which docs changed. All other columns
    pass through unchanged.

    100 TB shape: the flagged table is bounded by construction — at
    most ``1/min_share`` prefixes per source survive the share filter —
    so the application join is always a broadcast hash join and the
    pass stays map-side; no extra shuffle beyond detection's own agg.
    """
    if flagged is None:
        flagged = boilerplate_prefixes(
            df, source_col, text_col, prefix_chars, min_share
        )
    flags = flagged.select(
        F.col("source").alias("_bp_source"), F.col("prefix").alias("_bp_prefix")
    ).distinct()
    marked = df.withColumn(
        "_pref", F.substring(F.col(text_col), 1, prefix_chars)
    )
    joined = marked.join(
        F.broadcast(flags),
        (marked[source_col] == flags["_bp_source"])
        & (marked["_pref"] == flags["_bp_prefix"]),
        "left",
    )
    hit = F.col("_bp_prefix").isNotNull()
    rest = F.col(text_col).substr(
        F.lit(prefix_chars + 1), F.length(F.col(text_col))
    )
    out_cols = [
        F.when(hit, F.ltrim(rest)).otherwise(F.col(c)).alias(c)
        if c == text_col
        else F.col(c)
        for c in df.columns
    ]
    return joined.select(*out_cols, hit.alias("stripped"))


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Tokenizer-design diagnostic: the corpus's ``top_n`` most frequent
    tokens with each token's corpus share and the CUMULATIVE coverage —
    "how much of the corpus do the top-k vocabulary entries cover",
    the curve every vocab-size decision (BPE merges, embedding table
    size, OOV budget) is read off of.

    Scale shape: one map-side-combined token groupBy (vocab-sized, ≪
    corpus); the global total is reduced distributedly and collected as
    ONE scalar (a data-sized global window would single-partition the
    vocab — the skew_profile rule); top-N selection is
    TakeOrderedAndProject; the cumulative window runs over the BOUNDED
    top-N frame only. Ties broken by token text, so the ranking is
    unique and layout-independent.
    """
    from pyspark.sql import Window

    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    toks = df.select(F.explode(_tokens(text_col)).alias("token")).filter(
        F.col("token") != ""
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("n_occurrences"))
    total = counts.agg(F.sum("n_occurrences").cast("bigint")).collect()[0][0] or 0
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(top_n)
    w = Window.partitionBy().orderBy(F.desc("n_occurrences"), F.asc("token"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "token",
        "n_occurrences",
        F.round(F.col("n_occurrences") / F.lit(float(total)), 6).alias("share"),
        F.round(
            F.sum("n_occurrences").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
            / F.lit(float(total)),
            6,
        ).alias("cum_share"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 lexical retrieval: top-``k`` documents for a bag-of-words
    query (Robertson/Spärck Jones; the scoring function behind every
    production keyword index). Per matched term:

        idf · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))

    with the RATIONAL idf ``(N+1)/(df+1)`` (this package's
    tfidf_top_terms convention: monotone like the log form for fixed
    tf, but free of transcendentals, so Spark and any SQL oracle agree
    to the last bit; swap in ``F.ln`` for production ranking).

    Scale shape: tokens are filtered to the query's terms BEFORE any
    aggregation (the isin predicate rides the scan — the posting-list
    pruning an inverted index does physically); per-(doc, term) counts
    and per-term doc frequencies aggregate with map-side combine;
    ``avgdl`` folds as a literal from one exact integer reduce (never a
    1-row join — that plans BroadcastNestedLoopJoin). Per-doc summation
    is decimal-accumulated (order-insensitive); final ranking is
    TakeOrderedAndProject with an id tiebreak.
    """
    from cdc_system_spark.functions.portable import dsum

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    dl = df.select(
        F.col(id_col), F.size(_tokens(text_col)).cast("long").alias("_dl")
    )
    # exact integer reduce -> one scalar division in double (AVG() would
    # sum doubles in partition order — not reproducible)
    tot = dl.agg(
        F.sum("_dl").alias("s"), F.count("*").alias("n")
    ).collect()[0]
    if tot["n"] == 0:
        raise ValueError("bm25_topk over an empty corpus")
    avgdl = float(tot["s"]) / float(tot["n"])
    # carry the doc length through the explode (one narrow extra column)
    # instead of joining a separate length frame back later — one scan
    # branch and one join fewer; every exploded row of a doc carries the
    # same _dl, so min() in the aggregate reproduces it exactly
    toks = df.select(
        F.col(id_col),
        F.size(_tokens(text_col)).cast("long").alias("_dl"),
        F.explode(_tokens(text_col)).alias("term"),
    ).filter(F.col("term").isin(list(query_terms)))
    tf = (
        toks.groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.min("_dl").alias("_dl"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = tot["n"]
    idf = F.lit(float(n_docs + 1)) / (F.col("df") + 1)
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.lit(avgdl)
    )
    term_score = F.round(idf * F.col("tf") * F.lit(k1 + 1.0) / denom, 6)
    scored = tf.join(F.broadcast(dfreq), "term").select(
        F.col(id_col), term_score.alias("_s")
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(dsum("_s"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), id_col)
        .limit(k)
    )


def oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a vocabulary table
    (e.g. the top-N from :func:`vocab_coverage`): the fraction of a
    doc's tokens a fixed-vocab tokenizer would map to UNK — the
    document-level readout of the vocab-size decision, and a quality
    signal in its own right (high OOV ⇒ junk, code, or the wrong
    language for this tokenizer).

    Scale shape: the vocabulary is model-artifact-sized (≤ a few 100k
    rows), so membership is one BROADCAST left-semi-shaped join on the
    exploded tokens — no corpus-sized shuffle; counts re-aggregate on
    the doc id with map-side combine. Empty-token positions (split
    artifacts) are excluded from both numerator and denominator; docs
    with no tokens report rate 0 over n_tokens 0.
    """
    toks = spread(df).select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("token")
    ).filter(F.col("token") != "")
    v = vocab.select(F.col("token")).distinct()
    flagged = toks.join(
        F.broadcast(v.withColumn("_in", F.lit(1))), "token", "left"
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
            / F.count("*"),
            6,
        ).alias("oov_rate"),
    )


def charset_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_nonprintable: float = 0.05,
    max_digit: float = 0.3,
) -> DataFrame:
    """Character-class quality signals: per-doc ratios of non-printable
    bytes, digits, uppercase, and symbols — the C4/Gopher-style "is
    this even text" gate that catches binary spill, minified code,
    number tables, and SHOUTING boilerplate before any token-level
    scoring runs. ``keep`` is the conjunctive verdict under the two
    thresholds that matter most (non-printable share, digit share).

    "Printable" means tab/newline/CR plus the printable ASCII range
    ``[ -~]`` — multi-line documents are NOT penalized for their line
    breaks. Every character OUTSIDE that set counts toward
    ``nonprintable_ratio``, including non-ASCII letters (umlauts, CJK,
    curly quotes): the default ``max_nonprintable=0.05`` tolerates the
    ~1-2% accented-letter density of normal Latin-script prose, but
    non-Latin scripts score near 1.0 by construction — disable the
    gate (``max_nonprintable=1.0``) for CJK/Cyrillic/Arabic strata
    rather than letting it silently reject them.

    One zero-shuffle projection; each ratio is ``length(text with the
    class removed)`` arithmetic over simple character-class regexes
    that behave identically in Java regex and RE2 (no lookaround, no
    unicode classes), so the whole row is oracle-reproducible.
    """
    n = F.length(F.col(text_col))
    d = F.greatest(n, F.lit(1)).cast("double")

    def survivors(pattern: str):
        """Ratio of chars REMAINING after the class is removed."""
        return F.round(
            F.length(F.regexp_replace(F.col(text_col), pattern, "")) / d, 6
        )

    nonprint = survivors("[\\t\\n\\r -~]")  # remove printable ASCII + \t\n\r
    digit = survivors("[^0-9]")            # remove everything but digits
    upper = survivors("[^A-Z]")
    symbol = survivors("[A-Za-z0-9 ]")     # remove alnum+space
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        nonprint.alias("nonprintable_ratio"),
        digit.alias("digit_ratio"),
        upper.alias("upper_ratio"),
        symbol.alias("symbol_ratio"),
        (
            (nonprint <= F.lit(max_nonprintable))
            & (digit <= F.lit(max_digit))
        ).alias("keep"),
    )


def bigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt_buckets: int = 16,
) -> DataFrame:
    """Per-document language-model quality proxy from corpus bigram
    statistics: mean over the doc's bigrams of ``count(w1) /
    count(w1 w2)`` — how "surprising" each continuation is under the
    corpus's own bigram model (the rational, transcendental-free stand-
    in for CCNet's KenLM perplexity filter: ``-log P(w2|w1)`` is
    monotone in this ratio, and avoiding ``ln`` keeps Spark and any SQL
    oracle bit-identical). Low score ⇒ the doc reads like the corpus;
    high score ⇒ rare continuations (novel text, OR junk/shuffled
    words — exactly what perplexity filtering flags for review).

    Scale shape: bigram and unigram corpus counts are two salted
    two-phase aggregations (Zipf skew split across ``salt_buckets``
    deterministic salts — the :func:`term_frequency` pattern); the
    count lookups shuffle on the gram/word key; the per-doc mean is
    decimal-accumulated (order-insensitive) with map-side combine.
    Docs with fewer than 2 tokens are absent from the output.
    """
    from cdc_system_spark.functions.portable import dsum

    # materialize the token array BEFORE the lambda references it: a
    # split() inline in the transform would re-split the text per
    # element (HOFs have no common-subexpression elimination — the
    # measured blowup documented in minhash_signatures)
    doc_toks = (
        spread(df)
        .select(F.col(id_col), _tokens(text_col).alias("_w"))
        .filter(F.size("_w") >= 2)
    )
    grams = F.expr(
        "transform(sequence(1, size(_w) - 1), "
        "i -> struct(_w[i-1] as w1, concat_ws(' ', _w[i-1], _w[i]) as g))"
    )
    doc_grams = doc_toks.select(
        F.col(id_col), F.explode(grams).alias("b")
    ).select(id_col, "b.w1", "b.g")
    salt = (F.col(id_col) % salt_buckets).alias("_salt")
    g_part = doc_grams.select("g", salt).groupBy("g", "_salt").agg(
        F.count("*").alias("_n")
    )
    g_counts = g_part.groupBy("g").agg(F.sum("_n").alias("c2"))
    # unigram counts DERIVED from the bigram aggregate instead of a
    # second full aggregation over the exploded gram set: c1(w1) =
    # Σ c2(g) over grams whose first token is w1 (exact — both count
    # the same bigram instances), and the first token of g is
    # recoverable because tokens are space-split (no token contains a
    # space). Computed as a window over the DISTINCT-gram table, so
    # ONE aggregation branch (and one join on the scored side) serves
    # both counts: the second full explode + w1-keyed instance
    # aggregation and its separate count join are gone (guide §2.3;
    # r13 — the r12 checkpoint experiment on this query lost to
    # planning barriers, this form has none; the two-branch form
    # duplicated the whole explode+agg subtree because the pruned
    # projections defeat exchange reuse).
    from pyspark.sql import Window

    g_stats = g_counts.withColumn(
        "c1",
        F.sum("c2").over(
            Window.partitionBy(F.substring_index(F.col("g"), " ", 1))
        ),
    )
    scored = (
        doc_grams.join(g_stats, "g")
        .select(
            F.col(id_col),
            round_portable(F.col("c1") / F.col("c2").cast("double"), 6).alias("_r"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        round_portable(dsum("_r") / F.count("*"), 6).alias("surprisal"),
    )


def blocklist_filter(
    df: DataFrame,
    blocklist: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content blocklist gate (the C4 "bad words" filter, Raffel et al.
    2020 §2.2: drop any page containing a term from a fixed list).
    Output: one row per input doc with the count of DISTINCT blocked
    terms present, the sorted comma-joined terms themselves (string,
    not array — the driver-canonicalizer contract), and the keep
    verdict (no hits).

    Scale shape: the blocklist is model-artifact-sized → broadcast
    inner join against the doc's DISTINCT tokens (``array_distinct``
    before the explode, the substring-dedup lesson: dedup inside the
    row before the 1→N fan-out); the only shuffle is the doc-keyed hit
    aggregation, and the hit table re-joined to the corpus is hit-doc-
    sized, never corpus × blocklist.
    """
    if not blocklist:
        raise ValueError("blocklist must be non-empty")
    toks = spread(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(_tokens(text_col))).alias("_t"),
    )
    bl = df.sparkSession.createDataFrame(
        [(w,) for w in sorted(set(blocklist))], "_t string"
    )
    hits = (
        toks.join(F.broadcast(bl), "_t")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_hit_terms"),
            F.array_join(F.sort_array(F.collect_list("_t")), ",").alias(
                "hit_terms"
            ),
        )
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hit_terms"), F.lit(0).cast("long")).alias(
                "n_hit_terms"
            ),
            F.coalesce(F.col("hit_terms"), F.lit("")).alias("hit_terms"),
            F.col("n_hit_terms").isNull().alias("keep"),
        )
    )


_TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "ref")


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a URL column — the first dedup key of every
    web-crawl pipeline (snapshots of one page differ by scheme, www,
    trailing slash, tracking params, and fragments long before their
    text differs): scheme normalized to https, host lowercased with a
    leading ``www.`` stripped, trailing path slashes removed, the
    fragment dropped, and query params with tracking names (``utm_*``,
    ``fbclid``, ``gclid``, ``ref``) removed while the survivors are
    SORTED (param order is transport noise). Pure builtins — regexp +
    array transform riding the scan, zero shuffle, and every step has
    an exact DuckDB twin so the dedup stays oracle-checkable.

    Deliberately conservative: no percent-decoding, no default-port or
    dot-segment resolution — those can CHANGE which resource a URL
    names, and a canonicalizer that merges distinct pages is worse
    than one that misses an alias (the alias is caught later by
    content dedup; the merge is unrecoverable).
    """
    u = F.col(url) if isinstance(url, str) else url
    defrag = F.regexp_replace(u, "#.*$", "")
    rest = F.regexp_replace(defrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    base = F.substring_index(rest, "?", 1)
    query = F.when(
        F.instr(rest, "?") > 0, F.substr(rest, F.instr(rest, "?") + 1)
    ).otherwise(F.lit(""))
    host = F.regexp_replace(
        F.lower(F.substring_index(base, "/", 1)), "^www\\.", ""
    )
    path = F.regexp_replace(F.regexp_replace(base, "^[^/]*", ""), "/+$", "")
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "")
                & ~p.startswith(_TRACKING_PARAMS[0])
                & ~p.startswith(_TRACKING_PARAMS[1] + "=")
                & ~p.startswith(_TRACKING_PARAMS[2] + "=")
                & ~p.startswith(_TRACKING_PARAMS[3] + "="),
            )
        ),
        "&",
    )
    return F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one row per CANONICAL URL (smallest id — the deterministic
    survivor rule every dedup here uses): the crawl-side dedup that
    runs BEFORE any content pass, because it needs no text at all.
    Returns the surviving rows with a ``canonical_url`` column
    appended. One hash groupBy on the canonical string — the exact
    shape of ``exact_dedup``, so it scales the same way.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("canonical_url").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("canonical_url", canonical_url(url_col))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
