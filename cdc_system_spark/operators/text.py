"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-ratio heuristic), quality scoring, token
counting, and document fingerprinting — all pure ``pyspark.sql.functions``
expressions (array ops on the split-token array; no explode except where
aggregation requires it, no Python UDFs), so they run inside
whole-stage codegen and are SQL-oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny English function-word list for the language heuristic
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


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
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(diversity, 6).alias("diversity"),
        F.round(len_sat * diversity * (F.lit(0.5) + stop_ratio), 6).alias("quality_score"),
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
