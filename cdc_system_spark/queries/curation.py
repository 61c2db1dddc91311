"""Composed curation-pipeline queries.

``q_curation_pipeline`` runs the full training-data curation sequence
(exact dedup → MinHash-LSH clustering → repetition/length filter →
benchmark decontamination → stratified sampling) as ONE oracle-checked
query — the shape a real 100 TB curation run executes, and the check
that catches cross-operator interface drift no single-operator query
can. ``q_substring_dedup`` is the passage-level companion.

The DuckDB oracle reproduces every stage exactly (same md5-derived
hashes, same thresholds, same rounding) — the comparison covers the
pipeline's *math*, not just its row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_system_spark.operators import curation as C
from cdc_system_spark.operators import dedup as D
from cdc_system_spark.queries.base import catalog, register
from cdc_system_spark.queries.fragments import HS as _HS
from cdc_system_spark.queries.fragments import PERMS16, SH7, cluster_ctes, lsh_ctes

_GRAM5 = (
    "list_transform(range(1, greatest(len(w) - 4, 0) + 1), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])"
)
_BUCKET = (
    "CAST(CONCAT('0x', SUBSTR(MD5('s1' || CAST(doc_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT) % 1000"
)

_CURATION_CTES = f"""corpus0 AS (SELECT * FROM documents WHERE doc_id % 97 <> 0),
    bench AS (SELECT * FROM documents WHERE doc_id % 97 = 0),
    exact_keep AS (SELECT MIN(doc_id) AS doc_id FROM corpus0 GROUP BY md5(text)),
    c1 AS (SELECT c.* FROM corpus0 c JOIN exact_keep k USING (doc_id)),
    {cluster_ctes("c1")},
    c2 AS (SELECT c.* FROM c1 c LEFT JOIN comp ON c.doc_id = comp.src
           WHERE COALESCE(comp.cluster_id, c.doc_id) = c.doc_id),
    c2w AS (SELECT doc_id, string_split(text, ' ') AS w FROM c2),
    rep_g AS (SELECT doc_id,
                unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))
                    AS gram
              FROM c2w WHERE len(w) >= 2),
    rep_counts AS (SELECT doc_id, gram, COUNT(*) AS c FROM rep_g GROUP BY 1, 2),
    rep_mx AS (SELECT doc_id, MAX(c) AS max_c, SUM(c) AS n_grams
               FROM rep_counts GROUP BY 1),
    c3 AS (SELECT c2.* FROM c2 JOIN c2w USING (doc_id) LEFT JOIN rep_mx USING (doc_id)
           WHERE ROUND(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6) <= 0.75
             AND COALESCE(ROUND(CAST(max_c AS DOUBLE) / n_grams, 6), 0.0) <= 0.08
             AND len(w) >= 5),
    bw AS (SELECT string_split(text, ' ') AS w FROM bench),
    bg AS (SELECT DISTINCT unnest({_GRAM5}) AS gram FROM bw WHERE len(w) >= 5),
    c3w AS (SELECT doc_id, string_split(text, ' ') AS w FROM c3),
    cg AS (SELECT doc_id, unnest({_GRAM5}) AS gram FROM c3w WHERE len(w) >= 5),
    contaminated AS (SELECT DISTINCT doc_id FROM cg JOIN bg USING (gram)),
    c4 AS (SELECT * FROM c3 WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))"""

_SAMPLE_PRED = (
    f"{_BUCKET} < CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 200 ELSE 100 END"
)
_CURATION_SQL = f"""WITH RECURSIVE
    {_CURATION_CTES}
    SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
    FROM c4
    WHERE {_SAMPLE_PRED}"""


@register(
    "q_curation_pipeline",
    _CURATION_SQL,
    doc="end-to-end curation: exact dedup -> MinHash-LSH clusters -> "
    "repetition/length filter -> 5-gram decontamination vs the "
    "doc_id%%97 benchmark holdout -> deterministic stratified sample; "
    "oracle reproduces every stage's math",
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog(spark, sf_dir).documents
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    out = C.curate_corpus(corpus, bench)
    return out.select(
        "doc_id", "lang", "source", F.col("n_chars").cast("long").alias("n_chars")
    )


_STAR_CLUSTER_SQL = f"""WITH RECURSIVE {cluster_ctes("documents")}
    SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.src"""


@register(
    "q_dup_clusters_star",
    _STAR_CLUSTER_SQL,
    doc="connected components over MinHash-LSH pairs via alternating "
    "large-star/small-star contraction (Kiveris et al. SoCC'14) — "
    "O(log^2 n) rounds vs propagation's O(diameter); same labels, same "
    "oracle as q_dup_clusters",
)
def q_dup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog(spark, sf_dir).documents
    sigs = D.minhash_signatures(docs, k=7, num_perms=16)
    pairs = D.lsh_candidate_pairs(sigs, num_perms=16, rows_per_band=4)
    return D.star_contraction_clusters(docs, pairs)


_EST_TERMS = " + ".join(
    f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)" for i in range(16)
)
_JACCARD_EST_SQL = f"""WITH {lsh_ctes("documents")}
    SELECT p.id1, p.id2,
           ROUND(({_EST_TERMS}) / 16.0, 6) AS est_jaccard
    FROM lsh_pairs p
    JOIN sig a ON a.doc_id = p.id1
    JOIN sig b ON b.doc_id = p.id2"""


@register(
    "q_minhash_jaccard_est",
    _JACCARD_EST_SQL,
    doc="signature-agreement Jaccard estimate per LSH candidate pair — "
    "the cheap threshold step between banding and exact rescoring; "
    "pair table broadcast twice, signatures never shuffled",
)
def q_minhash_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog(spark, sf_dir).documents
    sigs = D.minhash_signatures(docs, k=7, num_perms=16)
    pairs = D.lsh_candidate_pairs(sigs, num_perms=16, rows_per_band=4)
    return D.minhash_jaccard_estimate(sigs, pairs, num_perms=16)


_NORMALIZE_SQL = """SELECT doc_id,
       trim(regexp_replace(lower(text), '[ \\t\\n\\r]+', ' ', 'g')) AS norm_text,
       trim(regexp_replace(lower(text), '[ \\t\\n\\r]+', ' ', 'g')) <> text
           AS changed
    FROM documents"""


@register(
    "q_normalize_text",
    _NORMALIZE_SQL,
    doc="canonical text normalization (lowercase + whitespace collapse + "
    "trim) — the form hash dedup should key on; zero-shuffle map pass",
)
def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.text import normalize_text

    return normalize_text(catalog(spark, sf_dir).documents)


# chunking params: 64-token windows, 8-token overlap -> stride 56
_CHUNK_SQL = """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    n AS (SELECT doc_id, w, len(w) AS n,
                 CASE WHEN len(w) <= 64 THEN 1
                      ELSE CAST(ceil((len(w) - 64) / 56.0) AS BIGINT) + 1 END
                     AS n_chunks
          FROM t)
    SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
           array_to_string(list_slice(w, CAST(i * 56 + 1 AS BIGINT),
                                      CAST(i * 56 + 64 AS BIGINT)), ' ')
               AS chunk_text,
           CAST(len(list_slice(w, CAST(i * 56 + 1 AS BIGINT),
                               CAST(i * 56 + 64 AS BIGINT))) AS BIGINT)
               AS n_chunk_tokens
    FROM n, unnest(range(0, n_chunks)) AS u(i)"""


@register(
    "q_chunk_documents",
    _CHUNK_SQL,
    doc="overlapping fixed-token chunking (64-token windows, stride 56): "
    "zero-shuffle Generate riding the scan",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog(spark, sf_dir).documents
    return C.chunk_documents(docs, chunk_tokens=64, overlap=8)


_PACK_SQL = """WITH t AS (
        SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
    c AS (SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
                         AS BIGINT) AS cum
          FROM t)
    SELECT doc_id, shard, n_tokens,
           cum - n_tokens AS start_tok,
           (cum - n_tokens) // 256 AS seq_first,
           (cum - 1) // 256 AS seq_last
    FROM c"""


@register(
    "q_sequence_pack",
    _PACK_SQL,
    doc="sequence packing bookkeeping: per-shard running token offsets "
    "and the 256-token context-window range each doc occupies; sharded "
    "cumsum (one shuffle), never a global total order",
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog(spark, sf_dir).documents
    return C.sequence_pack(docs, ctx_tokens=256, n_shards=8)


_G8 = " || ' ' || ".join(f"w[i+{j}]" if j else "w[i]" for j in range(8))

_SUBSTRING_SQL = f"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
                               FROM documents),
    g AS (SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, greatest(len(w) - 7, 0) + 1),
                        i -> {_G8})) AS passage
          FROM t WHERE len(w) >= 8),
    p AS (SELECT passage, COUNT(*) AS n_docs,
                 array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
          FROM g GROUP BY passage)
    SELECT passage, n_docs, doc_ids FROM p
    WHERE n_docs BETWEEN 2 AND 1000"""


@register(
    "q_substring_dedup",
    _SUBSTRING_SQL,
    doc="substring-level dedup: token-8-gram passages repeated across "
    ">=2 documents with sorted doc postings; posting-size cap mirrors "
    "the LSH bucket guard",
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog(spark, sf_dir).documents
    return C.substring_duplicate_passages(docs, n=8, min_docs=2, max_posting=1000)


_TOPK_SQL = """WITH r AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY CAST(CONCAT('0x',
                       SUBSTR(MD5('s2' || CAST(doc_id AS VARCHAR)), 1, 15))
                       AS BIGINT) ASC, doc_id ASC) AS rk
        FROM documents)
    SELECT doc_id, lang FROM r WHERE rk <= 20"""


@register(
    "q_topk_per_stratum",
    _TOPK_SQL,
    doc="exactly-k-per-stratum deterministic selection (md5 rank within "
    "lang, k=20) — fixed-size eval-set carving; WindowGroupLimit top-k "
    "shape",
)
def q_topk_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sampling import top_k_per_stratum

    docs = catalog(spark, sf_dir).documents.select("doc_id", "lang")
    return top_k_per_stratum(docs, "lang", 20, salt="s2")


_INGEST_SQL = """WITH corpus AS (SELECT * FROM documents WHERE doc_id % 10 <> 0),
    newbies AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
    batch AS (
        SELECT doc_id, text, lang, source FROM newbies
        UNION ALL
        SELECT doc_id + 1000000, text, lang, source FROM newbies
        UNION ALL
        SELECT doc_id + 2000000, text, lang, source FROM corpus
        WHERE doc_id % 7 = 1
        UNION ALL
        SELECT doc_id, text || ' v2', lang, source FROM corpus
        WHERE doc_id % 13 = 2),
    fresh AS (SELECT b.* FROM batch b
              WHERE md5(b.text) NOT IN (SELECT md5(text) FROM corpus)),
    keep AS (SELECT MIN(doc_id) AS doc_id FROM fresh GROUP BY md5(text)),
    dedup AS (SELECT f.* FROM fresh f JOIN keep USING (doc_id))
    SELECT doc_id, lang, source FROM corpus
    WHERE doc_id NOT IN (SELECT doc_id FROM dedup)
    UNION ALL
    SELECT doc_id, lang, source FROM dedup"""


@register(
    "q_incremental_ingest",
    _INGEST_SQL,
    doc="incremental corpus maintenance: a CDC-delivered batch (with "
    "in-batch dupes, already-present content, and UPDATE-shaped rows "
    "reusing existing ids) admitted via hash anti join + batch "
    "exact-dedup, then id-keyed upsert; corpus reduced to hash-width "
    "rows for the content join",
)
def q_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog(spark, sf_dir).documents.select("doc_id", "text", "lang", "source")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    newbies = docs.filter(F.col("doc_id") % 10 == 0)

    def _remap(df: DataFrame, offset: int) -> DataFrame:
        return df.select(
            (F.col("doc_id") + offset).alias("doc_id"), "text", "lang", "source"
        )

    # UPDATE-shaped rows: existing ids, changed text -> must replace
    updates = corpus.filter(F.col("doc_id") % 13 == 2).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" v2")).alias("text"),
        "lang",
        "source",
    )
    batch = (
        newbies.unionByName(_remap(newbies, 1_000_000))
        .unionByName(_remap(corpus.filter(F.col("doc_id") % 7 == 1), 2_000_000))
        .unionByName(updates)
    )
    # checkpoint the DERIVED fixture frames: the operator itself is 3
    # joins, but without a cut Catalyst re-derives the four union
    # branches from the raw scan inside every join arm — the committed
    # plan ballooned to 96 shuffles / 81 scans of plan text (r4 plan
    # audit). One materialized handoff restores the operator's natural
    # plan. (A real CDC batch arrives materialized anyway — the fixture
    # is what's synthetic here, not the operator.)
    out = C.incremental_ingest(
        corpus.localCheckpoint(eager=False), batch.localCheckpoint(eager=False)
    )
    return out.select("doc_id", "lang", "source")


# FLOOR(x*1e6 + 0.5)/1e6, not ROUND: see functions.portable.round_portable
_WSCORE_RAW = (
    "(LEAST(CAST(LENGTH(text) AS DOUBLE) / 500.0, 1.0)"
    " * (CAST(len(list_distinct(w)) AS DOUBLE) / len(w)))"
    " * (0.5 + CAST(len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'to',"
    " 'in', 'is', 'it', 'that', 'for'))) AS DOUBLE) / len(w))"
)
_WSCORE = f"FLOOR(({_WSCORE_RAW}) * 1000000.0 + 0.5) / 1000000.0"
_WBUCKET = (
    "CAST(CONCAT('0x', SUBSTR(MD5('s3' || CAST(doc_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT) % 1000"
)
_WEIGHTED_SQL = f"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w
                              FROM documents),
    q AS (SELECT doc_id, {_WSCORE} AS quality_score FROM t)
    SELECT doc_id, quality_score FROM q
    WHERE {_WBUCKET} < FLOOR(LEAST(GREATEST(quality_score, 0.0), 1.0) * 1000 + 0.5)"""


_SPLIT_SQL = """WITH b AS (
        SELECT doc_id,
               CAST(CONCAT('0x', SUBSTR(MD5('s4' || CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 1000 AS bucket
        FROM documents)
    SELECT doc_id,
           CASE WHEN bucket < 980 THEN 'train'
                WHEN bucket < 990 THEN 'val'
                ELSE 'test' END AS split
    FROM b"""


@register(
    "q_split_assign",
    _SPLIT_SQL,
    doc="deterministic train/val/test split assignment (98/1/1) from "
    "contiguous md5-bucket ranges — membership stable under corpus "
    "growth, so eval sets stay uncontaminated; map-only, zero shuffle",
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sampling import split_assign

    docs = catalog(spark, sf_dir).documents.select("doc_id")
    return split_assign(docs, salt="s4")


@register(
    "q_weighted_sample",
    _WEIGHTED_SQL,
    doc="quality-weighted deterministic sampling: keep probability = "
    "per-doc quality score (md5-bucket Bernoulli, seedable) — the soft "
    "filter between a hard quality cut and keeping everything",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sampling import weighted_sample
    from cdc_system_spark.operators.text import text_quality

    docs = catalog(spark, sf_dir).documents
    scored = text_quality(docs).select("doc_id", "quality_score")
    return weighted_sample(scored, "quality_score", salt="s3")


_QCUT_SQL = f"""WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS w
                             FROM documents),
    q AS (SELECT doc_id, lang, {_WSCORE} AS quality_score FROM t),
    r AS (SELECT *, PERCENT_RANK() OVER (
              PARTITION BY lang ORDER BY quality_score ASC, doc_id ASC) AS pr
          FROM q)
    SELECT doc_id, lang, quality_score FROM r WHERE pr >= 0.2"""


@register(
    "q_quality_cut",
    _QCUT_SQL,
    doc="per-stratum quality-percentile filter: drop each language's "
    "bottom 20% by quality score — the relative quality cut that "
    "doesn't erase whole low-scoring languages; one window shuffle, "
    "deterministic tiebreak",
)
def q_quality_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sampling import quality_percentile_filter
    from cdc_system_spark.operators.text import text_quality

    docs = catalog(spark, sf_dir).documents
    scored = text_quality(docs).select("doc_id", "quality_score")
    with_lang = docs.select("doc_id", "lang").join(scored, "doc_id")
    return quality_percentile_filter(
        with_lang, "quality_score", "lang", min_percentile=0.2
    )


_TEMP_MIX_SQL = """WITH c AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang),
    s AS (SELECT *, ROUND(SQRT(CAST(n_docs AS DOUBLE)), 6) AS w FROM c)
    SELECT lang, n_docs,
        ROUND(w / CAST(SUM(CAST(w AS DECIMAL(25,6))) OVER () AS DOUBLE), 6)
            AS weight,
        CAST(ROUND(w / CAST(SUM(CAST(w AS DECIMAL(25,6))) OVER () AS DOUBLE)
                   * CAST(SUM(n_docs) OVER () AS BIGINT), 0) AS BIGINT)
            AS quota
    FROM s"""


@register(
    "q_temperature_mix",
    _TEMP_MIX_SQL,
    doc="temperature-scaled language mixture (alpha=0.5): sampling "
    "weight proportional to sqrt(n_docs), normalized over a "
    "strata-sized aggregate with a decimal-accumulated sum; the "
    "multilingual rebalancing pass (mT5/XLM-R-style) before sampling",
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sampling import temperature_mix

    return temperature_mix(catalog(spark, sf_dir).documents, "lang", alpha=0.5)


_GLOBAL_SHUFFLE_SQL = """WITH k AS (
        SELECT doc_id,
               CAST(CONCAT('0x', SUBSTR(MD5('s5' || CAST(doc_id AS VARCHAR)),
                   1, 15)) AS BIGINT) AS key
        FROM documents)
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY key % 64, key, doc_id) AS BIGINT)
               AS global_pos
    FROM k"""


@register(
    "q_global_shuffle",
    _GLOBAL_SHUFFLE_SQL,
    doc="deterministic global training order without a global sort: "
    "shard-major two-level numbering (md5 shard + within-shard rank + "
    "broadcast offsets) equivalent to ROW_NUMBER over (key%S, key, id) "
    "but with no single-partition data-sized window",
)
def q_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sampling import global_shuffle

    docs = catalog(spark, sf_dir).documents.select("doc_id")
    out = global_shuffle(docs, salt="s5", num_shards=64)
    return out.select("doc_id", F.col("global_pos").cast("bigint").alias("global_pos"))


_TEMP_SAMPLE_SQL = """WITH c AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang),
    s AS (SELECT *, ROUND(SQRT(CAST(n_docs AS DOUBLE)), 6) AS w FROM c),
    q AS (
        SELECT lang,
            CAST(ROUND(w / CAST(SUM(CAST(w AS DECIMAL(25,6))) OVER () AS DOUBLE)
                       * CAST(SUM(n_docs) OVER () AS BIGINT), 0) AS BIGINT)
                AS quota
        FROM s),
    r AS (
        SELECT d.doc_id, d.lang, q.quota,
               ROW_NUMBER() OVER (
                   PARTITION BY d.lang
                   ORDER BY CAST(CONCAT('0x',
                       SUBSTR(MD5('s6' || CAST(d.doc_id AS VARCHAR)), 1, 15))
                       AS BIGINT) ASC, d.doc_id ASC) AS rk
        FROM documents d JOIN q ON d.lang = q.lang)
    SELECT doc_id, lang FROM r WHERE rk <= quota"""


@register(
    "q_temperature_sample",
    _TEMP_SAMPLE_SQL,
    doc="execute the temperature mixture: per-stratum md5-rank selection "
    "of exactly quota docs (head languages downsample, tail keeps all) "
    "— broadcast quota table onto one window shuffle, top-k with a "
    "data-driven k",
)
def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sampling import temperature_sample

    docs = catalog(spark, sf_dir).documents.select("doc_id", "lang")
    return temperature_sample(docs, "lang", alpha=0.5, salt="s6")


# -- leakage-safe split ------------------------------------------------------
_LSPLIT_SQL = """WITH docs_aug AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents
        WHERE doc_id % 25 = 0),
    g AS (SELECT doc_id,
                 MIN(doc_id) OVER (PARTITION BY md5(text)) AS group_id
          FROM docs_aug),
    b AS (SELECT doc_id, group_id,
               CAST(CONCAT('0x',
                   SUBSTR(MD5('s7' || CAST(group_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 1000 AS bucket
          FROM g)
    SELECT doc_id, group_id,
           CASE WHEN bucket < 980 THEN 'train'
                WHEN bucket < 990 THEN 'val'
                ELSE 'test' END AS split
    FROM b"""


@register(
    "q_leakage_split",
    _LSPLIT_SQL,
    doc="leakage-safe train/val/test split: bucket keyed on the "
    "duplicate-GROUP id (min id per content hash), so every copy of a "
    "document lands in the same split — per-doc hashing puts copies on "
    "both sides of the train/test line; synthetic dupes injected "
    "deterministically to exercise the grouping",
)
def q_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sampling import leakage_safe_split

    docs = catalog(spark, sf_dir).documents.select("doc_id", "text")
    dupes = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    out = leakage_safe_split(docs.unionByName(dupes), salt="s7")
    return out.select("doc_id", "group_id", "split")


# -- near-dup-aware incremental ingest (batch vs corpus LSH) -----------------
from cdc_system_spark.queries.fragments import sig_band_ctes as _sig_band_ctes

_NEARDUP_INGEST_SQL = f"""WITH
    corpus AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
    batch AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
    {_sig_band_ctes("batch", "_a")},
    {_sig_band_ctes("corpus", "_b")},
    cand AS (
        SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
        FROM bands_a x JOIN bands_b y
          ON x.band_idx = y.band_idx AND x.k0 = y.k0 AND x.k1 = y.k1),
    est AS (
        SELECT c.id1, ROUND(({_EST_TERMS}) / 16.0, 6) AS est_jaccard
        FROM cand c
        JOIN sig_a a ON a.doc_id = c.id1
        JOIN sig_b b ON b.doc_id = c.id2),
    rejected AS (SELECT DISTINCT id1 FROM est WHERE est_jaccard >= 0.5),
    admitted AS (SELECT doc_id FROM batch
                 WHERE doc_id NOT IN (SELECT id1 FROM rejected)),
    cand_in AS (
        SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
        FROM bands_a x JOIN bands_a y
          ON x.band_idx = y.band_idx AND x.k0 = y.k0 AND x.k1 = y.k1
             AND x.doc_id < y.doc_id
        WHERE x.doc_id IN (SELECT doc_id FROM admitted)
          AND y.doc_id IN (SELECT doc_id FROM admitted)),
    est_in AS (
        SELECT c.id2, ROUND(({_EST_TERMS}) / 16.0, 6) AS est_jaccard
        FROM cand_in c
        JOIN sig_a a ON a.doc_id = c.id1
        JOIN sig_a b ON b.doc_id = c.id2),
    dropped_in AS (SELECT DISTINCT id2 FROM est_in WHERE est_jaccard >= 0.5)
    SELECT doc_id, lang, source FROM batch
    WHERE doc_id NOT IN (SELECT id1 FROM rejected)
      AND doc_id NOT IN (SELECT id2 FROM dropped_in)"""


@register(
    "q_neardup_ingest",
    _NEARDUP_INGEST_SQL,
    doc="near-dup-aware incremental ingest: MinHash-LSH probe of the "
    "corpus band table with the batch's bands (batch x corpus "
    "candidates only, never corpus x corpus), reject batch docs whose "
    "signature-agreement Jaccard estimate >= 0.5, then dedup the "
    "admitted batch against ITSELF (smaller-id survivor) so two fresh "
    "near-dup twins in one micro-batch can't both accrete — the fuzzy "
    "companion to exact incremental_ingest; at scale the corpus bands "
    "are a maintained bucketed artifact and each sync interval only "
    "probes",
)
def q_neardup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog(spark, sf_dir).documents
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    admitted = C.neardup_ingest(corpus, batch, threshold=0.5)
    return admitted.select("doc_id", "lang", "source")


# -- ingest near-dup report (threshold-tuning observability) ------------------
_INGEST_REPORT_SQL = f"""WITH
    corpus AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
    batch AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
    {_sig_band_ctes("batch", "_a")},
    {_sig_band_ctes("corpus", "_b")},
    cand AS (
        SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
        FROM bands_a x JOIN bands_b y
          ON x.band_idx = y.band_idx AND x.k0 = y.k0 AND x.k1 = y.k1),
    est AS (
        SELECT c.id1, c.id2, ROUND(({_EST_TERMS}) / 16.0, 6) AS est_jaccard
        FROM cand c
        JOIN sig_a a ON a.doc_id = c.id1
        JOIN sig_b b ON b.doc_id = c.id2),
    best AS (
        SELECT id1 AS doc_id, id2 AS best_match, est_jaccard,
               ROW_NUMBER() OVER (
                   PARTITION BY id1
                   ORDER BY est_jaccard DESC, id2 ASC) AS rk
        FROM est)
    SELECT doc_id, best_match, est_jaccard FROM best WHERE rk = 1"""


@register(
    "q_ingest_dup_report",
    _INGEST_REPORT_SQL,
    doc="observability twin of near-dup ingest: each batch doc's best "
    "corpus match with its Jaccard estimate — the distribution a "
    "curator reads BEFORE choosing the admission threshold; argmax is "
    "one window over the candidate-pair-sized frame",
)
def q_ingest_dup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog(spark, sf_dir).documents
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    return C.neardup_ingest_report(corpus, batch)


# -- containment-aware incremental ingest (asymmetric batch vs corpus) --------
def _cbands_sql(sig: str) -> str:
    """1-row-band SELECT over a signature CTE (the containment
    geometry: 16 single-permutation bands — multi-row bands would
    filter out exactly the low-Jaccard/high-containment pairs)."""
    return "\n        UNION ALL ".join(
        f"SELECT doc_id, {i} AS band_idx, h{i} AS k0 FROM {sig}"
        for i in range(16)
    )


_CONTAIN_EC = (
    "FLOOR((sc.m * (c1.n_sh + c2.n_sh))"
    " / CAST((16 + sc.m) * least(c1.n_sh, c2.n_sh) AS DOUBLE)"
    " * 1000000.0 + 0.5) / 1000000.0"
)

_CONTAIN_INGEST_SQL = f"""WITH
    corpus AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
    batch AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
    {_sig_band_ctes("batch", "_a")},
    {_sig_band_ctes("corpus", "_b")},
    cbands_a AS ({_cbands_sql("sig_a")}),
    cbands_b AS ({_cbands_sql("sig_b")}),
    bszb AS (SELECT band_idx, k0, COUNT(*) AS bn
             FROM cbands_b GROUP BY band_idx, k0),
    bounded_b AS (
        SELECT cbands_b.* FROM cbands_b JOIN bszb USING (band_idx, k0)
        WHERE bszb.bn <= 1000),
    cand AS (
        SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
        FROM cbands_a x JOIN bounded_b y
          ON x.band_idx = y.band_idx AND x.k0 = y.k0),
    cnt AS (
        SELECT doc_id,
               CAST(len(list_distinct(list_transform(
                   range(1, greatest(length(text) - 6, 1) + 1),
                   i -> substr(text, i, 7)))) AS BIGINT) AS n_sh
        FROM documents),
    sc AS (
        SELECT c.id1, c.id2, CAST(({_EST_TERMS}) AS BIGINT) AS m
        FROM cand c
        JOIN sig_a a ON a.doc_id = c.id1
        JOIN sig_b b ON b.doc_id = c.id2),
    est AS (
        SELECT sc.id1, sc.id2, c1.n_sh AS n_sh1, c2.n_sh AS n_sh2,
               {_CONTAIN_EC} AS ec
        FROM sc
        JOIN cnt c1 ON c1.doc_id = sc.id1
        JOIN cnt c2 ON c2.doc_id = sc.id2),
    rejected AS (
        SELECT DISTINCT id1 FROM est WHERE ec >= 0.8 AND n_sh1 <= n_sh2),
    admitted AS (SELECT doc_id FROM batch
                 WHERE doc_id NOT IN (SELECT id1 FROM rejected)),
    bsza AS (SELECT band_idx, k0, COUNT(*) AS bn
             FROM cbands_a GROUP BY band_idx, k0),
    bounded_a AS (
        SELECT cbands_a.* FROM cbands_a JOIN bsza USING (band_idx, k0)
        WHERE bsza.bn <= 1000),
    cand_in AS (
        SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
        FROM bounded_a x JOIN bounded_a y
          ON x.band_idx = y.band_idx AND x.k0 = y.k0
             AND x.doc_id < y.doc_id
        WHERE x.doc_id IN (SELECT doc_id FROM admitted)
          AND y.doc_id IN (SELECT doc_id FROM admitted)),
    sc_in AS (
        SELECT c.id1, c.id2, CAST(({_EST_TERMS}) AS BIGINT) AS m
        FROM cand_in c
        JOIN sig_a a ON a.doc_id = c.id1
        JOIN sig_a b ON b.doc_id = c.id2),
    est_in AS (
        SELECT sc.id1, sc.id2, c1.n_sh AS n_sh1, c2.n_sh AS n_sh2,
               {_CONTAIN_EC} AS ec
        FROM sc_in sc
        JOIN cnt c1 ON c1.doc_id = sc.id1
        JOIN cnt c2 ON c2.doc_id = sc.id2),
    dropped_in AS (
        SELECT DISTINCT CASE WHEN n_sh1 < n_sh2 THEN id1
                             WHEN n_sh2 < n_sh1 THEN id2
                             ELSE greatest(id1, id2) END AS doc_id
        FROM est_in WHERE ec >= 0.8)
    SELECT doc_id, lang, source FROM batch
    WHERE doc_id NOT IN (SELECT id1 FROM rejected)
      AND doc_id NOT IN (SELECT doc_id FROM dropped_in)"""


@register(
    "q_containment_ingest",
    _CONTAIN_INGEST_SQL,
    doc="containment-aware incremental ingest (the r8 ingestor gate): "
    "reject batch docs whose estimated containment in an "
    "at-least-as-large corpus doc reaches 0.8 — the quoted-subset "
    "case Jaccard admission misses — then drop the smaller side of "
    "subset pairs arriving in the same batch; 1-row-band batch x "
    "corpus candidates only, corpus-side bucket caps, integer-exact "
    "Broder containment estimate; with a maintained LSH index the "
    "corpus side reads the persisted signature table (zero text)",
)
def q_containment_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog(spark, sf_dir).documents
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    admitted = C.containment_ingest(corpus, batch, threshold=0.8)
    return admitted.select("doc_id", "lang", "source")


# -- token-budget sampling -----------------------------------------------------
_TOKEN_BUDGET_SQL = """WITH t AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
    c AS (SELECT doc_id, lang, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY lang
                   ORDER BY CAST(CONCAT('0x',
                       SUBSTR(MD5('s8' || CAST(doc_id AS VARCHAR)), 1, 15))
                       AS BIGINT) ASC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_tokens
          FROM t)
    SELECT doc_id, lang, n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= 2000"""


@register(
    "q_token_budget",
    _TOKEN_BUDGET_SQL,
    doc="token-budget sampling: greedy md5-order prefix per language "
    "until 2000 tokens — training runs budget TOKENS, not documents "
    "(a doc quota over-draws strata with long docs); one window "
    "shuffle, exact integer cumsum, layout-independent",
)
def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sampling import token_budget_sample

    docs = catalog(spark, sf_dir).documents.select("doc_id", "lang", "text")
    out = token_budget_sample(docs, budget_tokens=2000, salt="s8")
    return out.select("doc_id", "lang", "n_tokens", "cum_tokens")


# -- curation funnel (per-stage retention) -------------------------------------
_FUNNEL_SQL = f"""WITH RECURSIVE
    {_CURATION_CTES},
    c5 AS (SELECT * FROM c4 WHERE {_SAMPLE_PRED})
    SELECT * FROM (
        SELECT 1 AS stage_idx, 'input' AS stage,
               CAST(COUNT(*) AS BIGINT) AS n_docs FROM corpus0
        UNION ALL SELECT 2, 'exact_dedup', CAST(COUNT(*) AS BIGINT) FROM c1
        UNION ALL SELECT 3, 'neardup_clusters', CAST(COUNT(*) AS BIGINT) FROM c2
        UNION ALL SELECT 4, 'quality_filters', CAST(COUNT(*) AS BIGINT) FROM c3
        UNION ALL SELECT 5, 'decontaminated', CAST(COUNT(*) AS BIGINT) FROM c4
        UNION ALL SELECT 6, 'sampled', CAST(COUNT(*) AS BIGINT) FROM c5)"""


@register(
    "q_curation_funnel",
    _FUNNEL_SQL,
    doc="curation retention funnel: survivor count after every pipeline "
    "stage (input -> exact dedup -> near-dup clusters -> quality "
    "filters -> decontamination -> sample) — the first sanity check on "
    "stage thresholds; one extra count reduce per already-materialized "
    "handoff, output is 6 rows",
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog(spark, sf_dir).documents
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return C.curation_funnel(corpus, bench)


# -- packing efficiency ---------------------------------------------------------
_PACK_EFF_SQL = """WITH t AS (
        SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
    c AS (SELECT doc_id, shard, n_tokens,
               CAST(SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
          FROM t),
    p AS (SELECT shard, n_tokens,
               (cum - n_tokens) // 256 AS seq_first,
               (cum - 1) // 256 AS seq_last
          FROM c),
    a AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(MAX(seq_last) + 1 AS BIGINT) AS n_seqs,
               CAST(SUM(CASE WHEN seq_last > seq_first THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_spanning
          FROM p GROUP BY shard)
    SELECT shard, n_docs, n_tokens, n_seqs,
           ROUND(CAST(n_tokens AS DOUBLE) / (n_seqs * 256), 6) AS fill_ratio,
           n_spanning
    FROM a"""


@register(
    "q_packing_efficiency",
    _PACK_EFF_SQL,
    doc="sequence-packing efficiency per shard: context-window fill "
    "ratio + boundary-straddling doc count — the numbers a packing "
    "config (ctx length, shard count) is judged by; one shard-keyed "
    "aggregate over the pack bookkeeping",
)
def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog(spark, sf_dir).documents
    return C.packing_efficiency(docs, ctx_tokens=256, n_shards=8)


# single-row bands (16 bands of 1 permutation): containment pairs have
# low Jaccard by construction, so the 4-row banding would filter them
# out — see containment_pairs' recall note
_CONTAIN_BANDS = """SELECT doc_id, 0 AS band_idx, h0 AS k0 FROM sig
        UNION ALL SELECT doc_id, 1 AS band_idx, h1 AS k0 FROM sig
        UNION ALL SELECT doc_id, 2 AS band_idx, h2 AS k0 FROM sig
        UNION ALL SELECT doc_id, 3 AS band_idx, h3 AS k0 FROM sig
        UNION ALL SELECT doc_id, 4 AS band_idx, h4 AS k0 FROM sig
        UNION ALL SELECT doc_id, 5 AS band_idx, h5 AS k0 FROM sig
        UNION ALL SELECT doc_id, 6 AS band_idx, h6 AS k0 FROM sig
        UNION ALL SELECT doc_id, 7 AS band_idx, h7 AS k0 FROM sig
        UNION ALL SELECT doc_id, 8 AS band_idx, h8 AS k0 FROM sig
        UNION ALL SELECT doc_id, 9 AS band_idx, h9 AS k0 FROM sig
        UNION ALL SELECT doc_id, 10 AS band_idx, h10 AS k0 FROM sig
        UNION ALL SELECT doc_id, 11 AS band_idx, h11 AS k0 FROM sig
        UNION ALL SELECT doc_id, 12 AS band_idx, h12 AS k0 FROM sig
        UNION ALL SELECT doc_id, 13 AS band_idx, h13 AS k0 FROM sig
        UNION ALL SELECT doc_id, 14 AS band_idx, h14 AS k0 FROM sig
        UNION ALL SELECT doc_id, 15 AS band_idx, h15 AS k0 FROM sig"""

_CONTAIN_SQL = f"""WITH sh AS (SELECT doc_id, {SH7} AS s FROM documents),
    hm AS (SELECT doc_id, {_HS} AS hmod FROM sh),
    sig AS (
        SELECT doc_id, {PERMS16}
        FROM hm GROUP BY doc_id),
    bands AS (
        {_CONTAIN_BANDS}),
    bsz AS (SELECT band_idx, k0, COUNT(*) AS bn
            FROM bands GROUP BY band_idx, k0),
    bounded AS (
        SELECT bands.* FROM bands JOIN bsz USING (band_idx, k0)
        WHERE bsz.bn <= 1000),
    lsh_pairs AS (
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        FROM bounded a JOIN bounded b
          ON a.band_idx = b.band_idx AND a.k0 = b.k0
             AND a.doc_id < b.doc_id),
    cnt AS (
        SELECT doc_id,
               CAST(len(list_distinct(list_transform(
                   range(1, greatest(length(text) - 6, 1) + 1),
                   i -> substr(text, i, 7)))) AS BIGINT) AS n_sh
        FROM documents),
    sc AS (
        SELECT p.id1, p.id2, CAST(({_EST_TERMS}) AS BIGINT) AS m
        FROM lsh_pairs p
        JOIN sig a ON a.doc_id = p.id1
        JOIN sig b ON b.doc_id = p.id2)
    SELECT sc.id1, sc.id2, c1.n_sh AS n_sh1, c2.n_sh AS n_sh2,
           ROUND(sc.m / CAST(16 AS DOUBLE), 6) AS est_jaccard,
           FLOOR((sc.m * (c1.n_sh + c2.n_sh))
                 / CAST((16 + sc.m) * least(c1.n_sh, c2.n_sh) AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0
               AS est_containment
    FROM sc
    JOIN cnt c1 ON c1.doc_id = sc.id1
    JOIN cnt c2 ON c2.doc_id = sc.id2"""


@register(
    "q_containment_pairs",
    _CONTAIN_SQL,
    doc="asymmetric containment estimate per LSH candidate pair "
    "(Broder resemblance-vs-containment): |A∩B|/min(|A|,|B|) from the "
    "integer signature match count and distinct-shingle counts — "
    "catches quoted/subset documents symmetric Jaccard misses; all "
    "inputs integer, one double division per output",
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.containment_pairs(
        catalog(spark, sf_dir).documents, k=7, rows_per_band=1
    )


_DROP_CONTAINED_SQL = f"""WITH pairs AS ({_CONTAIN_SQL}),
    drop_ids AS (
        SELECT DISTINCT CASE WHEN n_sh1 < n_sh2 THEN id1
                             WHEN n_sh2 < n_sh1 THEN id2
                             ELSE greatest(id1, id2) END AS doc_id
        FROM pairs WHERE est_containment >= 0.9)
    SELECT d.* FROM documents d
    LEFT JOIN drop_ids USING (doc_id) WHERE drop_ids.doc_id IS NULL"""


# containment-aware leakage-safe split: the containment pair graph
# (quoted-subset docs), closed transitively, becomes the split-group
# frame — oracle = the containment-pair CTE + recursive-CTE connected
# components + the same md5 bucket carving as q_leakage_split
_LSPLIT_CONTAIN_SQL = f"""WITH RECURSIVE pairs AS ({_CONTAIN_SQL}),
    cont AS (SELECT id1, id2 FROM pairs WHERE est_containment >= 0.8),
    edges AS (SELECT id1 AS a, id2 AS b FROM cont
              UNION SELECT id2, id1 FROM cont),
    reach(src, dst) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
    comp AS (SELECT src, LEAST(src, MIN(dst)) AS cluster_id
             FROM reach GROUP BY src),
    g AS (SELECT d.doc_id,
                 COALESCE(c.cluster_id, d.doc_id) AS group_id
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.src),
    b AS (SELECT doc_id, group_id,
               CAST(CONCAT('0x',
                   SUBSTR(MD5('s9' || CAST(group_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 1000 AS bucket
          FROM g)
    SELECT doc_id, group_id,
           CASE WHEN bucket < 980 THEN 'train'
                WHEN bucket < 990 THEN 'val'
                ELSE 'test' END AS split
    FROM b"""


@register(
    "q_leakage_split_containment",
    _LSPLIT_CONTAIN_SQL,
    doc="containment-aware leakage-safe split: the split group is the "
    "connected component of the CONTAINMENT pair graph (est >= 0.8), "
    "so a quoted-subset document — low Jaccard, high containment — "
    "follows its superset page to the same side of the train/test "
    "line; symmetric-Jaccard grouping leaves exactly that leak open",
)
def q_leakage_split_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators.sampling import containment_safe_split

    docs = catalog(spark, sf_dir).documents.select("doc_id", "text")
    out = containment_safe_split(docs, threshold=0.8, k=7, salt="s9")
    return out.select("doc_id", "group_id", "split")


@register(
    "q_containment_maintained",
    _CONTAIN_SQL,
    doc="containment pairs from the MAINTAINED LSH index: build the "
    "persisted signature table (with stored distinct-shingle counts) "
    "on 2/3 of the corpus, ingest the rest incrementally, then run "
    "containment_pairs(signatures=...) with ZERO per-call text passes "
    "— the oracle is the whole-corpus inline recompute, so a green "
    "row proves index-served containment == re-shingled containment",
)
def q_containment_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators import lsh_index as LI
    from cdc_system_spark.queries._maintained import shared_lsh_index

    docs = catalog(spark, sf_dir).documents
    path = shared_lsh_index(spark, sf_dir)
    sigs = LI.lsh_index_signature_tables(
        spark, path, docs, shingle_k=7, num_perms=16
    )
    return D.containment_pairs(docs, k=7, rows_per_band=1, signatures=sigs)


@register(
    "q_leakage_split_maintained",
    _LSPLIT_CONTAIN_SQL,
    doc="containment-aware leakage-safe split served by the maintained "
    "LSH index: identical semantics (and oracle) to "
    "q_leakage_split_containment, but the pair graph derives from the "
    "persisted signature/count table instead of re-shingling the "
    "corpus per call — the recompute was that query's dominant cost. "
    "r8: reads the POST-COMPACT trusted path (assume_covered — zero "
    "corpus text access, not even the live filter's md5 pass; valid "
    "because the shared index is built+ingested over exactly this "
    "corpus with no mutations, the invariant compact_index restores "
    "in the streaming ingestor). The live-filtered load keeps its own "
    "driver coverage via q_containment_maintained",
)
def q_leakage_split_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_system_spark.operators import lsh_index as LI
    from cdc_system_spark.operators.sampling import containment_safe_split
    from cdc_system_spark.queries._maintained import shared_lsh_index

    docs = catalog(spark, sf_dir).documents.select("doc_id", "text")
    path = shared_lsh_index(spark, sf_dir)
    sigs = LI.lsh_index_signature_tables(
        spark, path, docs, shingle_k=7, num_perms=16, assume_covered=True
    )
    out = containment_safe_split(
        docs, threshold=0.8, k=7, salt="s9", signatures=sigs
    )
    return out.select("doc_id", "group_id", "split")


@register(
    "q_drop_contained",
    _DROP_CONTAINED_SQL,
    doc="subset dedup action: drop each doc whose shingle set is "
    "contained (est >= 0.9) in a larger doc, keeping the superset "
    "copy; pair-sized drop-set reduction + corpus anti join",
)
def q_drop_contained(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.drop_contained(
        catalog(spark, sf_dir).documents, threshold=0.9, k=7
    )
