"""Multimodal-column queries: binary payloads through mapInPandas.

The media table is synthesized deterministically from ``documents``
(ASCII text → UTF-8 bytes), so every byte-level result the Arrow-batched
pandas operators produce is reproducible by the DuckDB oracle with plain
string functions (byte == character for this corpus). The decode step
runs through :class:`~cdc_system_spark.operators.multimodal.FakeCodec` —
a documented deterministic stand-in, since no image/audio library ships
in this environment; the Spark plumbing (binary columns, mapInPandas
batch iterators, 1→N frame fan-out, typed nullable metadata) is the real
production shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_system_spark.operators import multimodal as M
from cdc_system_spark.queries.base import catalog, register

# DuckDB twin of synthesize_media's kind/format assignment
_KIND = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)
_FMT = "CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END"


@register(
    "q_media_catalog",
    f"""SELECT doc_id AS media_id, {_KIND} AS kind, {_FMT} AS format,
           CAST(LENGTH(text) AS BIGINT) AS byte_len
    FROM documents""",
    doc="binary media table synthesis: opaque content + typed metadata",
)
def q_media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synthesize_media(catalog(spark, sf_dir).documents)
    return media.select("media_id", "kind", "format", "byte_len")


_DECODE_SQL = f"""WITH m AS (
        SELECT doc_id AS media_id, {_KIND} AS kind,
               LENGTH(text) AS n, ascii(substr(text, 1, 1)) AS first,
               md5(text) AS checksum
        FROM documents)
    SELECT media_id, kind, CAST(n AS BIGINT) AS byte_len, checksum,
           CAST(CASE WHEN kind IN ('image', 'video') THEN 16 * (1 + n % 64) END
                AS INTEGER) AS width,
           CAST(CASE WHEN kind IN ('image', 'video') THEN 16 * (1 + first % 64) END
                AS INTEGER) AS height,
           CAST(CASE WHEN kind = 'audio' THEN 8000 * (1 + first % 6) END
                AS INTEGER) AS sample_rate,
           CAST(CASE WHEN kind = 'audio' THEN n
                     WHEN kind = 'video' THEN 1 + n % 240
                     WHEN kind = 'image' THEN 1 END AS INTEGER) AS n_frames
    FROM m"""


@register(
    "q_media_decode",
    _DECODE_SQL,
    doc="Arrow-batched decode via mapInPandas + FakeCodec (deterministic stub)",
)
def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synthesize_media(catalog(spark, sf_dir).documents)
    return M.decode_media(media)


_HIST_SQL = """WITH m AS (
        SELECT doc_id AS media_id, string_split(text, '') AS ch,
               LENGTH(text) AS n
        FROM documents)
    SELECT media_id, CAST(n AS BIGINT) AS byte_len,
           CAST(b AS INTEGER) AS bin,
           ROUND(CAST(len(list_filter(ch, c -> ascii(c) // 32 = b)) AS DOUBLE)
                 / GREATEST(n, 1), 6) AS ratio
    FROM m, unnest(range(0, 8)) AS t(b)"""


@register(
    "q_media_byte_histogram",
    _HIST_SQL,
    doc="binary → fixed-length feature vector (numpy inside mapInPandas), flattened",
)
def q_media_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synthesize_media(catalog(spark, sf_dir).documents)
    hist = M.byte_histogram(media, bins=8)
    return hist.select(
        "media_id", "byte_len", F.posexplode("hist").alias("bin", "ratio")
    )


_FRAME_SQL = """WITH m AS (
        SELECT doc_id AS media_id, text,
               CAST(ceil(LENGTH(text) * 1.0 / 32) AS BIGINT) AS n_chunks
        FROM documents)
    SELECT media_id, CAST(i AS INTEGER) AS frame_idx,
           md5(substr(text, CAST(i * 32 + 1 AS INTEGER), 32)) AS frame_md5
    FROM m, unnest(range(0, GREATEST(n_chunks, 1), 4)) AS t(i)"""


@register(
    "q_frame_sample",
    _FRAME_SQL,
    doc="1→N frame fan-out inside mapInPandas: 32-byte windows, stride 4",
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synthesize_media(catalog(spark, sf_dir).documents)
    return M.frame_sample(media, frame_bytes=32, stride=4)


# FakeCodec.resize crops to width·height/256 bytes: 64×48 → 12
_RESIZE_CAP = max(1, (64 * 48) // 256)
_RESIZE_SQL = f"""SELECT doc_id AS media_id,
           CAST(64 AS INTEGER) AS width, CAST(48 AS INTEGER) AS height,
           CAST(LENGTH(substr(text, 1, {_RESIZE_CAP})) AS BIGINT) AS out_len,
           md5(substr(text, 1, {_RESIZE_CAP})) AS out_md5
    FROM documents WHERE doc_id % 3 = 0"""


@register(
    "q_resize_images",
    _RESIZE_SQL,
    doc="codec-injected image resize (FakeCodec deterministic crop): "
    "bytes->bytes mapInPandas over image-kind payloads",
)
def q_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synthesize_media(catalog(spark, sf_dir).documents)
    return M.resize_images(media, width=64, height=48)


_AUDIO_SQL = """WITH m AS (
        SELECT doc_id AS media_id, text, LENGTH(text) AS n,
               CAST(ceil(LENGTH(text) * 1.0 / 32) AS BIGINT) AS n_win
        FROM documents WHERE doc_id % 3 = 1),
    w AS (
        SELECT media_id, CAST(i AS INTEGER) AS window_idx,
               list_transform(string_split(
                   substr(text, CAST(i * 32 + 1 AS INTEGER), 32), ''),
                   c -> ascii(c)) AS s
        FROM m, unnest(range(0, GREATEST(n_win, 1))) AS t(i))
    SELECT media_id, window_idx,
           CAST(len(s) AS INTEGER) AS n_samples,
           FLOOR(CAST(list_sum(s) AS DOUBLE)
                 / GREATEST(len(s), 1) * 1e6 + 0.5) / 1e6 AS mean_amp,
           CAST(COALESCE(list_max(s), 0) AS INTEGER) AS peak_amp
    FROM w"""


@register(
    "q_audio_features",
    _AUDIO_SQL,
    doc="audio feature extraction: windowed mean/peak amplitude over "
    "bytes-as-8-bit-PCM (FakeCodec contract), numpy per Arrow batch, "
    "1->N window fan-out inside mapInPandas",
)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synthesize_media(catalog(spark, sf_dir).documents)
    return M.audio_features(media, window=32)


# -- image near-duplicate pairs (dHash + banded Hamming) ----------------------
_DHASH_SQL = """WITH docs_aug AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 25 = 0
        UNION ALL
        SELECT doc_id + 2000000, 'Z' || substr(text, 2)
        FROM documents WHERE doc_id % 25 = 0),
    d AS (
        SELECT doc_id AS media_id, text, LENGTH(text) AS n
        FROM docs_aug WHERE LENGTH(text) >= 1),
    h AS (SELECT media_id,
               CAST(list_sum(list_transform(range(0, 48),
                   i -> CASE WHEN ascii(substr(text, CAST(1 + (i * n) // 49 AS INTEGER), 1))
                               > ascii(substr(text, CAST(1 + ((i + 1) * n) // 49 AS INTEGER), 1))
                        THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS dh
          FROM d),
    bands AS (SELECT media_id, dh, b AS band_idx, (dh >> CAST(6 * b AS INTEGER)) & 63 AS val
              FROM h, unnest(range(0, 8)) AS t(b)),
    cand AS (SELECT DISTINCT a.media_id AS id1, b.media_id AS id2,
                    a.dh AS s1, b.dh AS s2
             FROM bands a JOIN bands b
               ON a.band_idx = b.band_idx AND a.val = b.val
                  AND a.media_id < b.media_id)
    SELECT id1, id2, CAST(bit_count(xor(s1, s2)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(s1, s2)) <= 4"""


@register(
    "q_image_neardup",
    _DHASH_SQL,
    doc="image near-duplicate pairs: 48-bit dHash fingerprints via the "
    "injected codec (Arrow-batched; a real codec would decode pixels "
    "and take 9x8 gradients) + pigeonhole-banded Hamming search "
    "(8 six-bit bands, max_hamming 4) with exact bit_count(xor) "
    "rescore of candidates only — the visual twin of SimHash dedup; "
    "deterministic re-encoded copies injected to exercise the match",
)
def q_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # inject deterministic re-encodes: exact byte copies (+1e6 ids) and
    # length-preserving single-byte edits (+2e6 ids) — the corpus's
    # seeded TEXT near-dups change payload length, which legitimately
    # shifts the sampled byte grid, so the guaranteed visual dupes are
    # seeded here (and any organic ones are caught too)
    docs = catalog(spark, sf_dir).documents.select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 25 == 0)
    aug = (
        docs.unionByName(
            copies.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
        )
        .unionByName(
            copies.select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(F.lit("Z"), F.expr("substr(text, 2)")).alias("text"),
            )
        )
        .filter(F.octet_length(F.col("text")) >= 1)
    )
    media = aug.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    return M.image_neardup_pairs(media)


_SCENE_SQL = """WITH m AS (
        SELECT doc_id AS media_id, text,
               CAST(ceil(LENGTH(text) * 1.0 / 32) AS BIGINT) AS n_chunks
        FROM documents),
    f AS (SELECT media_id, CAST(i AS INTEGER) AS frame_idx,
               CAST(CONCAT('0x', SUBSTR(
                   md5(substr(text, CAST(i * 32 + 1 AS INTEGER), 32)),
                   1, 15)) AS BIGINT) AS fp
          FROM m, unnest(range(0, GREATEST(n_chunks, 1), 1)) AS t(i)),
    p AS (SELECT media_id, frame_idx, fp,
               LAG(fp) OVER (PARTITION BY media_id
                             ORDER BY frame_idx) AS pfp,
               LAG(frame_idx) OVER (PARTITION BY media_id
                                    ORDER BY frame_idx) AS prev_idx
          FROM f)
    SELECT media_id, frame_idx, CAST(prev_idx AS INTEGER) AS prev_idx,
           CAST(bit_count(xor(fp, pfp)) AS INTEGER) AS hamming,
           bit_count(xor(fp, pfp)) > 16 AS is_cut
    FROM p WHERE pfp IS NOT NULL"""


@register(
    "q_scene_changes",
    _SCENE_SQL,
    doc="video shot-boundary detection: per-frame 64-bit fingerprints "
    "ride the frame_sample Arrow pass, consecutive-pair Hamming via "
    "one LAG window PARTITIONED BY media_id (per-video state only, "
    "never a global order) and builtin bit_count — cuts flagged above "
    "the distance threshold; the pre-pass for per-scene sampling / "
    "caption alignment in video curation",
)
def q_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.synthesize_media(catalog(spark, sf_dir).documents)
    return M.scene_changes(media, frame_bytes=32, stride=1, max_hamming=16)
