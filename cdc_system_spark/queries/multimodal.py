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
