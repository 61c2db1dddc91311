"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media is carried as an opaque ``binary`` column plus typed metadata —
the pattern a 100 TB multimodal corpus uses: parquet rows hold raw bytes
(or object-store pointers), and every per-item transformation runs as an
Arrow-batched ``mapInPandas`` over partition-local pandas frames, so the
decode cost parallelizes with the scan and nothing ever collects to the
driver.

The actual image/audio codecs (PIL, torchaudio, ffmpeg) are NOT in this
environment, so the decode step is **dependency-injected**: callers pass
a codec; the default :class:`FakeCodec` is a deterministic, documented
stand-in that derives every "decoded" attribute purely from the raw
bytes (lengths, first byte, md5), which keeps the whole pipeline
oracle-checkable by an external SQL engine. The Spark-side plumbing —
schemas, binary handling, Arrow batch shapes, partition spread — is
real and tested; swapping in a real codec changes one constructor.

Reference scope note: arya23923/cdc-system has no media surface at all
(its row images are JSON text, cdc_system.py:145-194); this module is
part of the driver-mandated LLM-pipeline extension, not reference parity.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_system_spark.functions.portable import spread

if TYPE_CHECKING:  # pandas only needed executor-side inside the UDFs
    import pandas as pd

KINDS = ["image", "audio", "video"]
FORMATS = {"image": "png", "audio": "wav", "video": "mp4"}

#: Decoded-metadata schema shared by every codec implementation.
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


class FakeCodec:
    """Deterministic stand-in for real media codecs (none in this env).

    Every attribute is a pure function of the raw bytes so an external
    SQL oracle can reproduce it:

    * ``byte_len``  = len(content)
    * ``checksum``  = md5(content) hex
    * first = content[0] (0 for empty)
    * image: width = 16·(1 + byte_len % 64), height = 16·(1 + first % 64)
    * audio: sample_rate = 8000·(1 + first % 6), n_frames = byte_len
    * video: image dims + n_frames = 1 + byte_len % 240
    """

    def decode(self, media_id: int, kind: str, content: bytes) -> dict:
        n = len(content)
        first = content[0] if n else 0
        out = {
            "media_id": media_id,
            "kind": kind,
            "byte_len": n,
            "checksum": hashlib.md5(content).hexdigest(),
            "width": None,
            "height": None,
            "sample_rate": None,
            "n_frames": None,
        }
        if kind in ("image", "video"):
            out["width"] = 16 * (1 + n % 64)
            out["height"] = 16 * (1 + first % 64)
        if kind == "audio":
            out["sample_rate"] = 8000 * (1 + first % 6)
            out["n_frames"] = n
        elif kind == "video":
            out["n_frames"] = 1 + n % 240
        elif kind == "image":
            out["n_frames"] = 1
        return out

    #: dHash width: 48 gradient bits keeps the hash positive in int64
    #: everywhere (bit 63 would flip sign in Spark/DuckDB BIGINT)
    DHASH_BITS = 48

    def dhash(self, kind: str, content: bytes) -> int:
        """Difference-hash stand-in: 48 gradient bits over evenly-spaced
        payload bytes — bit i is set iff byte[(i·n)//49] > byte
        [((i+1)·n)//49]. A real image dHash decodes pixels, resamples to
        9×8 grayscale and takes horizontal gradients; this is the same
        gradient construction over the raw bytes, a pure bytes function
        an external SQL oracle reproduces with ``ascii(substr(...))``.
        Small payload edits flip few bits — the property banded Hamming
        search needs."""
        n = len(content)
        if n == 0:
            return 0
        h = 0
        for i in range(self.DHASH_BITS):
            a = content[(i * n) // (self.DHASH_BITS + 1)]
            b = content[((i + 1) * n) // (self.DHASH_BITS + 1)]
            if a > b:
                h |= 1 << i
        return h

    def resize(self, kind: str, content: bytes, width: int, height: int) -> bytes:
        """Deterministic "resize" stand-in: crop the payload to a length
        proportional to the target pixel count (``width·height/256``
        bytes, min 1) — a pure bytes→bytes function an external SQL
        oracle reproduces with ``substr``. A real codec decodes pixels
        and resamples; the Spark plumbing around it is identical.
        """
        cap = max(1, (width * height) // 256)
        return content[:cap]


class RealCodecUnavailable(NotImplementedError):
    """Raised by pixel-level ops that need an actual image/audio library."""


def synthesize_media(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic media table from the documents corpus.

    The corpus is ASCII text; its UTF-8 bytes become the opaque payload
    (``content: binary``), and ``kind`` cycles image/audio/video by id.
    This is the test stand-in for a real ingest that reads media files —
    the downstream operators see exactly the schema they'd see in
    production: (media_id, kind, format, content, byte_len).
    """
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.col(id_col) % 3 + 1).cast("int")
    )
    fmt = F.element_at(
        F.array(*[F.lit(FORMATS[k]) for k in KINDS]), (F.col(id_col) % 3 + 1).cast("int")
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        fmt.alias("format"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("byte_len"),
    )


def decode_media(media: DataFrame, codec: FakeCodec | None = None) -> DataFrame:
    """Arrow-batched decode: (media_id, kind, content) → typed metadata.

    ``mapInPandas`` receives an iterator of pandas frames (one per Arrow
    batch) and yields frames matching :data:`DECODED_SCHEMA` — the shape
    a real decoder uses: per-batch library calls, columnar in/out, no
    per-row Python round trips through the JVM.
    """
    codec = codec or FakeCodec()

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = [
                codec.decode(int(m), str(k), bytes(c) if c is not None else b"")
                for m, k, c in zip(pdf["media_id"], pdf["kind"], pdf["content"])
            ]
            out = pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])
            for c in ("width", "height", "sample_rate", "n_frames"):
                out[c] = out[c].astype("Int32")
            yield out

    return spread(media).select("media_id", "kind", "content").mapInPandas(
        batches, schema=DECODED_SCHEMA
    )


_HIST_BINS = 8
HIST_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("hist", T.ArrayType(T.DoubleType())),
    ]
)


def byte_histogram(media: DataFrame, bins: int = _HIST_BINS) -> DataFrame:
    """Feature extraction: normalized byte-value histogram per item.

    A real pipeline would emit CLIP/wav2vec embeddings here; the byte
    histogram exercises the identical plumbing (binary → fixed-length
    ``array<double>`` feature vector via vectorized numpy inside
    ``mapInPandas``) while staying library-free and oracle-checkable.
    Bins split the 0–255 byte range evenly; ratios are rounded to 1e-6
    for cross-engine float stability.
    """
    width = 256 // bins

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, lens, hists = [], [], []
            for m, c in zip(pdf["media_id"], pdf["content"]):
                buf = np.frombuffer(bytes(c) if c is not None else b"", dtype=np.uint8)
                counts = np.bincount(buf // width, minlength=bins)[:bins]
                total = max(len(buf), 1)
                ids.append(int(m))
                lens.append(len(buf))
                # round half-up (not banker's): SQL ROUND semantics, so
                # exact ties like 105/128 = 0.8203125 match the oracle
                hists.append(
                    [float(np.floor(x / total * 1e6 + 0.5) / 1e6) for x in counts]
                )
            yield pd.DataFrame({"media_id": ids, "byte_len": lens, "hist": hists})

    return spread(media).select("media_id", "content").mapInPandas(
        batches, schema=HIST_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def frame_sample(
    media: DataFrame, frame_bytes: int = 32, stride: int = 4
) -> DataFrame:
    """Frame sampling: split payload into fixed windows, keep every
    ``stride``-th, emit one row per kept frame (1→N fan-out inside
    ``mapInPandas`` — the batch-iterator contract allows output frames
    longer than the input batch, which is exactly what video frame
    extraction produces at scale).
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, idxs, md5s = [], [], []
            for m, c in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(c) if c is not None else b""
                n_chunks = max(math.ceil(len(buf) / frame_bytes), 1)
                for i in range(0, n_chunks, stride):
                    ids.append(int(m))
                    idxs.append(i)
                    md5s.append(
                        hashlib.md5(buf[i * frame_bytes : (i + 1) * frame_bytes]).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return spread(media).select("media_id", "content").mapInPandas(
        batches, schema=FRAME_SCHEMA
    )


class RealImageCodec:
    """Pixel-level codec — requires an actual image library (PIL).

    The container ships no PIL/opencv, so construction raises
    :class:`RealCodecUnavailable`; in a real deployment the methods hold
    the actual decode/resample calls and everything downstream
    (:func:`resize_images`) is unchanged.
    """

    def __init__(self) -> None:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:
            raise RealCodecUnavailable(
                "RealImageCodec needs an image library (PIL); none is "
                "installed. Use FakeCodec (the default) for the plumbing."
            ) from exc
        raise RealCodecUnavailable(
            "real-codec path intentionally unimplemented in this build"
        )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_len", T.LongType()),
        T.StructField("out_md5", T.StringType()),
    ]
)


def resize_images(
    media: DataFrame, width: int, height: int, codec: FakeCodec | None = None
) -> DataFrame:
    """Resize every ``image``-kind payload to ``width×height`` via the
    injected codec; emits the resized payload's length and checksum.

    Same dependency-injection contract as :func:`decode_media`: the
    default :class:`FakeCodec` crops bytes deterministically (so the
    result is oracle-checkable); pass :class:`RealImageCodec` (or any
    object with ``resize(kind, content, w, h) -> bytes``) for real
    pixels. ``mapInPandas`` keeps the bytes→bytes work Arrow-batched and
    partition-local — at 100 TB the resize cost rides the scan, nothing
    collects.
    """
    codec = codec or FakeCodec()

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, lens, md5s = [], [], []
            for m, k, c in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                out = codec.resize(str(k), bytes(c) if c is not None else b"", width, height)
                ids.append(int(m))
                lens.append(len(out))
                md5s.append(hashlib.md5(out).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series([width] * len(ids), dtype="int32"),
                    "height": pd.Series([height] * len(ids), dtype="int32"),
                    "out_len": pd.Series(lens, dtype="int64"),
                    "out_md5": pd.Series(md5s, dtype="object"),
                }
            )

    imgs = media.filter(F.col("kind") == "image")
    return spread(imgs).select("media_id", "kind", "content").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("mean_amp", T.DoubleType()),
        T.StructField("peak_amp", T.IntegerType()),
    ]
)


def audio_features(media: DataFrame, window: int = 32) -> DataFrame:
    """Audio feature extraction: windowed loudness profile per clip —
    the framing/energy pass VAD, silence trimming, and loudness
    normalization all start from. Payload bytes are treated as 8-bit
    PCM samples (the FakeCodec contract: deterministic, numpy-exact,
    oracle-checkable); a real pipeline would swap in torchaudio frames
    here without touching the plumbing. One row per fixed-size window:
    mean and peak amplitude, vectorized numpy per Arrow batch.

    Same 1→N fan-out contract as :func:`frame_sample`; audio-kind rows
    only, filter pushed to the scan. Mean is round-half-up to 1e-6 so
    an external SQL engine reproduces it exactly (exact int sum / int
    width, one double division).
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, idxs, ns, means, peaks = [], [], [], [], []
            for m, c in zip(pdf["media_id"], pdf["content"]):
                buf = np.frombuffer(bytes(c) if c is not None else b"", dtype=np.uint8)
                n_win = max(math.ceil(len(buf) / window), 1)
                for i in range(n_win):
                    w = buf[i * window : (i + 1) * window]
                    total = int(w.sum())
                    n = max(len(w), 1)
                    ids.append(int(m))
                    idxs.append(i)
                    ns.append(len(w))
                    means.append(math.floor(total / n * 1e6 + 0.5) / 1e6)
                    peaks.append(int(w.max()) if len(w) else 0)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(idxs, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "mean_amp": pd.Series(means, dtype="float64"),
                    "peak_amp": pd.Series(peaks, dtype="int32"),
                }
            )

    clips = media.filter(F.col("kind") == "audio")
    return spread(clips).select("media_id", "content").mapInPandas(
        batches, schema=AUDIO_FEATURE_SCHEMA
    )


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def image_dhash(media: DataFrame, codec: FakeCodec | None = None) -> DataFrame:
    """Per-image perceptual fingerprint via the injected codec's
    ``dhash`` (Arrow-batched, same plumbing as :func:`decode_media`).
    With a real codec this is decode → 9×8 grayscale → gradient bits;
    the FakeCodec computes the documented byte-gradient stand-in.
    """
    codec = codec or FakeCodec()

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": [int(m) for m in pdf["media_id"]],
                    "dhash": [
                        codec.dhash(
                            str(k), bytes(c) if c is not None else b""
                        )
                        for k, c in zip(pdf["kind"], pdf["content"])
                    ],
                }
            )

    return spread(media).select("media_id", "kind", "content").mapInPandas(
        batches, schema=DHASH_SCHEMA
    )


def image_neardup_pairs(
    media: DataFrame,
    codec: FakeCodec | None = None,
    n_bands: int = 8,
    max_hamming: int = 4,
) -> DataFrame:
    """Image near-duplicate pairs: dHash fingerprints + pigeonhole-banded
    Hamming search — the visual twin of SimHash text dedup (re-encoded /
    lightly-cropped copies of the same image hash within a few bits; a
    multimodal corpus dedups them exactly like near-dup text). Candidates
    come from 6-bit band buckets, never an all-pairs scan; exact
    ``bit_count(xor)`` rescore of candidates only.
    """
    from cdc_system_spark.operators.dedup import hamming_band_pairs

    sigs = image_dhash(media.filter(F.col("kind") == "image"), codec)
    return hamming_band_pairs(
        sigs,
        "dhash",
        id_col="media_id",
        bits=FakeCodec.DHASH_BITS,
        n_bands=n_bands,
        max_hamming=max_hamming,
    )


def scene_changes(
    media: DataFrame,
    frame_bytes: int = 32,
    stride: int = 1,
    max_hamming: int = 16,
) -> DataFrame:
    """Scene-change detection over the sampled frame stream: one row
    per consecutive frame pair ``(media_id, frame_idx, prev_idx,
    hamming, is_cut)`` where ``hamming`` compares the two frames'
    64-bit dHash-style fingerprints and ``is_cut`` flags distances
    above ``max_hamming`` — the shot-boundary pass a video curation
    pipeline runs before per-scene sampling or caption alignment.

    Spark shape: frame fingerprints ride the :func:`frame_sample`
    Arrow pass (md5 of the frame window, folded to 64 bits — the
    deterministic fake-codec contract; a real pipeline swaps in a
    perceptual dHash per decoded frame, same columns); the
    consecutive-pair compare is one LAG window PARTITIONED BY media_id
    (per-video state only, never a global order), and the popcount is
    a builtin bit_count — zero Python in the compare path.
    """
    frames = frame_sample(media, frame_bytes=frame_bytes, stride=stride)
    from pyspark.sql import Window

    fp = frames.withColumn(
        "_fp",
        F.conv(F.substring("frame_md5", 1, 15), 16, 10).cast("long"),
    )
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    paired = (
        fp.withColumn("_prev_fp", F.lag("_fp").over(w))
        .withColumn("prev_idx", F.lag("frame_idx").over(w))
        .filter(F.col("_prev_fp").isNotNull())
    )
    hamming = F.bit_count(
        F.col("_fp").bitwiseXOR(F.col("_prev_fp"))
    ).cast("int")
    return paired.select(
        "media_id",
        "frame_idx",
        "prev_idx",
        hamming.alias("hamming"),
        (hamming > max_hamming).alias("is_cut"),
    )
