"""Maintained MinHash-LSH index artifact: persisted (signatures, bands).

The third member of the maintained-artifact family (``sketch.py``
``hll_state``/``hll_merge``; ``ann_index.py`` frozen centroids +
incremental assignments). The ad-hoc near-dup admission path
(:func:`~cdc_system_spark.operators.curation.neardup_ingest`) shingles
and MinHashes the WHOLE corpus on every micro-batch — at 100 TB the
corpus signature pass is the expensive side of every batch probe and it
is re-done per sync interval, even though admitted documents never
change their signatures. Here the corpus side runs ONCE at build time,
is persisted as tables, and is maintained *incrementally*: only NEW
documents are shingled/hashed on ingest, and the batch probe joins the
batch's bands against the stored posting table.

On-disk layout under ``path``:

- ``{path}/meta`` — one row ``(shingle_k, num_perms, rows_per_band)``:
  the index's frozen hash geometry. Every ingest/load validates against
  it — probing a 16-perm index with 8-perm batch signatures would
  silently produce garbage candidates, so mismatches raise instead.
- ``{path}/signatures`` — ``(id, h0..h{p-1})``, one row per indexed
  doc. Feeds the Jaccard-estimate rescore (signature agreement only —
  the stored corpus text is never re-read by a probe).
- ``{path}/bands`` — ``(id, band_idx, k0, k1, …)``, the exploded LSH
  posting table (``dedup._band_table`` shape, int64-packed keys). On a
  cluster this table is bucketed on the band key columns so a batch
  probe co-locates with the postings; plain parquet here (bucketing
  needs a metastore), and the probe's shuffle is batch-band-sized
  either way — the corpus postings shuffle at most once per probe, and
  zero times when bucketed.

Replay safety: ingest anti-joins on already-indexed ids (reading ONLY
the id column — parquet prunes the signature bytes), so a re-delivered
batch is a no-op — the same idempotence contract as
``streaming/ingest.py``'s batch markers and ``ann_index_ingest``.

Reference parity: the reference keeps its change-log lookup structures
current on every write (``cdc_system.py:143-197``); this is the
near-duplicate-detection equivalent — the index artifact is maintained
by the ingest path, not rebuilt by the query path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cdc_system_spark.operators.dedup import _band_table, minhash_signatures

__all__ = [
    "lsh_index_build",
    "lsh_index_ingest",
    "lsh_index_load",
]


def _meta_path(path: str) -> str:
    return f"{path}/meta"


def _sig_path(path: str) -> str:
    return f"{path}/signatures"


def _band_path(path: str) -> str:
    return f"{path}/bands"


def _read_meta(spark: SparkSession, path: str) -> tuple[int, int, int, str]:
    row = spark.read.parquet(_meta_path(path)).collect()[0]
    return (
        int(row["shingle_k"]),
        int(row["num_perms"]),
        int(row["rows_per_band"]),
        str(row["id_col"]),
    )


def lsh_index_build(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 7,
    num_perms: int = 16,
    rows_per_band: int = 4,
) -> int:
    """Build the index: MinHash the corpus once, persist signatures +
    exploded band postings + the frozen hash geometry. Returns the
    number of documents indexed.

    One signature pass + one band explode + two writes — the same work
    ``neardup_ingest`` spends on the corpus side of a SINGLE probe,
    spent once.
    """
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(shingle_k, num_perms, rows_per_band, id_col)],
        "shingle_k int, num_perms int, rows_per_band int, id_col string",
    ).write.mode("overwrite").parquet(_meta_path(path))
    sigs = minhash_signatures(
        corpus, text_col, id_col, k=shingle_k, num_perms=num_perms
    ).localCheckpoint(eager=False)
    sigs.write.mode("overwrite").parquet(_sig_path(path))
    # derive bands from the WRITTEN signatures: no re-hash of the text
    stored = spark.read.parquet(_sig_path(path))
    _band_table(stored, id_col, num_perms, rows_per_band).write.mode(
        "overwrite"
    ).parquet(_band_path(path))
    return stored.count()


def lsh_index_ingest(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str | None = None,
) -> int:
    """Incrementally maintain the index: shingle/hash ONLY the new
    documents under the frozen geometry and append their signatures and
    band postings. Returns documents admitted.

    Replay-safe: the anti-join on already-indexed ids makes a
    re-delivered batch a no-op. The corpus is never re-read beyond the
    id column, never re-hashed.
    """
    spark = new_docs.sparkSession
    shingle_k, num_perms, rows_per_band, meta_id = _read_meta(spark, path)
    id_col = id_col or meta_id
    if id_col != meta_id:
        raise ValueError(
            f"index at {path} was built on id column {meta_id!r}, got {id_col!r}"
        )
    existing = spark.read.parquet(_sig_path(path)).select(id_col)
    fresh = new_docs.select(id_col, text_col).join(existing, id_col, "left_anti")
    sigs = minhash_signatures(
        fresh, text_col, id_col, k=shingle_k, num_perms=num_perms
    ).localCheckpoint(eager=True)
    n = sigs.count()
    if n:
        sigs.write.mode("append").parquet(_sig_path(path))
        _band_table(sigs, id_col, num_perms, rows_per_band).write.mode(
            "append"
        ).parquet(_band_path(path))
    return n


def lsh_index_load(
    spark: SparkSession,
    path: str,
    num_perms: int | None = None,
    rows_per_band: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(signatures, bands) as DataFrames, geometry-validated.

    Pass the ``num_perms``/``rows_per_band`` the consumer will probe
    with to assert they match the index's frozen geometry (a mismatch
    raises here, at load, instead of producing silently-empty band
    joins downstream).
    """
    shingle_k, p, rpb, _ = _read_meta(spark, path)
    if num_perms is not None and num_perms != p:
        raise ValueError(f"index at {path} has num_perms={p}, caller wants {num_perms}")
    if rows_per_band is not None and rows_per_band != rpb:
        raise ValueError(
            f"index at {path} has rows_per_band={rpb}, caller wants {rows_per_band}"
        )
    return (
        spark.read.parquet(_sig_path(path)),
        spark.read.parquet(_band_path(path)),
    )
