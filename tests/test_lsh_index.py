"""Maintained MinHash-LSH index artifact: build/ingest/load parity with
the ad-hoc recompute path, replay idempotence, geometry validation, and
the neardup_ingest maintained-corpus substitution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_system_spark.operators import lsh_index as LI
from cdc_system_spark.operators.curation import neardup_ingest
from cdc_system_spark.operators.dedup import _band_table, minhash_signatures
from cdc_system_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_build_matches_adhoc_signatures(spark, docs, tmp_path):
    # index built over the corpus must agree with minhash_signatures
    # row for row — the contract that makes corpus_sigs= a pure
    # skip-the-recompute substitution
    path = str(tmp_path / "idx")
    n = LI.lsh_index_build(docs, path)
    assert n == docs.count()
    sigs, bands = LI.lsh_index_load(spark, path)
    adhoc = minhash_signatures(docs, k=7, num_perms=16)
    assert _rows(sigs) == _rows(adhoc)
    assert _rows(bands) == _rows(_band_table(adhoc, "doc_id", 16, 4))


def test_incremental_ingest_matches_full_recompute(spark, docs, tmp_path):
    # build on 2/3, ingest the remaining third: maintained tables ==
    # one-shot recompute over the FULL corpus (the hash geometry is
    # frozen, so incremental == batch exactly)
    path = str(tmp_path / "idx")
    LI.lsh_index_build(docs.filter("doc_id % 3 <> 0"), path)
    n = LI.lsh_index_ingest(docs.filter("doc_id % 3 = 0"), path)
    assert n == docs.filter("doc_id % 3 = 0").count()
    sigs, bands = LI.lsh_index_load(spark, path)
    full = minhash_signatures(docs, k=7, num_perms=16)
    assert _rows(sigs) == _rows(full)
    assert _rows(bands) == _rows(_band_table(full, "doc_id", 16, 4))


def test_ingest_replay_is_noop(spark, docs, tmp_path):
    path = str(tmp_path / "idx")
    LI.lsh_index_build(docs.filter("doc_id % 3 <> 0"), path)
    batch = docs.filter("doc_id % 3 = 0")
    assert LI.lsh_index_ingest(batch, path) == batch.count()
    # re-delivery: anti-join replay guard admits nothing, tables stable
    assert LI.lsh_index_ingest(batch, path) == 0
    sigs, bands = LI.lsh_index_load(spark, path)
    assert sigs.count() == docs.count()
    assert bands.count() == 4 * docs.count()


def test_geometry_validation(spark, docs, tmp_path):
    path = str(tmp_path / "idx")
    LI.lsh_index_build(docs.limit(20), path, num_perms=8, rows_per_band=4)
    with pytest.raises(ValueError, match="num_perms"):
        LI.lsh_index_load(spark, path, num_perms=16)
    with pytest.raises(ValueError, match="rows_per_band"):
        LI.lsh_index_load(spark, path, num_perms=8, rows_per_band=2)
    with pytest.raises(ValueError, match="id column"):
        LI.lsh_index_ingest(docs.limit(5), path, id_col="other_id")


def test_neardup_ingest_accepts_maintained_corpus(spark, docs, tmp_path):
    # the 100-TB path: probe against the persisted index instead of
    # re-hashing the corpus — admitted set must be ROW-IDENTICAL to the
    # inline-recompute path
    corpus = docs.filter("doc_id % 5 <> 0")
    batch = docs.filter("doc_id % 5 = 0").limit(60)
    path = str(tmp_path / "idx")
    LI.lsh_index_build(corpus, path)
    sigs, bands = LI.lsh_index_load(spark, path, num_perms=16, rows_per_band=4)
    inline = neardup_ingest(corpus, batch, shingle_k=7, num_perms=16)
    via_index = neardup_ingest(
        corpus, batch, shingle_k=7, num_perms=16,
        corpus_sigs=sigs, corpus_bands=bands,
    )
    assert _rows(via_index.select("doc_id")) == _rows(inline.select("doc_id"))
