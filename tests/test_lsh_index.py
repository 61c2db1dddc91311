"""Maintained MinHash-LSH index artifact: build/ingest/load parity with
the ad-hoc recompute path, version-key semantics under UPDATE/DELETE,
replay idempotence, geometry validation, the neardup_ingest
maintained-corpus substitution, and the streaming ingestor wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_system_spark.operators import lsh_index as LI
from cdc_system_spark.operators.curation import neardup_ingest
from cdc_system_spark.operators.dedup import _band_table, minhash_signatures
from cdc_system_spark.sources.catalog import load_table

SIG_COLS = ["doc_id"] + [f"h{i}" for i in range(16)]
BAND_COLS = ["doc_id", "band_idx", "k0", "k1"]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    # a 200-doc slice: every parity claim here is self-consistent
    # (maintained vs recomputed over the SAME frame), so corpus size
    # buys no extra coverage, only suite seconds
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter("doc_id < 200")
    )


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
    assert _rows(sigs.select(*SIG_COLS)) == _rows(adhoc)
    assert _rows(bands.select(*BAND_COLS)) == _rows(
        _band_table(adhoc, "doc_id", 16, 4)
    )


def test_incremental_ingest_matches_full_recompute(spark, docs, tmp_path):
    # build on 2/3, ingest the remaining third: probe tables ==
    # one-shot recompute over the FULL corpus (frozen hash geometry,
    # so incremental == batch exactly)
    path = str(tmp_path / "idx")
    LI.lsh_index_build(docs.filter("doc_id % 3 <> 0"), path)
    n = LI.lsh_index_ingest(docs.filter("doc_id % 3 = 0"), path)
    assert n == docs.filter("doc_id % 3 = 0").count()
    sigs, bands = LI.lsh_index_probe_tables(spark, path, docs)
    full = minhash_signatures(docs, k=7, num_perms=16)
    assert _rows(sigs) == _rows(full)
    assert _rows(bands) == _rows(_band_table(full, "doc_id", 16, 4))


def test_ingest_replay_is_noop(spark, docs, tmp_path):
    path = str(tmp_path / "idx")
    LI.lsh_index_build(docs.filter("doc_id % 3 <> 0"), path)
    batch = docs.filter("doc_id % 3 = 0")
    assert LI.lsh_index_ingest(batch, path) == batch.count()
    # re-delivery: version-keyed anti-join admits nothing, tables stable
    assert LI.lsh_index_ingest(batch, path) == 0
    sigs, bands = LI.lsh_index_load(spark, path)
    assert sigs.count() == docs.count()
    assert bands.count() == 4 * docs.count()


def test_update_and_delete_semantics(spark, tmp_path):
    # an UPDATE's edited text is a NEW version (indexes despite the old
    # id being present); probe tables follow the LIVE corpus: the old
    # version and a deleted doc stop matching
    path = str(tmp_path / "idx")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    v1 = mk([(1, "alpha text one"), (2, "beta text two"), (3, "gamma three")])
    LI.lsh_index_build(v1, path)
    # doc 1 edited, doc 3 deleted
    assert LI.lsh_index_ingest(mk([(1, "alpha text one EDITED")]), path) == 1
    live = mk([(1, "alpha text one EDITED"), (2, "beta text two")])
    sigs, bands = LI.lsh_index_probe_tables(spark, path, live)
    # probe tables carry exactly the live versions, under the live text
    assert _rows(sigs) == _rows(minhash_signatures(live, k=7, num_perms=16))
    assert sigs.filter("doc_id = 3").count() == 0
    # the stale version is still stored (append-only), just not live
    all_sigs, _ = LI.lsh_index_load(spark, path)
    assert all_sigs.filter("doc_id = 1").count() == 2


def test_probe_tables_sign_uncovered_rows_inline(spark, docs, tmp_path):
    # a corpus row the index never saw (bypassed the maintained path)
    # is signed inline — parity with recompute holds unconditionally
    path = str(tmp_path / "idx")
    LI.lsh_index_build(docs.filter("doc_id % 5 <> 0"), path)
    sigs, bands = LI.lsh_index_probe_tables(spark, path, docs)
    full = minhash_signatures(docs, k=7, num_perms=16)
    assert _rows(sigs) == _rows(full)
    assert _rows(bands) == _rows(_band_table(full, "doc_id", 16, 4))


def test_geometry_validation(spark, docs, tmp_path):
    path = str(tmp_path / "idx")
    LI.lsh_index_build(docs.limit(20), path, num_perms=8, rows_per_band=4)
    with pytest.raises(ValueError, match="num_perms"):
        LI.lsh_index_load(spark, path, num_perms=16)
    with pytest.raises(ValueError, match="rows_per_band"):
        LI.lsh_index_load(spark, path, num_perms=8, rows_per_band=2)
    with pytest.raises(ValueError, match="id column"):
        LI.lsh_index_ingest(docs.limit(5), path, id_col="other_id")
    # shingle_k is geometry too: same perms/bands but different shingle
    # width hashes different features — must fail loudly, both on load
    # and on the probe path (the ingestor passes shingle_k=7)
    with pytest.raises(ValueError, match="shingle_k"):
        LI.lsh_index_load(spark, path, shingle_k=5)
    with pytest.raises(ValueError, match="shingle_k"):
        LI.lsh_index_probe_tables(spark, path, docs.limit(5), shingle_k=5)


def test_containment_from_index_matches_inline(spark, docs, tmp_path):
    # the containment family served by the maintained artifact (stored
    # per-perm values + stored n_sh, 1-row bands derived at probe time)
    # must be ROW-IDENTICAL to the re-shingle-everything inline path —
    # including over an index that grew by ingest and has an uncovered
    # remainder signed inline
    from cdc_system_spark.operators.dedup import containment_pairs

    path = str(tmp_path / "idx")
    LI.lsh_index_build(docs.filter("doc_id % 3 = 1"), path)
    LI.lsh_index_ingest(docs.filter("doc_id % 3 = 2"), path)
    sigs = LI.lsh_index_signature_tables(
        spark, path, docs, shingle_k=7, num_perms=16
    )
    inline = containment_pairs(docs, k=7, num_perms=16, rows_per_band=1)
    via = containment_pairs(
        docs, k=7, num_perms=16, rows_per_band=1, signatures=sigs
    )
    assert _rows(via) == _rows(inline)
    # post-compact trusted path: stored == live right after a build
    # against this exact corpus, so assume_covered (zero text reads)
    # must be row-identical too
    path2 = str(tmp_path / "idx2")
    LI.lsh_index_build(docs, path2)
    trusted = LI.lsh_index_signature_tables(
        spark, path2, docs, assume_covered=True
    )
    via2 = containment_pairs(
        docs, k=7, num_perms=16, rows_per_band=1, signatures=trusted
    )
    assert _rows(via2) == _rows(inline)


def test_stats_state_maintained_equals_rebuilt(spark, docs, tmp_path):
    # the ≤64-row KMV health state, merged incrementally across build +
    # two ingests, must equal the state rebuilt from the whole version-
    # key set — and must survive compaction unchanged (EVER semantics)
    from cdc_system_spark.operators.sketch import kmv_state

    path = str(tmp_path / "idx")
    LI.lsh_index_build(docs.filter("doc_id % 3 = 0"), path)
    LI.lsh_index_ingest(docs.filter("doc_id % 3 = 1"), path)
    LI.lsh_index_ingest(docs.filter("doc_id % 3 = 2"), path)
    state = LI.lsh_index_stats_state(spark, path)
    assert state.count() <= 64
    vkeys = docs.select(
        F.md5(
            F.concat_ws("\u0000", F.col("doc_id").cast("string"), F.col("text"))
        ).alias("_vkey")
    )
    rebuilt = kmv_state(vkeys, "_vkey")
    assert _rows(state) == _rows(rebuilt)
    est = LI.lsh_index_stats(spark, path).head()
    assert est["saturated"] and est["n_est"] > 0
    # compact keeps only 1/3 of versions but the EVER-indexed stats
    # state is history, not storage — unchanged
    LI.lsh_index_compact(spark, path, docs.filter("doc_id % 3 = 0"))
    assert _rows(LI.lsh_index_stats_state(spark, path)) == _rows(rebuilt)
    # a stats-less read AFTER compaction must raise, not silently
    # rebuild a smaller live-only state from the survivors (the r7
    # advisor finding: 'ever' history is unrecoverable post-compact)
    import shutil

    import pytest as _pytest

    shutil.rmtree(tmp_path / "idx" / "stats")
    with _pytest.raises(ValueError, match="ever indexed"):
        LI.lsh_index_stats_state(spark, path)
    # a full REBUILD rewrites the stats to exactly the stored set and
    # clears the marker: the bootstrap is exact again
    LI.lsh_index_build(docs, path)
    shutil.rmtree(tmp_path / "idx" / "stats")
    assert _rows(LI.lsh_index_stats_state(spark, path)) == _rows(rebuilt)


def test_neardup_ingest_accepts_maintained_corpus(spark, docs, tmp_path):
    # the 100-TB path: probe against the persisted index instead of
    # re-hashing the corpus — admitted set must be ROW-IDENTICAL to the
    # inline-recompute path
    corpus = docs.filter("doc_id % 5 <> 0")
    batch = docs.filter("doc_id % 5 = 0").limit(60)
    path = str(tmp_path / "idx")
    LI.lsh_index_build(corpus, path)
    sigs, bands = LI.lsh_index_probe_tables(spark, path, corpus)
    inline = neardup_ingest(corpus, batch, shingle_k=7, num_perms=16)
    via_index = neardup_ingest(
        corpus, batch, shingle_k=7, num_perms=16,
        corpus_sigs=sigs, corpus_bands=bands,
    )
    assert _rows(via_index.select("doc_id")) == _rows(inline.select("doc_id"))


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def _ingestor(spark, base, corpus, idx_path=None):
    from cdc_system_spark.api import SnapshotTable
    from cdc_system_spark.streaming import StreamingCorpusIngestor

    return StreamingCorpusIngestor(
        spark,
        str(base / "log"),
        corpus,
        DOC_SCHEMA,
        checkpoint_path=str(base / "ckpt"),
        neardup_threshold=0.5,
        lsh_index_path=idx_path,
    )


def test_streaming_ingestor_maintains_and_uses_index(spark, tmp_path):
    # the indexed ingestor over a capture stream: the resulting corpus
    # must equal the PINNED inline-gate outcome (the literal below was
    # produced by an inline twin ingestor over the same stream — the
    # r9 suite-budget trim replaced the live twin run with its pinned
    # result; the containment twin test keeps the full two-ingestor
    # methodology), and the index must end covering every live corpus
    # version
    from cdc_system_spark.api import CDCSystem, SnapshotTable

    def run(tag, idx_path):
        base = tmp_path / tag
        sys_ = CDCSystem(spark, str(base), "docs")
        cap = sys_.setup_cdc(DOC_SCHEMA, key="doc_id")
        corpus = SnapshotTable(spark, str(base / "corpus"), DOC_SCHEMA)
        mk = lambda rows: spark.createDataFrame(rows, DOC_SCHEMA)
        corpus.write(
            mk([(1, "the quick brown fox jumps over the lazy dog")])
        )
        ing = _ingestor(spark, base, corpus, idx_path)
        # batch 0: a near-dup of doc 1 (rejected), a fresh doc, and two
        # fresh within-batch twins (larger id dropped)
        cap.capture_insert(
            mk(
                [
                    (10, "the quick brown fox jumps over the lazy dogs"),
                    (11, "completely different content about spark engines"),
                    (12, "pair twin text aa bb cc dd ee ff gg hh"),
                    (13, "pair twin text aa bb cc dd ee ff gg hh!!"),
                ]
            )
        )
        ing.apply_batch(cap.read_log(), 0)
        mx0 = cap.read_log().agg(F.max("cdc_id")).collect()[0][0]
        # batch 1: UPDATE doc 1's text (same-id near-dup must replace),
        # DELETE doc 11
        cap.capture_update(
            mk([(1, "the quick brown fox jumps over the lazy dog, revised")]),
            mk([(1, "the quick brown fox jumps over the lazy dog")]),
        )
        cap.capture_delete(
            mk([(11, "completely different content about spark engines")])
        )
        ing.apply_batch(cap.read_log().filter(F.col("cdc_id") > mx0), 1)
        mx1 = cap.read_log().agg(F.max("cdc_id")).collect()[0][0]
        # batch 2: a near-dup of the doc DELETED in batch 1 — admits,
        # because its twin is gone from the live corpus (the index's
        # stale version must not match)
        cap.capture_insert(
            mk([(20, "completely different content about spark engine")])
        )
        ing.apply_batch(cap.read_log().filter(F.col("cdc_id") > mx1), 2)
        return {r["doc_id"]: r["text"] for r in corpus.read().collect()}, corpus

    idx_path = str(tmp_path / "indexed" / "lshidx")
    indexed_rows, corpus = run("indexed", idx_path)
    # the inline twin's outcome, pinned: doc 1 revised in place, 10
    # rejected (near-dup of 1's original), 11 deleted, 12 kept with 13
    # (its within-batch twin) dropped, 20 admitted post-delete
    assert indexed_rows == {
        1: "the quick brown fox jumps over the lazy dog, revised",
        12: "pair twin text aa bb cc dd ee ff gg hh",
        20: "completely different content about spark engine",
    }
    assert 1 in indexed_rows and indexed_rows[1].endswith("revised")
    assert 12 in indexed_rows and 13 not in indexed_rows
    assert 10 not in indexed_rows
    assert 11 not in indexed_rows and 20 in indexed_rows
    # coverage: every live corpus version is indexed — probe-time
    # inline remainder is empty
    sigs, _ = LI.lsh_index_probe_tables(spark, idx_path, corpus.read())
    live = corpus.read()
    assert sigs.count() == live.count()
    full = minhash_signatures(
        live.select("doc_id", "text"), k=7, num_perms=16
    )
    assert _rows(sigs) == _rows(full)


def test_compact_drops_stale_keeps_probe_identical(spark, tmp_path):
    path = str(tmp_path / "idx")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    LI.lsh_index_build(
        mk([(1, "alpha text one"), (2, "beta text two"), (3, "gamma three")]),
        path,
    )
    LI.lsh_index_ingest(mk([(1, "alpha text one EDITED")]), path)
    live = mk([(1, "alpha text one EDITED"), (2, "beta text two")])
    before = _rows(LI.lsh_index_probe_tables(spark, path, live)[0])
    kept, dropped = LI.lsh_index_compact(spark, path, live)
    assert (kept, dropped) == (2, 2)  # old v1 of doc 1 + deleted doc 3
    sigs, bands = LI.lsh_index_load(spark, path)
    assert sigs.count() == 2 and bands.count() == 8
    assert _rows(LI.lsh_index_probe_tables(spark, path, live)[0]) == before


# -- property: probe parity under arbitrary edit sequences --------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_TXT = st.text(alphabet="abcdefg ", min_size=0, max_size=20)
# an op is (kind, doc_id, text): 0=upsert (insert or edit), 1=delete
_OP = st.tuples(st.integers(0, 1), st.integers(1, 6), _TXT)


from tests.hyp_budget import examples as _hyp_examples


@given(st.lists(st.tuples(st.integers(1, 6), _TXT), min_size=1, max_size=4),
       st.lists(_OP, min_size=0, max_size=6))
@settings(
    max_examples=_hyp_examples(2, 3),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_probe_parity_under_any_edit_sequence(spark, tmp_path_factory, initial, ops):
    # whatever sequence of inserts/edits/deletes the corpus saw — with
    # the index maintained only on upserts, deletes never told to it —
    # probe tables over the CURRENT corpus must equal the recompute
    path = str(tmp_path_factory.mktemp("lshprop") / "idx")
    state = {}
    for did, txt in initial:
        state[did] = txt
    mk = lambda d: spark.createDataFrame(
        [(k, v) for k, v in sorted(d.items())], "doc_id long, text string"
    )
    LI.lsh_index_build(mk(state), path)
    for kind, did, txt in ops:
        if kind == 0:
            state[did] = txt
            LI.lsh_index_ingest(
                spark.createDataFrame([(did, txt)], "doc_id long, text string"),
                path,
            )
        else:
            state.pop(did, None)
    current = mk(state)
    sigs, bands = LI.lsh_index_probe_tables(spark, path, current)
    full = minhash_signatures(current, k=7, num_perms=16)
    assert _rows(sigs) == _rows(full)
    assert _rows(bands) == _rows(_band_table(full, "doc_id", 16, 4))


def test_streaming_ingestor_containment_gate_parity(spark, tmp_path):
    # the indexed (live-filtered signature table) containment-gated
    # ingestor over a capture stream must equal the PINNED inline-gate
    # outcome: inserts, a quoted-subset reject, an UPDATE (same-id must
    # replace), and a post-DELETE re-admit (stale index versions must
    # not match). Then the TRUSTED window: after compact_index(), an
    # insert-only batch probes with zero corpus reads and stays
    # row-identical; the next overwriting batch drops back to the live
    # filter automatically. (The live inline twin run was replaced by
    # its pinned result in r9 — see the comment at the assertion.)
    from cdc_system_spark.api import CDCSystem, SnapshotTable
    from cdc_system_spark.streaming import StreamingCorpusIngestor

    page = " ".join(f"sentence{i} about topic{i} detail{i}" for i in range(40))
    unrelated = "completely different content about spark engines " * 3

    def run(tag, idx_path):
        base = tmp_path / tag
        sys_ = CDCSystem(spark, str(base), "docs")
        cap = sys_.setup_cdc(DOC_SCHEMA, key="doc_id")
        corpus = SnapshotTable(spark, str(base / "corpus"), DOC_SCHEMA)
        mk = lambda rows: spark.createDataFrame(rows, DOC_SCHEMA)
        corpus.write(mk([(1, page)]))
        ing = StreamingCorpusIngestor(
            spark,
            str(base / "log"),
            corpus,
            DOC_SCHEMA,
            checkpoint_path=str(base / "ckpt"),
            containment_threshold=0.8,
            lsh_index_path=idx_path,
        )
        # batch 0: a quoted excerpt of corpus doc 1 (rejected), a fresh
        # doc, a fresh page + ITS excerpt in the same batch (the
        # excerpt drops)
        page2 = " ".join(f"fresh{i} page{i} words{i}" for i in range(40))
        cap.capture_insert(
            mk(
                [
                    (10, page[100:220]),
                    (11, unrelated),
                    (12, page2),
                    (13, page2[50:170]),
                ]
            )
        )
        ing.apply_batch(cap.read_log(), 0)
        mx0 = cap.read_log().agg(F.max("cdc_id")).collect()[0][0]
        # batch 1: UPDATE doc 1 to a truncation of itself (same-id
        # containment must still replace), DELETE doc 11
        cap.capture_update(mk([(1, page[:200])]), mk([(1, page)]))
        cap.capture_delete(mk([(11, unrelated)]))
        ing.apply_batch(cap.read_log().filter(F.col("cdc_id") > mx0), 1)
        mx1 = cap.read_log().agg(F.max("cdc_id")).collect()[0][0]
        # batch 2: an excerpt of the DELETED doc — admits (live filter
        # must hide the index's stale version)
        cap.capture_insert(mk([(20, unrelated[:110])]))
        ing.apply_batch(cap.read_log().filter(F.col("cdc_id") > mx1), 2)
        return ing, cap, corpus, mk

    idx_path = str(tmp_path / "indexed" / "lshidx")
    ing_b, cap_b, corpus_b, mk = run("indexed", idx_path)
    snap = lambda c: {r["doc_id"]: r["text"] for r in c.read().collect()}
    rows = snap(corpus_b)
    # the inline twin's outcome, PINNED (r9 suite-budget trim: the
    # live inline run cost ~22 s; inline == indexed parity is proven
    # where it's strongest — the driver's DuckDB oracle gate, via
    # q_containment_ingest / q_containment_maintained — and the
    # Hypothesis probe-parity sweep covers arbitrary edit sequences)
    page2 = " ".join(f"fresh{i} page{i} words{i}" for i in range(40))
    assert rows == {1: page[:200], 12: page2, 20: unrelated[:110]}
    assert 10 not in rows and 13 not in rows  # subset rejects
    assert 11 not in rows and 20 in rows  # stale version didn't match
    assert rows[1] == rows[1][:200][:200] and len(rows[1]) == 200  # update
    assert 12 in rows

    # trusted window: compact, then an insert-only batch — parity with
    # a fresh live-filtered ingestor over the same stream
    assert ing_b._index_trusted is False
    ing_b.compact_index()
    assert ing_b._index_trusted is True
    mx2 = cap_b.read_log().agg(F.max("cdc_id")).collect()[0][0]
    cap_b.capture_insert(
        mk([(30, rows[12][40:160]), (31, "wholly new themes entirely " * 5)])
    )
    batch3 = cap_b.read_log().filter(F.col("cdc_id") > mx2)
    ing_b.apply_batch(batch3, 3)
    rows3 = snap(corpus_b)
    assert 30 not in rows3 and 31 in rows3  # subset rejected corpus-free
    assert ing_b._index_trusted is True  # insert-only: window holds
    # an overwriting batch closes the window
    mx3 = cap_b.read_log().agg(F.max("cdc_id")).collect()[0][0]
    cap_b.capture_update(mk([(31, "wholly new themes entirely, edited " * 5)]),
                         mk([(31, "wholly new themes entirely " * 5)]))
    ing_b.apply_batch(cap_b.read_log().filter(F.col("cdc_id") > mx3), 4)
    assert ing_b._index_trusted is False


def test_index_staleness_metric(spark, docs, tmp_path):
    # fresh index: ever ~= live -> churn within the KMV estimator's
    # noise of 0 (the saturated estimate sits a few % off the true
    # count — 0 exactly only below saturation); after ingesting edited
    # versions of 1/5 of the docs the stale originals read as ~17%
    # churn (1 - 200/240 within the KMV ~13% budget); after compaction
    # against the live corpus the LIVE count is unchanged and the EVER
    # estimate still includes the dead versions (EVER semantics)
    path = str(tmp_path / "idx")
    LI.lsh_index_build(docs, path)
    row = LI.lsh_index_staleness(spark, path, docs).head()
    assert row["churn_est"] <= 0.05 and row["n_live"] == docs.count()
    edited = docs.filter("doc_id % 5 = 0").select(
        "doc_id", F.concat(F.col("text"), F.lit(" v2")).alias("text")
    )
    LI.lsh_index_ingest(edited, path)
    live = docs.filter("doc_id % 5 <> 0").unionByName(edited)
    row2 = LI.lsh_index_staleness(spark, path, live).head()
    true_churn = 1 - live.count() / (docs.count() + edited.count())
    assert row2["n_live"] == live.count()
    assert abs(row2["churn_est"] - true_churn) < 0.10
    LI.lsh_index_compact(spark, path, live)
    row3 = LI.lsh_index_staleness(spark, path, live).head()
    assert row3 == row2  # EVER state survives compaction


def test_index_never_holds_versions_the_corpus_drops(spark, tmp_path):
    # r8 advisor: an admitted row that incremental_ingest's cross-id
    # content-hash anti join drops — reachable when a >max_bucket
    # degenerate LSH bucket suppresses the exact-duplicate candidate
    # pair, so the containment gate never sees it — must NOT leave a
    # live version in the maintained index; a stranded version would
    # make the post-compact trusted window (assume_covered) read a
    # superset index, silently breaking its stored==live contract.
    # The ingestor now indexes the INGEST SURVIVORS, not the
    # gate-admitted batch.
    from cdc_system_spark.api import CDCSystem, SnapshotTable
    from cdc_system_spark.streaming import StreamingCorpusIngestor

    base = tmp_path / "deg"
    sys_ = CDCSystem(spark, str(base), "docs")
    cap = sys_.setup_cdc(DOC_SCHEMA, key="doc_id")
    corpus = SnapshotTable(spark, str(base / "corpus"), DOC_SCHEMA)
    boiler = "identical boilerplate page body repeated verbatim " * 5
    # 21 same-text docs against gate_max_bucket=20: every band bucket
    # for this text exceeds the degeneracy cap, so the probe yields NO
    # candidate pair for a same-text arrival and the gate passes it
    # through (same mechanism as the default 1000-cap at 1001 docs,
    # sized down to keep the fixture cheap)
    corpus.write(
        spark.createDataFrame([(i, boiler) for i in range(21)], DOC_SCHEMA)
    )
    idx = str(base / "lshidx")
    ing = StreamingCorpusIngestor(
        spark,
        str(base / "log"),
        corpus,
        DOC_SCHEMA,
        checkpoint_path=str(base / "ckpt"),
        containment_threshold=0.8,
        lsh_index_path=idx,
        gate_max_bucket=20,
    )
    fresh = "a wholly different page about spark engines " * 6
    cap.capture_insert(
        spark.createDataFrame([(9999, boiler), (5000, fresh)], DOC_SCHEMA)
    )
    ing.apply_batch(cap.read_log(), 0)
    landed = {r["doc_id"] for r in corpus.read().select("doc_id").collect()}
    assert 5000 in landed
    assert 9999 not in landed  # the hash anti join dropped it
    # the index holds versions ONLY for rows the corpus landed:
    # 9999's version must be absent, 5000's present
    _, bands = LI.lsh_index_load(spark, idx, num_perms=16, rows_per_band=4)
    stored_ids = {r["doc_id"] for r in bands.select("doc_id").distinct().collect()}
    assert 5000 in stored_ids
    assert 9999 not in stored_ids


def test_staleness_metric_empty_state_is_defined(spark):
    # r8 advisor: zero stats rows made `ever` 0.0 and the churn
    # division emitted NaN/Infinity — an index built over an empty
    # corpus must read as a defined, unchurned 0.0
    from cdc_system_spark.operators._index_stats import staleness_metric

    state = spark.createDataFrame([], "h long")
    row = staleness_metric(state, spark.createDataFrame([], "k string")).head()
    assert (row["n_ever_est"], row["n_live"], row["churn_est"]) == (0.0, 0, 0.0)
    live = spark.createDataFrame([("a",), ("b",)], "k string")
    row2 = staleness_metric(state, live).head()
    assert row2["n_live"] == 2 and row2["churn_est"] == 0.0
