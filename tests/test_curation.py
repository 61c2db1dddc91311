"""Unit semantics for the composed-curation operators (round 3):
chunking, sequence packing, substring passages, and the end-to-end
pipeline's stage interactions. (Oracle parity runs via verify_local;
these pin edge cases and cross-stage behavior on crafted corpora.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_system_spark.operators.curation import (
    chunk_documents,
    curate_corpus,
    sequence_pack,
    substring_duplicate_passages,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_documents_windows_and_overlap(spark):
    words = [f"w{i}" for i in range(10)]
    docs = _docs(spark, [(1, " ".join(words)), (2, "short doc")])
    out = chunk_documents(docs, chunk_tokens=4, overlap=1)  # stride 3
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in out.collect()
    }
    # 10 tokens, window 4, stride 3 -> chunks at offsets 0,3,6,9 (ceil((10-4)/3)+1 = 3)
    assert got[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert got[(1, 1)] == ("w3 w4 w5 w6", 4)  # 1-token overlap
    assert got[(1, 2)] == ("w6 w7 w8 w9", 4)
    assert (1, 3) not in got
    assert got[(2, 0)] == ("short doc", 2)  # short doc: single partial chunk


def test_chunk_documents_reconstruction_property(spark):
    # Property: dropping each chunk's leading `overlap` tokens (except
    # chunk 0) and concatenating reconstructs the original document for
    # ANY (n_tokens, chunk_tokens, overlap) — chunking loses nothing.
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        n_tokens=st.integers(min_value=1, max_value=120),
        chunk_tokens=st.integers(min_value=2, max_value=24),
        overlap_frac=st.floats(min_value=0.0, max_value=0.9),
    )
    def check(n_tokens, chunk_tokens, overlap_frac):
        overlap = min(int(chunk_tokens * overlap_frac), chunk_tokens - 1)
        words = [f"w{i}" for i in range(n_tokens)]
        docs = _docs(spark, [(1, " ".join(words))])
        rows = sorted(
            chunk_documents(
                docs, chunk_tokens=chunk_tokens, overlap=overlap
            ).collect(),
            key=lambda r: r["chunk_idx"],
        )
        rebuilt: list[str] = []
        for r in rows:
            toks = r["chunk_text"].split(" ")
            rebuilt.extend(toks if r["chunk_idx"] == 0 else toks[overlap:])
            assert r["n_chunk_tokens"] == len(toks) <= chunk_tokens
        assert rebuilt == words

    check()


def test_chunk_documents_rejects_bad_overlap(spark):
    docs = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_sequence_pack_offsets_and_spans(spark):
    # one shard (n_shards=1): docs of 3, 4, 6 tokens; ctx=5
    docs = _docs(
        spark,
        [(1, "a b c"), (2, "d e f g"), (3, "h i j k l m")],
    )
    out = {r["doc_id"]: r for r in sequence_pack(docs, ctx_tokens=5, n_shards=1).collect()}
    assert (out[1]["start_tok"], out[1]["seq_first"], out[1]["seq_last"]) == (0, 0, 0)
    # doc2 occupies tokens [3, 7) -> straddles seq 0 and 1
    assert (out[2]["start_tok"], out[2]["seq_first"], out[2]["seq_last"]) == (3, 0, 1)
    # doc3 occupies tokens [7, 13) -> seqs 1..2
    assert (out[3]["start_tok"], out[3]["seq_first"], out[3]["seq_last"]) == (7, 1, 2)


def test_sequence_pack_shards_independent(spark):
    # same doc ids across shards restart their own offsets
    docs = _docs(spark, [(i, "x y z") for i in range(6)])
    out = sequence_pack(docs, ctx_tokens=100, n_shards=2).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["start_tok"])
    for starts in by_shard.values():
        assert sorted(starts) == [0, 3, 6]  # each shard's stream starts at 0


def test_substring_passages_found_across_docs(spark):
    boiler = "all rights reserved by the example corp license v2"  # 9 tokens
    docs = _docs(
        spark,
        [
            (1, "alpha beta " + boiler),
            (2, boiler + " gamma delta"),
            (3, "no shared passage here at all in this document"),
        ],
    )
    out = substring_duplicate_passages(docs, n=8, min_docs=2)
    rows = out.collect()
    assert rows, "shared 8-gram passage must be detected"
    assert all(r["doc_ids"] == "1,2" for r in rows)
    # doc 3 shares nothing
    assert not any("3" in r["doc_ids"].split(",") for r in rows)


def test_substring_passages_posting_cap(spark):
    common = " ".join(f"t{i}" for i in range(8))
    docs = _docs(spark, [(i, common) for i in range(5)])
    capped = substring_duplicate_passages(docs, n=8, min_docs=2, max_posting=3)
    assert capped.count() == 0  # posting of 5 docs exceeds the cap -> dropped


def test_top_k_per_stratum_exact_counts(spark):
    from cdc_system_spark.operators.sampling import top_k_per_stratum

    docs = spark.createDataFrame(
        [(i, "en" if i < 40 else "de") for i in range(45)], "doc_id long, lang string"
    )
    out = top_k_per_stratum(docs, "lang", 10, id_col="doc_id")
    by_lang = {}
    for r in out.collect():
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by_lang["en"]) == 10       # exactly k
    assert len(by_lang["de"]) == 5        # stratum smaller than k -> all
    # deterministic: same selection on rerun, different under a new salt
    again = {r["doc_id"] for r in top_k_per_stratum(docs, "lang", 10).collect()}
    assert again == by_lang["en"] | by_lang["de"]
    other = {r["doc_id"] for r in top_k_per_stratum(docs, "lang", 10, salt="x").collect()}
    assert other != again


def test_incremental_ingest_drops_dupes(spark):
    from cdc_system_spark.operators.curation import incremental_ingest

    corpus = _docs(spark, [(1, "alpha"), (2, "beta")])
    batch = _docs(
        spark,
        [
            (10, "gamma"),          # genuinely new -> admitted
            (11, "alpha"),          # content already in corpus -> dropped
            (12, "gamma"),          # in-batch dupe -> min id (10) survives
        ],
    )
    out = sorted(r["doc_id"] for r in incremental_ingest(corpus, batch).collect())
    assert out == [1, 2, 10]
    # empty batch: corpus unchanged
    empty = _docs(spark, [(99, "zeta")]).filter("doc_id < 0")
    unchanged = sorted(r["doc_id"] for r in incremental_ingest(corpus, empty).collect())
    assert unchanged == [1, 2]


def test_incremental_ingest_upserts_existing_id(spark):
    """A CDC UPDATE arrives as an existing doc_id with changed text: it
    must REPLACE the corpus row, never duplicate the id (the id-keyed
    invariant downstream clustering/joins assume)."""
    from cdc_system_spark.operators.curation import incremental_ingest

    corpus = _docs(spark, [(1, "alpha"), (2, "beta")])
    batch = _docs(
        spark,
        [
            (1, "alpha revised"),   # UPDATE: same id, new text -> replaces
            (2, "beta"),            # unchanged re-delivery -> no-op
            (3, "gamma"),           # plain insert
        ],
    )
    rows = incremental_ingest(corpus, batch).collect()
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == [1, 2, 3], f"duplicate or lost ids: {ids}"
    by_id = {r["doc_id"]: r["text"] for r in rows}
    assert by_id[1] == "alpha revised"  # the update won
    assert by_id[2] == "beta"           # untouched
    assert by_id[3] == "gamma"


def test_normalize_text_collapses_whitespace(spark):
    from cdc_system_spark.operators.text import normalize_text

    docs = _docs(spark, [(1, "  Foo\t\tBar \n Baz "), (2, "already clean")])
    got = {r["doc_id"]: r for r in normalize_text(docs).collect()}
    assert got[1]["norm_text"] == "foo bar baz"
    assert got[1]["changed"]
    assert got[2]["norm_text"] == "already clean" and not got[2]["changed"]


def test_minhash_jaccard_estimate_identical_docs(spark):
    from cdc_system_spark.operators.dedup import (
        minhash_jaccard_estimate,
        minhash_signatures,
    )

    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # identical
            (3, "a completely different document about spark engines"),
        ],
    )
    sigs = minhash_signatures(docs, k=7, num_perms=8)
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id1 long, id2 long")
    got = {(r["id1"], r["id2"]): r["est_jaccard"] for r in
           minhash_jaccard_estimate(sigs, pairs, num_perms=8).collect()}
    assert got[(1, 2)] == 1.0             # identical shingle sets
    assert got[(1, 3)] < 0.5              # unrelated text


def test_simhash_neardup_identical_docs_hamming_zero(spark):
    from cdc_system_spark.operators.dedup import simhash_neardup_pairs

    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "totally unrelated words about database engines and planners"),
        ],
    )
    rows = {(r["id1"], r["id2"]): r["hamming"]
            for r in simhash_neardup_pairs(docs, max_hamming=2).collect()}
    assert rows.get((1, 2)) == 0
    assert (1, 3) not in rows and (2, 3) not in rows


def test_simhash_neardup_rejects_invalid_band_config(spark):
    """Pigeonhole completeness (every pair within max_hamming agrees on
    >= 1 band) requires max_hamming < n_bands and evenly split bits —
    invalid configs must error, not silently return incomplete pairs."""
    import pytest as _pytest

    from cdc_system_spark.operators.dedup import simhash_neardup_pairs

    docs = _docs(spark, [(1, "a b c"), (2, "a b d")])
    with _pytest.raises(ValueError, match="max_hamming"):
        simhash_neardup_pairs(docs, bits=32, n_bands=4, max_hamming=4)
    with _pytest.raises(ValueError, match="divide"):
        simhash_neardup_pairs(docs, bits=30, n_bands=4, max_hamming=2)


def test_weighted_sample_rates_follow_weights(spark):
    from cdc_system_spark.operators.sampling import weighted_sample

    rows = [(i, 1.0 if i < 1000 else (0.3 if i < 2000 else 0.0)) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, wt double")
    kept = weighted_sample(df, "wt", id_col="doc_id").collect()
    by_band = {1.0: 0, 0.3: 0, 0.0: 0}
    for r in kept:
        by_band[r["wt"]] += 1
    assert by_band[1.0] == 1000          # weight 1 keeps everything
    assert 240 <= by_band[0.3] <= 360    # ~30% within hash tolerance
    assert by_band[0.0] == 0             # weight 0 drops all
    # deterministic rerun; weights outside [0,1] clamp instead of erroring
    again = weighted_sample(df, "wt", id_col="doc_id").count()
    assert again == len(kept)
    clamped = spark.createDataFrame([(1, 7.5), (2, -3.0)], "doc_id long, wt double")
    got = {r["doc_id"] for r in weighted_sample(clamped, "wt").collect()}
    assert got == {1}


def test_star_contraction_matches_label_propagation(spark):
    # large-star/small-star (O(log^2 n) rounds) must produce the same
    # components as min-label propagation (O(diameter) rounds) on a
    # graph mixing the hard shapes: a long chain (stretches diameter),
    # a clique (near-dup group), random sparse pairs, and singletons
    import random

    from cdc_system_spark.operators.dedup import (
        duplicate_clusters,
        star_contraction_clusters,
    )

    rnd = random.Random(7)
    docs = spark.createDataFrame([(n,) for n in range(60)], "doc_id long")
    edges = [(i, i + 1) for i in range(9)]                      # chain 0..9
    edges += [(a, b) for a in range(20, 25) for b in range(20, 25) if a < b]
    for _ in range(20):                                          # sparse random
        a, b = rnd.sample(range(30, 56), 2)
        edges.append((min(a, b), max(a, b)))
    pairs = spark.createDataFrame(sorted(set(edges)), "id1 long, id2 long")
    lp = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(docs, pairs).collect()}
    st = {
        r["doc_id"]: r["cluster_id"]
        for r in star_contraction_clusters(docs, pairs).collect()
    }
    assert lp == st
    assert st[9] == 0      # chain collapses to its min
    assert st[24] == 20    # clique root
    assert st[59] == 59    # untouched singleton labels itself


def test_curate_corpus_end_to_end_stages(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    bench_text = "benchmark question about prime numbers and their distribution today ok"
    rows = [
        (1, base, "en", "s", len(base)),                      # survives
        (2, base, "en", "s", len(base)),                      # exact dupe of 1 -> dropped
        (3, "spam " * 30 + "end", "en", "s", 5),              # repetitious -> dropped
        (4, "tiny doc", "en", "s", 8),                        # < 5 tokens -> dropped
        (5, bench_text + " extra words to pass the length gate fine", "en", "s", 9),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    bench = spark.createDataFrame(
        [(100, bench_text, "en", "b", len(bench_text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = curate_corpus(
        docs, bench, rates={"en": 1.0}, default_rate=1.0, salt="s1", min_tokens=5
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    # 2 exact-dup'd, 3 repetitious, 4 short, 5 contaminated (shares a
    # 5-gram with the benchmark) -> only 1 survives at rate 1.0
    assert kept == [1]


def test_split_assign_covers_all_rows_deterministically(spark):
    from cdc_system_spark.operators.sampling import split_assign

    docs = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    out = split_assign(docs).collect()
    assert len(out) == 2000
    by_split = {}
    for r in out:
        by_split.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by_split) == {"train", "val", "test"}
    # ~98/1/1 within hash granularity
    assert len(by_split["train"]) > 1900
    assert 0 < len(by_split["val"]) < 100
    assert 0 < len(by_split["test"]) < 100
    # stability under corpus growth: a doc's split never changes when
    # other docs are added
    subset = split_assign(docs.filter("doc_id < 500")).collect()
    for r in subset:
        assert r["doc_id"] in by_split[r["split"]]
    # invalid config errors
    import pytest as _pytest

    with _pytest.raises(ValueError):
        split_assign(docs, splits={"a": 0.9, "b": 0.2})


def test_quality_percentile_filter_cuts_bottom_per_stratum(spark):
    from cdc_system_spark.operators.sampling import quality_percentile_filter

    rows = [(i, "en", float(i)) for i in range(100)] + [
        (100 + i, "de", float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    out = quality_percentile_filter(df, "score", "lang", 0.2).collect()
    en = sorted(r["doc_id"] for r in out if r["lang"] == "en")
    de = sorted(r["doc_id"] - 100 for r in out if r["lang"] == "de")
    # percent_rank >= 0.2 keeps ranks where (rank-1)/(n-1) >= 0.2
    assert en == list(range(20, 100))   # bottom 20 of 100 cut (0..19)
    assert de == list(range(2, 10))     # bottom 2 of 10 cut


def test_temperature_mix_weights_and_quota(spark):
    from cdc_system_spark.operators.sampling import temperature_mix

    rows = [(i, "en" if i < 900 else ("de" if i < 990 else "sw")) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = {r["lang"]: r for r in temperature_mix(df, "lang", alpha=0.5).collect()}
    assert out["en"]["n_docs"] == 900 and out["sw"]["n_docs"] == 10
    # weights normalize and quotas redistribute ~N (rounding slack)
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-5
    assert abs(sum(r["quota"] for r in out.values()) - 1000) <= len(out)
    # alpha=0.5 flattens: the rare language gains share, the head loses
    assert out["sw"]["quota"] > 10 and out["en"]["quota"] < 900
    # alpha=1.0 keeps natural proportions exactly
    nat = {r["lang"]: r for r in temperature_mix(df, "lang", alpha=1.0).collect()}
    assert all(nat[lg]["quota"] == nat[lg]["n_docs"] for lg in nat)


def test_global_shuffle_is_a_dense_permutation(spark):
    from cdc_system_spark.operators.sampling import global_shuffle

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = global_shuffle(df, salt="t", num_shards=8).collect()
    assert sorted(r["global_pos"] for r in out) == list(range(1, 501))
    # layout-independent: same permutation after an arbitrary repartition
    pos = {r["doc_id"]: r["global_pos"] for r in out}
    again = global_shuffle(df.repartition(7), salt="t", num_shards=8).collect()
    assert {r["doc_id"]: r["global_pos"] for r in again} == pos
    # a different salt draws a different permutation
    other = global_shuffle(df, salt="u", num_shards=8).collect()
    assert {r["doc_id"]: r["global_pos"] for r in other} != pos
    with pytest.raises(ValueError, match="num_shards"):
        global_shuffle(df, num_shards=0)


def test_token_histogram_partitions_the_corpus(spark):
    from cdc_system_spark.operators.text import token_histogram

    docs = _docs(
        spark,
        [(1, "a b c"), (2, "a b c d e"), (3, " ".join(["t"] * 40)), (4, "x")],
    )
    out = {r["bucket"]: r for r in token_histogram(docs, width=16).collect()}
    assert out[0]["n_docs"] == 3 and out[0]["n_tokens"] == 3 + 5 + 1
    assert out[2]["n_docs"] == 1 and out[2]["lo_tokens"] == 32
    assert abs(sum(r["share"] for r in out.values()) - 1.0) < 1e-5
    with pytest.raises(ValueError, match="width"):
        token_histogram(docs, width=0)


def test_temperature_sample_hits_quotas(spark):
    from cdc_system_spark.operators.sampling import temperature_mix, temperature_sample

    rows = [(i, "en" if i < 900 else ("de" if i < 990 else "sw")) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    quotas = {r["lang"]: r["quota"] for r in temperature_mix(df, "lang", 0.5).collect()}
    got = temperature_sample(df, "lang", 0.5, salt="t").groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in got}
    # head downsamples to quota; tail keeps min(quota, size)
    assert counts["en"] == quotas["en"] < 900
    assert counts["de"] == min(quotas["de"], 90)
    assert counts["sw"] == min(quotas["sw"], 10) == 10
    # deterministic under relayout, different under another salt
    again = temperature_sample(df.repartition(7), "lang", 0.5, salt="t")
    assert {r["doc_id"] for r in again.collect()} == {
        r["doc_id"] for r in temperature_sample(df, "lang", 0.5, salt="t").collect()
    }


def test_curate_corpus_quality_survivor_mode(spark):
    from cdc_system_spark.operators.curation import curate_corpus

    base = " ".join(f"tok{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            # near-dup pair: 2 is longer (higher length-saturation score)
            (1, base, "en"),
            (2, base + " extra trailing tokens here", "en"),
            (3, " ".join(f"zz{i}" for i in range(30)), "en"),
        ],
        "doc_id long, text string, lang string",
    )
    bench = spark.createDataFrame([(99, "zz xx cc vv bb nn")], "doc_id long, text string")
    kw = dict(rates={"en": 1.0}, min_tokens=2)
    min_id = {r["doc_id"] for r in curate_corpus(docs, bench, **kw).collect()}
    qual = {r["doc_id"] for r in curate_corpus(docs, bench, survivor="quality", **kw).collect()}
    # both keep one of the near-dup pair plus doc 3; quality mode keeps
    # the higher-scoring copy (2), min-id keeps 1
    assert 3 in min_id and 3 in qual
    if 1 in min_id or 2 in min_id:   # pair actually clustered by LSH
        assert 1 in min_id and 2 not in min_id
        assert 2 in qual and 1 not in qual
    import pytest as _pytest

    with _pytest.raises(ValueError, match="survivor"):
        curate_corpus(docs, bench, survivor="nope", **kw)


def test_write_training_shards_materializes_shuffle_order(spark, tmp_path):
    import glob

    from cdc_system_spark.operators.sampling import (
        global_shuffle,
        write_training_shards,
    )

    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    out = str(tmp_path / "shards")
    write_training_shards(df, out, num_files=8, salt="t")

    # file ranges partition [1, N] contiguously and rows sort within
    ranges = []
    for f in sorted(glob.glob(out + "/*.parquet")):
        rows = spark.read.parquet(f).orderBy("global_pos").collect()
        pos = [r["global_pos"] for r in rows]
        assert pos == sorted(pos)
        if pos:
            ranges.append((pos[0], pos[-1], len(pos)))
    ranges.sort()
    covered = sum(n for _, _, n in ranges)
    assert covered == 1000
    for (a_lo, a_hi, _), (b_lo, b_hi, _) in zip(ranges, ranges[1:]):
        assert a_hi < b_lo            # contiguous, non-overlapping
    # the materialized order IS the global_shuffle permutation
    expect = {
        r["doc_id"]: r["global_pos"]
        for r in global_shuffle(df, salt="t").collect()
    }
    got = {
        r["doc_id"]: r["global_pos"] for r in spark.read.parquet(out).collect()
    }
    assert got == expect


# -- near-dup-aware incremental ingest ---------------------------------------


def test_neardup_ingest_rejects_edited_copy_admits_fresh(spark):
    from cdc_system_spark.operators.curation import neardup_ingest

    base = " ".join(f"token{i} word{i} item{i}" for i in range(40))
    corpus = _docs(spark, [(1, base), (2, "a completely different document about rivers and mountains " * 3)])
    batch = _docs(
        spark,
        [
            # near-copy of corpus doc 1 (one word changed) -> rejected
            (10, base.replace("token7", "CHANGED")),
            # unrelated fresh doc -> admitted
            (11, "entirely novel content with no overlap whatsoever " * 4),
        ],
    )
    admitted = neardup_ingest(corpus, batch, threshold=0.5)
    assert {r["doc_id"] for r in admitted.collect()} == {11}


def test_neardup_ingest_never_compares_corpus_to_itself(spark):
    # two corpus docs that are near-dups of EACH OTHER must not affect
    # admission of an unrelated batch
    from cdc_system_spark.operators.curation import neardup_ingest

    base = " ".join(f"alpha{i} beta{i}" for i in range(40))
    corpus = _docs(spark, [(1, base), (2, base.replace("alpha3", "XX"))])
    batch = _docs(spark, [(10, "fresh and unrelated material here " * 5)])
    admitted = neardup_ingest(corpus, batch, threshold=0.5)
    assert {r["doc_id"] for r in admitted.collect()} == {10}


def test_neardup_ingest_shared_id_does_not_cross_match(spark):
    # a CDC UPDATE re-uses its doc_id: the batch doc shares id=1 with a
    # corpus doc but has unrelated text — it must be admitted (the
    # estimate must pair batch signatures with CORPUS signatures, never
    # batch-with-batch or id-collided rows)
    from cdc_system_spark.operators.curation import neardup_ingest

    corpus = _docs(spark, [(1, " ".join(f"legacy{i} text{i}" for i in range(40)))])
    batch = _docs(spark, [(1, "totally rewritten page content after the update " * 4)])
    admitted = neardup_ingest(corpus, batch, threshold=0.3)
    assert {r["doc_id"] for r in admitted.collect()} == {1}


def test_neardup_ingest_dedups_within_batch(spark):
    # two near-duplicate FRESH docs in one micro-batch: both pass the
    # corpus probe (neither is in the corpus yet) — the within-batch
    # pass must keep only the smaller id; within_batch=False documents
    # the old accretion behavior
    from cdc_system_spark.operators.curation import neardup_ingest

    base = " ".join(f"token{i} word{i} item{i}" for i in range(40))
    corpus = _docs(spark, [(1, "existing corpus text about oceans " * 5)])
    batch = _docs(
        spark,
        [
            (10, base),
            (11, base.replace("token7", "CHANGED")),  # near-dup of 10
            (12, "entirely novel content with no overlap whatsoever " * 4),
        ],
    )
    admitted = neardup_ingest(corpus, batch, threshold=0.5)
    assert {r["doc_id"] for r in admitted.collect()} == {10, 12}
    legacy = neardup_ingest(corpus, batch, threshold=0.5, within_batch=False)
    assert {r["doc_id"] for r in legacy.collect()} == {10, 11, 12}


def test_neardup_ingest_report_best_match(spark):
    from cdc_system_spark.operators.curation import neardup_ingest_report

    base = " ".join(f"token{i} word{i} item{i}" for i in range(40))
    corpus = _docs(spark, [(1, base), (2, base.replace("token5", "ALT"))])
    batch = _docs(spark, [(10, base.replace("token7", "CHANGED"))])
    rows = neardup_ingest_report(corpus, batch).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["doc_id"] == 10 and r["best_match"] in (1, 2)
    assert r["est_jaccard"] >= 0.5


def test_token_budget_sample_greedy_prefix(spark):
    from cdc_system_spark.operators.sampling import token_budget_sample

    docs = spark.createDataFrame(
        [(i, "en", "w " * 9 + "w") for i in range(10)]  # 10 tokens each
        + [(100, "de", "x y z")],
        "doc_id long, lang string, text string",
    )
    out = token_budget_sample(docs, budget_tokens=35, strata_col="lang")
    rows = out.collect()
    en = [r for r in rows if r["lang"] == "en"]
    assert len(en) == 3                       # 3 docs x 10 tokens <= 35 < 4 docs
    assert max(r["cum_tokens"] for r in en) == 30
    de = [r for r in rows if r["lang"] == "de"]
    assert len(de) == 1 and de[0]["n_tokens"] == 3   # whole tiny stratum kept


def test_token_budget_sample_is_salt_deterministic(spark):
    from cdc_system_spark.operators.sampling import token_budget_sample

    docs = spark.createDataFrame(
        [(i, "en", "tok " * 4 + "tok") for i in range(20)],
        "doc_id long, lang string, text string",
    )
    a = {r["doc_id"] for r in token_budget_sample(docs, 25, salt="s").collect()}
    b = {r["doc_id"] for r in token_budget_sample(docs, 25, salt="s").collect()}
    c = {r["doc_id"] for r in token_budget_sample(docs, 25, salt="other").collect()}
    assert a == b and len(a) == 5
    assert c != a  # different salt draws a different prefix (20C5 ≫ collisions)


def test_curation_funnel_is_monotone_and_matches_pipeline(spark):
    from cdc_system_spark.operators.curation import curate_corpus, curation_funnel

    rows = [
        (i, "en", " ".join(f"w{i}t{j} common words here" for j in range(8)))
        for i in range(40)
    ]
    rows += [(100 + i, "en", rows[i][2]) for i in range(10)]  # exact dupes
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    corpus = docs.filter("doc_id % 7 <> 0")
    bench = docs.filter("doc_id % 7 = 0")
    funnel = {r["stage"]: r["n_docs"] for r in curation_funnel(corpus, bench).collect()}
    order = ["input", "exact_dedup", "neardup_clusters", "quality_filters",
             "decontaminated", "sampled"]
    assert list(funnel) == order or set(funnel) == set(order)
    vals = [funnel[s] for s in order]
    assert vals[0] == corpus.count()
    assert all(a >= b for a, b in zip(vals, vals[1:]))  # monotone shrink
    assert funnel["sampled"] == curate_corpus(corpus, bench).count()


def test_packing_efficiency_math(spark):
    from cdc_system_spark.operators.curation import packing_efficiency

    # one shard (ids all % 8 == 1): docs of 10 tokens, ctx 16
    docs = spark.createDataFrame(
        [(1, "t " * 9 + "t"), (9, "t " * 9 + "t"), (17, "t " * 9 + "t")],
        "doc_id long, text string",
    )
    rows = packing_efficiency(docs, ctx_tokens=16, n_shards=8).collect()
    assert len(rows) == 1
    r = rows[0]
    # 30 tokens over ceil(30/16)=2 sequences -> fill 30/32
    assert r["n_docs"] == 3 and r["n_tokens"] == 30 and r["n_seqs"] == 2
    assert r["fill_ratio"] == round(30 / 32, 6)
    # doc1 [0,10) seq0; doc9 [10,20) spans 0->1; doc17 [20,30) seq1
    assert r["n_spanning"] == 1


def test_containment_catches_quoted_subset(spark):
    # doc 2 is doc 1 quoted inside a much longer page: Jaccard is low
    # (big union) but containment of the smaller set is ~1
    from cdc_system_spark.operators.dedup import containment_pairs

    quote = "the quick brown fox jumps over the lazy dog " * 3
    page = quote + " ".join(f"filler{i} unrelated{i} padding{i}" for i in range(15))
    docs = spark.createDataFrame(
        [(1, quote), (2, page)], "doc_id long, text string"
    )
    rows = containment_pairs(docs, k=7).collect()  # single-row bands (default)
    assert rows, "LSH must band the shared prefix together"
    r = rows[0]
    assert (r["id1"], r["id2"]) == (1, 2)
    assert r["est_containment"] > 0.8
    assert r["est_containment"] > r["est_jaccard"]  # the asymmetric gap
    assert r["n_sh1"] < r["n_sh2"]


def test_drop_contained_keeps_superset(spark):
    from cdc_system_spark.operators.dedup import drop_contained

    quote = "the quick brown fox jumps over the lazy dog " * 3
    page = quote + " ".join(f"filler{i} unrelated{i}" for i in range(15))
    other = "completely different standalone document body " * 4
    docs = spark.createDataFrame(
        [(1, quote), (2, page), (3, other)], "doc_id long, text string"
    )
    kept = {r["doc_id"] for r in drop_contained(docs, threshold=0.8).collect()}
    assert kept == {2, 3}     # the quote (contained) drops, superset stays


def test_containment_clusters_feed_leakage_safe_split(spark):
    # the composition the subset-dedup surface exists for: containment
    # pairs -> duplicate_clusters -> leakage_safe_split, so a quote and
    # the page containing it can never straddle the train/test line
    from cdc_system_spark.operators.dedup import (
        containment_pairs,
        duplicate_clusters,
    )
    from cdc_system_spark.operators.sampling import leakage_safe_split

    quote = "the quick brown fox jumps over the lazy dog " * 3
    page = quote + " ".join(f"filler{i} unrelated{i}" for i in range(15))
    docs = spark.createDataFrame(
        [(1, quote), (2, page)]
        + [(i, f"standalone doc {i} " * 10) for i in range(10, 40)],
        "doc_id long, text string",
    )
    pairs = containment_pairs(docs, k=7).filter("est_containment >= 0.8")
    clusters = duplicate_clusters(docs, pairs.select("id1", "id2"))
    split = leakage_safe_split(
        docs, clusters=clusters, splits={"train": 0.5, "test": 0.5}
    )
    got = {r["doc_id"]: r["split"] for r in split.collect()}
    assert got[1] == got[2]          # contained pair shares a split
    assert len(got) == 32            # nothing dropped


def test_containment_safe_split_operator(spark):
    # the packaged form of the composition above: a contained doc
    # FOLLOWS its superset's split, transitively (quote ⊂ page ⊂ book
    # all one group), and singletons split independently of each other
    from cdc_system_spark.operators.sampling import containment_safe_split

    quote = "the quick brown fox jumps over the lazy dog " * 3
    page = quote + " ".join(f"filler{i} unrelated{i}" for i in range(15))
    book = page + " appendix material entirely new " * 10
    docs = spark.createDataFrame(
        [(1, quote), (2, page), (3, book)]
        + [(i, f"standalone doc {i} " * 10) for i in range(10, 40)],
        "doc_id long, text string",
    )
    split = containment_safe_split(
        docs, threshold=0.8, splits={"train": 0.5, "test": 0.5}, salt="t"
    )
    got = {r["doc_id"]: (r["group_id"], r["split"]) for r in split.collect()}
    assert got[1] == got[2] == got[3] == (1, got[1][1])  # one chain-group
    assert len(got) == 33
    assert {s for _, s in got.values()} == {"train", "test"}


def test_bottomk_sample_fixed_budget_and_mergeable(spark):
    from cdc_system_spark.operators.sampling import bottomk_sample

    df = spark.range(1000).select(F.col("id").alias("doc_id"),
                                  (F.col("id") * 2).alias("payload"))
    whole = bottomk_sample(df, 25)
    assert whole.count() == 25
    assert whole.columns == ["doc_id", "payload"]
    shards = [
        bottomk_sample(df.filter(F.col("doc_id") % 4 == i), 25)
        for i in range(4)
    ]
    u = shards[0]
    for s in shards[1:]:
        u = u.unionByName(s)
    merged = bottomk_sample(u, 25)
    assert sorted(r["doc_id"] for r in merged.collect()) == sorted(
        r["doc_id"] for r in whole.collect()
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bottomk_sample(df, 0)


def test_containment_ingest_rejects_quoted_subset(spark):
    # the case neardup_ingest MISSES by design: an excerpt of a long
    # corpus page has tiny Jaccard (the union is the page) but
    # containment ~1 — the asymmetric gate rejects it; a batch doc
    # CONTAINING a small corpus doc is admitted (it brings new content)
    from cdc_system_spark.operators.curation import (
        containment_ingest,
        neardup_ingest,
    )

    page = " ".join(f"sentence{i} about topic{i} detail{i}" for i in range(40))
    excerpt = page[100:220]
    corpus = _docs(
        spark,
        [(1, page), (2, "tiny corpus note on rivers")],
    )
    batch = _docs(
        spark,
        [
            (10, excerpt),  # quoted subset of corpus doc 1 -> rejected
            (11, "entirely novel content with no overlap whatsoever " * 4),
            # superset of corpus doc 2 -> admitted (brings new content)
            (12, "tiny corpus note on rivers plus a long original "
                 "continuation " + " ".join(f"extra{i}" for i in range(30))),
        ],
    )
    admitted = containment_ingest(corpus, batch, threshold=0.8)
    assert {r["doc_id"] for r in admitted.collect()} == {11, 12}
    # and the symmetric gate indeed admits the excerpt (the gap this
    # operator exists to close)
    sym = neardup_ingest(corpus, batch, threshold=0.5)
    assert 10 in {r["doc_id"] for r in sym.collect()}


def test_containment_ingest_within_batch_and_same_id(spark):
    from cdc_system_spark.operators.curation import containment_ingest

    page = " ".join(f"fresh{i} page{i} words{i}" for i in range(40))
    corpus = _docs(spark, [(1, " ".join(f"old{i} row{i}" for i in range(40)))])
    batch = _docs(
        spark,
        [
            (10, page),          # fresh page
            (11, page[50:170]),  # its quoted excerpt, same batch -> drop
            (12, "unrelated novel material " * 6),
        ],
    )
    admitted = containment_ingest(corpus, batch, threshold=0.8)
    assert {r["doc_id"] for r in admitted.collect()} == {10, 12}
    legacy = containment_ingest(
        corpus, batch, threshold=0.8, within_batch=False
    )
    assert {r["doc_id"] for r in legacy.collect()} == {10, 11, 12}
    # allow_same_id: a CDC UPDATE truncating its own row to a subset
    # must still replace it
    trunc = _docs(spark, [(1, corpus.head()["text"][:120])])
    gated = containment_ingest(corpus, trunc, threshold=0.8)
    assert gated.count() == 0
    allowed = containment_ingest(
        corpus, trunc, threshold=0.8, allow_same_id=True
    )
    assert allowed.count() == 1


def test_cc_capped_iterations_match_unpaired_reference(spark):
    # r13: both CC loops run contraction/propagation rounds in PAIRS
    # with one fused signature action per pair. The pairing must not
    # change the ROUND-COUNT semantics of the max_iters cap: a capped
    # run's labels must equal exactly max_iters rounds of the unpaired
    # reference (computed here in pure Python), and a converged run's
    # labels must equal the fixed point regardless of where in a pair
    # convergence lands.
    from collections import defaultdict

    from cdc_system_spark.operators.dedup import (
        duplicate_clusters,
        star_contraction_clusters,
    )

    chain = [(i, i + 1) for i in range(8)]          # diameter stretches rounds
    extra = [(20, 21), (21, 22), (40, 41)]
    edge_list = chain + extra
    docs = spark.createDataFrame(
        [(n,) for n in range(45)], "doc_id long"
    )
    pairs = spark.createDataFrame(edge_list, "id1 long, id2 long")

    adj = defaultdict(set)
    for a, b in edge_list:
        adj[a].add(b)
        adj[b].add(a)

    def lp_ref(rounds: int) -> dict[int, int]:
        labels = {n: min({n} | adj[n]) for n in adj}
        for _ in range(rounds):
            labels = {
                n: min([labels[n]] + [labels[m] for m in adj[n]])
                for n in adj
            }
        return {
            n: labels.get(n, n) for n in range(45)
        }

    def star_round(edges: set) -> set:
        sym = edges | {(v, u) for u, v in edges}
        nbr = defaultdict(set)
        for u, v in sym:
            nbr[u].add(v)
        large = set()
        for u in nbr:
            m = min(nbr[u] | {u})
            for v in nbr[u]:
                if v > u:
                    large.add((v, m))
        oriented = {
            (max(u, v), min(u, v)) for u, v in large if u != v
        }
        nbr2 = defaultdict(set)
        for u, v in oriented:
            nbr2[u].add(v)
        res = set()
        for u in nbr2:
            m = min(nbr2[u])
            for v in nbr2[u]:
                if v != m:
                    res.add((v, m))
            res.add((u, m))
        return {(u, v) for u, v in res if u != v}

    def star_ref(rounds: int) -> dict[int, int]:
        edges = {
            (max(a, b), min(a, b)) for a, b in edge_list if a != b
        }
        for _ in range(rounds):
            edges = star_round(edges)
        roots = defaultdict(list)
        for u, v in edges:
            roots[u].append(v)
        lbl = {u: min(vs) for u, vs in roots.items()}
        return {n: lbl.get(n, n) for n in range(45)}

    for k in (1, 2, 3, 25):
        got_lp = {
            r["doc_id"]: r["cluster_id"]
            for r in duplicate_clusters(docs, pairs, max_iters=k).collect()
        }
        assert got_lp == lp_ref(k), f"LP mismatch at max_iters={k}"
        got_st = {
            r["doc_id"]: r["cluster_id"]
            for r in star_contraction_clusters(
                docs, pairs, max_iters=k
            ).collect()
        }
        assert got_st == star_ref(k), f"star mismatch at max_iters={k}"
    # fully converged: every chain member labels to its component min
    assert got_lp[8] == 0 and got_lp[22] == 20 and got_lp[41] == 40
    assert got_st == got_lp
