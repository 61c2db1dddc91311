"""Unit semantics for the corpus-curation operators added in round 2:
TF-IDF, repetition signals, decontamination, stratified sampling.
(Oracle parity is covered by verify_local; these pin the edge cases.)"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cdc_system_spark.operators.dedup import decontaminate, token_ngrams
from cdc_system_spark.operators.sampling import stratified_sample
from cdc_system_spark.operators.text import repetition_signals, tfidf_top_terms


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_rare_term_outranks_common(spark):
    docs = _docs(
        spark,
        [
            (1, "the cat sat"),
            (2, "the dog ran"),
            (3, "the cat ran"),
        ],
    )
    out = tfidf_top_terms(docs, top_k=1).collect()
    # "the" appears in all docs (df=3 → idf=1); each doc's unique-ish
    # term (df=1 → idf=2) must win its top slot
    top = {r["doc_id"]: r["term"] for r in out}
    assert top[1] == "sat"  # df=1, beats cat(df=2) and the(df=3)
    assert top[2] == "dog"
    for r in out:
        assert r["rk"] == 1


def test_tfidf_deterministic_tiebreak(spark):
    docs = _docs(spark, [(1, "b a"), (2, "x y")])
    out = tfidf_top_terms(docs, top_k=2)
    r1 = [(r["doc_id"], r["term"]) for r in out.collect()]
    # all terms df=1, tf=1 → equal scores; tiebreak = term asc
    assert (1, "a") in r1 and r1.index((1, "a")) < r1.index((1, "b"))


def test_repetition_signals_flags_repeats(spark):
    docs = _docs(
        spark,
        [
            (1, "spam ham " * 50 + "end"),      # "spam ham"/"ham spam" dominate
            (2, " ".join(f"w{i}" for i in range(40))),  # all distinct, no repeats
            (3, "one"),                          # single token: no 2-grams
        ],
    )
    got = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert got[1]["top_2gram_frac"] > 0.4 and not got[1]["keep"]
    assert got[2]["dup_word_frac"] == 0.0 and got[2]["keep"]
    assert got[3]["top_2gram_frac"] == 0.0  # empty gram array, no null leak


def test_repetition_signals_empty_doc_survives_ansi(spark):
    # Spark 4 runs ANSI mode by default: an unguarded division by
    # LENGTH(text)=0 would abort the whole job with DIVIDE_BY_ZERO.
    # Empty docs are routine in web corpora — must pass through cleanly.
    docs = _docs(spark, [(1, ""), (2, "a normal doc")])
    got = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert got[1]["symbol_ratio"] == 0.0
    assert got[1]["top_2gram_frac"] == 0.0
    assert got[2]["symbol_ratio"] == 0.0  # letters+spaces only


def test_ngram_jaccard_short_doc_survives_ansi(spark):
    # a doc shorter than n tokens must yield no grams, not an ANSI
    # INVALID_ARRAY_INDEX abort (same hazard class as the empty-doc
    # division: rare rows that kill the whole job)
    from cdc_system_spark.operators.dedup import ngram_jaccard_pairs

    docs = _docs(
        spark,
        [
            (1, "only two"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "the quick brown fox jumps over the lazy cat"),
        ],
    )
    rows = ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    assert [(r["id1"], r["id2"]) for r in rows] == [(2, 3)]


def test_token_ngrams_short_doc_empty(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c d e")])
    out = df.select("doc_id", token_ngrams("text", 5).alias("g")).collect()
    got = {r["doc_id"]: r["g"] for r in out}
    assert got[1] == []
    assert got[2] == ["a b c d e"]


def test_decontaminate_drops_overlapping_doc(spark):
    bench = _docs(spark, [(100, "secret eval answer key alpha beta")])
    corpus = _docs(
        spark,
        [
            (1, "totally clean document with no overlap at all here"),
            (2, "prefix junk secret eval answer key alpha suffix"),  # shares 5-gram
            (3, "short doc"),  # < 5 tokens: can never be contaminated
        ],
    )
    kept = {r["doc_id"] for r in decontaminate(corpus, bench, n=5).collect()}
    assert kept == {1, 3}


def test_contamination_report_ratios(spark):
    from cdc_system_spark.operators.dedup import contamination_report

    bench = _docs(spark, [(100, "secret eval answer key alpha beta")])
    corpus = _docs(
        spark,
        [
            (1, "totally clean document with no overlap at all here"),
            # 4 distinct 5-grams; "secret eval answer key alpha" and
            # "eval answer key alpha beta" hit the benchmark -> 2/4
            (2, "pre secret eval answer key alpha beta post"),
            (3, "short doc"),  # < 5 tokens: zero grams, never reported
        ],
    )
    out = {r["doc_id"]: r for r in contamination_report(corpus, bench, n=5).collect()}
    assert set(out) == {2}
    assert out[2]["n_grams"] == 4
    assert out[2]["n_contaminated"] == 2
    assert out[2]["contaminated_ratio"] == 0.5


def test_stratified_sample_deterministic_and_stratified(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)],
        "doc_id long, lang string",
    )
    s1 = stratified_sample(docs, "lang", {"en": 0.5, "de": 0.1}, id_col="doc_id")
    s2 = stratified_sample(docs, "lang", {"en": 0.5, "de": 0.1}, id_col="doc_id")
    assert sorted(r["doc_id"] for r in s1.collect()) == sorted(
        r["doc_id"] for r in s2.collect()
    )
    by_lang = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # 1000 docs per stratum; hash-uniform within ~15%
    assert 420 <= by_lang["en"] <= 580
    assert 60 <= by_lang["de"] <= 140
    # a different salt draws a different (but same-size-ish) sample
    s3 = stratified_sample(docs, "lang", {"en": 0.5, "de": 0.1}, id_col="doc_id", salt="x")
    assert {r["doc_id"] for r in s3.collect()} != {r["doc_id"] for r in s1.collect()}


def test_redact_pii_replaces_and_counts(spark):
    from cdc_system_spark.operators.text import redact_pii

    docs = _docs(
        spark,
        [
            (1, "reach me at alice@corp.example.org today"),
            (2, "call +1 (555) 123-4567 or 555-987-6543 now"),
            (3, "no personal data here"),
        ],
    )
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert got[1]["clean_text"] == "reach me at <EMAIL> today"
    assert (got[1]["n_emails"], got[1]["n_phones"]) == (1, 0)
    assert got[2]["clean_text"] == "call <PHONE> or <PHONE> now"
    assert got[2]["n_phones"] == 2
    assert got[3]["clean_text"] == "no personal data here"
    assert not got[3]["had_pii"]


def test_redact_pii_counts_match_replacements(spark):
    from cdc_system_spark.operators.text import redact_pii

    # a 9+-digit run inside an email local part is an email, not a
    # phone: n_phones counts on the email-redacted text, so it always
    # equals the number of <PHONE> tokens in clean_text
    docs = _docs(spark, [(1, "mail 5551234567x@example.com please")])
    row = redact_pii(docs).collect()[0]
    assert row["clean_text"] == "mail <EMAIL> please"
    assert (row["n_emails"], row["n_phones"]) == (1, 0)


def test_rarity_score_orders_rare_above_common(spark):
    from cdc_system_spark.operators.text import rarity_score

    # "common" appears 4x in the corpus, "unique" once
    docs = _docs(
        spark,
        [(1, "common common common"), (2, "common unique")],
    )
    got = {r["doc_id"]: r["mean_rarity"] for r in rarity_score(docs).collect()}
    assert got[2] > got[1]
    assert got[1] == 0.25  # every token has corpus freq 4
    assert got[2] == round((0.25 + 1.0) / 2, 6)


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing contract: docs sharing a substring of length
    k + window - 1 share at least one fingerprint; disjoint docs with
    disjoint alphabets share none; fingerprints are deduped."""
    from cdc_system_spark.operators.text import winnow_fingerprints

    shared = "the quick brown fox jumps"
    docs = _docs(
        spark,
        [
            (1, "AAAA " + shared + " BBBB"),
            (2, "CCCC " + shared + " DDDD"),
            (3, "zzzzzzzzzzzzzzzzzzzzzzzzzz"),
        ],
    )
    out = winnow_fingerprints(docs, k=7, window=4)
    fps = {}
    rows = out.collect()
    for r in rows:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] & fps[2]            # shared substring -> shared fp
    assert not (fps[1] & fps[3])      # disjoint alphabet -> no overlap
    # deduped: row count equals sum of set sizes
    assert len(rows) == sum(len(s) for s in fps.values())
    with pytest.raises(ValueError, match="k and window"):
        winnow_fingerprints(docs, k=0)


def test_quality_survivors_keeps_best_per_cluster(spark):
    from cdc_system_spark.operators.dedup import quality_survivors

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5)],  # cluster {1,2,3} + singletons
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.1), (5, 0.5)],
        "doc_id long, quality_score double",
    )
    got = {
        r["cluster_id"]: r["doc_id"]
        for r in quality_survivors(clusters, scores).collect()
    }
    # best score wins; score tie broken by smaller id; singletons survive
    assert got == {1: 2, 4: 4, 5: 5}


def test_boilerplate_prefixes_finds_injected_headers(spark):
    from cdc_system_spark.operators.text import boilerplate_prefixes

    import random

    rng = random.Random(7)
    rows = []
    for i in range(100):
        body = " ".join(f"w{rng.randint(0, 10**9)}" for _ in range(10))
        header = "SITE NAV | HOME | ABOUT | CONTACT | "   # > prefix_chars
        text = (header + body) if i % 4 == 0 else body
        rows.append((i, "web", text))
    rows.append((1000, "tiny", "only doc of its source"))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = boilerplate_prefixes(docs, min_share=0.2).collect()
    found = {(r["source"], r["prefix"]): r for r in out}
    # the injected header is the only repeated prefix in 'web'
    web_hits = [k for k in found if k[0] == "web"]
    assert web_hits and web_hits[0][1] == "SITE NAV | HOME | ABOUT | CONT"
    assert len(web_hits) == 1
    assert found[web_hits[0]]["n_docs"] == 25
    assert abs(found[web_hits[0]]["share"] - 0.25) < 1e-9
    # the single-doc source trivially "repeats" at share 1.0 — callers
    # gate by source size; the operator reports honestly
    assert found[("tiny", "only doc of its source"[:30])]["share"] == 1.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_share"):
        boilerplate_prefixes(docs, min_share=0.0)
    with _pytest.raises(ValueError, match="prefix_chars"):
        boilerplate_prefixes(docs, prefix_chars=0)


def test_strip_boilerplate_removes_flagged_prefixes_only(spark):
    from cdc_system_spark.operators.text import (
        boilerplate_prefixes,
        strip_boilerplate,
    )

    import random

    rng = random.Random(11)
    rows = []
    bodies = {}
    for i in range(40):
        body = " ".join(f"w{rng.randint(0, 10**9)}" for _ in range(8))
        bodies[i] = body
        header = "LEGAL NOTICE *** ALL RIGHTS *** "  # 32 chars > prefix 30
        text = (header + body) if i % 2 == 0 else body
        rows.append((i, "web", text))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in strip_boilerplate(docs, min_share=0.2).collect()}
    assert len(out) == 40  # row-preserving
    assert set(out[0].asDict()) == {"doc_id", "source", "text", "stripped"}
    for i in range(40):
        if i % 2 == 0:
            assert out[i]["stripped"], i
            # first 30 header chars cut, remainder left-trimmed:
            # "LEGAL NOTICE *** ALL RIGHTS **" | "* " + body
            assert out[i]["text"] == "* " + bodies[i], i
        else:
            assert not out[i]["stripped"], i
            assert out[i]["text"] == bodies[i], i
    # precomputed flag table is honored (detect once, apply many)
    flags = boilerplate_prefixes(docs, min_share=0.2)
    out2 = {
        r["doc_id"]: r["text"]
        for r in strip_boilerplate(docs, flagged=flags, min_share=0.2).collect()
    }
    assert out2 == {i: out[i]["text"] for i in out}
    # an empty flag table strips nothing
    none = strip_boilerplate(docs, flagged=flags.filter("n_docs < 0")).collect()
    assert all(not r["stripped"] for r in none)


def test_line_dedup_drops_repeated_lines_and_preserves_order(spark):
    from cdc_system_spark.operators.text import line_dedup

    footer = "COOKIES | PRIVACY | TERMS"
    docs = spark.createDataFrame(
        [
            (1, "web", f"alpha one\n{footer}\nbeta two"),
            (2, "web", f"{footer}\ngamma three"),
            (3, "web", "delta four\nepsilon five"),
            (4, "web", footer),  # nothing but boilerplate
            (5, "other", f"{footer}"),  # sole doc of its source: kept? no —
            # share 1.0 >= threshold, dropped; callers gate tiny sources
        ],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, min_share=0.5).collect()}
    # footer appears in 3/4 'web' docs (share 0.75 >= 0.5) — dropped;
    # every other line is unique (share 0.25) — kept, in order
    assert out[1]["text"] == "alpha one\nbeta two" and out[1]["changed"]
    assert out[2]["text"] == "gamma three" and out[2]["changed"]
    assert out[3]["text"] == "delta four\nepsilon five"
    assert not out[3]["changed"]
    assert out[4]["text"] == "" and out[4]["changed"]
    assert out[5]["text"] == "" and out[5]["changed"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_share"):
        line_dedup(docs, min_share=0.0)


def test_cross_source_dup_matrix_canonicalizes_and_counts(spark):
    from cdc_system_spark.operators.dedup import cross_source_dup_matrix

    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a"), (4, "c"), (5, "b")],
        "doc_id long, source string",
    )
    # pairs deliberately emitted in both source orders: (a,b) via 1-2
    # and (b,a) via 5-3 must land in the SAME unordered cell
    pairs = spark.createDataFrame(
        [(1, 2), (3, 5), (1, 3), (2, 4)], "id1 long, id2 long"
    )
    got = {
        (r["src_a"], r["src_b"]): r["n_pairs"]
        for r in cross_source_dup_matrix(docs, pairs).collect()
    }
    assert got == {("a", "b"): 2, ("a", "a"): 1, ("b", "c"): 1}


def test_lsh_recall_report_counts_and_null_on_no_truth(spark):
    from cdc_system_spark.operators.dedup import lsh_recall_report

    import random

    rng = random.Random(3)
    words = lambda n: " ".join(f"w{rng.randint(0, 10**9)}" for _ in range(n))  # noqa: E731
    twin = words(40)
    rows = [(1, twin), (2, twin)] + [(i, words(40)) for i in range(3, 20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    row = lsh_recall_report(docs).collect()[0]
    # the identical twins are the only true pair; identical signatures
    # always share every band, so LSH must catch them
    assert row["n_true"] == 1
    assert row["n_caught"] == 1
    assert row["recall"] == 1.0
    # all-distinct corpus: no truth, recall is null (not a fake 1.0)
    empty = lsh_recall_report(docs.filter("doc_id > 2")).collect()[0]
    assert empty["n_true"] == 0
    assert empty["n_caught"] == 0
    assert empty["recall"] is None


# -- leakage-safe split ------------------------------------------------------


def test_leakage_safe_split_keeps_dup_groups_together(spark):
    from cdc_system_spark.operators.sampling import leakage_safe_split

    rows = [(i, f"unique document number {i}") for i in range(200)]
    rows += [(1000 + i, f"unique document number {i}") for i in range(0, 200, 5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(docs).collect()
    by_id = {r["doc_id"]: r for r in out}
    for i in range(0, 200, 5):
        assert by_id[1000 + i]["group_id"] == by_id[i]["group_id"] == i
        assert by_id[1000 + i]["split"] == by_id[i]["split"]
    assert {r["split"] for r in out} <= {"train", "val", "test"}


def test_leakage_safe_split_with_explicit_clusters(spark):
    from cdc_system_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    clusters = spark.createDataFrame([(2, 1)], "doc_id long, cluster_id long")
    out = {r["doc_id"]: r for r in leakage_safe_split(docs, clusters).collect()}
    assert out[2]["group_id"] == 1  # clustered with doc 1
    assert out[2]["split"] == out[1]["split"]
    assert out[3]["group_id"] == 3  # singleton keys off its own id


# -- vocabulary coverage -----------------------------------------------------


def test_vocab_coverage_ranks_and_cumulates(spark):
    from cdc_system_spark.operators.text import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b  c")],  # double space -> empty token dropped
        "doc_id long, text string",
    )
    rows = vocab_coverage(docs, top_n=2).collect()
    assert [(r["rank"], r["token"], r["n_occurrences"]) for r in rows] == [
        (1, "a", 4),
        (2, "b", 3),
    ]
    # shares are over the FULL corpus (9 tokens incl. the 2 c's)
    assert rows[0]["share"] == round(4 / 9, 6)
    assert rows[1]["cum_share"] == round(7 / 9, 6)


def test_vocab_coverage_tie_breaks_by_token(spark):
    from cdc_system_spark.operators.text import vocab_coverage

    docs = spark.createDataFrame([(1, "z y z y")], "doc_id long, text string")
    rows = vocab_coverage(docs, top_n=2).collect()
    assert [r["token"] for r in rows] == ["y", "z"]  # equal counts -> lexical


# -- BM25 ---------------------------------------------------------------------


def test_bm25_ranks_by_relevance_and_length(spark):
    from cdc_system_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark"),            # high tf, short
            (2, "spark engine " + "pad " * 50),  # 1 hit, long -> penalized
            (3, "spark spark other words here"),
            (4, "nothing relevant at all"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ["spark"], k=10).collect()
    ids = [r["doc_id"] for r in rows]
    assert 4 not in ids                     # no match -> absent
    assert ids[0] == 1                      # highest tf, shortest
    assert ids.index(3) < ids.index(2)      # length normalization works
    assert all(rows[i]["bm25"] >= rows[i + 1]["bm25"] for i in range(len(rows) - 1))


def test_bm25_multi_term_sums_per_term_scores(spark):
    from cdc_system_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha alpha"), (3, "beta gamma")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["bm25"] for r in bm25_topk(docs, ["alpha", "beta"], k=10).collect()}
    assert rows[1] > rows[2]  # two distinct rare-ish terms beat repeating one
    assert set(rows) == {1, 2, 3}


def test_bm25_rejects_empty_query(spark):
    import pytest as _pytest

    from cdc_system_spark.operators.text import bm25_topk

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        bm25_topk(docs, [])


# -- OOV rate + charset quality -------------------------------------------------


def test_oov_rate_counts_unknown_tokens(spark):
    from cdc_system_spark.operators.text import oov_rate

    docs = spark.createDataFrame(
        [(1, "a b zz"), (2, "a  a")], "doc_id long, text string"
    )
    vocab = spark.createDataFrame([("a",), ("b",)], "token string")
    got = {r["doc_id"]: r for r in oov_rate(docs, vocab).collect()}
    assert got[1]["n_tokens"] == 3 and got[1]["n_oov"] == 1
    assert got[1]["oov_rate"] == round(1 / 3, 6)
    assert got[2]["n_tokens"] == 2 and got[2]["n_oov"] == 0  # empty token dropped


def test_charset_quality_ratios_and_verdict(spark):
    from cdc_system_spark.operators.text import charset_quality

    german = "Die Tür steht offen und niemand geht je hindurch"
    docs = spark.createDataFrame(
        [
            (1, "Hello World 42"),          # clean
            (2, "1234567890"),              # all digits -> digit gate trips
            (3, "bin\x01\x02ary"),          # non-printable -> rejected
            (4, "line one\nline two\ttab"), # \n\t are printable text
            (5, german),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in charset_quality(docs).collect()}
    assert got[1]["keep"] and got[1]["nonprintable_ratio"] == 0.0
    assert got[1]["digit_ratio"] == round(2 / 14, 6)
    assert got[1]["upper_ratio"] == round(2 / 14, 6)
    assert not got[2]["keep"] and got[2]["digit_ratio"] == 1.0
    assert not got[3]["keep"] and got[3]["nonprintable_ratio"] == 0.25  # 2/8
    # multi-line/tabbed docs must NOT be counted non-printable
    assert got[4]["keep"] and got[4]["nonprintable_ratio"] == 0.0
    # one umlaut (~2% of chars) passes the 5% Latin-prose allowance;
    # the non-ASCII letter IS counted (documented behavior)
    assert got[5]["nonprintable_ratio"] == round(1 / len(german), 6)
    assert got[5]["keep"]


def test_bigram_surprisal_separates_common_from_rare(spark):
    from cdc_system_spark.operators.text import bigram_surprisal

    # docs 1-3 repeat the same phrasing; doc 4 uses each word in novel
    # combinations -> every bigram unique -> higher mean ratio
    common = "the cat sat on the mat"
    docs = spark.createDataFrame(
        [(1, common), (2, common), (3, common), (4, "mat the on sat cat the")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bigram_surprisal(docs).collect()}
    assert got[1]["surprisal"] == got[2]["surprisal"] == got[3]["surprisal"]
    assert got[4]["surprisal"] > got[1]["surprisal"]
    assert got[1]["n_bigrams"] == 5


def test_bigram_surprisal_skips_short_docs(spark):
    from cdc_system_spark.operators.text import bigram_surprisal

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "two words")], "doc_id long, text string"
    )
    rows = {r["doc_id"] for r in bigram_surprisal(docs).collect()}
    assert rows == {2}


def test_blocklist_filter_verdicts_and_terms(spark):
    from cdc_system_spark.operators.text import blocklist_filter

    docs = spark.createDataFrame(
        [(1, "good clean text"), (2, "some bad stuff here bad"),
         (3, "bad and worse"), (4, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           blocklist_filter(docs, ["bad", "worse"]).collect()}
    assert len(got) == 4                        # every input doc present
    assert got[1]["keep"] and got[1]["n_hit_terms"] == 0
    assert not got[2]["keep"] and got[2]["n_hit_terms"] == 1  # distinct, not 2
    assert got[3]["hit_terms"] == "bad,worse"   # sorted joined string
    assert got[4]["keep"]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        blocklist_filter(docs, [])
