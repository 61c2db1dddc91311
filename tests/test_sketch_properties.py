"""Property-based checks for the portable sketches.

Pure-Python oracles (collections.Counter, md5 arithmetic) prove the
sketch math, not just row counts: the Count-Min estimate must upper-
bound the true count for EVERY input (the paper's one-sided guarantee
holds exactly here because everything is integer), and the containment
identity must reproduce the closed form from the integer inputs.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.hyp_budget import examples

from cdc_system_spark.operators.sketch import countmin_estimates

_WORD = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
_DOC = st.lists(_WORD, min_size=0, max_size=25).map(" ".join)


@given(st.lists(_DOC, min_size=1, max_size=12))
@settings(
    max_examples=examples(6, 10),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_countmin_upper_bound_holds_for_every_input(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    truth = Counter(t for d in docs for t in d.split(" ") if t)
    terms = ["aa", "cc", "ff", "absent"]
    got = {r["term"]: r for r in countmin_estimates(df, terms).collect()}
    for t in terms:
        assert got[t]["exact_count"] == truth.get(t, 0)
        assert got[t]["est_count"] >= got[t]["exact_count"]


_VALS = st.lists(
    st.integers(min_value=-5000, max_value=5000).map(lambda c: c / 100.0),
    min_size=1,
    max_size=60,
)


@given(_VALS)
@settings(
    max_examples=examples(6, 10),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_quantile_sketch_bracket_holds_for_every_input(spark, vals):
    from cdc_system_spark.operators.sketch import quantile_sketch

    df = spark.createDataFrame([(v,) for v in vals], "value double")
    svals = sorted(vals)
    n = len(vals)
    rows = quantile_sketch(df, "value", percents=(10, 50, 90)).collect()
    assert len(rows) == 3
    for r in rows:
        rank = max(-(-r["pct"] * n // 100), 1)
        assert r["target_rank"] == rank
        exact = svals[rank - 1]
        assert r["lo_est"] - 1e-9 <= exact <= r["hi_est"] + 1e-9


@given(_VALS, st.integers(min_value=1, max_value=7))
@settings(
    max_examples=examples(6, 10),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_equidepth_from_counts_equals_ntile_for_every_input(spark, vals, k):
    from cdc_system_spark.operators.sketch import equidepth_from_counts

    from tests.test_sketch import _exact_ntile_hist

    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = {
        r["bucket"]: (r["n"], r["lo"], r["hi"])
        for r in equidepth_from_counts(df, "value", k=k).collect()
    }
    assert got == _exact_ntile_hist(vals, k)


@given(
    st.sets(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=30),
    st.sets(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=30),
)
@settings(
    max_examples=examples(6, 10),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_bloom_no_false_negative_for_every_input(spark, members, probes):
    from cdc_system_spark.operators.bloom import bloom_build, bloom_probe

    build = spark.createDataFrame([(k,) for k in members], "k long")
    probe = spark.createDataFrame([(k,) for k in probes], "k long")
    bloom = bloom_build(build, "k")
    got = {
        r["k"]: r["maybe_member"]
        for r in bloom_probe(probe, "k", bloom).collect()
    }
    for k in probes & members:
        assert got[k], f"false negative on {k}"  # the hard guarantee
