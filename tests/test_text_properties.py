"""Property-based checks for the text-pipeline operators.

Oracles are independent pure-Python implementations (collections.Counter
over token lists) — the Spark side computes the same quantities with a
zero-shuffle sorted-array fold (repetition) and builtin array transforms
(n-grams), so the property proves the fold logic, not just row counts.
Hypothesis drives small vocabularies (to force repeats), empty-ish docs,
and single-token edges.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_system_spark.operators.dedup import token_ngrams
from cdc_system_spark.operators.text import repetition_signals

#: tiny vocab so 2-grams collide often (the interesting regime)
_WORD = st.sampled_from(["aa", "bb", "cc", "dd"])
_DOC = st.lists(_WORD, min_size=1, max_size=30).map(" ".join)


def _py_top_2gram_frac(text: str) -> float:
    w = text.split(" ")
    if len(w) < 2:
        return 0.0
    grams = [f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)]
    return round(Counter(grams).most_common(1)[0][1] / len(grams), 6)


def _py_dup_word_frac(text: str) -> float:
    w = text.split(" ")
    return round(1.0 - len(set(w)) / len(w), 6)


@given(st.lists(_DOC, min_size=1, max_size=20))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_repetition_fold_matches_counter(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    for i, text in enumerate(docs):
        assert got[i]["top_2gram_frac"] == _py_top_2gram_frac(text), text
        assert got[i]["dup_word_frac"] == _py_dup_word_frac(text), text


@given(st.lists(_DOC, min_size=1, max_size=20), st.integers(2, 6))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_token_ngrams_match_python(spark, docs, n):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    out = df.select("doc_id", token_ngrams("text", n).alias("g")).collect()
    got = {r["doc_id"]: r["g"] for r in out}
    for i, text in enumerate(docs):
        w = text.split(" ")
        want = (
            [" ".join(w[j : j + n]) for j in range(len(w) - n + 1)]
            if len(w) >= n
            else []
        )
        assert got[i] == want, (text, n)


# -- quantization properties (driver-side twin: pure Python, no Spark) --------


@given(
    st.lists(
        st.floats(
            min_value=-100.0, max_value=100.0, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=64,
    )
)
@settings(max_examples=200, deadline=None)
def test_quantize_list_error_bound_and_range(vec):
    # symmetric scalar quantization: every q in [-127, 127] (floor(x*s+.5)
    # hits -127..127 for |x| <= max), and dequantization error is bounded
    # by half a quantization step: |q/s - x| <= 0.5/s
    from cdc_system_spark.operators.similarity import quantize_list

    q = quantize_list(vec)
    mx = max(max(abs(x) for x in vec), 1e-30)
    s = 127.0 / mx
    assert all(-127 <= v <= 127 for v in q)
    for qi, xi in zip(q, vec):
        assert abs(qi / s - xi) <= 0.5 / s + 1e-12


@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, allow_infinity=False),
        min_size=2,
        max_size=32,
    )
)
@settings(max_examples=100, deadline=None)
def test_quantize_preserves_sign_of_large_components(vec):
    from cdc_system_spark.operators.similarity import quantize_list

    q = quantize_list(vec)
    mx = max(max(abs(x) for x in vec), 1e-30)
    for qi, xi in zip(q, vec):
        if abs(xi) > mx / 100:  # components above one quantization step
            assert (qi > 0) == (xi > 0) or qi == 0
