"""Portable HyperLogLog sketch (operators/sketch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_system_spark.operators.sketch import hll_distinct


def test_hll_estimate_within_tolerance(spark):
    # 2000 distinct values: well past the small-range regime for m=64;
    # standard error 1.04/sqrt(64) ~ 13% -> assert within 3 sigma
    df = spark.range(2000).select(F.concat(F.lit("u"), "id").alias("v"))
    row = hll_distinct(df, "v").head()
    assert row["n_empty_buckets"] == 0
    assert abs(row["n_est"] - 2000) / 2000 < 0.4


def test_hll_is_layout_and_duplicate_independent(spark):
    df = spark.range(500).select(F.concat(F.lit("x"), "id").alias("v"))
    a = hll_distinct(df, "v").head()
    b = hll_distinct(df.repartition(13), "v").head()
    dup = hll_distinct(df.union(df).union(df), "v").head()  # dups don't move it
    assert a == b == dup


def test_hll_flags_small_range_and_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), ("c",), (None,)], "v string"
    )
    row = hll_distinct(df, "v").head()
    assert row["n_empty_buckets"] >= 60      # tiny cardinality flagged
    only_null = spark.createDataFrame([(None,)], "v string")
    r2 = hll_distinct(only_null, "v").head()
    assert r2["n_empty_buckets"] == 64
    # zero distinct values is EXACT, not the raw estimator's ~45.38
    assert r2["n_est"] == 0.0


def test_countmin_upper_bounds_and_hits_exact(spark):
    from cdc_system_spark.operators.sketch import countmin_estimates

    docs = spark.createDataFrame(
        [(1, "a b a c a"), (2, "b c d"), (3, "")],
        "doc_id long, text string",
    )
    got = {r["term"]: r for r in
           countmin_estimates(docs, ["a", "b", "zzz"]).collect()}
    assert got["a"]["exact_count"] == 3 and got["b"]["exact_count"] == 2
    for r in got.values():                       # the CM guarantee
        assert r["est_count"] >= r["exact_count"]
    # 8 distinct tokens into 4x1024 buckets: collisions essentially
    # impossible -> estimates are exact here
    assert got["a"]["est_count"] == 3
    assert got["zzz"]["est_count"] == 0 and got["zzz"]["exact_count"] == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        countmin_estimates(docs, [])


def test_countmin_is_layout_independent(spark):
    from cdc_system_spark.operators.sketch import countmin_estimates

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} shared w{i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, countmin_estimates(docs, ["shared", "w1"]).collect()))
    b = sorted(map(tuple, countmin_estimates(docs.repartition(11), ["shared", "w1"]).collect()))
    assert a == b


def test_quantile_sketch_brackets_exact_percentiles(spark):
    from cdc_system_spark.operators.sketch import quantile_sketch

    vals = [round(0.07 * i * i, 2) for i in range(1, 201)]  # skewed grid
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = {r["pct"]: r for r in quantile_sketch(df, "value").collect()}
    svals = sorted(vals)
    for pct, r in got.items():
        rank = -(-pct * len(vals) // 100)  # ceil
        assert r["target_rank"] == rank
        exact = svals[rank - 1]
        assert r["lo_est"] - 1e-9 <= exact <= r["hi_est"] + 1e-9
    # bracket width is bounded by one 256th of the range
    rng = max(vals) - min(vals)
    for r in got.values():
        assert r["hi_est"] - r["lo_est"] <= rng / 256 + 0.02


def test_quantile_sketch_edge_cases(spark):
    import pytest as _pytest

    from cdc_system_spark.operators.sketch import quantile_sketch

    # constant column: every bracket collapses onto the single value
    const = spark.createDataFrame([(7.25,)] * 9, "value double")
    for r in quantile_sketch(const, "value").collect():
        assert r["lo_est"] == 7.25 and r["hi_est"] == 7.25 and r["bin"] == 0
    # empty input (or all-NULL) -> empty result, not a fake estimate
    empty = spark.createDataFrame([(None,)], "value double")
    assert quantile_sketch(empty, "value").count() == 0
    with _pytest.raises(ValueError):
        quantile_sketch(const, "value", percents=[])
    with _pytest.raises(ValueError):
        quantile_sketch(const, "value", percents=[0])
    with _pytest.raises(ValueError):
        quantile_sketch(const, "value", num_bins=0)


def test_quantile_sketch_is_layout_independent(spark):
    from cdc_system_spark.operators.sketch import quantile_sketch

    vals = [(float(i % 37) + 0.5,) for i in range(300)]
    df = spark.createDataFrame(vals, "value double")
    a = sorted(map(tuple, quantile_sketch(df, "value").collect()))
    b = sorted(
        map(tuple, quantile_sketch(df.repartition(13), "value").collect())
    )
    assert a == b


def _exact_ntile_hist(vals, k):
    """Pure-Python oracle: NTILE(k) over sorted values, per-bucket
    (n, lo, hi) — tiebreak-free because extrema only depend on value."""
    s = sorted(vals)
    n = len(s)
    fl, r0 = divmod(n, k)
    out = {}
    start = 0
    for b in range(1, k + 1):
        size = fl + (1 if b <= r0 else 0)
        if size == 0:
            continue
        chunk = s[start : start + size]
        out[b] = (size, round(chunk[0], 6), round(chunk[-1], 6))
        start += size
    return out


def test_equidepth_from_counts_matches_exact_ntile(spark):
    from cdc_system_spark.operators.sketch import equidepth_from_counts

    # heavy ties straddling bucket boundaries: 7 distinct values, 53
    # rows, k=10 -> NTILE sizes 6,6,6,5,... with tied values split
    vals = [1.0] * 11 + [2.5] * 9 + [2.5] * 4 + [7.75] * 13 + [100.0] * 7 + [
        -3.25
    ] * 5 + [0.0] * 4
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = {
        r["bucket"]: (r["n"], r["lo"], r["hi"])
        for r in equidepth_from_counts(df, "value", k=10).collect()
    }
    assert got == _exact_ntile_hist(vals, 10)


def test_equidepth_from_counts_fewer_rows_than_buckets(spark):
    from cdc_system_spark.operators.sketch import equidepth_from_counts

    vals = [5.0, 1.0, 3.0]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = {
        r["bucket"]: (r["n"], r["lo"], r["hi"])
        for r in equidepth_from_counts(df, "value", k=10).collect()
    }
    # NTILE with n < k: first n buckets get one row each
    assert got == {1: (1, 1.0, 1.0), 2: (1, 3.0, 3.0), 3: (1, 5.0, 5.0)}


def test_hll_distinct_by_matches_scalar_per_group(spark):
    from cdc_system_spark.operators.sketch import hll_distinct, hll_distinct_by

    rows = [("a", f"u{i % 40}") for i in range(200)] + [
        ("b", f"v{i}") for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, u string")
    grouped = {
        r["g"]: (r["n_est"], r["n_empty_buckets"])
        for r in hll_distinct_by(df, ["g"], "u").collect()
    }
    for g in ("a", "b"):
        scalar = hll_distinct(df.filter(F.col("g") == g), "u").head()
        assert grouped[g] == (scalar["n_est"], scalar["n_empty_buckets"]), g
    # estimates are in the documented +-~13% band (b: 300 distinct)
    assert abs(grouped["b"][0] - 300) / 300 < 0.45
    # all-null group vanishes, like GROUP BY over the filtered input
    withnull = df.union(spark.createDataFrame([("c", None)], "g string, u string"))
    assert "c" not in {
        r["g"] for r in hll_distinct_by(withnull, ["g"], "u").collect()
    }


def test_quantile_sketch_by_brackets_each_group(spark):
    from cdc_system_spark.operators.sketch import quantile_sketch_by

    # group a: compact grid; group b: 100x wider — per-group bin
    # geometry must bracket each group's own percentiles
    rows = [("a", round(1.0 + 0.01 * i, 2)) for i in range(100)] + [
        ("b", float(i * 7 % 997)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, value double")
    got = {
        (r["g"], r["pct"]): r
        for r in quantile_sketch_by(df, ["g"], "value").collect()
    }
    import math

    byg = {"a": sorted(v for g, v in rows if g == "a"),
           "b": sorted(v for g, v in rows if g == "b")}
    for (g, pct), r in got.items():
        rank = max(math.ceil(pct * len(byg[g]) / 100), 1)
        exact = byg[g][rank - 1]
        assert r["target_rank"] == rank
        assert r["lo_est"] - 1e-9 <= exact <= r["hi_est"] + 1e-9, (g, pct)
        # bracket width bounded by the GROUP's range / 256
        rng = byg[g][-1] - byg[g][0]
        assert r["hi_est"] - r["lo_est"] <= rng / 256 + 0.02
    assert len(got) == 6  # 2 groups x 3 default percents


def test_hll_state_merge_equals_rebuild(spark):
    from cdc_system_spark.operators.sketch import (
        hll_distinct,
        hll_estimate,
        hll_merge,
        hll_state,
    )

    rows = [(f"u{i}",) for i in range(500)]
    df = spark.createDataFrame(rows, "v string")
    whole = hll_distinct(df, "v").head()
    parts = [
        hll_state(df.filter(F.expr(f"CAST(SUBSTR(v, 2) AS INT) % 3 = {i}")), "v")
        for i in range(3)
    ]
    merged = hll_estimate(hll_merge(*parts)).head()
    assert (merged["n_est"], merged["n_empty_buckets"]) == (
        whole["n_est"],
        whole["n_empty_buckets"],
    )
    # merge is idempotent: re-merging the same state changes nothing
    again = hll_estimate(hll_merge(parts[0], parts[0])).head()
    solo = hll_estimate(parts[0]).head()
    assert again["n_est"] == solo["n_est"]
    # empty state estimates exact zero
    import pytest as _pytest

    empty = hll_state(spark.createDataFrame([], "v string"), "v")
    assert hll_estimate(empty).head()["n_est"] == 0.0
    with _pytest.raises(ValueError):
        hll_merge()


def test_hll_grouped_merge_equals_rebuild_and_passes_groups(spark):
    # the grouped twin of test_hll_state_merge_equals_rebuild: states
    # per (group, shard), merged WITHIN groups; a group absent from
    # one shard passes through (union semantics); estimates equal the
    # per-group rebuild exactly
    import pytest as _pytest

    from cdc_system_spark.operators.sketch import (
        hll_distinct_by,
        hll_estimate_by,
        hll_merge_by,
        hll_state_by,
    )

    rows = [(["a", "b", "only0"][i % 3], f"u{i}") for i in range(400)]
    df = spark.createDataFrame(rows, "g string, v string")
    whole = {
        r["g"]: (r["n_est"], r["n_empty_buckets"])
        for r in hll_distinct_by(df, ["g"], "v").collect()
    }
    # shard by value parity; 'only0' lives in shard 0 only
    shard = lambda i: df.filter(
        F.expr(f"CAST(SUBSTR(v, 2) AS INT) % 2 = {i}")
        & ((F.col("g") != "only0") | F.lit(i == 0))
    )
    a = hll_state_by(shard(0), ["g"], "v")
    b = hll_state_by(shard(1).filter("g <> 'only0'"), ["g"], "v")
    merged = {
        r["g"]: (r["n_est"], r["n_empty_buckets"])
        for r in hll_estimate_by(
            hll_merge_by(a, b, group_cols=["g"]), ["g"]
        ).collect()
    }
    assert set(merged) == {"a", "b", "only0"}
    assert merged["a"] == whole["a"] and merged["b"] == whole["b"]
    # the shard-0-only group survives the merge with its shard estimate
    solo = {
        r["g"]: (r["n_est"], r["n_empty_buckets"])
        for r in hll_estimate_by(a, ["g"]).collect()
    }
    assert merged["only0"] == solo["only0"]
    with _pytest.raises(ValueError):
        hll_merge_by(group_cols=["g"])


def test_winsorize_clips_tails_conservatively(spark):
    from cdc_system_spark.operators.sketch import winsorize

    vals = [float(i) for i in range(1, 100)] + [10_000.0]  # one wild outlier
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    out = {r["value"]: r["clipped"] for r in winsorize(df, "value").collect()}
    assert out[10_000.0] < 10_000.0       # the outlier is clipped down
    assert out[50.0] == 50.0              # the body passes through
    # conservative: clip bound is at or beyond the exact p99 (rank 99
    # of 100 -> value 99.0)
    assert out[10_000.0] >= 99.0
    # lower tail: p1 -> rank 1 -> min value; nothing below it to clip
    assert out[1.0] == 1.0
    # nulls pass through
    withnull = df.union(spark.createDataFrame([(None,)], "value double"))
    got = winsorize(withnull, "value").filter("value IS NULL").head()
    assert got["clipped"] is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        winsorize(df, "value", p_lo=50, p_hi=50)


def test_histogram_state_merge_equals_whole_and_brackets(spark):
    import math

    from cdc_system_spark.operators.sketch import (
        histogram_merge,
        histogram_state,
        quantiles_from_state,
    )

    vals = [round(v * 0.5, 2) for v in range(1, 301)]  # 0.5 .. 150.0
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    LO, HI = 0.0, 200.0
    whole = histogram_state(df, "value", LO, HI)
    shards = [
        histogram_state(
            df.filter(F.expr(f"CAST(value * 2 AS INT) % 3 = {i}")),
            "value",
            LO,
            HI,
        )
        for i in range(3)
    ]
    merged = histogram_merge(*shards)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    got = {
        r["pct"]: r
        for r in quantiles_from_state(merged, LO, HI).collect()
    }
    svals = sorted(vals)
    for pct, r in got.items():
        exact = svals[max(math.ceil(pct * len(vals) / 100), 1) - 1]
        assert r["lo_est"] - 1e-9 <= exact <= r["hi_est"] + 1e-9, pct
    # out-of-range values clamp into edge bins (count preserved)
    wild = spark.createDataFrame([(-5.0,), (999.0,)], "value double")
    st = histogram_state(wild, "value", LO, HI)
    rows = {r["bin"]: r["cnt"] for r in st.collect()}
    assert rows == {0: 1, 255: 1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        histogram_state(df, "value", 10.0, 5.0)
    with _pytest.raises(ValueError):
        histogram_merge()


def test_countmin_state_merge_equals_rebuild(spark):
    from cdc_system_spark.operators.sketch import (
        countmin_estimates,
        countmin_merge,
        countmin_query,
        countmin_state,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i % 5} shared tail{i % 2}") for i in range(60)],
        "doc_id long, text string",
    )
    whole = countmin_state(docs)
    shards = [
        countmin_state(docs.filter(F.col("doc_id") % 3 == i))
        for i in range(3)
    ]
    merged = countmin_merge(*shards)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    terms = ["shared", "w1", "absent"]
    via_state = {
        r["term"]: r["est_count"]
        for r in countmin_query(merged, terms).collect()
    }
    direct = {
        r["term"]: r["est_count"]
        for r in countmin_estimates(docs, terms).collect()
    }
    assert via_state == direct
    assert via_state["shared"] >= 60 and via_state["absent"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        countmin_merge()
    with _pytest.raises(ValueError):
        countmin_query(merged, [])


def test_winsorize_by_clips_per_group(spark):
    import pytest as _pytest

    from cdc_system_spark.operators.sketch import winsorize_by

    # group a is tight (1..99); group b is 100x wider. A GLOBAL clip
    # would leave a's outlier untouched — the per-group clip catches it.
    rows = [("a", float(i)) for i in range(1, 100)] + [("a", 5000.0)] + [
        ("b", float(i * 100)) for i in range(1, 100)
    ]
    df = spark.createDataFrame(rows, "g string, value double")
    out = {
        (r["g"], r["value"]): r["clipped"]
        for r in winsorize_by(df, ["g"], "value").collect()
    }
    assert out[("a", 5000.0)] < 5000.0     # clipped within a's p99 bracket
    assert out[("a", 5000.0)] >= 99.0      # conservative bound
    assert out[("a", 50.0)] == 50.0        # body untouched
    assert out[("b", 5000.0)] == 5000.0    # mid-range for b: untouched
    # null values pass through; all-null group passes through
    withnull = df.union(
        spark.createDataFrame([("a", None), ("c", None)], "g string, value double")
    )
    got = {
        (r["g"], r["value"]): r["clipped"]
        for r in winsorize_by(withnull, ["g"], "value").collect()
    }
    assert got[("a", None)] is None and got[("c", None)] is None
    with _pytest.raises(ValueError):
        winsorize_by(df, ["g"], "value", p_lo=99, p_hi=1)


def test_selectivity_from_state_accuracy_and_merge(spark):
    from cdc_system_spark.operators.sketch import (
        histogram_merge,
        histogram_state,
        selectivity_from_state,
    )

    df = spark.range(10000).select((F.col("id") % 400).cast("double").alias("v"))
    LO, HI = 0.0, 400.0
    whole = histogram_state(df, "v", LO, HI)
    est = selectivity_from_state(whole, LO, HI, 50.0, 250.0).collect()[0]
    exact = df.filter("v >= 50.0 and v <= 250.0").count() / 10000
    # uniform data: estimator error bounded by ~2 partial bin widths
    assert abs(est["selectivity"] - exact) < 2 / 256 + 1e-9
    assert est["total_rows"] == 10000
    # merged shard states give the IDENTICAL estimate (counts additive,
    # arithmetic order-insensitive via the decimal accumulator)
    a = histogram_state(df.filter("id % 2 = 0"), "v", LO, HI)
    b = histogram_state(df.filter("id % 2 = 1"), "v", LO, HI)
    merged = selectivity_from_state(
        histogram_merge(a, b), LO, HI, 50.0, 250.0
    ).collect()[0]
    assert merged == est


def test_selectivity_empty_and_disjoint_ranges(spark):
    from cdc_system_spark.operators.sketch import (
        histogram_state,
        selectivity_from_state,
    )

    LO, HI = 0.0, 400.0
    empty = histogram_state(
        spark.range(0).select(F.col("id").cast("double").alias("v")), "v", LO, HI
    )
    row = selectivity_from_state(empty, LO, HI, 50.0, 250.0).collect()[0]
    assert (row["est_rows"], row["total_rows"], row["selectivity"]) == (0.0, 0, 0.0)
    df = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    st = histogram_state(df, "v", LO, HI)
    out = selectivity_from_state(st, LO, HI, 300.0, 390.0).collect()[0]
    assert out["selectivity"] == 0.0  # no mass in the queried range
