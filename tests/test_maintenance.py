"""Log compaction: content preserved, layout date-partitioned, and
time-range scans prune partitions (PartitionFilters in the plan)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cdc_system_spark.operators.maintenance import compact_log, read_log_range
from cdc_system_spark.plans import explain_str
from cdc_system_spark.queries.base import cdc_log


def test_compaction_preserves_content_and_prunes(spark, sf_dir, tmp_path):
    raw = str(tmp_path / "raw")
    compacted = str(tmp_path / "compacted")
    # audit-schema log with multi-day changed_at from the driver's events
    log = cdc_log(spark, sf_dir)
    log.write.parquet(raw)

    stats = compact_log(spark, raw, compacted, target_rows_per_file=500)
    assert stats["rows"] == log.count()
    assert stats["days"] >= 2

    back = spark.read.parquet(compacted)
    assert back.count() == stats["rows"]
    assert sorted(r["cdc_id"] for r in back.collect()) == sorted(
        r["cdc_id"] for r in log.collect()
    )

    # a time-bounded read must prune at the partition level
    some_day = back.select(F.min("change_date").cast("string")).head()[0]
    ranged = read_log_range(spark, compacted, start_date=some_day, end_date=None)
    plan = explain_str(ranged, "formatted")
    assert "PartitionFilters" in plan and "change_date" in plan
    assert ranged.count() == stats["rows"]  # min date onward = everything


def test_range_read_filters_rows(spark, sf_dir, tmp_path):
    raw = str(tmp_path / "raw")
    compacted = str(tmp_path / "compacted")
    cdc_log(spark, sf_dir).write.parquet(raw)
    compact_log(spark, raw, compacted)

    all_days = sorted(
        r["change_date"]
        for r in spark.read.parquet(compacted).select("change_date").distinct().collect()
    )
    cutoff = str(all_days[1])
    early = read_log_range(spark, compacted, end_date=cutoff)
    assert early.select("change_date").distinct().count() == 1


def test_zorder_value_interleaves_bits(spark):
    from cdc_system_spark.operators.maintenance import zorder_value

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 3), (65535, 65535), (70000, -5)],
        "a long, b long",
    )
    got = [
        r["z"]
        for r in df.select(zorder_value("a", "b").alias("z"))
        .orderBy("a", "b")
        .collect()
    ]
    # (0,0)->0; (0,1)->1; (1,0)->2; (3,3)->15; saturation at 16 bits;
    # negatives clamp to 0
    by_input = dict(
        zip(sorted([(0, 0), (1, 0), (0, 1), (3, 3), (65535, 65535), (70000, -5)]), got)
    )
    assert by_input[(0, 0)] == 0
    assert by_input[(0, 1)] == 1
    assert by_input[(1, 0)] == 2
    assert by_input[(3, 3)] == 15
    assert by_input[(65535, 65535)] == (1 << 32) - 1
    assert by_input[(70000, -5)] == by_input.get((70000, -5))  # defined
    # clamp: a saturates to 65535, b to 0 -> same as (65535, 0)
    z_a_sat = df.sparkSession.createDataFrame(
        [(65535, 0)], "a long, b long"
    ).select(zorder_value("a", "b").alias("z")).head()["z"]
    assert by_input[(70000, -5)] == z_a_sat


def test_compact_zordered_tightens_per_file_stats(spark, tmp_path):
    import glob

    from cdc_system_spark.operators.maintenance import compact_zordered

    # uniform 2-D grid: both dims independently spread
    rows = [(i, (i * 7919) % 1000, (i * 104729) % 1000) for i in range(20000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    out = str(tmp_path / "z")
    compact_zordered(df.repartition(16), out, "x", "y", num_files=16, bits=10)

    spans_x, spans_y = [], []
    for f in glob.glob(out + "/*.parquet"):
        pdf = spark.read.parquet(f).agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y")
        ).head()
        spans_x.append(pdf[1] - pdf[0])
        spans_y.append(pdf[3] - pdf[2])
    # each file covers a compact square: typical per-file span on BOTH
    # dimensions is far below the global span (999). A single-column
    # sort would give tight x but global-width y.
    import statistics

    assert statistics.median(spans_x) <= 999 / 2
    assert statistics.median(spans_y) <= 999 / 2
    # content preserved
    assert spark.read.parquet(out).count() == 20000
    with pytest.raises(ValueError, match="num_files"):
        compact_zordered(df, out, "x", "y", num_files=0)


def test_zone_map_and_prune_fraction(spark):
    from cdc_system_spark.operators.maintenance import prune_fraction, zone_map

    # write order correlates with value: zones cleanly separate ranges
    rows = [(i, float(i * 10)) for i in range(128)]
    df = spark.createDataFrame(rows, "pos long, value double")
    zm = zone_map(df, "pos", "value", num_zones=4)
    zones = {r["zone"]: r for r in zm.collect()}
    assert set(zones) == {0, 1, 2, 3}
    assert all(r["n_rows"] == 32 for r in zones.values())
    assert zones[0]["v_min"] == 0.0 and zones[0]["v_max"] == 310.0
    assert zones[3]["v_min"] == 960.0 and zones[3]["v_max"] == 1270.0
    # predicate value BETWEEN 0 AND 300 touches only zone 0
    pf = prune_fraction(zm, 0.0, 300.0).head()
    assert pf["n_zones"] == 4 and pf["n_skipped"] == 3
    assert pf["rows_skipped"] == 96 and pf["skip_fraction"] == 0.75
    # uncorrelated layout: nothing skippable — the diagnosis case
    shuffled = spark.createDataFrame(
        [(i, float(((i * 53) % 128) * 10)) for i in range(128)],
        "pos long, value double",
    )
    pf2 = prune_fraction(
        zone_map(shuffled, "pos", "value", num_zones=4), 0.0, 300.0
    ).head()
    assert pf2["n_skipped"] == 0


def test_zone_map_edge_cases(spark):
    import pytest as _pytest

    from cdc_system_spark.operators.maintenance import zone_map

    empty = spark.createDataFrame([(None, 1.0)], "pos long, value double")
    assert zone_map(empty, "pos", "value").count() == 0
    one = spark.createDataFrame([(5, 2.5)], "pos long, value double")
    r = zone_map(one, "pos", "value").head()
    assert (r["zone"], r["n_rows"], r["v_min"], r["v_max"]) == (0, 1, 2.5, 2.5)
    with _pytest.raises(ValueError):
        zone_map(one, "pos", "value", num_zones=0)


def test_zorder_rewrite_improves_zone_map_skipping(spark, tmp_path):
    """The layout story end-to-end: a value-uncorrelated write order
    gives a zone map nothing to skip; rewriting Z-ordered on the
    filter column makes the SAME predicate skip most zones."""
    from cdc_system_spark.operators.maintenance import (
        compact_zordered,
        prune_fraction,
        zone_map,
    )

    rows = [(i, ((i * 53) % 256), ((i * 91) % 256)) for i in range(1024)]
    df = spark.createDataFrame(rows, "pos long, a long, b long")
    before = prune_fraction(
        zone_map(df, "pos", "a", num_zones=16), 0.0, 31.0
    ).head()
    assert before["skip_fraction"] < 0.2  # scattered: nothing skippable

    from cdc_system_spark.operators.maintenance import zorder_value

    out = str(tmp_path / "zordered")
    compact_zordered(df, out, "a", "b", num_files=4)
    # the rewrite lays rows out in z order; zoning on the z value IS
    # zoning on the new physical order
    rewritten = spark.read.parquet(out)
    after = prune_fraction(
        zone_map(rewritten, zorder_value("a", "b"), F.col("a"), num_zones=16),
        0.0,
        31.0,
    ).head()
    assert after["skip_fraction"] > before["skip_fraction"] + 0.3


def _hilbert_ref(n: int, x: int, y: int) -> int:
    # independent reference: Wikipedia's iterative xy2d
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_value_matches_reference_exhaustively(spark):
    from cdc_system_spark.operators.maintenance import hilbert_value

    bits = 4
    n = 1 << bits
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["d"]
        for r in df.select("x", "y", hilbert_value("x", "y", bits).alias("d")).collect()
    }
    assert got == {(x, y): _hilbert_ref(n, x, y) for x, y in rows}
    # bijective onto [0, n*n) — a space-FILLING curve, no collisions
    assert sorted(got.values()) == list(range(n * n))
    # out-of-range inputs clamp like zorder_value
    wild = spark.createDataFrame([(-5, 99), (999, 3)], "x long, y long")
    vals = [
        r["d"] for r in wild.select(hilbert_value("x", "y", bits).alias("d")).collect()
    ]
    assert vals == [_hilbert_ref(n, 0, 15), _hilbert_ref(n, 15, 3)]


def test_hilbert_vs_zorder_skip_rate_ab(spark, tmp_path):
    """The adopt-or-reject A/B the round contract asks for: same data,
    same zone-map skip-fraction methodology, Z-order vs Hilbert layout.
    Numbers recorded in BENCH_NOTES_r07.md."""
    from cdc_system_spark.operators.maintenance import (
        compact_hilbert,
        compact_zordered,
        hilbert_value,
        prune_fraction,
        zone_map,
        zorder_value,
    )

    rows = [(i, ((i * 53) % 256), ((i * 91) % 256)) for i in range(4096)]
    df = spark.createDataFrame(rows, "pos long, a long, b long")
    out_z = str(tmp_path / "z")
    out_h = str(tmp_path / "h")
    compact_zordered(df, out_z, "a", "b", num_files=8)
    compact_hilbert(df, out_h, "a", "b", num_files=8)

    def skip(path, key, lo, hi, col):
        zoned = zone_map(spark.read.parquet(path), key, F.col(col), num_zones=32)
        return prune_fraction(zoned, lo, hi).head()["skip_fraction"]

    # per-dimension range predicates over the rewritten physical order
    z_a = skip(out_z, zorder_value("a", "b"), 0.0, 31.0, "a")
    h_a = skip(out_h, hilbert_value("a", "b"), 0.0, 31.0, "a")
    z_b = skip(out_z, zorder_value("a", "b"), 0.0, 31.0, "b")
    h_b = skip(out_h, hilbert_value("a", "b"), 0.0, 31.0, "b")
    # both layouts must make the predicate skippable at all; Hilbert
    # must be at least competitive (within one 32nd) on each dimension
    for v in (z_a, h_a, z_b, h_b):
        assert v > 0.5
    assert h_a >= z_a - 1 / 32 and h_b >= z_b - 1 / 32
    print(f"SKIP_AB z_a={z_a:.4f} h_a={h_a:.4f} z_b={z_b:.4f} h_b={h_b:.4f}")


def test_zone_state_merge_equals_rebuild(spark):
    import pytest as _pytest

    from cdc_system_spark.operators.maintenance import zone_merge, zone_state

    rows = [(i, float(i % 97)) for i in range(500)]
    df = spark.createDataFrame(rows, "pos long, value double")
    whole = zone_state(df, "pos", "value", 0, 600, num_zones=8)
    parts = [
        zone_state(df.filter(F.col("pos") % 3 == i), "pos", "value", 0, 600, num_zones=8)
        for i in range(3)
    ]
    merged = zone_merge(*parts)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # out-of-range order keys clamp to edge zones
    wild = spark.createDataFrame([(-10, 1.0), (999, 2.0)], "pos long, value double")
    st = {r["zone"]: r for r in zone_state(wild, "pos", "value", 0, 600, num_zones=8).collect()}
    assert set(st) == {0, 7}
    with _pytest.raises(ValueError):
        zone_state(df, "pos", "value", 10, 5)
    with _pytest.raises(ValueError):
        zone_merge()


def test_zone_pruned_between_rows_and_pushdown(spark, tmp_path):
    # the zone map driving an ACTUAL pruned read: rows == plain filter
    # (including NULL order keys and out-of-geometry clamps), and the
    # surviving-zone id ranges reach the parquet scan as pushed filters
    from cdc_system_spark.operators.maintenance import (
        zone_pruned_between,
        zone_state,
    )

    rows = [(i, float(i // 100)) for i in range(1000)]
    rows += [(None, 2.5), (None, 9.0), (-5, 2.2), (2000, 2.4)]
    df = spark.createDataFrame(rows, "id long, v double")
    df.orderBy("id").coalesce(4).write.parquet(str(tmp_path / "t"))
    stored = spark.read.parquet(str(tmp_path / "t"))
    st = zone_state(stored, "id", "v", 0, 999, num_zones=10)
    pruned = zone_pruned_between(
        stored, st, "id", F.col("v"), 2.0, 3.0, 0, 999, num_zones=10
    )
    plain = stored.filter(F.col("v").between(2.0, 3.0))
    key = lambda d: sorted(
        ((r["id"] is None, r["id"]), r["v"]) for r in d.collect()
    )
    assert key(pruned) == key(plain)
    # NULL ids with in-range v pass; the -5/2000 clamps land in the
    # surviving edge-zone ranges (zone 0 kept via -5's 2.2, zone 9 via
    # 2000's 2.4) and survive
    got = {(r["id"], r["v"]) for r in pruned.collect()}
    assert (None, 2.5) in got and (-5, 2.2) in got and (2000, 2.4) in got
    assert (None, 9.0) not in got
    # the range predicate is pushed to the scan (id min/max row-group
    # stats can serve it; the computed v-between cannot)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "id" in plan.split("PushedFilters")[1][:200]
    # degenerate: nothing skippable (predicate spans all zones) falls
    # back to the plain filter — still row-identical
    wide = zone_pruned_between(
        stored, st, "id", F.col("v"), 0.0, 99.0, 0, 999, num_zones=10
    )
    assert wide.count() == stored.count()


def test_read_pending_pruned_matches_plain_poll_and_pushes(spark, tmp_path):
    # the reference hot poll (WHERE synced=0 ORDER BY cdc_id LIMIT n)
    # served by the maintained log zone state: rows == the plain poll,
    # and the surviving tail zones reach the parquet scan as a pushed
    # cdc_id range — the (synced, cdc_id) covering-index analogue
    # (cdc_system.py:129-132) completing DDL2 on the CDC path itself
    from cdc_system_spark.operators.maintenance import (
        log_zone_state,
        read_pending_pruned,
    )

    # drained log: ids 0..799 synced, the 800..999 tail pending
    rows = [(i, "INSERT" if i % 3 else "UPDATE", i % 37, i < 800)
            for i in range(1000)]
    df = spark.createDataFrame(
        rows, "cdc_id long, operation string, record_id long, synced boolean"
    )
    df.orderBy("cdc_id").coalesce(4).write.parquet(str(tmp_path / "log"))
    stored = spark.read.parquet(str(tmp_path / "log"))
    st = log_zone_state(stored, 0, 999, num_zones=10)
    pruned = read_pending_pruned(stored, st, 0, 999, num_zones=10, limit=50)
    plain = (
        stored.filter(~F.col("synced")).orderBy("cdc_id").limit(50)
    )
    key = lambda d: [
        (r["cdc_id"], r["operation"], r["record_id"]) for r in d.collect()
    ]
    assert key(pruned) == key(plain)
    assert key(pruned)[0][0] == 800 and len(key(pruned)) == 50
    # the tail-zone cdc_id range is pushed to the scan: row groups of
    # the synced prefix never load (what the covering index buys SQLite)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "cdc_id" in plan.split("PushedFilters")[1][:200]
    # unlimited form returns every pending row
    all_pending = read_pending_pruned(stored, st, 0, 999, num_zones=10)
    assert all_pending.count() == 200
