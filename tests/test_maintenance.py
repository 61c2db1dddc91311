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
