"""Log compaction: content preserved, layout date-partitioned, and
time-range scans prune partitions (PartitionFilters in the plan)."""

from __future__ import annotations

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
