"""Date-partitioned layout + partition pruning — the scale path for every
time-range task (SCALE.md §1: at 100 TB the time predicate is served by
directory-level pruning, above the row-group filter). Proves the engine's
write layout actually prunes: a day-filter over a ``day=``-partitioned
table must touch only that day's files.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_db_spark.tables import load_table


def test_day_partitioned_scan_prunes(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "events_by_day")
    ev.withColumn("day", F.date_format(F.to_date("ts"), "yyyy-MM-dd")).write.mode(
        "overwrite"
    ).partitionBy("day").parquet(path)

    days = [r["day"] for r in spark.read.parquet(path).select("day").distinct().collect()]
    assert len(days) > 3  # fixture spans enough days for pruning to matter

    one_day = str(sorted(days)[1])  # partition values are date-inferred on read
    q = spark.read.parquet(path).filter(F.col("day") == one_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the day predicate must appear as a PartitionFilter on the scan,
    # not as a post-scan Filter over all partitions
    assert "PartitionFilters" in plan and one_day in plan.split("PushedFilters")[0]

    expected = ev.filter(F.date_format(F.to_date("ts"), "yyyy-MM-dd") == one_day).count()
    assert len(q.collect()) == expected
    # the scan's numFiles metric proves only the one partition was touched
    # (30 day-directories exist; the full-table scan would read all of them)
    scan = q._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    n_files = scan.metrics().apply("numFiles").value()
    n_dirs = len(days)
    assert n_files < n_dirs and n_files >= 1, (n_files, n_dirs)
