"""Time-partitioned layout: pruning must happen at planning time, and
compaction must be content-preserving, crash-safe and re-prunable."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _scan_metrics(df) -> dict:
    """{metric: value} of the (single) file scan in the EXECUTED plan —
    numPartitions/numFiles are what partition pruning actually read
    (df.inputFiles() lists the whole relation pre-pruning, so it cannot
    prove pruning)."""
    out: dict = {}

    def walk(node):
        if "Scan" in node.getClass().getSimpleName():
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                out[kv._1()] = kv._2().value()
        ch = node.children().iterator()
        while ch.hasNext():
            walk(ch.next())

    walk(df._jdf.queryExecution().executedPlan())
    return out


def _layout(spark, sf_dir, tmp_path, name="events_part"):
    from replibyte_spark.catalog import load_table
    from replibyte_spark.sinks.partitioned import write_time_partitioned

    path = str(tmp_path / name)
    write_time_partitioned(load_table(spark, sf_dir, "events"), path,
                           ts_col="ts")
    return path


def test_partition_pruning_reads_only_matching_dirs(spark, sf_dir, tmp_path):
    from replibyte_spark.sinks.partitioned import load_time_partitioned

    path = _layout(spark, sf_dir, tmp_path)
    df = (load_time_partitioned(spark, path)
          .filter(F.col("event_date").between("2024-01-08", "2024-01-14")))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    assert "event_date" in plan.split("PartitionFilters", 1)[1][:300], plan
    df.collect()  # metrics are runtime: the scan must actually run
    m = _scan_metrics(df)
    # 7 matching daily partitions out of ~30 — pruning happened
    assert m["numPartitions"] == 7, m
    assert m["numFiles"] == 7, m
    # the data files keep full-resolution ts; the derived column agrees
    bad = df.filter(F.col("ts").cast("date") != F.col("event_date")).count()
    assert bad == 0


def test_partitioned_roundtrip_is_lossless(spark, sf_dir, tmp_path):
    from replibyte_spark.catalog import load_table
    from replibyte_spark.sinks.partitioned import load_time_partitioned

    path = _layout(spark, sf_dir, tmp_path)
    raw = load_table(spark, sf_dir, "events")
    back = load_time_partitioned(spark, path).drop("event_date")
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, raw.collect()))


def test_compaction_shrinks_files_preserves_rows_and_pruning(
        spark, sf_dir, tmp_path):
    from replibyte_spark.catalog import load_table
    from replibyte_spark.sinks.partitioned import (compact_time_partitions,
                                                   load_time_partitioned,
                                                   partition_files)

    # simulate micro-batch litter: 6 small files per partition
    path = str(tmp_path / "events_litter")
    ev = load_table(spark, sf_dir, "events").repartition(6)
    (ev.withColumn("event_date", F.col("ts").cast("date"))
     .write.partitionBy("event_date").parquet(path))
    before = partition_files(path)
    assert all(len(v) > 1 for v in before.values()), "fixture not littered"
    want = sorted(map(tuple, spark.read.parquet(path).drop("event_date")
                      .collect()))

    stats = compact_time_partitions(spark, path, target_rows_per_file=10**6)
    after = partition_files(path)
    assert stats["files_before"] == sum(len(v) for v in before.values())
    assert stats["files_after"] == sum(len(v) for v in after.values())
    assert stats["files_after"] < stats["files_before"]
    # every partition fits the budget -> exactly one file each
    assert all(len(v) == 1 for v in after.values()), after
    assert sorted(map(tuple,
                      spark.read.parquet(path).drop("event_date")
                      .collect())) == want
    # still a prunable layout after the rename swap
    df = (load_time_partitioned(spark, path)
          .filter(F.col("event_date") == "2024-01-03"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    df.collect()
    m = _scan_metrics(df)
    assert m["numPartitions"] == 1 and m["numFiles"] == 1, m
    # no staging remnants
    assert not os.path.exists(path + ".compacting")
    assert not os.path.exists(path + ".precompact")


def test_compaction_sizes_files_to_target(spark, sf_dir, tmp_path):
    """A partition bigger than the target splits into ceil(n/target)
    files — the skew story: a monster partition fans out instead of
    funnelling through one task."""
    from replibyte_spark.catalog import load_table
    from replibyte_spark.sinks.partitioned import (compact_time_partitions,
                                                   partition_files)

    path = str(tmp_path / "events_sized")
    ev = load_table(spark, sf_dir, "events").repartition(4)
    (ev.withColumn("event_date", F.col("ts").cast("date"))
     .write.partitionBy("event_date").parquet(path))
    counts = {str(r["d"]): r["n"] for r in
              (spark.read.parquet(path)
               .groupBy(F.col("event_date").alias("d"))
               .agg(F.count(F.lit(1)).alias("n")).collect())}
    target = max(2, max(counts.values()) // 3)
    compact_time_partitions(spark, path, target_rows_per_file=target)
    files = partition_files(path)
    import math
    for d, n in counts.items():
        got = len(files[f"event_date={d}"])
        # maxRecordsPerFile guarantees the upper bound per task; the hash
        # slot assignment makes the expected count ceil(n/target), with
        # +1 slack for uneven slot fill
        assert got <= math.ceil(n / target) + 1, (d, n, got)
        assert got >= math.ceil(n / target), (d, n, got)


def test_compaction_rejects_bad_target(spark, sf_dir, tmp_path):
    import pytest

    from replibyte_spark.sinks.partitioned import compact_time_partitions

    path = _layout(spark, sf_dir, tmp_path, "events_badtarget")
    with pytest.raises(ValueError):
        compact_time_partitions(spark, path, target_rows_per_file=0)
