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


def _rowgroup_ts_spans(path: str) -> "list[list[tuple]]":
    """Per-file list of (min, max) ts spans per row group, over every
    data file of a one-level partitioned layout."""
    import pyarrow.parquet as pq

    spans_per_file = []
    for entry in sorted(os.listdir(path)):
        full = os.path.join(path, entry)
        if "=" not in entry or not os.path.isdir(full):
            continue
        for fn in sorted(os.listdir(full)):
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(full, fn)).metadata
            ts_idx = next(i for i in range(len(md.schema))
                          if md.schema.column(i).name == "ts")
            spans_per_file.append([
                (md.row_group(rg).column(ts_idx).statistics.min,
                 md.row_group(rg).column(ts_idx).statistics.max)
                for rg in range(md.num_row_groups)])
    return spans_per_file


def test_sorted_write_makes_rowgroup_stats_tight(spark, tmp_path):
    """sort_within=True writes each partition's rows timestamp-sorted, so
    the parquet footer's per-row-group ts min/max are non-overlapping —
    the stats an intra-day range scan uses to skip row groups (the
    second pruning tier under the directory-level partition pruning).
    The unsorted control shows near-full-day spans in every row group."""
    from replibyte_spark.sinks.partitioned import write_time_partitioned

    # one synthetic day, arrival-shuffled (hash order), big enough for
    # several row groups under a shrunken block size
    df = (spark.range(200_000)
          .select((F.col("id") % 1000).alias("k"),
                  F.expr("timestamp'2024-03-01 00:00:00' + make_interval("
                         "0, 0, 0, 0, 0, 0, id % 86400)").alias("ts"))
          .orderBy(F.xxhash64("id")))
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", str(64 * 1024))
    try:
        sorted_p = str(tmp_path / "rg_sorted")
        unsorted_p = str(tmp_path / "rg_unsorted")
        write_time_partitioned(df, sorted_p, ts_col="ts")
        write_time_partitioned(df, unsorted_p, ts_col="ts",
                               sort_within=False)
    finally:
        if old_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old_block)

    sorted_spans = _rowgroup_ts_spans(sorted_p)
    assert any(len(s) > 1 for s in sorted_spans), \
        "no multi-row-group file produced; shrink block size further"
    for spans in sorted_spans:
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2, spans  # sorted => disjoint spans
    # control: unsorted row groups each span ~the whole day, so at least
    # one adjacent pair overlaps in every multi-group file
    overlapping = sum(
        1 for spans in _rowgroup_ts_spans(unsorted_p) if len(spans) > 1
        and any(a[1] > b[0] for a, b in zip(spans, spans[1:])))
    assert overlapping > 0
