"""Time-partitioned table layout: partition pruning + small-file compaction.

The range twin of :mod:`.bucketed` (which buys exchange-free JOINS): an
event/fact table that is repeatedly filtered on time should be WRITTEN
partitioned by a time-derived column, so a date-range query reads only
the matching partition directories — at 100 TB with daily partitions, a
one-week dashboard query scans ~0.2% of the files instead of all of
them, and the pruning happens at PLANNING time (Catalyst partition
pruning over the directory listing), before a single task launches.

Spark-first rendering: ``write.partitionBy(date_col)`` on a derived
``CAST(ts AS DATE)`` column; readers get the partition column back from
directory discovery and any predicate on it becomes ``PartitionFilters``
in the scan (locked by tests/test_plan_shapes.py).  The data files keep
the full-resolution timestamp — the partition column is pure layout.

``compact_time_partitions`` is the maintenance half: streaming ingest
and small micro-batches leave each partition littered with tiny files
(the classic small-files problem — at 100 TB the NameNode/listing cost
and per-file task overhead dominate long before the bytes do).
Compaction rewrites each partition into ~size-targeted files with ONE
shuffle keyed on (partition, file-slot): two-phase like per_group_cap —
a count aggregation sizes each partition's file budget, a uniform hash
assigns rows to slots, so a skewed partition gets more files instead of
one monster task.

The whole maintenance path (listing, staging, swap, recovery) speaks
the scheme-resolved Hadoop FileSystem API — the same ``swap_directory``
/ ``recover_directory`` dance the ANN/MinHash index compactors use
(util.py) and the same FS resolution the datastore write path uses
(datastore.py) — so compaction works identically on ``file://``,
``hdfs://``, ``s3a://`` and ``gs://`` roots.  Crash contract (honest
version): content is never lost — the rewrite lands beside the live
layout and the swap keeps the old content as ``.bak`` until the new
directory is in place; a compaction killed mid-swap is repaired by
simply RE-RUNNING it (``recover_directory`` on entry restores the
``.bak``).  The swap is not seamless for concurrent readers: between
the two renames the live path briefly does not exist (longer on object
stores, where rename is copy+delete), so a reader holding the
pre-compaction file list may hit a missing-file error mid-swap — run
compaction on a maintenance cadence, pin frames that must survive it
(``localCheckpoint``), or retry the read once (contract locked by
tests/test_partitioned.py::test_compaction_vs_concurrent_readers).

Reference analogue: none — Replibyte's datastore is an opaque blob
archive (datastore/s3.rs); layout maintenance is a capability a
Spark-first engine adds on top of full parity, like :mod:`.bucketed`.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..util import hadoop_exists, recover_directory, swap_directory


def write_time_partitioned(df: DataFrame, path: str, ts_col: str = "ts",
                           date_col: str = "event_date",
                           mode: str = "overwrite",
                           sort_within: bool = True) -> None:
    """Write `df` partitioned by ``date_col = CAST(ts_col AS DATE)``.

    One directory per day; the derived column exists only as layout
    (readers recover it from partition discovery), the original
    timestamp column stays in the data files untouched.

    ``sort_within`` (default on) additionally sorts each task's rows by
    the timestamp before writing — a free second pruning tier: parquet
    row-group min/max stats on a sorted column are tight and
    non-overlapping, so an intra-day time predicate skips row groups at
    scan time on top of the directory-level partition pruning (verified
    against the written footers in tests/test_partitioned.py).  At
    100 TB this is the poor-man's Z-order for the single-dimension
    case: directory pruning bounds WHICH days are read, row-group stats
    bound which STRIPES of each day."""
    if date_col in df.columns:
        raise ValueError(f"{date_col} already exists in the frame; pass "
                         f"date_col= a fresh name")
    out = df.withColumn(date_col, F.col(ts_col).cast("date"))
    if sort_within:
        out = out.sortWithinPartitions(date_col, ts_col)
    out.write.mode(mode).partitionBy(date_col).parquet(path)


def load_time_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the layout back; the partition column returns as a DATE
    column via directory discovery and predicates on it prune at
    planning time."""
    return spark.read.parquet(path)


def partition_files(spark: SparkSession,
                    path: str) -> "dict[str, list[str]]":
    """{partition dirname: [data files]} for a one-level partitioned
    layout — the maintenance view compaction works from.  Listed via the
    scheme-resolved Hadoop FileSystem (never the local filesystem API) so
    maintenance works on the same s3a://gs://hdfs:// roots the write path
    does."""
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(path).getFileSystem(spark._jsc.hadoopConfiguration())
    out: dict[str, list[str]] = {}
    for st in fs.listStatus(P(path)):
        name = st.getPath().getName()
        if "=" in name and st.isDirectory():
            out[name] = sorted(
                f.getPath().getName() for f in fs.listStatus(st.getPath())
                if f.getPath().getName().endswith(".parquet")
                and not f.getPath().getName().startswith("."))
    return dict(sorted(out.items()))


def detect_partition_column(spark: SparkSession, path: str) -> "str | None":
    """The partition key of the one-level layout at `path` (the `k` of
    its `k=v` directories), or None when the path is missing or holds no
    partition directories — the layout-detection probe `corpus compact`
    uses, Hadoop-FS-resolved so remote layouts are detected too."""
    if not hadoop_exists(spark, path):
        return None
    parts = partition_files(spark, path)
    return sorted(parts)[0].split("=", 1)[0] if parts else None


def assign_file_slots(spark: SparkSession, df: DataFrame,
                      budgets: "dict[str, int]", null_budget: int,
                      null_n: int, date_col: str) -> "tuple[DataFrame, int]":
    """Attach a deterministic ``__slot`` file-slot column: rows of each
    partition hash uniformly into that partition's file budget.

    The budget lookup must stay O(1) in expression size: a CASE branch
    per partition is O(partitions) generated code, and a multi-year
    daily layout (~3,650 partitions) pushes the method past janino's
    64 KB limit — silent interpreted fallback on exactly the op whose
    input cardinality IS partition count.  So the budgets ride a tiny
    broadcast frame joined on the stringified partition value instead
    (compile-locked at 2,500 partitions with fallback disabled,
    tests/test_partitioned.py).  Returns (frame + __slot, total slots)."""
    bdf = spark.createDataFrame(
        [(d, b) for d, b in budgets.items()] or [("__none__", 1)],
        "__part_key string, __budget int")
    joined = df.join(
        F.broadcast(bdf),
        F.col(date_col).cast("string") == F.col("__part_key"), "left")
    nf = (F.when(F.col(date_col).isNull(), F.lit(null_budget))
          .otherwise(F.coalesce(F.col("__budget"), F.lit(1))))
    # deterministic uniform slot from the row's stable content hash —
    # xxhash64 over all non-partition columns (no rand(): retries and
    # re-runs land rows in the same file)
    data_cols = [c for c in df.columns if c != date_col]
    slot = F.pmod(F.xxhash64(*[F.col(c) for c in data_cols]), nf)
    n_slots = max(1, sum(budgets.values()) + (null_budget if null_n else 0))
    return (joined.withColumn("__slot", slot)
            .drop("__part_key", "__budget")), n_slots


def compact_time_partitions(spark: SparkSession, path: str,
                            target_rows_per_file: int,
                            date_col: str = "event_date") -> "dict":
    """Rewrite every partition of the layout at `path` into
    ``ceil(rows / target_rows_per_file)`` files.

    Two-phase, one shuffle: a per-partition count aggregation (map-side
    partial, partition-count-bounded collect) sizes each partition's
    file budget; rows are assigned a uniform hash slot within their
    partition and shuffled on (partition, slot), so every output file is
    written by one task and a skewed partition fans out to more files
    instead of one monster task.  Stages into ``path + '.tmp'`` and
    swaps via :func:`~replibyte_spark.util.swap_directory` — Hadoop FS
    throughout, so the same call compacts a ``file://``, ``hdfs://`` or
    ``s3a://`` layout.  A compaction killed mid-swap is repaired on the
    next run (:func:`~replibyte_spark.util.recover_directory` on entry);
    see the module docstring for the concurrent-reader contract.

    The per-partition file budgets ride a small broadcast frame joined
    onto the data (O(1) expression size at any partition count — an
    inline CASE branch per partition would cross janino's 64 KB method
    limit around a few thousand partitions).  Rows whose partition
    value is NULL (the layout's ``__HIVE_DEFAULT_PARTITION__``
    directory) get their own explicit budget via a NULL-check before
    the join lookup — a string-equality join key never matches SQL
    NULL and would silently mis-size that partition.

    Returns {"files_before": n, "files_after": m, "partitions": p}."""
    if target_rows_per_file <= 0:
        raise ValueError("target_rows_per_file must be > 0, got "
                         f"{target_rows_per_file}")
    # a previous compaction crashed mid-swap leaves the live path missing
    # with the old content complete in `.bak` — re-running compaction IS
    # the recovery procedure
    recover_directory(spark, path)
    before = sum(len(v) for v in partition_files(spark, path).values())
    df = spark.read.parquet(path)
    if date_col not in df.columns:
        raise ValueError(f"layout at {path} has no partition column "
                         f"`{date_col}` (columns: {df.columns})")
    null_n = 0
    counts: "dict[str, int]" = {}
    for r in (df.groupBy(F.col(date_col).alias("d"))
              .agg(F.count(F.lit(1)).alias("n")).collect()):
        if r["d"] is None:
            null_n = r["n"]
        else:
            counts[str(r["d"])] = r["n"]
    budgets = {d: max(1, math.ceil(n / target_rows_per_file))
               for d, n in counts.items()}
    null_budget = max(1, math.ceil(null_n / target_rows_per_file))
    slotted, n_slots = assign_file_slots(spark, df, budgets, null_budget,
                                         null_n, date_col)

    def write(staged: str) -> None:
        (slotted
         .repartition(n_slots, F.col(date_col), F.col("__slot"))
         .drop("__slot")
         .write.mode("overwrite").partitionBy(date_col)
         .option("maxRecordsPerFile", target_rows_per_file)
         .parquet(staged))
        if not hadoop_exists(spark, staged + "/_SUCCESS"):
            raise RuntimeError(f"compaction write to {staged} left no "
                               f"_SUCCESS marker; live layout untouched")

    swap_directory(spark, path, write)
    after = sum(len(v) for v in partition_files(spark, path).values())
    return {"files_before": before, "files_after": after,
            "partitions": len(counts) + (1 if null_n else 0)}
