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
one monster task.  The rewrite stages into a sibling directory and
renames over the original only after its _SUCCESS marker lands — a
killed compaction leaves the live layout untouched.

Reference analogue: none — Replibyte's datastore is an opaque blob
archive (datastore/s3.rs); layout maintenance is a capability a
Spark-first engine adds on top of full parity, like :mod:`.bucketed`.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import dialect as D


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


def partition_files(path: str) -> "dict[str, list[str]]":
    """{partition dirname: [data files]} for a one-level partitioned
    layout — the maintenance view compaction works from."""
    out: dict[str, list[str]] = {}
    for entry in sorted(os.listdir(path)):
        full = os.path.join(path, entry)
        if "=" in entry and os.path.isdir(full):
            out[entry] = sorted(
                f for f in os.listdir(full)
                if f.endswith(".parquet") and not f.startswith("."))
    return out


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
    instead of one monster task.  Stages into ``path + '.compacting'``
    and renames over the original only after _SUCCESS — crash-safe.

    Returns {"files_before": n, "files_after": m, "partitions": p}."""
    if target_rows_per_file <= 0:
        raise ValueError("target_rows_per_file must be > 0, got "
                         f"{target_rows_per_file}")
    before = sum(len(v) for v in partition_files(path).values())
    df = spark.read.parquet(path)
    counts = {str(r["d"]): r["n"] for r in
              (df.groupBy(F.col(date_col).alias("d"))
               .agg(F.count(F.lit(1)).alias("n")).collect())}
    budgets = {d: max(1, math.ceil(n / target_rows_per_file))
               for d, n in counts.items()}
    slot_cases = " ".join(
        f"WHEN CAST(`{date_col}` AS STRING) = {D.q(d)} THEN {b}"
        for d, b in budgets.items())
    nf = F.expr(f"CASE {slot_cases} ELSE 1 END")
    # deterministic uniform slot from the row's stable content hash —
    # xxhash64 over all non-partition columns (no rand(): retries and
    # re-runs land rows in the same file)
    data_cols = [c for c in df.columns if c != date_col]
    slot = F.pmod(F.xxhash64(*[F.col(c) for c in data_cols]), nf)
    staged = f"{path}.compacting"
    shutil.rmtree(staged, ignore_errors=True)
    (df.withColumn("__slot", slot)
     .repartition(max(1, sum(budgets.values())), F.col(date_col),
                  F.col("__slot"))
     .drop("__slot")
     .write.mode("overwrite").partitionBy(date_col)
     .option("maxRecordsPerFile", target_rows_per_file)
     .parquet(staged))
    if not os.path.exists(os.path.join(staged, "_SUCCESS")):
        raise RuntimeError(f"compaction write to {staged} left no "
                           f"_SUCCESS marker; original layout untouched")
    old = f"{path}.precompact"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(staged, path)
    shutil.rmtree(old, ignore_errors=True)
    after = sum(len(v) for v in partition_files(path).values())
    return {"files_before": before, "files_after": after,
            "partitions": len(counts)}
