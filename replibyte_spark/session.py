"""SparkSession bootstrap tuned for scale.

Defaults are chosen for the driver's local[32] test box but every knob is the
one you would also set on a 1000-executor cluster:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- Arrow on (vectorized Python interop for the few pandas_udf paths)
- shuffle partitions sized to cores locally; on a real cluster AQE coalesces
  from a high initial number, so we set the *initial* number high and let AQE
  shrink it instead of hand-tuning per query
- UTC session timezone for deterministic timestamp semantics (matches the
  DuckDB oracle's naive timestamps)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "replibyte_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 8
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # write timestamps as INT64 micros, not the legacy INT96 default:
        # INT96 columns carry NO parquet statistics, which silently
        # disables row-group min/max skipping for every time predicate on
        # data this engine writes (found via sinks/partitioned.py's
        # sorted-write pruning tier, r12); INT64 micros is also what
        # every modern reader (DuckDB, arrow) expects
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
    )
    return builder.getOrCreate()
