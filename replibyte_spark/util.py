"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None,
            min_bytes: int = 0) -> DataFrame:
    """Repartition up to cluster parallelism when the input arrives with too
    few partitions.

    Small-but-compute-heavy inputs (a single parquet file of documents whose
    shingling/hashing costs 1000× its IO) otherwise run on ONE core: Spark
    sizes scan partitions by bytes (`spark.sql.files.maxPartitionBytes`), not
    by downstream compute.  At 100 TB the scan is already wide and this is a
    no-op — `fan_out` only ever *increases* parallelism, never shuffles data
    that is already spread out.

    `min_bytes` opts a call site into a size floor: below it the input is
    left alone because the repartition exchange (an extra stage + shuffle of
    the whole input) costs more wall-clock than just computing serially.
    Only pass it where compute-per-byte is MODERATE (e.g. vector scoring);
    extreme ops (shingling, image decode) should always spread out.  The
    size comes from Catalyst's plan statistics (file sizes) — no job runs.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if min_bytes:
        try:
            size = int(df._jdf.queryExecution().optimizedPlan()
                       .stats().sizeInBytes())
        except Exception:
            size = None
        if size is not None and size < min_bytes:
            return df
    return df.repartition(target)
