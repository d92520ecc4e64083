"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to cluster parallelism when the input arrives with too
    few partitions.

    Small-but-compute-heavy inputs (a single parquet file of documents whose
    shingling/hashing costs 1000× its IO) otherwise run on ONE core: Spark
    sizes scan partitions by bytes (`spark.sql.files.maxPartitionBytes`), not
    by downstream compute.  At 100 TB the scan is already wide and this is a
    no-op — `fan_out` only ever *increases* parallelism, never shuffles data
    that is already spread out.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
