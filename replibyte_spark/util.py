"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def free_persistent_rdds(spark: SparkSession, blocking: bool = True) -> int:
    """Explicitly unpersist EVERY RDD in the context's persistent-RDD
    registry; returns how many were freed.

    `spark.catalog.clearCache()` only reaches cache-manager blocks
    (``df.persist()``); ``localCheckpoint`` RDDs bypass the cache manager
    and free only when the JVM garbage-collects every referencing plan —
    which the ContextCleaner cannot force and which round 4 showed can
    simply never happen while the session lives.  The bench harness (and
    its hygiene test) call this between queries so no query's blocks
    survive into the next query's measurement.  Safe there because nothing
    re-executes a prior query's plan after its measurement completes;
    callers that still need a checkpointed frame must not call this.
    """
    jmap = spark.sparkContext._jsc.getPersistentRDDs()  # py4j dict-like
    rdds = list(jmap.values())
    for jrdd in rdds:
        jrdd.unpersist(blocking)
    return len(rdds)


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to cluster parallelism when the input arrives with too
    few partitions.

    Small-but-compute-heavy inputs (a single parquet file of documents whose
    shingling/hashing costs 1000× its IO) otherwise run on ONE core: Spark
    sizes scan partitions by bytes (`spark.sql.files.maxPartitionBytes`), not
    by downstream compute.  At 100 TB the scan is already wide and this is a
    no-op — `fan_out` only ever *increases* parallelism, never shuffles data
    that is already spread out.

    History (SCALE.md): a `min_bytes` size floor used to skip the exchange
    for sub-32 MB inputs on the theory that the shuffle cost exceeded the
    serial compute.  Measured at sf0.1 the opposite was true — the ANN
    brute-force scoring left on 1 partition cost 2.9 s vs 1.3 s fanned out —
    because compute-per-byte for HOF vector folds is high, exactly the case
    this helper exists for.  The floor was the two-round bench regression;
    it is gone.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
