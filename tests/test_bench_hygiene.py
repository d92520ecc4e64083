"""Guards the bench harness's cache-hygiene contract (bench.py): after a
bench iteration's cleanup sequence, NO persisted/checkpointed blocks may
survive into the next query's measurement.

Round-2 post-mortem: persisted blocks from one bench query (internal
`persist()`/`localCheckpoint()` calls inside operators) outlived their
query because the ContextCleaner frees a block only after the Python
wrapper is garbage-collected AND the JVM notices the weak ref — so later
queries ran under inherited heap pressure and measured 1.8× slower.  The
fix (bench.py: del + gc.collect + clearCache per query) is behavioral and
would regress silently; this test locks it.
"""

from __future__ import annotations

import gc
import time


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _drain(spark, target: int, seconds: float = 30) -> int:
    """Poll the persistent-RDD registry down to `target` (ContextCleaner is
    asynchronous: blocks free only after BOTH GCs notice the dropped
    references).  Returns the final count."""
    deadline = time.monotonic() + seconds
    while time.monotonic() < deadline:
        n = _persistent_rdd_count(spark)
        if n <= target:
            return n
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
    return _persistent_rdd_count(spark)


def test_bench_cleanup_frees_all_persistent_blocks(spark, sf_dir):
    """Run the two bench queries that persist/checkpoint internally
    (corpus pipeline: eager localCheckpoint + persisted pair list;
    embedding near-dup: checkpointed bucket frame), then apply EXACTLY the
    cleanup sequence bench.py uses between queries and assert the
    persistent-RDD registry drains back to its pre-test baseline.
    (Baseline-relative because the session is shared across the pytest
    run — earlier tests' blocks may still be draining.)"""
    from replibyte_spark.workload import all_queries

    spark.catalog.clearCache()
    gc.collect()
    base = _drain(spark, 0)

    qs = all_queries()
    for name in ("training_corpus_pipeline", "embedding_near_dup"):
        df = qs[name].spark_fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        # bench.py's per-query cleanup
        del df
        gc.collect()
        spark.catalog.clearCache()

    # Spark pins the MOST RECENT execution (and any RDD its plan
    # references, e.g. a localCheckpoint) until a subsequent execution
    # displaces it — observed empirically: the last query's checkpoint
    # block never drains, however long you GC, until one more query runs.
    # In the bench loop the next measured query provides that displacement,
    # so the previous query's blocks are always freed before they could
    # skew it; model the same here with a trivial non-persisting query.
    spark.range(10).write.mode("overwrite").format("noop").save()

    final = _drain(spark, base)
    assert final <= base, (
        f"{final} persistent RDDs (baseline {base}) survived the bench "
        "cleanup sequence — cache bleed across bench queries is back")
