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


def test_bench_cleanup_frees_all_persistent_blocks(spark, sf_dir):
    """Run the two bench queries that persist/checkpoint internally
    (corpus pipeline: eager localCheckpoint + persisted pair list;
    embedding near-dup: checkpointed bucket frame), then apply EXACTLY the
    cleanup sequence bench.py uses between queries and assert the
    persistent-RDD registry drains."""
    from replibyte_spark.workload import all_queries

    qs = all_queries()
    for name in ("training_corpus_pipeline", "embedding_near_dup"):
        df = qs[name].spark_fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        # bench.py's per-query cleanup
        del df
        gc.collect()
        spark.catalog.clearCache()

    # ContextCleaner is asynchronous: blocks free only after the JVM sees
    # the dropped references.  Nudge both GCs and poll briefly — bench
    # queries get the same grace implicitly (seconds pass between
    # measurements).
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        if _persistent_rdd_count(spark) == 0:
            break
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
    assert _persistent_rdd_count(spark) == 0, (
        f"{_persistent_rdd_count(spark)} persistent RDDs survived the "
        "bench cleanup sequence — cache bleed across bench queries is back")
