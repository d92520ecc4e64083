"""Guards the bench harness's cache-hygiene contract (bench.py): after a
bench iteration's cleanup sequence, NO persisted/checkpointed blocks may
survive into the next query's measurement.

Round-2 post-mortem: persisted blocks from one bench query (internal
`persist()`/`localCheckpoint()` calls inside operators) outlived their
query because the ContextCleaner frees a block only after the Python
wrapper is garbage-collected AND the JVM notices the weak ref — so later
queries ran under inherited heap pressure and measured 1.8× slower.

Round-4 post-mortem: GC-based cleanup (del + gc.collect + clearCache) is
NOT sufficient — the corpus pipeline's eager localCheckpoint stayed pinned
in the persistent-RDD registry through displacement queries and 25 s of
double-GC draining, because checkpoint RDDs free only when the JVM
collects every referencing plan.  The fix is twofold: the corpus pipeline
now materializes through the cache manager (reclaimable by clearCache),
and bench.py's cleanup explicitly sweeps the registry
(util.free_persistent_rdds).  This test applies EXACTLY that cleanup
sequence and asserts the registry is empty — deterministically, no drain
loop, no displacement query.
"""

from __future__ import annotations

import gc


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_bench_cleanup_frees_all_persistent_blocks(spark, sf_dir):
    """Run the two bench queries that persist/checkpoint internally
    (corpus pipeline: cache-manager persist + driver union-find;
    embedding near-dup: localCheckpoint'd bucket frame), apply bench.py's
    per-iteration cleanup after each, and assert ZERO persistent RDDs
    remain — the registry a leaked block would bleed through."""
    from replibyte_spark.util import free_persistent_rdds
    from replibyte_spark.workload import all_queries

    # start clean (earlier suite tests may have blocks mid-drain)
    spark.catalog.clearCache()
    free_persistent_rdds(spark)
    assert _persistent_rdd_count(spark) == 0

    qs = all_queries()
    for name in ("training_corpus_pipeline", "embedding_near_dup"):
        df = qs[name].spark_fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        # bench.py's per-iteration cleanup()
        del df
        gc.collect()
        spark.catalog.clearCache()
        free_persistent_rdds(spark)
        assert _persistent_rdd_count(spark) == 0, (
            f"persistent RDDs survived the bench cleanup after {name} — "
            "cache bleed across bench queries is back")
