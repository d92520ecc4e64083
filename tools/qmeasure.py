#!/usr/bin/env python
"""Per-query measurement harness for optimization work (guide §1).

Times named registry queries with the bench's own methodology (unmeasured
warm pass, min-of-N noop-sink writes, cache hygiene between iterations)
and prints a per-stage wall-clock attribution for the LAST measured
iteration so the time can be mapped back to plan operators.

Usage:
    python tools/qmeasure.py [-n RUNS] [--plan-dir DIR --tag TAG] NAME...

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

This tool is measurement-only: it never changes what a query computes.
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", "--runs", type=int, default=3)
    ap.add_argument("--plan-dir", default=None,
                    help="write <name>_<tag>.txt explain(formatted) here")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--stages", action="store_true",
                    help="print per-stage attribution of the last run")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from replibyte_spark.session import get_spark
    from replibyte_spark.util import free_persistent_rdds
    from replibyte_spark.workload import all_queries, prepare_fixtures

    spark = get_spark("qmeasure", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    unknown = [n for n in args.names if n not in queries]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    prepare_fixtures(spark, sf_dir)

    def cleanup() -> None:
        gc.collect()
        spark.catalog.clearCache()
        free_persistent_rdds(spark)

    def stage_report(group: str) -> list[str]:
        sc = spark.sparkContext
        st = sc.statusTracker()
        store = sc._jsc.sc().statusStore()
        lines = []
        jids = sorted(st.getJobIdsForGroup(group))
        for jid in jids:
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            jname = ""
            try:
                jd = store.job(jid)  # v1.JobData (raises if evicted)
                if jd.description().isDefined():
                    jname = jd.description().get()
            except Exception:
                pass
            lines.append(f"  job {jid} {jname[:90]}")
            for sid in sorted(ji.stageIds):
                try:
                    # Spark 4.1: stageData(id, details, taskStatus,
                    # withSummaries, unsortedQuantiles) -> Seq[StageData]
                    seq = store.stageData(sid, False, None, False, None)
                    if seq.isEmpty():
                        continue
                    s = seq.apply(seq.size() - 1)
                    dur = 0
                    if (s.submissionTime().isDefined()
                            and s.completionTime().isDefined()):
                        dur = (s.completionTime().get().getTime()
                               - s.submissionTime().get().getTime())
                    lines.append(
                        f"    stage {sid:4d} {dur:6d}ms tasks="
                        f"{s.numCompleteTasks():3d} "
                        f"in={s.inputBytes()>>10}K sh_r="
                        f"{s.shuffleReadBytes()>>10}K sh_w="
                        f"{s.shuffleWriteBytes()>>10}K  "
                        f"{s.name()[:80]}")
                except Exception as ex:  # stage may be missing from store
                    lines.append(f"    stage {sid}: <{ex}>")
        return lines

    results = {}
    for name in args.names:
        q = queries[name]
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = q.spark_fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plan_dir,
                                   f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
            cleanup()
        if not args.no_warm:
            q.spark_fn(spark, sf_dir).write.mode("overwrite") \
                .format("noop").save()
            cleanup()
        times = []
        group = ""
        for i in range(args.runs):
            group = f"qm:{name}:{i}"
            spark.sparkContext.setJobGroup(group, group, False)
            t0 = time.perf_counter()
            q.spark_fn(spark, sf_dir).write.mode("overwrite") \
                .format("noop").save()
            times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobGroup(None, None, False)
            if i < args.runs - 1:
                cleanup()
        if args.stages:
            print(f"--- {name} stage attribution (last run, "
                  f"{times[-1]:.3f}s) ---")
            print("\n".join(stage_report(group)))
        cleanup()
        results[name] = times
        print(f"{name}: min {min(times):.3f}s  runs "
              f"{[round(t, 3) for t in times]}  load1 "
              f"{os.getloadavg()[0]:.2f}", flush=True)

    print("# summary")
    for n, ts in results.items():
        print(f"{n}\t{min(ts):.3f}")


if __name__ == "__main__":
    main()
