#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
compact JSON line — the LAST stdout line: {"metric": ..., "value":
total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...}.

Everything bulky (raw per-iteration times, straggler-task metrics,
load-average attribution) goes to the bench_raw.json SIDECAR next to this
file, NOT the stdout line: the driver tail-captures only ~2 KB of output,
and inlining raw_times in round 7 pushed the line past that window, making
BENCH_r07.json unparseable ("parsed": null).  The stdout line stays under
1.5 KB by contract (tests/test_bench_contract.py).

Each query is fully materialized (noop-sink write of every column) so the
wall-clock includes the whole plan, not just lazy construction.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Clean-window sentinels (warm-min thresholds at cpus=32, sf0.1, from the
# committed clean recordings).  Loadavg is blind to hypervisor steal, so a
# recording is trusted only when rows of three DIFFERENT shapes all land
# at their idle cost: a scan/agg (q1), a shuffle-heavy salted join (zipf),
# and — r12, after the r11 artifact shipped minhash/simhash ~2× dirty
# while BOTH scan sentinels passed — a pure hash-fan-out row (minhash),
# the shape most sensitive to steal that scan sentinels underreport.
SENTINELS = {
    "q1_pricing_summary": 0.45,
    "zipf_hot_join_salted": 2.3,
    # the r12 committed recording's warm value is 1.92; mildly-degraded
    # windows the same day read 2.34-2.35 (still far from the 4.12 the
    # r11 artifact shipped dirty), so 2.3 separates "best-achievable
    # window" from "don't commit" — expect to retry a few windows.
    "minhash_near_dup": 2.3,
}
SENTINEL_CPUS, SENTINEL_SF = 32, "0.1"
# r12 recording rule: a code-untouched row moving more than this vs the
# last COMMITTED recording means the window (or an unnoticed regression)
# is lying — either way the recording must not be committed as-is.
DRIFT_LIMIT = 1.5


def _committed_sidecar(path: str) -> "dict | None":
    """The last git-committed bench_raw.json (the previous clean
    recording), falling back to the on-disk file when git is unavailable.
    Comparing against HEAD rather than the working copy means an aborted
    dirty run can't become the next run's baseline."""
    rel = os.path.relpath(path, os.path.dirname(os.path.abspath(__file__)))
    try:
        out = subprocess.run(
            ["git", "show", f"HEAD:{rel}"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)), timeout=10)
        if out.returncode == 0:
            return json.loads(out.stdout)
    except Exception:
        pass
    try:
        with open(path) as fh:
            return json.load(fh)
    except Exception:
        return None


def load_gate(cpus: int) -> "tuple[float, bool]":
    """Refuse to measure on a busy box: back off while the 1-min load
    average exceeds the limit (default 0.15×cpus, env-overridable); if it
    never settles, flag the run as load-polluted instead of silently
    recording contended numbers (the r9 artifact was recorded at loadavg
    6-8.35 against the old 0.25×cpus limit — it barely passed, and the
    most CPU-parallel rows (the ANN family) read ~2× their idle cost;
    r10 tightened the default so a recorded run means a genuinely idle
    box).  Returns (load_limit, load_polluted)."""
    load_limit = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_LIMIT",
                                      str(0.15 * cpus)))
    load_retries = int(os.environ.get("SPARK_GRAFT_BENCH_LOAD_RETRIES", "4"))
    load_backoff = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_BACKOFF",
                                        "30"))
    for _ in range(load_retries):
        if os.getloadavg()[0] <= load_limit:
            break
        print(f"# loadavg {os.getloadavg()[0]:.2f} > limit "
              f"{load_limit:.2f}: backing off {load_backoff:.0f}s",
              file=sys.stderr)
        time.sleep(load_backoff)
    load_polluted = os.getloadavg()[0] > load_limit
    if load_polluted:
        print(f"# WARNING: loadavg {os.getloadavg()[0]:.2f} still > "
              f"{load_limit:.2f} after {load_retries} backoffs — recording "
              f"anyway, flagged load_polluted", file=sys.stderr)
    return load_limit, load_polluted


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    load_limit, load_polluted = load_gate(cpus)

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # adaptive extension: when the first `runs` iterations of a query
    # spread more than SPREAD ((max-min)/min), take up to EXTRA_RUNS more
    # before picking the min — high-variance queries get min-of-5 without
    # paying 5 runs everywhere (BENCH_r06 drift was concentrated in a
    # handful of queries)
    extra_runs = int(os.environ.get("SPARK_GRAFT_BENCH_EXTRA_RUNS", "2"))
    spread_limit = float(os.environ.get("SPARK_GRAFT_BENCH_SPREAD", "0.30"))

    from replibyte_spark.session import get_spark
    from replibyte_spark.util import free_persistent_rdds
    from replibyte_spark.workload import all_queries, prepare_fixtures

    spark = get_spark("replibyte-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = {n: q for n, q in all_queries().items() if q.bench}

    # build every parameter-keyed on-disk fixture BEFORE the timing loop:
    # a cache-key change (new index parameters) must cost one build here,
    # never inside a measured iteration
    prepare_fixtures(spark, sf_dir)

    # min-of-N (default 3): the box's run-to-run variance at sf0.1 is larger
    # than most plan-level differences; min isolates the plan cost.
    import gc

    def cleanup() -> None:
        """Per-iteration hygiene: drop every cached/checkpointed block NOW.

        clearCache frees cache-manager blocks; free_persistent_rdds sweeps
        what clearCache cannot reach (localCheckpoint RDDs, which otherwise
        stay pinned until the JVM GCs every referencing plan — the round-4
        cache-bleed failure).  Safe mid-bench: the next iteration rebuilds
        its DataFrame from scratch, nothing re-executes a swept plan."""
        gc.collect()
        spark.catalog.clearCache()
        free_persistent_rdds(spark)

    def max_shuffle_task_ms(group: str) -> int:
        """Longest shuffle-READING task (ms) across the job group's stages —
        the straggler metric skew mitigation actually improves.  Wall-clock
        on a 32-core box hides a hot partition whenever other work keeps the
        cores busy; the hot task's own duration does not.  (Scan/explode
        stages are excluded: they read files, not shuffle, and their task
        times reflect input splits, not key distribution.)"""
        sc = spark.sparkContext
        st = sc.statusTracker()
        store = sc._jsc.sc().statusStore()
        mx = 0
        for jid in st.getJobIdsForGroup(group):
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is None:
                    continue
                it = store.taskList(sid, si.currentAttemptId, 100000).iterator()
                while it.hasNext():
                    td = it.next()
                    dur = td.duration()
                    tm = td.taskMetrics()
                    if (dur.isDefined() and tm.isDefined()
                            and tm.get().shuffleReadMetrics().recordsRead() > 0):
                        mx = max(mx, dur.get())
        return mx

    # Unmeasured warm pass over EVERY bench query (r12).  The r11/r12
    # artifacts repeatedly shipped the FIRST few rows (subset closure,
    # minhash, simhash) 2-3× their warm-steady cost: they executed inside
    # the first noisy minute after fixture building — decaying loadavg,
    # cold JIT/codegen, cold parquet page cache — and min-of-5 never
    # escaped that window (a dedicated session measured warm minhash at
    # 2.3-2.8 s while the bench recorded 6.4-11 across all five
    # iterations).  One full unmeasured pass costs ~1 recording's worth
    # of wall-clock and makes every MEASURED iteration warm, which is
    # what the sentinel thresholds have always described ("warm q1
    # ≤ 0.45").  The sidecar's first_measured (née cold_times) now means
    # "first post-warm iteration" — hot-vs-cold attribution moved into
    # this pass, where it belongs, instead of polluting row 1's minimum.
    for name, q in bench_queries.items():
        q.spark_fn(spark, sf_dir).write.mode("overwrite") \
            .format("noop").save()
        cleanup()

    # load re-settle AFTER fixtures + warm pass: the opening gate ran
    # before Spark even started, so fixture builds and the warm pass
    # leave a decaying 1-min loadavg the first measured rows would
    # otherwise absorb
    load_limit2, load_polluted2 = load_gate(cpus)
    load_polluted = load_polluted or load_polluted2

    raw_times: dict[str, list] = {}
    raw_tasks: dict[str, list] = {}
    loadavg_at: dict[str, list] = {}
    loadavg_start = [round(x, 2) for x in os.getloadavg()]

    def run_iterations(name: str, q) -> None:
        """min-of-N measurement loop for one query; APPENDS to the
        per-name raw lists so a retry round simply extends the evidence
        (the reported time is the min across every iteration ever run)."""
        # runtime enforcement of the hygiene contract the test locks: every
        # query starts its first measured iteration with a clean registry
        leftover = spark.sparkContext._jsc.getPersistentRDDs().size()
        assert leftover == 0, (
            f"{leftover} persistent RDDs leaked into {name}'s measurement")
        print(f"# {name}: 0 persistent RDDs at start", file=sys.stderr)
        # box-load attribution: a uniform inflation across queries with a
        # high load-average here is contention, not a plan regression.
        # One [1m,5m,15m] sample PER measuring pass (a retried row gets a
        # second sample), so the sidecar's evidence describes the window
        # the reported min actually came from, not just the first dirty
        # attempt (r13 review)
        loadavg_at.setdefault(name, []).append(
            [round(x, 2) for x in os.getloadavg()])
        times: list[float] = []
        tasks: list[int] = []
        i = 0
        while True:
            group = f"bench:{name}:{i}"
            spark.sparkContext.setJobGroup(group, group, False)
            t0 = time.perf_counter()
            df = q.spark_fn(spark, sf_dir)
            # noop sink materializes EVERY column (count() would let Catalyst
            # prune the projections we're trying to measure)
            df.write.mode("overwrite").format("noop").save()
            elapsed = time.perf_counter() - t0
            spark.sparkContext.setJobGroup(None, None, False)
            times.append(elapsed)
            tasks.append(max_shuffle_task_ms(group))
            del df
            cleanup()
            i += 1
            if i < runs:
                continue
            spread = (max(times) - min(times)) / min(times)
            if spread <= spread_limit or i >= runs + extra_runs:
                break
            print(f"# {name}: spread {spread:.0%} > {spread_limit:.0%}, "
                  f"extending to run {i + 1}", file=sys.stderr)
        # raw per-iteration wall-clocks go to the sidecar so round-over-
        # round drift is attributable post hoc (min hides which runs were
        # load spikes); element [0] is each query's FIRST MEASURED
        # iteration — post the r12 unmeasured warm pass, so it's warm;
        # a raw[0] >> min gap now reads as in-loop interference, not
        # cold caches
        raw_times.setdefault(name, []).extend(round(t, 3) for t in times)
        raw_tasks.setdefault(name, []).extend(int(t) for t in tasks)
        print(f"# {name}: {round(min(times), 3)}s (min of {len(times)}), "
              f"max shuffle task {int(tasks[min(range(len(times)), key=times.__getitem__)])}ms",
              file=sys.stderr)

    for name, q in bench_queries.items():
        run_iterations(name, q)

    def best(name: str) -> "tuple[float, int]":
        ts = raw_times[name]
        bi = min(range(len(ts)), key=ts.__getitem__)
        return ts[bi], raw_tasks[name][bi]

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # the sidecar name is env-overridable so developer/judge reruns write
    # a DIFFERENT file (e.g. bench_raw.local.json, gitignored) — the
    # committed bench_raw.json must always describe the same run as the
    # recorded BENCH artifact (the r8 verdict's artifact/sidecar skew)
    sidecar_name = os.environ.get("SPARK_GRAFT_BENCH_SIDECAR",
                                  "bench_raw.json")
    sidecar_path = (sidecar_name if os.path.isabs(sidecar_name)
                    else os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        sidecar_name))

    # clean-window verdict: sentinel thresholds (cpus/sf-matched runs
    # only) + per-row drift vs the last committed recording.  Both go to
    # the sidecar so a recording carries its own admissibility evidence;
    # drift is attribution (code may have legitimately changed), the
    # sentinel breach is disqualifying.
    prev = _committed_sidecar(sidecar_path)

    def window_checks() -> "tuple[dict, dict, dict]":
        timings = {n: round(best(n)[0], 3) for n in raw_times}
        breach: dict[str, list] = {}
        if cpus == SENTINEL_CPUS and sf == SENTINEL_SF:
            for n, limit in SENTINELS.items():
                if n in timings and timings[n] > limit:
                    breach[n] = [timings[n], limit]
        drift: dict[str, float] = {}
        if prev and prev.get("cpus") == cpus and prev.get("sf_dir") == sf_dir:
            for n, rt in (prev.get("raw_times") or {}).items():
                if n in timings and rt and min(rt) > 0:
                    ratio = timings[n] / min(rt)
                    if ratio > DRIFT_LIMIT or ratio < 1 / DRIFT_LIMIT:
                        drift[n] = round(ratio, 2)
        slow = {n: r for n, r in drift.items() if r > DRIFT_LIMIT}
        return breach, slow, drift

    # refuse-and-retry (r13, r12 verdict #2): instead of EMITTING a
    # flagged-dirty summary, re-measure only the breached / slower-moving
    # rows after a bounded load backoff — the driver's artifact then
    # carries the best window this invocation could find, not the first.
    # Retries extend each row's raw evidence (min across everything), so
    # a retry can only improve a row.  A row still breached after the
    # retry budget stays flagged — a genuine code regression cannot be
    # retried away, which is the point of the sentinels.
    retry_rounds = int(os.environ.get("SPARK_GRAFT_BENCH_RETRY_ROUNDS", "2"))
    retry_backoff = float(os.environ.get("SPARK_GRAFT_BENCH_RETRY_BACKOFF",
                                         "45"))
    retried: dict[str, int] = {}
    for round_i in range(retry_rounds):
        sentinel_breach, slow_movers, drift_vs_committed = window_checks()
        suspects = sorted(set(sentinel_breach) | set(slow_movers))
        if not suspects:
            break
        print(f"# retry {round_i + 1}/{retry_rounds}: window not clean "
              f"(breach={sorted(sentinel_breach)}, "
              f"slow={sorted(slow_movers)}) — backing off "
              f"{retry_backoff:.0f}s and re-measuring those rows",
              file=sys.stderr)
        time.sleep(retry_backoff)
        load_gate(cpus)
        for n in suspects:
            # re-warm unmeasured first: the backoff sleep cooled caches
            bench_queries[n].spark_fn(spark, sf_dir).write \
                .mode("overwrite").format("noop").save()
            cleanup()
            run_iterations(n, bench_queries[n])
            retried[n] = retried.get(n, 0) + 1

    # final escalation (r14, r13 verdict #2): the bounded retry ladder
    # above gives up after `retry_rounds` fixed backoffs, which is how the
    # r13 driver artifact shipped dirty (load rose 3.6->11.2 mid-run and
    # 45 s backoffs never outlived the wave).  If drift remains after the
    # budget, re-enter a HARD load gate — wait until the 1-min loadavg is
    # actually quiet (< SPARK_GRAFT_BENCH_QUIET_LOAD, default 1.0), up to
    # SPARK_GRAFT_BENCH_QUIET_WAIT seconds — then re-warm and re-measure
    # only the dirty rows once more.  If the window STILL isn't clean the
    # summary self-classifies with load_polluted: true; no more
    # silently-dirty driver artifacts.
    sentinel_breach, slow_movers, drift_vs_committed = window_checks()
    suspects = sorted(set(sentinel_breach) | set(slow_movers))
    quiet_gated = False
    if suspects:
        quiet_gated = True
        quiet_load = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_LOAD",
                                          "1.0"))
        quiet_wait = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_WAIT",
                                          "600"))
        print(f"# retry budget exhausted with dirty rows {suspects}: "
              f"waiting up to {quiet_wait:.0f}s for 1-min load < "
              f"{quiet_load}", file=sys.stderr)
        t_gate = time.monotonic()
        while (os.getloadavg()[0] > quiet_load
               and time.monotonic() - t_gate < quiet_wait):
            time.sleep(15)
        print(f"# quiet gate exit after {time.monotonic() - t_gate:.0f}s "
              f"at loadavg {os.getloadavg()[0]:.2f}; final re-measure of "
              f"{suspects}", file=sys.stderr)
        for n in suspects:
            bench_queries[n].spark_fn(spark, sf_dir).write \
                .mode("overwrite").format("noop").save()
            cleanup()
            run_iterations(n, bench_queries[n])
            retried[n] = retried.get(n, 0) + 1

    sentinel_breach, slow_movers, drift_vs_committed = window_checks()
    # a window that stayed dirty through the quiet gate is load-polluted
    # by definition of the gate (or a real regression — either way the
    # artifact must not read as clean)
    load_polluted = load_polluted or bool(sentinel_breach) or bool(slow_movers)
    timings = {n: round(best(n)[0], 3) for n in raw_times}
    straggler_ms = {n: best(n)[1] for n in raw_times}
    loadavg_end = [round(x, 2) for x in os.getloadavg()]
    if sentinel_breach:
        print(f"# WARNING: sentinel breach {sentinel_breach} after "
              f"{retry_rounds} retry rounds — this window is NOT clean, "
              f"do not commit this recording", file=sys.stderr)
    if slow_movers:
        print(f"# drift >{DRIFT_LIMIT}x SLOWER vs last committed "
              f"recording: {slow_movers} — code-untouched slow movers "
              f"mean a dirty window", file=sys.stderr)
    elif drift_vs_committed:
        print(f"# drift vs last committed recording (all faster): "
              f"{drift_vs_committed}", file=sys.stderr)

    with open(sidecar_path, "w") as fh:
        json.dump({
            "raw_times": raw_times,
            "cold_times": {n: rt[0] for n, rt in raw_times.items()},
            "max_shuffle_task_ms": straggler_ms,
            "loadavg_start": loadavg_start,
            "loadavg_at_query": loadavg_at,
            "loadavg_end": loadavg_end,
            "load_limit": round(load_limit, 2),
            "load_polluted": load_polluted,
            "sentinels": SENTINELS,
            "sentinel_breach": sentinel_breach,
            "drift_limit": DRIFT_LIMIT,
            "drift_vs_committed": drift_vs_committed,
            "retried": retried, "retry_rounds": retry_rounds,
            "quiet_gated": quiet_gated,
            "runs": runs, "extra_runs": extra_runs,
            "spread_limit": spread_limit, "cpus": cpus, "sf_dir": sf_dir,
        }, fh, indent=1)
    print(f"# raw iteration times + load attribution -> {sidecar_path}",
          file=sys.stderr)

    # the compact summary is the FINAL stdout line (driver tail-captures
    # ~2 KB; test_bench_contract locks the size).  load = [1-min loadavg
    # at start, at end]: a clean artifact shows start under the limit.
    summary = {
        "metric": "headline_queries_total_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "load": [loadavg_start[0], loadavg_end[0]],
        "sidecar": sidecar_name,
    }
    if load_polluted:
        summary["load_polluted"] = True
    if sentinel_breach:
        summary["sentinel_breach"] = sorted(sentinel_breach)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
