"""bench.py is a driver artifact contract: exactly ONE compact JSON line
on stdout (the driver tail-captures ~2 KB and records it as
BENCH_r{N}.json) plus a bench_raw.json sidecar with the bulky diagnostics
(raw iteration times, straggler metrics, load attribution).  Round 7
inlined raw_times into the stdout line and overflowed the tail capture —
the artifact came back "parsed": null.  Lock both halves here."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow  # full sf0.001 bench subprocess, ~5-8 min (r14 verdict #2)
def test_bench_emits_one_json_line_with_contract_schema(tmp_path):
    # the sidecar goes to a TEMP name via the env override: a pytest run
    # must never dirty the committed bench_raw.json (the r8 verdict's
    # artifact/sidecar skew came from exactly that), and the override is
    # what developer/judge reruns use (bench_raw.local.json, gitignored).
    # The load limit is raised so a busy CI box doesn't spend the
    # backoff budget; the gate's own behavior is covered below.
    sidecar = str(tmp_path / "bench_raw.test.json")
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_BENCH_RUNS="1",
               SPARK_GRAFT_CPUS="8",
               SPARK_GRAFT_BENCH_SIDECAR=sidecar,
               SPARK_GRAFT_BENCH_LOAD_LIMIT="512")
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, env=env,
                         cwd=REPO, timeout=480)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE stdout line, got {len(lines)}"
    # the driver tail-captures ~2 KB: the summary line must fit with room
    # to spare or the artifact comes back "parsed": null (round 7)
    assert len(lines[0]) < 1500, f"summary line {len(lines[0])}B >= 1500B"
    rec = json.loads(lines[0])
    assert rec["metric"] == "headline_queries_total_wall_clock"
    assert rec["unit"] == "sec"
    assert rec["sf"] == 0.001
    assert isinstance(rec["value"], (int, float))
    assert rec["queries"] and all(
        isinstance(v, (int, float)) for v in rec["queries"].values())
    assert abs(sum(rec["queries"].values()) - rec["value"]) < 0.01
    # start/end 1-min load echoed in the summary (r9: load-gated bench)
    assert len(rec["load"]) == 2 and all(
        isinstance(x, (int, float)) for x in rec["load"])
    assert "load_polluted" not in rec       # limit raised above → clean
    # bulky diagnostics live in the sidecar, NOT the stdout line
    assert "raw_times" not in rec and "max_shuffle_task_ms" not in rec
    assert rec["sidecar"] == sidecar
    with open(sidecar) as fh:
        raw = json.load(fh)
    assert raw["load_limit"] == 512
    assert raw["load_polluted"] is False
    # straggler metric: one entry per query
    assert set(raw["max_shuffle_task_ms"]) == set(rec["queries"])
    # raw per-iteration times: recorded time is their minimum; [0] is the
    # first measured (post the unmeasured warm pass) iteration for
    # attribution
    assert set(raw["raw_times"]) == set(rec["queries"])
    for name, rt in raw["raw_times"].items():
        assert rt and all(isinstance(t, (int, float)) for t in rt)
        assert abs(min(rt) - rec["queries"][name]) < 0.01
        assert raw["cold_times"][name] == rt[0]
    # load-average attribution: pre/post plus per-query snapshots
    assert len(raw["loadavg_start"]) == 3 and len(raw["loadavg_end"]) == 3
    assert set(raw["loadavg_at_query"]) == set(rec["queries"])
    # r12: the sidecar carries its own admissibility evidence — sentinel
    # thresholds, breaches (none here: sentinels apply only at the
    # recording shape cpus=32/sf0.1), and drift vs the committed
    # recording (none here: the committed sidecar is a different sf)
    assert set(raw["sentinels"]) == {"q1_pricing_summary",
                                     "zipf_hot_join_salted",
                                     "minhash_near_dup"}
    assert raw["sentinel_breach"] == {}
    assert raw["drift_vs_committed"] == {}
    assert raw["drift_limit"] == 1.5
    assert "sentinel_breach" not in rec


def test_bench_load_gate_backs_off_then_flags(monkeypatch, capsys):
    """The gate retries while the box is loaded, passes as soon as the
    load settles, and flags load_polluted (instead of refusing forever)
    when it never does."""
    import bench

    monkeypatch.setenv("SPARK_GRAFT_BENCH_LOAD_LIMIT", "2.0")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_LOAD_RETRIES", "3")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_LOAD_BACKOFF", "0")
    # settles on the third reading
    readings = iter([(9.0,) * 3, (9.0,) * 3, (1.0,) * 3, (1.0,) * 3,
                     (1.0,) * 3])
    monkeypatch.setattr(bench.os, "getloadavg", lambda: next(readings))
    limit, polluted = bench.load_gate(cpus=8)
    assert (limit, polluted) == (2.0, False)
    assert "backing off" in capsys.readouterr().err
    # never settles -> polluted flag, loud warning
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.0,) * 3)
    limit, polluted = bench.load_gate(cpus=8)
    assert polluted is True
    assert "load_polluted" in capsys.readouterr().err
    # default limit derives from the cpu count (0.15x since r10 — a
    # recorded run must mean a genuinely idle box)
    monkeypatch.delenv("SPARK_GRAFT_BENCH_LOAD_LIMIT")
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (1.0,) * 3)
    limit, polluted = bench.load_gate(cpus=32)
    assert (limit, polluted) == (4.8, False)
