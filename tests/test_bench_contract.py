"""bench.py is a driver artifact contract: exactly ONE JSON line on stdout
with the schema the driver records as BENCH_r{N}.json.  A broken emit would
surface only at round snapshot time — lock it here instead."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_one_json_line_with_contract_schema():
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
               SPARK_GRAFT_BENCH_RUNS="1",
               SPARK_GRAFT_CPUS="8")
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, env=env,
                         cwd=REPO, timeout=480)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE stdout line, got {len(lines)}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "headline_queries_total_wall_clock"
    assert rec["unit"] == "sec"
    assert rec["sf"] == 0.001
    assert isinstance(rec["value"], (int, float))
    assert rec["queries"] and all(
        isinstance(v, (int, float)) for v in rec["queries"].values())
    # round-4 straggler metric rides along, one entry per query
    assert set(rec["max_shuffle_task_ms"]) == set(rec["queries"])
    assert abs(sum(rec["queries"].values()) - rec["value"]) < 0.01
    # round-7: raw per-iteration times ride along so artifact drift is
    # attributable post hoc; the recorded time is their minimum
    assert set(rec["raw_times"]) == set(rec["queries"])
    for name, rt in rec["raw_times"].items():
        assert rt and all(isinstance(t, (int, float)) for t in rt)
        assert abs(min(rt) - rec["queries"][name]) < 0.01
