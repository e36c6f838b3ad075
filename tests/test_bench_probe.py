"""Pins for bench.py's two-stage tunnel-liveness probe (r4 session 6).

A cold-boot VM's FIRST dispatch includes the remote TPU claim (269 s
measured) — a single 40 s probe falsely declares the relay dead on every
fresh VM, which is the exact scoreboard zero VERDICT r3 punished.  bench.py
therefore retries a failed 40 s probe once with a 300 s window before
emitting ``{"error": "tunnel dead"}``.

bench.py starts a daemon watchdog thread AT IMPORT that hard-exits the
process at BENCH_DEADLINE_S, so it must be driven in a subprocess — never
imported into the test process.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent

_DRIVER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
import bench

calls = []
bench._cpu_platform_pinned = lambda: False
bench._tunnel_alive = lambda timeout_s=40.0: (calls.append(timeout_s),
                                              {alive_seq})[1]
emitted = []
bench.emit = lambda: emitted.append(dict(bench._best))
bench.main()
print("CALLS=" + json.dumps(calls))
print("BEST=" + json.dumps(emitted[-1]))
"""


def _run(alive_expr: str, deadline: str = "120") -> dict:
    env = dict(os.environ)
    env["BENCH_DEADLINE_S"] = deadline
    r = subprocess.run(
        [sys.executable, "-c",
         _DRIVER.format(repo=str(REPO), alive_seq=alive_expr)],
        capture_output=True, text=True, timeout=int(deadline) + 60, env=env,
        cwd=str(REPO))
    assert r.returncode == 0, r.stderr[-2000:]
    out = {}
    for line in r.stdout.splitlines():
        if line.startswith("CALLS="):
            out["calls"] = json.loads(line[len("CALLS="):])
        elif line.startswith("BEST="):
            out["best"] = json.loads(line[len("BEST="):])
    assert "calls" in out and "best" in out, r.stdout[-2000:]
    return out


def test_dead_tunnel_gets_patient_retry_then_diagnostic_json():
    # both probes fail -> [40, 300] attempted, "tunnel dead" emitted
    # WITHOUT the backend ever being initialized
    out = _run("False")
    assert out["calls"] == [40.0, 300.0]
    assert out["best"]["error"] == "tunnel dead"


def test_dead_tunnel_carries_last_recorded_golden_value():
    # VERDICT r4 Next #1: the real emit() must attach the best recorded
    # potrf golden row (clearly labeled stale) so a relay death at capture
    # time never again scores 0.0 with no context.  Uses the REAL emit —
    # the diagnostic JSON goes to stdout.
    env = dict(os.environ)
    env["BENCH_DEADLINE_S"] = "120"
    driver = (
        "import jax, sys\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.path.insert(0, {str(REPO)!r})\n"
        "import bench\n"
        "bench._cpu_platform_pinned = lambda: False\n"
        "bench._tunnel_alive = lambda timeout_s=40.0: False\n"
        "bench.main()\n"
    )
    r = subprocess.run([sys.executable, "-c", driver], capture_output=True,
                       text=True, timeout=180, env=env, cwd=str(REPO))
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["value"] == 0.0 and "tunnel dead" in out["error"]
    lr = out["last_recorded"]
    assert lr["value"] > 0 and "STALE" in lr["note"]
    assert lr["source"] == "bench_results/golden_tpu_v5_lite_s.jsonl"
    assert out["vs_baseline_last_recorded"] == pytest.approx(
        lr["value"] / 175.0, abs=0.01)


@pytest.mark.slow
def test_cold_boot_recovery_runs_the_real_bench():
    # quick probe fails, patient succeeds (the measured cold-boot shape) ->
    # bench proceeds to a real verified number on the CPU backend
    out = _run("(False if len(calls) == 1 else True)", deadline="300")
    assert out["calls"] == [40.0, 300.0]
    assert "error" not in out["best"]
    assert out["best"].get("value", 0) > 0
