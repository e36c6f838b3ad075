"""Pins for bench.py's single-claim tunnel-liveness flow (r5).

Every process pays its own remote-TPU claim, and a claim issued right
after another process released the chip takes ~300 s (r5: 306.8 s
measured in-process after a FAST subprocess probe).  bench.py therefore
makes exactly ONE claim: a failed 40 s quick probe no longer triggers a
patient subprocess retry (that claim+release forced the main process to
claim AGAIN — two ~300 s stalls, a guaranteed watchdog zero); instead the
main process proceeds straight to its in-process claim, and a truly dead
relay hangs there until the import-time watchdog emits the diagnostic
JSON (with the last-recorded golden value) at BENCH_DEADLINE_S.

bench.py starts the daemon watchdog thread AT IMPORT and it hard-exits
the process, so bench must be driven in a subprocess — never imported
into the test process.
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
{extra}
emitted = []
bench.emit = lambda: emitted.append(dict(bench._best))
bench.main()
print("CALLS=" + json.dumps(calls))
print("BEST=" + json.dumps(emitted[-1]))
"""


def _run(alive_expr: str, deadline: str = "120", extra: str = "") -> dict:
    env = dict(os.environ)
    env["BENCH_DEADLINE_S"] = deadline
    r = subprocess.run(
        [sys.executable, "-c",
         _DRIVER.format(repo=str(REPO), alive_seq=alive_expr, extra=extra)],
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


def test_failed_probe_makes_exactly_one_quick_attempt_then_proceeds():
    # the quick probe fails ONCE ([40] only — no 300 s subprocess retry,
    # that second claim+release is what starved the main process in r5),
    # and main() proceeds to its own in-process claim; on this CPU-pinned
    # driver the "claim" succeeds instantly and the bench completes, so
    # the pre-seeded "tunnel dead" error must have been cleared by the
    # first recorded stage
    out = _run("False")
    assert out["calls"] == [40.0]
    assert "error" not in out["best"]
    assert out["best"].get("value", 0) > 0


def test_dead_relay_hang_is_bounded_by_watchdog_with_last_recorded():
    # a truly dead relay hangs the in-process claim forever; the watchdog
    # must hard-exit at BENCH_DEADLINE_S having printed the diagnostic
    # JSON with the "tunnel dead" error AND the last-recorded golden row
    # (VERDICT r4 Next #1).  Simulated by hanging backend init; uses the
    # REAL emit + watchdog — the JSON goes to stdout.
    env = dict(os.environ)
    env["BENCH_DEADLINE_S"] = "25"
    driver = (
        "import jax, sys, time\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.path.insert(0, {str(REPO)!r})\n"
        "import bench\n"
        "bench._cpu_platform_pinned = lambda: False\n"
        "bench._tunnel_alive = lambda timeout_s=40.0: False\n"
        "bench.jax.default_backend = lambda: time.sleep(3600)\n"
        "bench.main()\n"
    )
    r = subprocess.run([sys.executable, "-c", driver], capture_output=True,
                       text=True, timeout=120, env=env, cwd=str(REPO))
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["value"] == 0.0 and "tunnel dead" in out["error"]
    lr = out["last_recorded"]
    assert lr["value"] > 0 and "STALE" in lr["note"]
    assert lr["source"] == "bench_results/golden_tpu_v5_lite_s.jsonl"
    assert out["vs_baseline_last_recorded"] == pytest.approx(
        lr["value"] / 175.0, abs=0.01)


@pytest.mark.slow
def test_alive_probe_runs_the_real_bench():
    # healthy path: quick probe succeeds -> single claim -> real verified
    # number on the CPU backend
    out = _run("True", deadline="300")
    assert out["calls"] == [40.0]
    assert "error" not in out["best"]
    assert out["best"].get("value", 0) > 0
