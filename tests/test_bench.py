"""bench.py contract tests (no TPU required).

The harness that records benchmark results parses exactly ONE JSON line
from stdout and treats a nonzero exit as a crash, so the
unreachable-backend watchdog must emit a well-formed zero measurement and
exit 0 — otherwise a tunnel outage at bench time is recorded as a parse
error instead of a measurement (reference anchor: the bench contract in
the round driver; the measured quantity mirrors SURVEY.md §6's
samples/sec wall-clock framing).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_deadline_emits_record_and_exits_zero():
    """Driver-window deadline: bench must emit its best-available estimate
    (zero here — the deadline fires before any step runs) and exit 0, so a
    contended table build can never turn the round's benchmark into an
    unparsed rc=124 (round-1 failure mode, BENCH_r01.json)."""
    env = dict(os.environ)
    env["CNC_BENCH_DEADLINE_S"] = "0"   # fire ~1s after the thread starts
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import runpy, sys; sys.argv = ['bench.py'];"
         "runpy.run_path('bench.py', run_name='__main__')"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    lines = [l for l in res.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, res.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "rd_train_throughput"
    assert rec["unit"] == "samples/s"
    assert "deadline" in res.stderr


def test_watchdog_emits_zero_record_and_exits_zero():
    env = dict(os.environ)
    env["CNC_BENCH_WATCHDOG_S"] = "0"   # fire immediately
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import runpy, sys; sys.argv = ['bench.py'];"
         "runpy.run_path('bench.py', run_name='__main__')"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    lines = [l for l in res.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, res.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "rd_train_throughput"
    assert rec["value"] == 0.0
    assert rec["unit"] == "samples/s"
    assert rec["vs_baseline"] == 0.0


@pytest.mark.slow
def test_slow_setup_emits_nonzero_partial_estimate():
    """VERDICT r4 weak #1: a slow setup must never zero the benchmark.

    CNC_BENCH_TEST_DEADLINE_AFTER_MINI simulates the driver deadline
    arriving immediately after the 3-step mini-measurement (i.e. the fixed
    costs consumed nearly the whole window).  The emitted record must carry
    the nonzero partial throughput estimate banked by those first steps."""
    env = dict(os.environ)
    env["CNC_BENCH_TINY"] = "1"
    env["CNC_BENCH_TEST_DEADLINE_AFTER_MINI"] = "1"
    env["CNC_BENCH_DEADLINE_S"] = "100000"   # real deadline never fires
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import runpy, sys; sys.argv = ['bench.py'];"
         "runpy.run_path('bench.py', run_name='__main__')"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-2000:]
    lines = [l for l in res.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, res.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "rd_train_throughput"
    assert rec["value"] > 0.0, (rec, res.stderr[-1000:])
    assert rec["vs_baseline"] > 0.0
    assert rec["fast"] is None          # deadline hit before the full pass
    assert "deadline" in res.stderr
