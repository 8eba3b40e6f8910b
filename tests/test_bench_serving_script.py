"""Smoke test for scripts/bench_serving.py --tiny (the engine-worker
serving bench: prefix-cache multi-turn, chunked prefill under load, and
a preemption episode must all exercise on the CPU tiny config and emit
the summary JSON line)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_paged_worker_bench_tiny():
    env = dict(os.environ)
    env["VCODER_TPU_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "bench_serving.py"),
         "--tiny"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    rec = json.loads(lines[-1])
    assert rec["metric"] == "paged_engine_worker"
    # Prefix cache produced hits on the turn-2 admissions. (No TTFT
    # ordering assertion here: turn-2 < turn-1 only holds at hardware
    # scale, where the vision encode + long prefill the cache skips
    # dwarfs the B=1 chunked suffix forward. At the tiny CPU scale the
    # chunk overhead dominates and turn 2 is legitimately slower.)
    assert rec["prefix_hit_rate"] > 0
    assert rec["ttft_p50_turn2_ms"] > 0
    # The undersized pool forced at least one preemption-by-recompute.
    assert rec["preemptions"] >= 1
    assert rec["aggregate_tok_per_s"] > 0
    assert rec["chunked_admission_ttft_ms"] > 0


@pytest.mark.slow
def test_spec_accept_probe_script():
    """scripts/spec_accept_probe.py emits the accept/projection JSON for
    all four COST prompt variants; realistic answers must land inside
    the measured hardware bracket (>= 1.0 accept, < 4.0)."""
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "spec_accept_probe.py"),
         "--samples", "20", "--json"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    for task in ("panoptic", "panoptic_nosg", "depth", "depth_noinp"):
        for k in (4, 8, 16):
            row = rec[f"{task}_k{k}"]
            assert 1.0 <= row["accept_per_dispatch"] < 4.0, (task, k, row)
