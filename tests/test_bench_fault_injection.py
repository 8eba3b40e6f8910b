"""Fault-injection test for the driver bench (round-3 lesson).

BENCH_r03 recorded rc=1/parsed=null because one transient
RESOURCE_EXHAUSTED in a secondary section killed the process before the
primary TTFT line printed. bench.py now (a) flushes the primary JSON line
the moment TTFT is measured, (b) runs every secondary in its own
try/except with a bounded reset-and-retry on OOM, and (c) reports FAILED
sections in the summary while the rest proceed. This test proves it: two
sections are monkeypatched to raise (one persistent fake
RESOURCE_EXHAUSTED, one generic crash) and main() must still return 0
with the primary line on stdout and every untouched secondary in the
summary.

Runs the real bench machinery in VCODER_BENCH_TINY mode (tiny configs,
interpret-mode kernels) on the CPU test backend.
"""

import json

import pytest


@pytest.fixture()
def tiny_bench(monkeypatch):
    monkeypatch.setenv("VCODER_BENCH_TINY", "1")
    import importlib

    import bench

    importlib.reload(bench)  # pick up TINY knobs
    assert bench.TINY
    yield bench
    monkeypatch.delenv("VCODER_BENCH_TINY")
    importlib.reload(bench)


def _patch_section(bench, name, fn):
    for i, (n, _) in enumerate(bench.SECTIONS):
        if n == name:
            bench.SECTIONS[i] = (n, fn)
            return
    raise AssertionError(f"section {name} not found")


@pytest.mark.slow
def test_bench_survives_section_failures(tiny_bench, capfd):
    bench = tiny_bench

    def fake_oom(ctx):
        raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory allocating 123 bytes")

    def fake_crash(ctx):
        raise ValueError("synthetic section bug")

    # Two failure modes in the middle of the run: a persistent OOM (the
    # retry also OOMs) and a deterministic bug.
    _patch_section(bench, "decode_bf16_b4", fake_oom)
    _patch_section(bench, "paged_int8_b8", fake_crash)

    rc = bench.main()
    out, err = capfd.readouterr()

    assert rc == 0
    # Primary line is intact, parseable, first on stdout.
    lines = [ln for ln in out.strip().splitlines() if ln.strip()]
    rec = json.loads(lines[0])
    assert rec["metric"] == "vcoder_ds_7b_prefill_ttft_p50_single_chip"
    assert rec["value"] > 0
    assert rec["unit"] == "ms"
    # The OOM section was retried once (reset + rebuild) before giving up.
    assert err.count("RESOURCE_EXHAUSTED in decode_bf16_b4") == 1
    # Both injected sections reported FAILED; the others survived.
    assert "2 secondary section(s) FAILED: decode_bf16_b4, paged_int8_b8" in err
    assert "decode_bf16_B4=FAILED" in err
    assert "paged_int8_B8=FAILED" in err
    for survivor in (
        "vision_encode=",
        "decode_int8=",
        "serve_int8_B8=",
        "paged_q8kv_B32=",
        "13b_ttft=",
        "train_vcoder_ds_7b=",
        "spec_costlike=",
    ):
        seg = err.split(survivor, 1)[1]
        assert not seg.startswith("FAILED"), survivor


@pytest.mark.slow
@pytest.mark.weekly  # the driver runs bench.py on hardware every round,
# and the fault-injection test above exercises the same tiny sections —
# ~110 s of duplicate coverage in the full tier (VERDICT r4 #8)
def test_bench_clean_run_tiny(tiny_bench, capfd):
    """No injected faults: every section must produce a number."""
    bench = tiny_bench
    rc = bench.main()
    out, err = capfd.readouterr()
    assert rc == 0
    rec = json.loads(out.strip().splitlines()[0])
    assert rec["value"] > 0
    assert "FAILED" not in err
