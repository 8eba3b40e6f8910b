"""Per-step timing probe for the chunked-admission path (phase-B style).

Drives PagedServingEngine.step() directly (no worker thread): 6 text
rows decoding, then one long text admission — prints wall time per step,
pending state, and group cursor so a stalled admission shows exactly
where the time goes.

    python scripts/probe_admission.py [--tiny]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _fence():
    """True device fence: block_until_ready does NOT fence through the
    axon tunnel — fetch a scalar instead."""
    import jax
    import jax.numpy as jnp

    jax.device_get(jnp.zeros(()) + 0)


def _phase_a(args, cfg, eng, txt, V):
    """8 concurrent multimodal turn-1 admissions — the wire bench's
    phase-A workload at engine level, with FENCED per-phase attribution
    (_stage_admission / _build_group / per-chunk _group_chunk /
    finishing fetch). --distinct-px gives every conversation its own
    images (no cross-conversation prefix reuse: full ~1.7k-token
    regions, the wire bench's turn-1 shape)."""
    import numpy as np

    from vcoder_tpu.constants import (
        DEPTH_TOKEN_INDEX,
        IMAGE_TOKEN_INDEX,
        SEG_TOKEN_INDEX,
    )

    hw = cfg.vision.image_size

    def make_px(i):
        return np.random.RandomState(i).randn(1, hw, hw, 3).astype(
            np.float32
        )

    px = make_px(0)
    sys_text = list(np.random.RandomState(7).randint(5, V, size=24))

    def turn1(i):
        q = list(np.random.RandomState(1000 + i).randint(5, V, size=8))
        return (
            [cfg.text.bos_token_id]
            + sys_text
            + [IMAGE_TOKEN_INDEX, DEPTH_TOKEN_INDEX, SEG_TOKEN_INDEX]
            + q
            + [10 + i]
        )

    # Warm + register the shared prefix (like the bench's warm convs).
    for i in (90, 91):
        eng.add_request(turn1(i), images=px, segs=px, depths=px,
                        max_new_tokens=4)
    t0 = time.perf_counter()
    while eng.has_work():
        eng.step()
    print(f"warm convs: {time.perf_counter() - t0:.1f}s", flush=True)

    from vcoder_tpu.serve import paged_engine as pe

    for name in ("_fill_pending", "_advance_group", "_stage_admission",
                 "_build_group"):
        real = getattr(eng, name)

        def timed(*a, _real=real, _name=name, **kw):
            t = time.perf_counter()
            out = _real(*a, **kw)
            if _name == "_build_group":
                _fence()  # vision encode + px H2D land inside here
            print(f"    {_name}: {(time.perf_counter() - t) * 1e3:.1f}ms",
                  flush=True)
            return out

        setattr(eng, name, timed)

    real_chunk = pe._group_chunk

    def timed_chunk(*a, **kw):
        t = time.perf_counter()
        out = real_chunk(*a, **kw)
        _fence()
        print(f"      _group_chunk(kc={kw.get('kc')},"
              f" text={kw.get('text_mode')}):"
              f" {(time.perf_counter() - t) * 1e3:.1f}ms", flush=True)
        return out

    pe._group_chunk = timed_chunk

    t_sub = time.perf_counter()
    rids = [
        eng.add_request(
            turn1(i),
            images=make_px(100 + i) if args.distinct_px else px,
            segs=make_px(200 + i) if args.distinct_px else px,
            depths=make_px(300 + i) if args.distinct_px else px,
            max_new_tokens=4,
        )
        for i in range(8)
    ]
    first = {}
    for step in range(200):
        t0 = time.perf_counter()
        events = eng.step()
        dt = (time.perf_counter() - t0) * 1e3
        now = time.perf_counter()
        for r, _tok, _d in events:
            first.setdefault(r, now)
        print(f"step {step:3d}: {dt:7.1f}ms  events={len(events)}"
              f" groups={len(eng._pending_groups)}"
              f" sizes={eng.admit_group_sizes}", flush=True)
        if all(r in first for r in rids):
            break
    ttfts = sorted((first[r] - t_sub) * 1e3 for r in rids)
    print(f"turn1 engine TTFTs ms: {[round(t) for t in ttfts]}", flush=True)
    print(f"p50: {ttfts[len(ttfts) // 2]:.0f}ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--phase", default="B", choices=["A", "B"],
                    help="A: 8 concurrent multimodal turn-1 admissions"
                    " over a warm shared prefix; B: one long text"
                    " admission under decode load")
    ap.add_argument("--distinct-px", action="store_true",
                    help="phase A: per-conversation images (no"
                    " cross-conversation prefix reuse — full regions)")
    args = ap.parse_args()
    if args.tiny:
        os.environ.setdefault("VCODER_TPU_PLATFORM", "cpu")

    import jax

    from vcoder_tpu.config import VCoderConfig
    from vcoder_tpu.models import vcoder as model_mod
    from vcoder_tpu.serve.paged_engine import PagedServingEngine

    if args.tiny:
        import jax.numpy as jnp

        cfg = VCoderConfig.tiny("vcoder_ds_llava")
        params = model_mod.init_vcoder_params(
            jax.random.PRNGKey(0), cfg, dtype=jnp.float32
        )
        page, max_len, kv_quant = 16, 256, False
    else:
        from vcoder_tpu.quant import init_quantized_params

        cfg = VCoderConfig.standard("vcoder_ds_llava", "7b")
        params = init_quantized_params(jax.random.PRNGKey(0), cfg, bits=8)
        page, max_len, kv_quant = 128, 2048, True

    rng = np.random.RandomState(0)
    V = min(cfg.text.vocab_size, 30000)
    eng = PagedServingEngine(
        cfg, params, max_batch=8, max_len=max_len, page_size=page,
        kv_quant=kv_quant, sync_every=8, prefix_cache=True,
        prefix_chunk=page, chunked_prefill=2 * page, eos_id=-1,
    )
    t0 = time.perf_counter()
    eng.warmup_chunks()
    print(f"warmup_chunks: {time.perf_counter() - t0:.1f}s", flush=True)

    def txt(n, seed):
        return [cfg.text.bos_token_id] + list(
            np.random.RandomState(seed).randint(5, V, size=n)
        )

    if args.phase == "A":
        _phase_a(args, cfg, eng, txt, V)
        eng.close()
        return

    bg_new = 64 if args.tiny else 256
    for i in range(6):
        eng.add_request(txt(24, i), max_new_tokens=bg_new)
    t0 = time.perf_counter()
    while not all(eng.active[:6]):
        eng.step()
    print(f"bg admit: {time.perf_counter() - t0:.1f}s", flush=True)
    # Steady decode warm.
    for _ in range(3):
        t0 = time.perf_counter()
        eng.step()
        print(f"decode step: {(time.perf_counter() - t0) * 1e3:.0f}ms",
              flush=True)

    # Split step time: staging (_fill_pending) vs chunk forwards
    # (_advance_group) vs decode (everything else).
    for name in ("_fill_pending", "_advance_group", "_finish_admission"):
        real = getattr(eng, name)

        def timed(*a, _real=real, _name=name, **kw):
            t = time.perf_counter()
            out = _real(*a, **kw)
            print(f"    {_name}: {(time.perf_counter() - t) * 1e3:.1f}ms",
                  flush=True)
            return out

        setattr(eng, name, timed)

    long_len = min(max_len - bg_new - 8, 1024)
    rid = eng.add_request(txt(long_len, 99), max_new_tokens=8)
    print(f"long admission submitted ({long_len + 1} tokens)", flush=True)
    t_sub = time.perf_counter()
    for step in range(400):
        t0 = time.perf_counter()
        events = eng.step()
        dt = (time.perf_counter() - t0) * 1e3
        g = eng._pending_groups[0] if eng._pending_groups else None
        print(
            f"step {step:3d}: {dt:7.1f}ms  groups={len(eng._pending_groups)}"
            f" off={getattr(g, 'off', '-')}"
            f" gb={getattr(g, 'gb', '-')}"
            f" events={len(events)} queue={len(eng.queue)}",
            flush=True,
        )
        if any(r == rid for r, _, _ in events):
            print(
                f"ADMITTED after {(time.perf_counter() - t_sub) * 1e3:.0f}ms",
                flush=True,
            )
            break
    eng.close()


if __name__ == "__main__":
    main()
