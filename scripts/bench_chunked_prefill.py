"""Chunked-prefill latency benchmark: what do RUNNING streams feel when
a long multimodal request gets admitted?

Drives the paged engine with a steady set of decoding streams, injects
3-modality admissions (≈1.8k-token prefills) on a schedule, and reports
the running streams' inter-token latency (ITL) percentiles + worst
stall, against the admitted requests' TTFT — for dense admission
(chunked_prefill=0) vs chunk sizes. The tradeoff this quantifies:
chunking bounds the decode stall at ~one chunk's cost but spreads the
admitted request's prefill over several steps. Run on the TPU box:

    python scripts/bench_chunked_prefill.py [--chunks 0 256 512]

int8 weights + int8 KV pages (the 7B serving configuration that fits
the chip); --tiny smoke-tests the harness on CPU.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, nargs="+", default=[0, 256, 512])
    ap.add_argument("--decoders", type=int, default=4,
                    help="steady decoding streams")
    ap.add_argument("--injections", type=int, default=4,
                    help="multimodal admissions injected mid-run")
    ap.add_argument("--inject-every", type=int, default=12,
                    help="steps between injections")
    ap.add_argument("--max-new", type=int, default=160)
    ap.add_argument("--size", type=str, default="7b")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vcoder_tpu.config import VCoderConfig
    from vcoder_tpu.constants import (
        DEPTH_TOKEN_INDEX,
        IMAGE_TOKEN_INDEX,
        SEG_TOKEN_INDEX,
    )
    from vcoder_tpu.models import vcoder as model_mod
    from vcoder_tpu.serve.paged_engine import PagedServingEngine

    if args.tiny:
        cfg = VCoderConfig.tiny("vcoder_ds_llava")
        params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
        page, kv_quant, max_len = 8, False, 256
        chunks = [0, 16]
        attn = "xla"
    else:
        cfg = VCoderConfig.standard("vcoder_ds_llava", args.size)
        from vcoder_tpu.quant import init_quantized_params

        params = init_quantized_params(jax.random.PRNGKey(0), cfg, bits=8)
        page, kv_quant, max_len = 128, True, 2048
        chunks = args.chunks
        attn = "auto"

    hw = cfg.vision.image_size
    rng = np.random.RandomState(0)
    px = rng.randn(1, hw, hw, 3).astype(np.float32)
    max_batch = args.decoders + args.injections

    def text_prompt(i):
        return (
            [cfg.text.bos_token_id]
            + list(rng.randint(5, 3000, size=24))
            + [10 + i]
        )

    def mm_prompt(i):
        text = list(rng.randint(5, 3000, size=48))
        return (
            [cfg.text.bos_token_id]
            + text[:8]
            + [IMAGE_TOKEN_INDEX, DEPTH_TOKEN_INDEX, SEG_TOKEN_INDEX]
            + text[8:]
            + [10 + i]
        )

    results = {}
    for chunk in chunks:
        eng = PagedServingEngine(
            cfg,
            params,
            max_batch=max_batch,
            max_len=max_len,
            page_size=page,
            kv_quant=kv_quant,
            chunked_prefill=chunk,
            attn_impl=attn,
        )
        # Warmup: compile text + multimodal prefill buckets, the chunk
        # forwards, and the decode graph outside the timed window.
        eng.add_request(text_prompt(100), max_new_tokens=3)
        eng.add_request(
            mm_prompt(101), images=px, segs=px, depths=px,
            max_new_tokens=3,
        )
        eng.run()
        eng.timer.samples.clear()

        decoder_rids = [
            eng.add_request(text_prompt(i), max_new_tokens=args.max_new)
            for i in range(args.decoders)
        ]
        arrivals = {rid: [] for rid in decoder_rids}
        injected = 0
        steps = 0
        t0 = time.perf_counter()
        total_tokens = 0
        while eng.has_work():
            events = eng.step()
            now = time.perf_counter()
            steps += 1
            total_tokens += len(events)
            for rid, _, _ in events:
                if rid in arrivals:
                    arrivals[rid].append(now)
            if (
                injected < args.injections
                and steps % args.inject_every == 0
            ):
                eng.add_request(
                    mm_prompt(injected), images=px, segs=px, depths=px,
                    max_new_tokens=24,
                )
                injected += 1
        wall = time.perf_counter() - t0

        itl = np.concatenate(
            [np.diff(np.asarray(ts)) for ts in arrivals.values()
             if len(ts) > 1]
        ) * 1e3
        ttft = eng.timer.summary().get("ttft", {})
        results[chunk] = {
            "itl_p50_ms": round(float(np.percentile(itl, 50)), 1),
            "itl_p99_ms": round(float(np.percentile(itl, 99)), 1),
            "itl_max_ms": round(float(itl.max()), 1),
            "admit_ttft_p50_ms": round(ttft.get("p50_ms", 0.0), 1),
            "tok_per_s": round(total_tokens / wall, 1),
            "wall_s": round(wall, 2),
        }
        print(f"chunk={chunk}: {json.dumps(results[chunk])}",
              file=sys.stderr)
        del eng

    dense = results[chunks[0]]
    best = min(
        (r for c, r in results.items() if c != chunks[0]),
        key=lambda r: r["itl_max_ms"],
        default=dense,
    )
    print(
        json.dumps(
            {
                "metric": "chunked_prefill_decode_stall",
                "dense_itl_max_ms": dense["itl_max_ms"],
                "chunked_itl_max_ms": best["itl_max_ms"],
                "dense_itl_p99_ms": dense["itl_p99_ms"],
                "chunked_itl_p99_ms": best["itl_p99_ms"],
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
