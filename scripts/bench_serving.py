"""Engine-level serving benchmark: continuous batching end to end.

Unlike bench.py's raw decode-loop secondaries, this drives the REAL
``ServingEngine.step()`` path — per-request multimodal prefill, slot
admission, per-step host sync, event emission — and reports aggregate
throughput plus the engine's own TTFT / decode-step percentiles, with
speculative decoding off vs on. Run on the TPU box:

    python scripts/bench_serving.py [--batch 8] [--requests 16] \
        [--max-new 96] [--lookahead 8]

Runs int8 weights + int8 KV (the serving configuration that fits the
chip at multimodal context; bf16 B=1 numbers live in bench.py).
Random weights: absolute accept-rates for speculation are NOT
representative of trained checkpoints (random 7B output rarely repeats);
the spec run reports dispatch counts so the overhead at the measured
accept rate is explicit.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--max-new", type=int, default=96)
    ap.add_argument("--lookahead", type=int, default=8)
    ap.add_argument("--size", type=str, default="7b")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config on CPU (smoke test)")
    args = ap.parse_args()
    # int8 weights only: 7B bf16 (14.5 GB) + a multimodal-context slot
    # cache (prompts expand to ~1.8k tokens) cannot fit the 15.5 GB chip
    # at any useful batch; bf16 B=1 numbers live in bench.py secondaries.
    args.bf16 = False

    import jax
    import jax.numpy as jnp

    from vcoder_tpu.config import VCoderConfig
    from vcoder_tpu.constants import (
        DEPTH_TOKEN_INDEX,
        IMAGE_TOKEN_INDEX,
        SEG_TOKEN_INDEX,
    )
    from vcoder_tpu.models import vcoder as model_mod
    from vcoder_tpu.quant import init_quantized_params
    from vcoder_tpu.serve.engine import ServingEngine

    if args.tiny:
        cfg = VCoderConfig.tiny("vcoder_ds_llava")
        args.bf16 = True
    else:
        cfg = VCoderConfig.standard("vcoder_ds_llava", args.size)
    if args.bf16:
        params = model_mod.init_vcoder_params(
            jax.random.PRNGKey(0), cfg,
            dtype=jnp.float32 if args.tiny else jnp.bfloat16,
        )
    else:
        params = init_quantized_params(jax.random.PRNGKey(0), cfg, bits=8)

    hw = cfg.vision.image_size
    rng = np.random.RandomState(0)
    px = rng.randn(1, hw, hw, 3).astype(np.float32)

    def prompt(i):
        text = list(rng.randint(5, 30000, size=24))
        return (
            [cfg.text.bos_token_id]
            + text[:6]
            + [IMAGE_TOKEN_INDEX, DEPTH_TOKEN_INDEX, SEG_TOKEN_INDEX]
            + text[6:]
            + [10 + i]
        )

    results = {}
    for mode, spec, sync in (
        ("plain", 0, 1),
        ("windowed", 0, 8),  # 8 decode steps per dispatch+fetch
        ("spec", args.lookahead, 1),
        ("spec-fused", args.lookahead, 8),  # 8 verifies per dispatch,
        # device-resident drafting histories
    ):
        eng = ServingEngine(
            cfg,
            params,
            max_batch=args.batch,
            max_len=2048,
            kv_quant=not args.bf16,  # int8 KV halves the slot-cache HBM
            speculative=spec,
            sync_every=sync,
        )
        # Warmup: compile the prefill buckets + decode graph outside the
        # timed window (first-mode runs otherwise eat ~2 min of XLA
        # compiles and the comparison is meaningless).
        for i in range(2):
            eng.add_request(
                prompt(100 + i), images=px, segs=px, depths=px,
                max_new_tokens=4,
            )
        eng.run()
        eng.timer.samples.clear()
        for i in range(args.requests):
            eng.add_request(
                prompt(i), images=px, segs=px, depths=px,
                max_new_tokens=args.max_new,
            )
        t0 = time.perf_counter()
        out = eng.run()
        wall = time.perf_counter() - t0
        total_tokens = sum(len(v) for v in out.values())
        s = eng.timer.summary()
        decode = s.get("decode_step", {})
        ttft = s.get("ttft", {})
        results[mode] = {
            "tokens": total_tokens,
            "wall_s": round(wall, 2),
            "tok_per_s": round(total_tokens / wall, 1),
            "decode_dispatches": decode.get("count", 0),
            "decode_p50_ms": round(decode.get("p50_ms", 0.0), 2),
            "ttft_p50_ms": round(ttft.get("p50_ms", 0.0), 1),
            "tok_per_dispatch": round(
                total_tokens / max(decode.get("count", 1), 1), 2
            ),
        }
        print(f"{mode}: {json.dumps(results[mode])}", file=sys.stderr)
        del eng

    print(
        json.dumps(
            {
                "metric": "serving_engine_aggregate",
                "plain_tok_per_s": results["plain"]["tok_per_s"],
                "windowed_tok_per_s": results["windowed"]["tok_per_s"],
                "spec_tok_per_s": results["spec"]["tok_per_s"],
                "spec_fused_tok_per_s": results["spec-fused"]["tok_per_s"],
                "batch": args.batch,
                "requests": args.requests,
            }
        )
    )


if __name__ == "__main__":
    main()
