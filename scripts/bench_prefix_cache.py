"""Prefix-cache TTFT benchmark: cold prefill vs cached-prefix admission.

Drives the REAL ``PagedServingEngine`` admission path at 7B with the
multi-turn chat workload the cache targets: turn 1 pays a full
multimodal prefill; turn N re-sends the whole conversation (the
reference re-prefills it — vcoder_llava/serve/chat.py:141-150) and here
maps the cached pages + runs only the new turn's text through the
chunked suffix forward. Run on the TPU box:

    python scripts/bench_prefix_cache.py [--turns 4] [--turn-tokens 48]

Reports per-turn admission latency (the engine's own ttft timer) with
the cache off vs on, plus page-reuse counters. int8 weights + int8 KV
(the serving configuration that fits the chip at multimodal context).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=4)
    ap.add_argument("--turn-tokens", type=int, default=48)
    ap.add_argument("--size", type=str, default="7b")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config on CPU (smoke test)")
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
        params = model_mod.init_vcoder_params(
            jax.random.PRNGKey(0), cfg, dtype=jnp.float32
        )
        page_size, max_len = 8, 256
    else:
        from vcoder_tpu.quant import init_quantized_params

        cfg = VCoderConfig.standard("vcoder_ds_llava", args.size)
        params = init_quantized_params(jax.random.PRNGKey(0), cfg, bits=8)
        page_size, max_len = 128, 2944

    hw = cfg.vision.image_size
    rng = np.random.RandomState(0)
    px = rng.randn(1, hw, hw, 3).astype(np.float32)

    base = (
        [cfg.text.bos_token_id]
        + list(rng.randint(5, 200, size=24))
        + [IMAGE_TOKEN_INDEX, DEPTH_TOKEN_INDEX, SEG_TOKEN_INDEX]
    )

    def conversation(n_turns):
        """Prompt per turn: full history + a fresh user turn, as chat
        front ends re-send it."""
        prompts, hist = [], list(base)
        for t in range(n_turns):
            hist = hist + list(
                rng.randint(5, 200, size=args.turn_tokens)
            )
            prompts.append(list(hist))
        return prompts

    prompts = conversation(args.turns)
    results = {}
    for mode in ("cold", "cached"):
        eng = PagedServingEngine(
            cfg,
            params,
            max_batch=1,
            max_len=max_len,
            page_size=page_size,
            kv_quant=not args.tiny,
            prefix_cache=(mode == "cached"),
        )
        # Warmup: compile every per-turn prefill bucket (and the suffix
        # chunk graphs for the cached mode) outside the timed loop.
        for p in prompts:
            eng.add_request(p, images=px, segs=px, depths=px,
                            max_new_tokens=2)
            eng.run()
        if eng.prefix_idx is not None:
            # Drop warmup pages (back to the free list) so the timed loop
            # measures realistic turn-over-turn reuse, not a full replay
            # hit; zero the counters the warmup inflated.
            for s, idx in enumerate(eng.prefix_idx):
                eng.free_pages[s].extend(idx.evict(len(idx.page_hash)))
                idx.hits = idx.misses = idx.reused_pages = idx.evicted = 0
        eng.timer.samples.clear()

        per_turn = []
        for p in prompts:
            eng.add_request(p, images=px, segs=px, depths=px,
                            max_new_tokens=2)
            eng.run()
            t = eng.timer.summary()["ttft"]
            per_turn.append(round(t["p50_ms"], 1))
            eng.timer.samples.clear()
        results[mode] = per_turn
        if mode == "cached":
            results["prefix_stats"] = eng.prefix_stats()
        print(f"{mode}: per-turn admission ms = {per_turn}",
              file=sys.stderr)
        del eng

    cold_tail = results["cold"][1:]
    cached_tail = results["cached"][1:]
    print(
        json.dumps(
            {
                "metric": "prefix_cache_turn_admission_ms",
                "cold_per_turn": results["cold"],
                "cached_per_turn": results["cached"],
                "tail_speedup": round(
                    sum(cold_tail) / max(sum(cached_tail), 1e-9), 2
                ),
                "prefix_stats": results["prefix_stats"],
                "turns": args.turns,
                "turn_tokens": args.turn_tokens,
            }
        )
    )


if __name__ == "__main__":
    main()
