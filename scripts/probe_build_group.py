"""Attribute _build_group's 1.7 s (round-5 phase-A probe): host stack +
bf16 convert vs H2D transfer vs the batched _plan_embeds dispatch (tower
forward + splice) at the gb=8 three-modality shape.

Run on the TPU box: python scripts/probe_build_group.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vcoder_tpu.config import VCoderConfig
    from vcoder_tpu.quant import init_quantized_params
    from vcoder_tpu.serve.paged_engine import _plan_embeds

    cfg = VCoderConfig.standard("vcoder_ds_llava", "7b")
    params = init_quantized_params(jax.random.PRNGKey(0), cfg, bits=8)
    gb, hw = 8, cfg.vision.image_size
    src_cap = 2304
    dtype = params["lm"]["embed_tokens"].dtype

    def fence():
        jax.device_get(jnp.zeros(()) + 0)

    rng = np.random.RandomState(0)
    reqs = [
        [rng.randn(1, hw, hw, 3).astype(np.float32) for _ in range(3)]
        for _ in range(gb)
    ]

    for trial in range(3):
        # (a) host stack into [gb, hw, hw, 3] f32 per modality
        t0 = time.perf_counter()
        stacked = []
        for m in range(3):
            out = np.zeros((gb, hw, hw, 3), np.float32)
            for i in range(gb):
                out[i] = reqs[i][m][0]
            stacked.append(out)
        t_stack = time.perf_counter() - t0

        # (b) H2D with cast to the embed dtype (what stack_px does)
        fence()
        t0 = time.perf_counter()
        dev = [jnp.asarray(s, dtype) for s in stacked]
        fence()
        t_h2d = time.perf_counter() - t0

        # (b2) H2D of pre-cast bf16 (half the bytes, conversion hoisted)
        pre = [s.astype(jnp.bfloat16) for s in stacked]
        fence()
        t0 = time.perf_counter()
        dev2 = [jnp.asarray(p) for p in pre]
        fence()
        t_h2d_pre = time.perf_counter() - t0

        # (c) _plan_embeds (tower + splice) with resident pixels
        plan_arrays = {
            "safe_ids": jnp.zeros((gb, src_cap), jnp.int32),
            "is_text": jnp.zeros((gb, src_cap), bool),
            "vis_idx": jnp.zeros((gb, src_cap), jnp.int32),
        }
        t0 = time.perf_counter()
        src = _plan_embeds(
            params, cfg, plan_arrays, dev[0], dev[1], dev[2],
            use_vcoder_emb=cfg.use_vcoder_lm_emb, has_images=True,
            has_segs=True, has_depths=True, attn_impl="auto",
        )
        fence()
        t_plan = time.perf_counter() - t0

        print(
            f"trial {trial}: stack={t_stack*1e3:6.1f}ms  "
            f"h2d_f32cast={t_h2d*1e3:6.1f}ms  "
            f"h2d_prebf16={t_h2d_pre*1e3:6.1f}ms  "
            f"plan_embeds={t_plan*1e3:6.1f}ms", flush=True,
        )


if __name__ == "__main__":
    main()
