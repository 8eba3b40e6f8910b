"""Decompose the lockstep group-chunk cost on hardware (VERDICT r4 #1).

probe_admission measured ~460 ms per `_group_chunk(kc=256)` at G=8 —
and ~450 ms at G=1 in the round-4 wire bench, i.e. the cost is nearly
TOKEN-INDEPENDENT while the matmul work should be ~15 ms (G=1) to
~110 ms (G=8, W8A8). This script times the pieces at a (gb, kc) grid to
find the constant:

  chunk    — the engine's jitted `_group_chunk` (donated pools)
  verify   — `llama_paged_verify` alone, same shapes, jitted + donated
  attend   — `carry_paged_attention_multi` alone, one layer x L loop
  append   — `append_tokens_layer` alone, one layer x L loop
  dense    — dense-path prefill forward at the same token count
             (the W8A8 reference rate)

Run: python scripts/bench_group_chunk.py [--kc 256] [--gb 1,8] [--q8]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kc", default="256")
    ap.add_argument("--gb", default="1,8")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--no-q8", action="store_true",
                    help="bf16 KV pools instead of int8+scales")
    args = ap.parse_args()
    if args.tiny:
        os.environ.setdefault("VCODER_TPU_PLATFORM", "cpu")

    import jax
    import jax.numpy as jnp

    from vcoder_tpu.config import VCoderConfig
    from vcoder_tpu.models import llama as llama_mod
    from vcoder_tpu.ops.paged_attention import (
        append_pages_layer,
        append_tokens_layer,
        carry_paged_attention_multi,
        carry_paged_attention_multi_q8,
    )
    from vcoder_tpu.serve import paged_engine as pe

    if args.tiny:
        cfg = VCoderConfig.tiny("vcoder_ds_llava")
        from vcoder_tpu.models import vcoder as model_mod

        params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
        page, max_len = 16, 256
    else:
        from vcoder_tpu.quant import init_quantized_params

        cfg = VCoderConfig.standard("vcoder_ds_llava", "7b")
        params = init_quantized_params(jax.random.PRNGKey(0), cfg, bits=8)
        page, max_len = 128, 2048
    q8 = not args.no_q8
    tc = cfg.text
    L, KH, HD, D = (tc.num_layers, tc.num_kv_heads, tc.head_dim,
                    tc.hidden_size)
    H = tc.num_heads
    max_batch = 8
    p_max = max_len // page
    n_pages = max_batch * p_max + 1 + 1  # sentinel + scratch
    rng = np.random.default_rng(0)

    def fresh_pools():
        if q8:
            kp = jnp.zeros((L, n_pages, KH, page, HD), jnp.int8)
            vp = jnp.zeros((L, n_pages, KH, page, HD), jnp.int8)
            ks = jnp.zeros((L, n_pages, KH, page), jnp.float32)
            vs = jnp.zeros((L, n_pages, KH, page), jnp.float32)
            return kp, vp, ks, vs
        fdt = jnp.float32 if args.tiny else jnp.bfloat16
        kp = jnp.zeros((L, n_pages, KH, page, HD), fdt)
        return kp, jnp.zeros_like(kp), None, None

    def fence(x):
        jax.device_get(jax.tree.leaves(x)[0].ravel()[0])

    def bench(fn, state, *fixed):
        """fn(*fixed_args_first..., *state) -> new state (donated pools
        thread through: outputs become next call's inputs)."""
        state = fn(*fixed, *state)
        fence(state)
        best = float("inf")
        for _ in range(args.windows):
            t0 = time.perf_counter()
            state = fn(*fixed, *state)
            fence(state)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    kcs = [int(x) for x in args.kc.split(",")]
    gbs = [int(x) for x in args.gb.split(",")]
    src_cap = p_max * page + max(kcs)
    tbl_cap = p_max + max(kcs) // page

    for gb in gbs:
        for kc in kcs:
            # Row r owns pages [1 + r*p_max, 1 + (r+1)*p_max); region
            # starts at 0 and the chunk at offset 0 (fresh admission).
            tables = np.zeros((gb, tbl_cap), np.int32)
            for r in range(gb):
                tables[r, :p_max] = 1 + r * p_max + np.arange(p_max)
            tables_d = jnp.asarray(tables)
            starts = jnp.zeros((gb,), jnp.int32)
            active = jnp.ones((gb,), bool)
            src = jnp.asarray(
                rng.integers(5, 30000, size=(gb, src_cap)), jnp.int32
            )

            # ---- engine _group_chunk (text mode) ----
            def chunk_once(kp, vp, ks, vs):
                out = pe._group_chunk(
                    params, cfg, src, kp, vp, ks, vs, tables_d, starts,
                    jnp.asarray(0, jnp.int32), active,
                    jnp.asarray(False, bool), kc=kc, text_mode=True,
                )
                return out[1:]  # pools pass through (donated)

            t_chunk = bench(chunk_once, fresh_pools())

            # ---- llama_paged_verify alone ----
            emb = jnp.asarray(
                rng.standard_normal((gb, kc, D)),
                jnp.float32 if args.tiny else jnp.bfloat16,
            )
            positions = jnp.broadcast_to(
                jnp.arange(kc, dtype=jnp.int32)[None], (gb, kc)
            )
            lengths = jnp.zeros((gb,), jnp.int32)

            @partial(jax.jit, donate_argnums=(2, 3, 4, 5))
            def verify_once(lm, emb, kp, vp, ks, vs):
                out = llama_mod.llama_paged_verify(
                    lm, tc, emb, positions, kp, vp,
                    tables_d, lengths, active,
                    k_scale=ks, v_scale=vs, interpret=args.tiny,
                )
                # Non-quantized verify returns (hidden, kp, vp): pad the
                # state back to 4 slots.
                return tuple(out[1:]) + (None,) * (5 - len(out))

            t_verify = bench(verify_once, fresh_pools(), params["lm"], emb)

            # ---- attend kernel alone (L iterations) ----
            q = jnp.asarray(
                rng.standard_normal((gb, kc, H, HD)),
                jnp.float32 if args.tiny else jnp.bfloat16,
            )
            attn_lengths = jnp.full((gb,), kc, jnp.int32)

            @partial(jax.jit, donate_argnums=(1, 2, 3, 4))
            def attend_L(q, kp, vp, ks, vs):
                def body(l, carry):
                    kp, vp, ks, vs, acc = carry
                    if q8:
                        o, kp, vp, ks, vs = carry_paged_attention_multi_q8(
                            q, kp, vp, ks, vs, tables_d, attn_lengths, l,
                            window=kc, interpret=args.tiny,
                        )
                    else:
                        o, kp, vp = carry_paged_attention_multi(
                            q, kp, vp, tables_d, attn_lengths, l,
                            window=kc, interpret=args.tiny,
                        )
                    # acc keeps o live without touching the pools.
                    return (kp, vp, ks, vs, acc + o.sum().astype(acc.dtype))
                out = jax.lax.fori_loop(
                    0, L, body, (kp, vp, ks, vs, jnp.zeros((), jnp.float32))
                )
                return out[:4]

            t_attend = bench(attend_L, fresh_pools(), q)

            # ---- append alone (L iterations) ----
            pools0 = fresh_pools()
            tok_kv = jnp.asarray(
                rng.standard_normal((gb, kc, KH, HD)), pools0[0].dtype
            )

            @partial(jax.jit, donate_argnums=(1,))
            def append_L(tok_kv, kp):
                def body(l, kp):
                    return append_tokens_layer(
                        kp, l, tok_kv, positions, tables_d, active
                    )
                return (jax.lax.fori_loop(0, L, body, kp),)

            t_append = bench(append_L, (pools0[0],), tok_kv)

            @partial(jax.jit, donate_argnums=(1,))
            def append_pages_L(tok_kv, kp):
                def body(l, kp):
                    return append_pages_layer(
                        kp, l, tok_kv, positions, tables_d, active
                    )
                return (jax.lax.fori_loop(0, L, body, kp),)

            t_pg = (bench(append_pages_L, (fresh_pools()[0],), tok_kv)
                    if kc % page == 0 else float("nan"))

            print(
                f"gb={gb} kc={kc}: chunk={t_chunk:7.1f}ms  "
                f"verify={t_verify:7.1f}ms  attend_L={t_attend:7.1f}ms  "
                f"append_L(x1 pool)={t_append:7.1f}ms  "
                f"append_pages_L(x1 pool)={t_pg:7.1f}ms", flush=True,
            )


if __name__ == "__main__":
    main()
