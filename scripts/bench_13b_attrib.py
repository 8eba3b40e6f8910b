"""Attribute the 13B int8 decode gap to a resource (VERDICT r4 #3).

decode_13b_b2 measured 95.7 tok/s aggregate vs a ~126 tok/s
weight-streaming floor (13 GB int8 / 819 GB/s x B=2). Three loops on the
SAME param leaves separate the candidates:

  raw_stream    — per step, sum every int8 weight byte (pure HBM read:
                  the DMA ceiling for these exact arrays/layouts)
  matmul_stream — per step, scan the layer stack running ONLY the seven
                  projection qmatmuls + lm_head on a dummy [B, D]
                  activation (adds the int8->bf16 convert + MXU work,
                  no attention/cache/norms)
  full          — the real decode_step fori window (bench.py's loop)

raw ~= floor, matmul << raw  -> the fused convert+dot is the binding
resource; full << matmul     -> attention/cache/scatter overheads.

Usage: python scripts/bench_13b_attrib.py [--model 13b] [--steps 8]
       [--windows 5] [--b 2] [--int4]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="13b")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--int4", action="store_true",
                    help="nibble-packed int4 weights instead of int8")
    ap.add_argument("--w8a8-min", type=int, default=None,
                    help="override ops.quant.W8A8_MIN_TOKENS (e.g. 1 to"
                    " force the s8s8 dot at decode token counts)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vcoder_tpu.config import VCoderConfig
    from vcoder_tpu.models import vcoder as model_mod
    from vcoder_tpu.models.llama import KVCache
    from vcoder_tpu.ops.quant import QuantizedTensor, qmatmul
    from vcoder_tpu.quant import init_quantized_params

    if args.w8a8_min is not None:
        from vcoder_tpu.ops import quant as quant_mod

        quant_mod.W8A8_MIN_TOKENS = args.w8a8_min
        print(f"W8A8_MIN_TOKENS={args.w8a8_min}", flush=True)
    cfg = VCoderConfig.standard("vcoder_ds_llava", args.model)
    bits = 4 if args.int4 else 8
    params = init_quantized_params(jax.random.PRNGKey(0), cfg, bits=bits)
    B, N = args.b, args.steps
    T0 = 512
    tc = cfg.text
    D = tc.hidden_size

    # Count streamed int8 bytes once (weights only — the traffic the
    # floor is computed from).
    def nbytes(t):
        if isinstance(t, QuantizedTensor):
            return t.q.size * t.q.dtype.itemsize
        return t.size * t.dtype.itemsize if hasattr(t, "size") else 0

    total = sum(nbytes(l) for l in jax.tree.leaves(
        params, is_leaf=lambda x: isinstance(x, QuantizedTensor)))
    lm_total = sum(nbytes(l) for l in jax.tree.leaves(
        params["lm"], is_leaf=lambda x: isinstance(x, QuantizedTensor)))
    print(f"param bytes: all={total/2**30:.2f} GiB lm={lm_total/2**30:.2f}"
          f" GiB  (floor at 819 GB/s: "
          f"{B / (lm_total / 819e9):.1f} tok/s aggregate)", flush=True)

    def timeit(fn, *a):
        out = fn(*a)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[0])  # compile+fence
        best = float("inf")
        for _ in range(args.windows):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
            best = min(best, (time.perf_counter() - t0) / N)
        return best

    # ---- raw_stream ----
    lm = params["lm"]
    qleaves = [l.q for l in jax.tree.leaves(
        lm, is_leaf=lambda x: isinstance(x, QuantizedTensor))
        if isinstance(l, QuantizedTensor)]
    print(f"int leaves: {len(qleaves)}", flush=True)

    @jax.jit
    def raw_stream(leaves):
        def body(i, acc):
            s = jnp.zeros((), jnp.int32)
            for q in leaves:
                s += jnp.sum(q.astype(jnp.int32) & 1)
            return acc + s
        return jax.lax.fori_loop(0, N, body, jnp.zeros((), jnp.int32))

    dt = timeit(raw_stream, qleaves)
    print(f"raw_stream:    {dt*1e3:7.2f} ms/step  "
          f"{lm_total/dt/1e9:6.1f} GB/s  {B/dt:6.1f} tok/s-equiv",
          flush=True)

    # ---- matmul_stream ----
    @jax.jit
    def matmul_stream(params, x):
        lm = params["lm"]

        def body(i, x):
            def layer(h, lp):
                q = qmatmul(h, lp["q_proj"])
                k = qmatmul(h, lp["k_proj"])
                v = qmatmul(h, lp["v_proj"])
                # o_proj input is [B, H*HD] == q's shape; keep k/v as
                # dead-cheap dependencies so their streams stay live.
                h = h + qmatmul(
                    q + k.sum(-1, keepdims=True) * 0
                    + v.sum(-1, keepdims=True) * 0,
                    lp["o_proj"],
                )
                g = qmatmul(h, lp["gate_proj"])
                u = qmatmul(h, lp["up_proj"])
                h = h + qmatmul(jax.nn.silu(g) * u, lp["down_proj"])
                return h, None

            h, _ = jax.lax.scan(layer, x, lm["layers"])
            logits = qmatmul(h, lm["lm_head"])
            return x + logits[:, :D] * 0 + 1e-6

        return jax.lax.fori_loop(0, N, body, x)

    x = jnp.zeros((B, D), jnp.bfloat16)
    dt = timeit(matmul_stream, params, x)
    print(f"matmul_stream: {dt*1e3:7.2f} ms/step  "
          f"{lm_total/dt/1e9:6.1f} GB/s  {B/dt:6.1f} tok/s-equiv",
          flush=True)

    # ---- full decode ----
    S_cache = T0 + 64
    cache = KVCache.create(tc, B, S_cache, quantized=True)
    cache = KVCache(
        k=cache.k, v=cache.v,
        kv_mask=jnp.broadcast_to(
            (jnp.arange(S_cache) < T0)[None, :], (B, S_cache)),
        length=jnp.full((B,), T0, jnp.int32),
        k_scale=cache.k_scale, v_scale=cache.v_scale,
    )

    @partial(jax.jit, donate_argnums=(3,))
    def decode_n(params, tok, pos, cache):
        def body(i, carry):
            tok, cache = carry
            logits, cache = model_mod.decode_step(
                params, cfg, tok, pos + i, cache
            )
            return jnp.argmax(logits, -1).astype(jnp.int32), cache
        return jax.lax.fori_loop(0, N, body, (tok, cache))

    tok = jnp.zeros((B,), jnp.int32)
    pos = jnp.full((B,), T0, jnp.int32)
    out = decode_n(params, tok, pos, cache)
    jax.device_get(out[0])
    st = [out[0], out[1]]
    best = float("inf")
    for _ in range(args.windows):
        t0 = time.perf_counter()
        st[0], st[1] = decode_n(params, st[0], pos, st[1])
        jax.device_get(st[0])
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"full_decode:   {best*1e3:7.2f} ms/step  "
          f"{lm_total/best/1e9:6.1f} GB/s  {B/best:6.1f} tok/s aggregate",
          flush=True)


if __name__ == "__main__":
    main()
