"""Attribute the paged-q8 B=32 decode step: matmul stack vs paged attention.

bench.py's `paged_q8_b32` secondary (7B int8 weights + int8 pages,
B=32, ctx=640, page=128) reports ~810 tok/s aggregate = ~39.5 ms per
batched step. Rooflines at v5e HBM ~819 GB/s say the step's mandatory
traffic is ~6.7 GB int8 weights (~8.2 ms) + ~6.4 GB live KV pages
(~7.8 ms) = ~16 ms, so something costs ~2.4x. This script splits the
step on hardware:

  A. full     — bench.py's exact `_paged_decode_n_fn` window (reproduces
                the secondary),
  B. matmuls  — same window with append+attend deleted (attn := q), i.e.
                the int8-weight-streaming matmul stack alone,
  C. attend   — fori window over layers x steps of ONLY the q8 append +
                carry kernel with a fixed q (pools ride the carry).

A - B ~= C cross-checks the split; B vs the 8.2 ms weight floor and C vs
the 7.8 ms page floor say which side deserves kernel work. Timing is
bench.py's probe-corrected best-of-N windows (the only honest way
through the ~40 ms/fetch tunnel). Run on the real chip:

    python scripts/bench_paged_attrib.py
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import numpy as np

import bench
from bench import (
    BQ,
    N_STEPS,
    PAGE_Q,
    T,
    TINY,
    Ctx,
    _best_window,
    _paged_decode_n_fn,
    _wait_for_healthy_tunnel,
    jax_block,
)


def _pools(cfg, B, page):
    import jax.numpy as jnp

    L = cfg.text.num_layers
    KH, HD = cfg.text.num_kv_heads, cfg.text.head_dim
    p_max = (T + page) // page
    n_pages = B * p_max + 2
    k_pages = jnp.zeros((L, n_pages, KH, page, HD), jnp.int8)
    v_pages = jnp.zeros((L, n_pages, KH, page, HD), jnp.int8)
    k_scale = jnp.zeros((L, n_pages, KH, page), jnp.float32)
    v_scale = jnp.zeros((L, n_pages, KH, page), jnp.float32)
    table = jnp.asarray(
        np.arange(1, B * p_max + 1).reshape(B, p_max).astype(np.int32)
    )
    return k_pages, v_pages, k_scale, v_scale, table


def _matmul_only_fn(cfg):
    """bench._paged_decode_n_fn's window with attention deleted."""
    import jax
    import jax.numpy as jnp

    from vcoder_tpu.models.llama import (
        apply_rope,
        qm,
        rms_norm,
        rope_cos_sin,
    )

    tc = cfg.text
    H, KH, HD = tc.num_heads, tc.num_kv_heads, tc.head_dim
    eps = tc.rms_norm_eps

    @jax.jit
    def decode_n(params, tok, positions):
        def step(i, tok):
            x = jnp.take(params["lm"]["embed_tokens"], tok[:, None], axis=0)
            B = x.shape[0]
            cos, sin = rope_cos_sin(
                (positions + i)[:, None], HD, tc.rope_theta
            )

            def layer(x, lp):
                residual = x
                h = rms_norm(x, lp["input_layernorm"], eps)
                q = qm(h, lp["q_proj"]).reshape(B, 1, H, HD)
                k = qm(h, lp["k_proj"]).reshape(B, 1, KH, HD)
                v = qm(h, lp["v_proj"]).reshape(B, 1, KH, HD)
                q = apply_rope(q, cos, sin)
                k = apply_rope(k, cos, sin)
                # attention deleted: pass q straight through; fold k/v in
                # at 1e-9 weight (scalar, so GQA tiny shapes broadcast) so
                # their projections can't be DCE'd (x*0 would fold away).
                attn = q[:, 0] + 1e-9 * (k[:, 0].mean() + v[:, 0].mean())
                x = residual + qm(attn.reshape(B, 1, H * HD), lp["o_proj"])
                residual = x
                h = rms_norm(x, lp["post_attention_layernorm"], eps)
                mlp = qm(
                    jax.nn.silu(qm(h, lp["gate_proj"])) * qm(h, lp["up_proj"]),
                    lp["down_proj"],
                )
                return residual + mlp, None

            x, _ = jax.lax.scan(layer, x, params["lm"]["layers"])
            x = rms_norm(x, params["lm"]["norm"], eps)
            logits = qm(x[:, 0].astype(jnp.bfloat16), params["lm"]["lm_head"])
            return jnp.argmax(logits, -1).astype(jnp.int32)

        return jax.lax.fori_loop(0, N_STEPS, step, tok)

    return decode_n


def _attend_only_fn(cfg, table, lengths0, active, *, with_kernel=True):
    """Only the per-layer q8 append + carry kernel, weights untouched.
    ``with_kernel=False`` keeps just the 4 pool scatters (variant D), so
    C - D isolates the kernel from the appends."""
    import jax
    import jax.numpy as jnp

    from vcoder_tpu.ops.paged_attention import (
        append_scale_layer,
        append_token_layer,
        carry_paged_attention_q8,
    )
    from vcoder_tpu.models.llama import _kv_quantize

    tc = cfg.text
    H, KH, HD = tc.num_heads, tc.num_kv_heads, tc.head_dim
    page = PAGE_Q
    L = tc.num_layers

    @partial(jax.jit, donate_argnums=(1, 2, 3, 4))
    def attend_n(q, k_pages, v_pages, k_scale, v_scale):
        def step(i, carry):
            q, pk, pv, ks, vs = carry
            positions = lengths0 + i
            row_pages = jnp.take_along_axis(
                table, (positions // page)[:, None], axis=1
            )[:, 0]
            offsets = positions % page
            attn_lengths = lengths0 + i + active.astype(jnp.int32)

            def layer(pools, l):
                pk, pv, ks, vs = pools
                kq, kscl = _kv_quantize(q[:, :KH])
                vq, vscl = _kv_quantize(q[:, :KH])
                pk = append_token_layer(pk, l, kq, row_pages, offsets, active)
                pv = append_token_layer(pv, l, vq, row_pages, offsets, active)
                ks = append_scale_layer(ks, l, kscl, row_pages, offsets, active)
                vs = append_scale_layer(vs, l, vscl, row_pages, offsets, active)
                if with_kernel:
                    attn, pk, pv, ks, vs = carry_paged_attention_q8(
                        q, pk, pv, ks, vs, table, attn_lengths, l,
                        interpret=TINY,
                    )
                else:
                    attn = q
                return (pk, pv, ks, vs), attn.mean()

            (pk, pv, ks, vs), outs = jax.lax.scan(
                layer, (pk, pv, ks, vs), jnp.arange(L, dtype=jnp.int32)
            )
            q2 = q + (1e-9 * outs.mean()).astype(q.dtype)  # keep live
            return (q2, pk, pv, ks, vs)

        return jax.lax.fori_loop(0, N_STEPS, step, (q,) + tuple(
            (k_pages, v_pages, k_scale, v_scale)
        ))

    return attend_n


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from vcoder_tpu.config import VCoderConfig  # noqa: F401 (cfg via ctx)
    from vcoder_tpu.ops import paged_attention as pa

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--no-fused", action="store_true",
        help="force the scatter+attend path (FUSED_APPEND=False) so two"
        " runs A/B the fused append+attend kernel on hardware",
    )
    args = ap.parse_args()
    if args.no_fused:
        pa.FUSED_APPEND = False
    print(f"FUSED_APPEND={pa.FUSED_APPEND}", flush=True)

    _wait_for_healthy_tunnel()
    ctx = Ctx()
    cfg = ctx.get("cfg7")
    qparams = ctx.get("qparams7")
    B, page = BQ, PAGE_Q
    lengths0 = jnp.full((B,), T, jnp.int32)
    active = jnp.ones((B,), bool)

    rows = []

    # --- A. full window (bench parity) ---
    k_pages, v_pages, k_scale, v_scale, table = _pools(cfg, B, page)
    fn = _paged_decode_n_fn(cfg, table, lengths0, active, quantized=True)
    tok = jnp.zeros((B,), jnp.int32)
    st = list(fn(qparams, tok, k_pages, v_pages, k_scale, v_scale))
    jax_block(st[0])

    def _run_a():
        st[:] = fn(qparams, *st)
        jax_block(st[0])

    tok_s = _best_window(_run_a, B * N_STEPS)
    ms = B / tok_s * 1e3
    rows.append(("A full step", ms, tok_s))
    print(f"A full:    {tok_s:8.1f} tok/s  {ms:6.2f} ms/step", flush=True)
    del st

    # --- B. matmuls only ---
    decode_mm = _matmul_only_fn(cfg)
    tokb = jnp.zeros((B,), jnp.int32)
    tokb = decode_mm(qparams, tokb, lengths0)
    jax_block(tokb)
    stb = [tokb]

    def _run_b():
        stb[0] = decode_mm(qparams, stb[0], lengths0)
        jax_block(stb[0])

    tok_s_b = _best_window(_run_b, B * N_STEPS)
    ms_b = B / tok_s_b * 1e3
    rows.append(("B matmuls", ms_b, tok_s_b))
    print(f"B matmul:  {tok_s_b:8.1f} tok/s  {ms_b:6.2f} ms/step", flush=True)

    # --- C. attend only ---
    k_pages, v_pages, k_scale, v_scale, table = _pools(cfg, B, page)
    attend_n = _attend_only_fn(cfg, table, lengths0, active)
    q = jnp.zeros((B, cfg.text.num_heads, cfg.text.head_dim), jnp.bfloat16)
    stc = list(attend_n(q, k_pages, v_pages, k_scale, v_scale))
    jax_block(stc[0])

    def _run_c():
        stc[:] = attend_n(stc[0], *stc[1:])
        jax_block(stc[0])

    tok_s_c = _best_window(_run_c, B * N_STEPS)
    ms_c = B / tok_s_c * 1e3
    rows.append(("C attend", ms_c, tok_s_c))
    print(f"C attend:  {tok_s_c:8.1f} tok/s  {ms_c:6.2f} ms/step", flush=True)
    del stc

    # --- D. appends only (no kernel) ---
    k_pages, v_pages, k_scale, v_scale, table = _pools(cfg, B, page)
    append_n = _attend_only_fn(cfg, table, lengths0, active, with_kernel=False)
    std = list(append_n(q, k_pages, v_pages, k_scale, v_scale))
    jax_block(std[0])

    def _run_d():
        std[:] = append_n(std[0], *std[1:])
        jax_block(std[0])

    tok_s_d = _best_window(_run_d, B * N_STEPS)
    ms_d = B / tok_s_d * 1e3
    rows.append(("D appends", ms_d, tok_s_d))
    print(f"D appends: {tok_s_d:8.1f} tok/s  {ms_d:6.2f} ms/step", flush=True)

    print()
    print(f"A - B = {rows[0][1] - rows[1][1]:.2f} ms (attend share), "
          f"C measured alone = {rows[2][1]:.2f} ms")
    wt = 0  # int8 weight bytes (LM stack only — decode never touches vision)
    for leaf in jax.tree.leaves(qparams["lm"]):
        wt += leaf.size * leaf.dtype.itemsize
    kv = B * ((T + page) // page) * page * cfg.text.num_kv_heads * \
        cfg.text.head_dim * 2 * cfg.text.num_layers
    print(f"floors: weights {wt / 819e9 * 1e3:.2f} ms, "
          f"live pages {kv / 819e9 * 1e3:.2f} ms (at 819 GB/s)")


if __name__ == "__main__":
    main()
