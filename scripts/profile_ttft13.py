"""13B int8 prefill TTFT attribution (round-3 VERDICT #3).

Decomposes the fused VCoder-DS-13B prefill (244 ms p50 in BENCH_r03-era
runs) into its stages, each timed as its own jit on the real chip with
bench.py's probe-corrected window methodology:

  1. vision encode   — one batched CLIP pass over [3B, 336, 336, 3]
  2. embed assembly  — token embed + static splice scatter
  3. decoder forward — 40-layer Llama prefill (flash attention)
  4. lm_head         — last-position logits

and prints the bf16-MXU roofline for comparison: the decoder runs
dequantized-int8 -> bf16 matmuls (W8A8 int8 matmul is SLOWER than bf16 on
this XLA pin — docs/ROADMAP.md #4), so the floor is
2 * params * T / 197e12 s on v5e. Run on the TPU box:

    python scripts/profile_ttft13.py [--size 13b]

Also supports --size 7b for a same-methodology comparison row.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="13b")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _p50, _wait_for_healthy_tunnel, jax_block
    from __graft_entry__ import _example_batch
    from vcoder_tpu.config import VCoderConfig
    from vcoder_tpu.models import llama as llama_mod
    from vcoder_tpu.models import vcoder as model_mod
    from vcoder_tpu.quant import init_quantized_params

    _wait_for_healthy_tunnel()

    cfg = VCoderConfig.standard("vcoder_ds_llava", args.size)
    if args.size == "7b":
        params = model_mod.init_vcoder_params(
            jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16
        )
    else:
        params = init_quantized_params(jax.random.PRNGKey(3), cfg, bits=8)
    batch = _example_batch(cfg, batch_size=1)

    # --- full fused step (the bench number) ---
    @jax.jit
    def full(params, batch):
        logits, _ = model_mod.prefill(
            params, cfg, batch, batch["images"], batch["segs"],
            batch["depths"], use_vcoder_emb=cfg.use_vcoder_lm_emb,
        )
        return jnp.argmax(logits, axis=-1)

    full_ms = _p50(full, params, batch, iters=3, windows=3) * 1e3

    # --- stage 1: vision encode (batched 3-modality CLIP + projectors) ---
    @jax.jit
    def vis(params, batch):
        t = model_mod.encode_vision(
            params, cfg, batch["images"], batch["segs"], batch["depths"]
        )
        return jax.tree.map(lambda x: x.mean(), t)

    vis_ms = _p50(vis, params, batch, iters=3, windows=3) * 1e3

    # --- stage 2: embedding assembly (token embeds + splice scatter) ---
    vis_table = jax.jit(
        lambda p, b: model_mod.encode_vision(
            p, cfg, b["images"], b["segs"], b["depths"]
        )
    )(params, batch)
    jax_block(jax.tree.map(lambda x: x[..., :1], vis_table))

    @jax.jit
    def asm(params, batch, vis_table):
        e = model_mod.assemble_embeddings(
            params, cfg, batch["safe_ids"], batch["is_text"],
            batch["vis_idx"], vis_table,
            use_vcoder_emb=cfg.use_vcoder_lm_emb,
        )
        return e.mean()

    asm_ms = _p50(asm, params, batch, vis_table, iters=3, windows=3) * 1e3

    # --- stage 3+4: decoder forward + lm_head on precomputed embeds ---
    embeds = jax.jit(
        lambda p, b, t: model_mod.assemble_embeddings(
            p, cfg, b["safe_ids"], b["is_text"], b["vis_idx"], t,
            use_vcoder_emb=cfg.use_vcoder_lm_emb,
        )
    )(params, batch, vis_table)
    jax_block(embeds[..., :1])

    @jax.jit
    def dec(params, embeds, batch):
        hidden, _ = llama_mod.llama_forward(
            params["lm"], cfg.text, embeds,
            attn_mask=batch["attn_mask"],
            position_ids=batch["position_ids"],
        )
        return hidden[:, -1, :1]

    dec_ms = _p50(dec, params, embeds, batch, iters=3, windows=3) * 1e3

    @jax.jit
    def head(params, embeds, batch):
        last = jnp.clip(batch["seq_lens"] - 1, 0, None)
        h = jnp.take_along_axis(embeds, last[:, None, None], axis=1)[:, 0]
        return jnp.argmax(
            llama_mod.lm_head(params["lm"], h[:, None, :])[:, 0], -1
        )

    head_ms = _p50(head, params, embeds, batch, iters=5, windows=3) * 1e3

    # --- roofline ---
    t_pad = int(batch["safe_ids"].shape[1])
    h = cfg.text.hidden_size
    i = cfg.text.intermediate_size
    L = cfg.text.num_layers
    V = cfg.text.vocab_size
    dec_flops_tok = L * (4 * h * h + 3 * h * i) * 2
    dec_tflop = dec_flops_tok * t_pad / 1e12
    attn_tflop = L * 2 * 2 * t_pad * t_pad * h / 2 / 1e12  # causal QK+PV
    peak = 197.0  # v5e bf16 dense TFLOP/s
    roofline_ms = (dec_tflop + attn_tflop) / peak * 1e3

    print(
        f"size={args.size} T_pad={t_pad}\n"
        f"full fused prefill : {full_ms:8.1f} ms\n"
        f"  vision encode    : {vis_ms:8.1f} ms\n"
        f"  embed assembly   : {asm_ms:8.1f} ms\n"
        f"  decoder forward  : {dec_ms:8.1f} ms\n"
        f"  lm_head (last)   : {head_ms:8.1f} ms\n"
        f"  sum of stages    : {vis_ms + asm_ms + dec_ms + head_ms:8.1f} ms"
        f" (fusion benefit = sum - full)\n"
        f"decoder matmul+attn roofline @ {peak:.0f} TFLOP/s bf16: "
        f"{roofline_ms:.1f} ms ({dec_tflop + attn_tflop:.1f} TFLOP)\n"
        f"decoder MFU vs bf16 peak: {roofline_ms / dec_ms * 100:.0f}%"
    )


if __name__ == "__main__":
    main()
