"""Vision-encode A/B bench: fused-attention tower with XLA MLP vs the
fused LN2+MLP+residual kernel (ops/vit_attention.py::fused_block_mlp).

Decides models/clip.py::FUSE_MLP_DEFAULT from hardware, not theory: the
MLP is 61% of the tower FLOPs and the XLA route round-trips the
[B, T, 4096] GELU intermediate through HBM, but XLA's matmul epilogue
fusion is strong — measure before switching. Run on the real chip:

    python scripts/bench_vision.py [--batch 16 32]

Prints img/s/chip per variant; timing methodology is bench.py's
probe-corrected pipelined windows (tunnel RTT subtracted).
"""

import argparse
import sys

sys.path.insert(0, ".")

from bench import _p50, _wait_for_healthy_tunnel  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[16, 32])
    ap.add_argument(
        "--attrib",
        action="store_true",
        help="per-stage attribution (front / attn / mlp) at --batch[0]",
    )
    args = ap.parse_args()

    _wait_for_healthy_tunnel()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from vcoder_tpu.config import VCoderConfig
    from vcoder_tpu.models import clip as clip_mod

    cfg = VCoderConfig.standard("vcoder_ds_llava", "7b")
    vt = clip_mod.init_clip_params(
        jax.random.PRNGKey(0), cfg.vision, dtype=jnp.bfloat16
    )
    n_blocks = clip_mod._num_blocks(cfg.vision)

    @partial(jax.jit, static_argnames=("fuse_mlp",))
    def encode(vt, px, *, fuse_mlp: bool):
        patches = clip_mod.patchify(px, cfg.vision.patch_size)
        x = patches @ vt["patch_embedding"]
        B = px.shape[0]
        cls = jnp.broadcast_to(
            vt["class_embedding"], (B, 1, cfg.vision.hidden_size)
        ).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + vt["position_embedding"][None, :, :]
        x = clip_mod.layer_norm(
            x, vt["pre_layernorm"]["scale"], vt["pre_layernorm"]["bias"],
            cfg.vision.layer_norm_eps,
        )
        x = clip_mod._run_blocks_fused(
            {"layers": vt["layers"]}, cfg.vision, x, n_blocks,
            fuse_mlp=fuse_mlp,
        )
        return x[:, 1:, :].mean()

    for B in args.batch:
        px = jax.random.normal(
            jax.random.PRNGKey(1),
            (B, cfg.vision.image_size, cfg.vision.image_size, 3),
            jnp.bfloat16,
        )
        for fuse_mlp in (False, True):
            s = _p50(
                partial(encode, fuse_mlp=fuse_mlp), vt, px, iters=10
            )
            name = "fused-mlp" if fuse_mlp else "xla-mlp  "
            print(
                f"B={B:3d} {name}: {B / s:7.1f} img/s/chip"
                f"  ({s * 1e3:.2f} ms/batch)",
                flush=True,
            )

    if args.attrib:
        attrib(cfg, vt, args.batch[0])


def attrib(cfg, vt, B):
    """Stage attribution for the fused vision encode (round-3 VERDICT
    #9): front (patchify/patch-embed/pos/pre-LN), attention-kernel-only
    blocks, MLP-only blocks, each timed as its own jit, with per-stage
    bf16-MXU rooflines. The residual third beyond the MLP fusion wash is
    whichever stage's MFU lags."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from bench import _p50
    from vcoder_tpu.models import clip as clip_mod
    from vcoder_tpu.ops.vit_attention import (
        fused_block_attention,
        pick_head_block,
        repack_stacked,
    )

    v = cfg.vision
    eps = v.layer_norm_eps
    D, H, HD, I = v.hidden_size, v.num_heads, v.head_dim, v.intermediate_size
    n_blocks = clip_mod._num_blocks(v)
    px = jax.random.normal(
        jax.random.PRNGKey(1), (B, v.image_size, v.image_size, 3),
        jnp.bfloat16,
    )

    @jax.jit
    def front(vt, px):
        patches = clip_mod.patchify(px, v.patch_size)
        x = patches @ vt["patch_embedding"]
        cls = jnp.broadcast_to(
            vt["class_embedding"], (B, 1, D)
        ).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + vt["position_embedding"][None, :, :]
        x = clip_mod.layer_norm(
            x, vt["pre_layernorm"]["scale"], vt["pre_layernorm"]["bias"], eps
        )
        return x

    x0 = front(vt, px)
    jax.device_get(x0[..., :1])
    T = x0.shape[1]
    Tp = -(-T // 8) * 8
    hb = pick_head_block(H)
    lp = vt["layers"]
    wqkv, bqkv, wo = repack_stacked(lp, H, hb, HD)

    @jax.jit
    def attn_blocks(x0, wqkv, bqkv, wo, lp):
        x = jnp.pad(x0, ((0, 0), (0, Tp - T), (0, 0)))
        layers = dict(
            wqkv=wqkv, bqkv=bqkv, wo=wo,
            ln1_scale=lp["ln1_scale"], ln1_bias=lp["ln1_bias"],
            out_bias=lp["out_bias"],
        )

        def block(x, l):
            h = clip_mod.layer_norm(x, l["ln1_scale"], l["ln1_bias"], eps)
            a = fused_block_attention(
                h, l["wqkv"], l["bqkv"], l["wo"],
                t_valid=T, n_heads=H, hb=hb,
            )
            return x + a + l["out_bias"], None

        sliced = jax.tree.map(lambda a: a[:n_blocks], layers)
        x, _ = jax.lax.scan(block, x, sliced)
        return x[:, :T].mean()

    @jax.jit
    def mlp_blocks(x0, lp):
        layers = dict(
            ln2_scale=lp["ln2_scale"], ln2_bias=lp["ln2_bias"],
            fc1=lp["fc1"], fc1_bias=lp["fc1_bias"],
            fc2=lp["fc2"], fc2_bias=lp["fc2_bias"],
        )

        def block(x, l):
            h = clip_mod.layer_norm(x, l["ln2_scale"], l["ln2_bias"], eps)
            x = x + (
                clip_mod.qm(
                    clip_mod.quick_gelu(clip_mod.qm(h, l["fc1"]) + l["fc1_bias"]),
                    l["fc2"],
                )
                + l["fc2_bias"]
            )
            return x, None

        sliced = jax.tree.map(lambda a: a[:n_blocks], layers)
        x, _ = jax.lax.scan(block, x0, sliced)
        return x.mean()

    @jax.jit
    def full(vt, px):
        return clip_mod.clip_encode(vt, v, px).mean()

    front_ms = _p50(lambda vt, px: front(vt, px).mean(), vt, px, iters=10) * 1e3
    attn_ms = _p50(attn_blocks, x0, wqkv, bqkv, wo, lp, iters=10) * 1e3
    mlp_ms = _p50(mlp_blocks, x0, lp, iters=10) * 1e3
    full_ms = _p50(full, {**vt}, px, iters=10) * 1e3

    peak = 197e12
    # Per-stage matmul FLOPs (batch B, seq T):
    patch_tf = 2 * B * T * (v.patch_size**2 * 3) * D / 1e12
    attn_mm_tf = n_blocks * 2 * B * T * (4 * D * D) / 1e12
    attn_sc_tf = n_blocks * 2 * B * 2 * T * T * D / 1e12  # QK^T + PV
    mlp_tf = n_blocks * 2 * B * T * (2 * D * I) / 1e12

    def row(name, ms, tf):
        mfu = tf / (ms / 1e3) / peak * 1e12 * 100
        print(f"{name:18s}: {ms:7.2f} ms  {tf:6.2f} TFLOP  {mfu:5.1f}% MFU")

    print(f"\nattribution @ B={B}, T={T} (pad {Tp}), {n_blocks} blocks:")
    row("front (patch+LN)", front_ms, patch_tf)
    row("attn blocks", attn_ms, attn_mm_tf + attn_sc_tf)
    row("mlp blocks", mlp_ms, mlp_tf)
    print(
        f"{'sum of stages':18s}: {front_ms + attn_ms + mlp_ms:7.2f} ms   "
        f"vs full {full_ms:.2f} ms"
    )
    row("full encode", full_ms, patch_tf + attn_mm_tf + attn_sc_tf + mlp_tf)


if __name__ == "__main__":
    main()
