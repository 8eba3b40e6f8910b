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


if __name__ == "__main__":
    main()
