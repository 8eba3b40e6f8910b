"""Fused ViT attention-block kernel (ops/vit_attention.py): interpret-mode
parity against the plain XLA tower path, plus the dispatch guard.

The kernel replaces QKV-projection + bidirectional MHA + out-projection of
one CLIP block; on CPU it runs interpreted against `_run_blocks` (the
numerical oracle), all in f32 so tolerances are tight."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.models import clip as clip_mod
from vcoder_tpu.ops.attention import xla_attention
from vcoder_tpu.ops.vit_attention import (
    fused_block_attention,
    fused_block_mlp,
    pick_head_block,
    pick_i_block,
    repack_stacked,
)


def _mk_block_weights(key, Dm, scale=0.2):
    ks = jax.random.split(key, 8)
    w = {
        "q_proj": jax.random.normal(ks[0], (Dm, Dm)) * scale,
        "k_proj": jax.random.normal(ks[1], (Dm, Dm)) * scale,
        "v_proj": jax.random.normal(ks[2], (Dm, Dm)) * scale,
        "out_proj": jax.random.normal(ks[3], (Dm, Dm)) * scale,
        "q_bias": jax.random.normal(ks[4], (Dm,)) * scale,
        "k_bias": jax.random.normal(ks[5], (Dm,)) * scale,
        "v_bias": jax.random.normal(ks[6], (Dm,)) * scale,
    }
    return w


@pytest.mark.parametrize("B,T,H,dh", [(2, 13, 4, 8), (1, 29, 2, 16)])
def test_fused_block_matches_oracle(B, T, H, dh):
    Dm = H * dh
    w = _mk_block_weights(jax.random.PRNGKey(0), Dm)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, Dm))

    q = (x @ w["q_proj"] + w["q_bias"]).reshape(B, T, H, dh)
    k = (x @ w["k_proj"] + w["k_bias"]).reshape(B, T, H, dh)
    v = (x @ w["v_proj"] + w["v_bias"]).reshape(B, T, H, dh)
    ref = xla_attention(q, k, v, causal=False).reshape(B, T, Dm) @ w["out_proj"]

    hb = pick_head_block(H)
    stacked = {key: val[None] for key, val in w.items()}  # L=1
    wqkv, bqkv, wo = repack_stacked(stacked, H, hb, dh)
    Tp = -(-T // 8) * 8
    x_pad = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    out = fused_block_attention(
        x_pad, wqkv[0], bqkv[0], wo[0],
        t_valid=T, n_heads=H, hb=hb, interpret=True,
    )[:, :T]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_fused_tower_matches_plain_tower():
    cfg = VCoderConfig.tiny().vision
    params = clip_mod.init_clip_params(jax.random.PRNGKey(0), cfg)
    hw = cfg.image_size
    px = jax.random.normal(jax.random.PRNGKey(1), (2, hw, hw, 3))

    # Shared embedding front-end, then both block runners.
    patches = clip_mod.patchify(px, cfg.patch_size)
    x = patches @ params["patch_embedding"]
    cls = jnp.broadcast_to(
        params["class_embedding"], (2, 1, cfg.hidden_size)
    ).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"][None, :, :]
    x = clip_mod.layer_norm(
        x, params["pre_layernorm"]["scale"], params["pre_layernorm"]["bias"],
        cfg.layer_norm_eps,
    )
    n_blocks = clip_mod._num_blocks(cfg)
    ref = clip_mod._run_blocks(params, cfg, x, n_blocks, "xla")
    out = clip_mod._run_blocks_fused(params, cfg, x, n_blocks, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_fused_dispatch_guard_cpu():
    """On CPU (and under quantized weights) clip_encode must stay on the
    portable path — _fused_eligible gates the kernel to single-device
    TPU with plain weights."""
    cfg = VCoderConfig.tiny().vision
    params = clip_mod.init_clip_params(jax.random.PRNGKey(0), cfg)
    assert jax.default_backend() == "cpu"
    assert not clip_mod._fused_eligible(params, cfg, "auto")
    assert not clip_mod._fused_eligible(params, cfg, "xla")
    # clip_encode still runs end-to-end through the portable path
    px = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.image_size,
                                                   cfg.image_size, 3))
    out = clip_mod.clip_encode(params, cfg, px)
    assert out.shape[0] == 1


def test_pick_head_block():
    assert pick_head_block(16) == 4
    assert pick_head_block(2) == 2
    assert pick_head_block(3) == 1


@pytest.mark.parametrize("B,T,Dm,I,ib", [(2, 16, 32, 64, 32), (1, 24, 64, 128, 128)])
def test_fused_mlp_matches_oracle(B, T, Dm, I, ib):
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    x = jax.random.normal(ks[0], (B, T, Dm))
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (Dm,))
    lnb = 0.1 * jax.random.normal(ks[2], (Dm,))
    fc1 = jax.random.normal(ks[3], (Dm, I)) * 0.2
    fc1b = jax.random.normal(ks[4], (I,)) * 0.2
    fc2 = jax.random.normal(ks[5], (I, Dm)) * 0.2
    fc2b = jax.random.normal(ks[6], (Dm,)) * 0.2
    eps = 1e-5

    h = clip_mod.layer_norm(x, lns, lnb, eps)
    ref = x + (clip_mod.quick_gelu(h @ fc1 + fc1b) @ fc2 + fc2b)

    out = fused_block_mlp(
        x, lns, lnb, fc1, fc1b, fc2, fc2b,
        eps=eps, i_block=ib, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_pick_i_block():
    assert pick_i_block(4096) == 512
    assert pick_i_block(256) == 256
    assert pick_i_block(96) == 96
