"""CLIP ViT vision tower in functional JAX.

Replaces the reference's frozen HF ``CLIPVisionModel`` wrapper
(reference: vcoder_llava/model/multimodal_encoder/clip_encoder.py). TPU-first
choices:

* The patch embedding is a **matmul, not a conv**: images are rearranged to
  ``[B, num_patches, patch_size²·C]`` and multiplied by a ``[P²C, D]``
  matrix — this maps straight onto the MXU with no conv lowering.
* ``select_layer=-2`` (the production setting) means the output is the
  hidden state *entering* the last transformer block, so we simply run
  ``num_layers - 1`` blocks and skip both the final block and the
  post-layernorm — the reference computes the full tower and throws the
  last layer away (clip_encoder.py:29-45).
* Attention is bidirectional flash attention on TPU.

Numerics match HF ``CLIPVisionModel`` (quick-GELU, pre-LN) — validated in
tests/test_clip_parity.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vcoder_tpu.config import VisionConfig
from vcoder_tpu.ops.attention import multi_head_attention
from vcoder_tpu.ops.quant import qmatmul as qm


def init_clip_params(
    rng: jax.Array, cfg: VisionConfig, dtype=jnp.float32
) -> dict:
    L, D, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    P, C = cfg.patch_size, cfg.num_channels
    keys = jax.random.split(rng, 10)

    def nrm(key, shape):
        return jax.random.normal(key, shape, dtype) * jnp.asarray(0.02, dtype)

    return {
        "class_embedding": nrm(keys[0], (D,)),
        "patch_embedding": nrm(keys[1], (P * P * C, D)),
        "position_embedding": nrm(keys[2], (cfg.num_positions, D)),
        "pre_layernorm": {
            "scale": jnp.ones((D,), dtype),
            "bias": jnp.zeros((D,), dtype),
        },
        "layers": {
            "ln1_scale": jnp.ones((L, D), dtype),
            "ln1_bias": jnp.zeros((L, D), dtype),
            "ln2_scale": jnp.ones((L, D), dtype),
            "ln2_bias": jnp.zeros((L, D), dtype),
            "q_proj": nrm(keys[3], (L, D, D)),
            "q_bias": jnp.zeros((L, D), dtype),
            "k_proj": nrm(keys[4], (L, D, D)),
            "k_bias": jnp.zeros((L, D), dtype),
            "v_proj": nrm(keys[5], (L, D, D)),
            "v_bias": jnp.zeros((L, D), dtype),
            "out_proj": nrm(keys[6], (L, D, D)),
            "out_bias": jnp.zeros((L, D), dtype),
            "fc1": nrm(keys[7], (L, D, I)),
            "fc1_bias": jnp.zeros((L, I), dtype),
            "fc2": nrm(keys[8], (L, I, D)),
            "fc2_bias": jnp.zeros((L, D), dtype),
        },
    }


def layer_norm(x, scale, bias, eps):
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return (x * scale + bias).astype(dtype)


def quick_gelu(x):
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def patchify(images: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, (H/P)*(W/P), P*P*C] in conv-equivalent order.

    The flattening order per patch is (C, ph, pw) to match HF's Conv2d
    weight layout [D, C, P, P] flattened — the importer flattens the conv
    kernel the same way, so patchify(x) @ W == Conv2d(x).
    """
    B, H, W, C = images.shape
    P = patch_size
    x = images.reshape(B, H // P, P, W // P, P, C)
    # -> [B, H/P, W/P, C, P, P] so each patch flattens as (C, ph, pw)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(B, (H // P) * (W // P), C * P * P)


def _num_blocks(cfg: VisionConfig) -> int:
    # select_layer=-L_off means "hidden state after num_layers - L_off + 1
    # blocks" in HF terms (hidden_states has num_layers+1 entries, entry 0
    # being the embeddings). -2 -> run num_layers-1 blocks.
    sl = cfg.select_layer
    n_blocks = cfg.num_layers + 1 + sl if sl < 0 else sl
    if not (0 <= n_blocks <= cfg.num_layers):
        raise ValueError(f"select_layer {sl} out of range")
    return n_blocks


# Fused LN2+MLP+residual kernel in the fused tower path: correctness is
# interpret-proven (tests/test_vit_attention.py), but the hardware A/B
# (scripts/bench_vision.py, one v5e chip) measured a wash — 346/356 vs
# 354/355 img/s at B=16/32 — XLA's matmul epilogue fusion already covers
# the LN+GELU+residual traffic the kernel was built to save, so the
# simpler XLA MLP stays the default.
FUSE_MLP_DEFAULT = False


def _fused_eligible(
    params: dict, cfg: VisionConfig, attn_impl: str,
    fuse_mlp: bool = FUSE_MLP_DEFAULT,
) -> bool:
    """Use the fused attention-block kernel (ops/vit_attention.py)?
    TPU-only, single-device (under a multi-chip mesh the Pallas call
    would be replicated by GSPMD), plain unquantized attention weights,
    and shapes whose fused blocks meet the Mosaic lane tiling. The MLP
    constraints (plain fc1/fc2, intermediate lane tiling) apply only
    when the MLP kernel itself is on — with fuse_mlp off the MLP runs
    through qmatmul and handles quantized/LoRA weights fine."""
    if attn_impl not in ("auto", "pallas"):
        return False
    if jax.default_backend() != "tpu":
        return False
    from vcoder_tpu.parallel.mesh import current_mesh

    mesh = current_mesh()
    if mesh is not None and mesh.size > 1:
        return False
    lp = params["layers"]
    attn_keys = ("q_proj", "k_proj", "v_proj", "out_proj")
    if any(not isinstance(lp[k], jnp.ndarray) for k in attn_keys):
        return False  # quantized / LoRA-wrapped vision weights
    from vcoder_tpu.ops.vit_attention import pick_head_block

    hb = pick_head_block(cfg.num_heads)
    if not (
        cfg.hidden_size % 128 == 0 and (hb * 3 * cfg.head_dim) % 128 == 0
    ):
        return False
    if fuse_mlp:
        if any(not isinstance(lp[k], jnp.ndarray) for k in ("fc1", "fc2")):
            return False
        if cfg.intermediate_size % 128 != 0:
            return False
    return True


def clip_encode(
    params: dict,
    cfg: VisionConfig,
    images: jnp.ndarray,
    *,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """Encode images to patch features at ``cfg.select_layer``.

    Args:
      images: [B, H, W, C] — already preprocessed (resized, normalized),
        channel-last (TPU-friendly layout; the preprocessing pipeline emits
        this directly).

    Returns: [B, num_patches(+1), D] — CLS dropped iff
      ``cfg.select_feature == 'patch'`` (reference: clip_encoder.py:29-37).
    """
    B = images.shape[0]
    D = cfg.hidden_size
    eps = cfg.layer_norm_eps

    patches = patchify(images, cfg.patch_size)
    x = qm(patches, params["patch_embedding"])  # [B, N, D]
    cls = jnp.broadcast_to(params["class_embedding"], (B, 1, D)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)  # [B, N+1, D]
    x = x + params["position_embedding"][None, :, :]
    x = layer_norm(
        x, params["pre_layernorm"]["scale"], params["pre_layernorm"]["bias"], eps
    )

    n_blocks = _num_blocks(cfg)

    if _fused_eligible(params, cfg, attn_impl):
        x = _run_blocks_fused(params, cfg, x, n_blocks)
    else:
        x = _run_blocks(params, cfg, x, n_blocks, attn_impl)

    if cfg.select_feature == "patch":
        return x[:, 1:, :]
    if cfg.select_feature == "cls_patch":
        return x
    raise ValueError(f"Unexpected select feature: {cfg.select_feature}")


def _run_blocks(params, cfg, x, n_blocks, attn_impl):
    """Transformer blocks via the attention dispatcher (XLA / flash) —
    the portable path (CPU tests, meshes, quantized towers)."""
    B, T, D = x.shape
    H, HD = cfg.num_heads, cfg.head_dim
    eps = cfg.layer_norm_eps

    def block(x, lp):
        residual = x
        h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], eps)
        q = (qm(h, lp["q_proj"]) + lp["q_bias"]).reshape(B, T, H, HD)
        k = (qm(h, lp["k_proj"]) + lp["k_bias"]).reshape(B, T, H, HD)
        v = (qm(h, lp["v_proj"]) + lp["v_bias"]).reshape(B, T, H, HD)
        attn = multi_head_attention(q, k, v, causal=False, impl=attn_impl)
        x = residual + (qm(attn.reshape(B, T, D), lp["out_proj"]) + lp["out_bias"])
        residual = x
        h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], eps)
        x = residual + (
            qm(quick_gelu(qm(h, lp["fc1"]) + lp["fc1_bias"]), lp["fc2"])
            + lp["fc2_bias"]
        )
        return x, None

    sliced = jax.tree.map(lambda a: a[:n_blocks], params["layers"])
    x, _ = jax.lax.scan(block, x, sliced)
    return x


def _run_blocks_fused(
    params, cfg, x, n_blocks, *, interpret=False, fuse_mlp=FUSE_MLP_DEFAULT
):
    """Transformer blocks with the fused Pallas kernels
    (ops/vit_attention.py): QKV+softmax+out-projection in one call per
    layer, and LN2+MLP+residual in a second (``fused_block_mlp``) that
    keeps the [T, 4D] GELU intermediate in VMEM instead of
    round-tripping it through HBM between the two XLA matmuls. The
    sequence is padded to a multiple of 8 for the whole run (584 for
    CLIP's 577 — measured faster than 640-lane padding despite the
    unaligned score lanes); pad rows never contaminate valid rows
    (attention is masked by a key bias, everything else is row-local)
    and are sliced off here."""
    from vcoder_tpu.ops.vit_attention import (
        fused_block_attention,
        fused_block_mlp,
        pick_head_block,
        pick_i_block,
        repack_stacked,
    )

    B, T, D = x.shape
    H, HD = cfg.num_heads, cfg.head_dim
    eps = cfg.layer_norm_eps
    hb = pick_head_block(H)
    ib = pick_i_block(cfg.intermediate_size) if fuse_mlp else 0
    Tp = -(-T // 8) * 8
    x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))

    lp = params["layers"]
    wqkv, bqkv, wo = repack_stacked(lp, H, hb, HD)
    layers = dict(
        wqkv=wqkv, bqkv=bqkv, wo=wo,
        ln1_scale=lp["ln1_scale"], ln1_bias=lp["ln1_bias"],
        ln2_scale=lp["ln2_scale"], ln2_bias=lp["ln2_bias"],
        out_bias=lp["out_bias"], fc1=lp["fc1"], fc1_bias=lp["fc1_bias"],
        fc2=lp["fc2"], fc2_bias=lp["fc2_bias"],
    )

    def block(x, l):
        h = layer_norm(x, l["ln1_scale"], l["ln1_bias"], eps)
        a = fused_block_attention(
            h, l["wqkv"], l["bqkv"], l["wo"],
            t_valid=T, n_heads=H, hb=hb, interpret=interpret,
        )
        x = x + a + l["out_bias"]
        if fuse_mlp:
            x = fused_block_mlp(
                x, l["ln2_scale"], l["ln2_bias"],
                l["fc1"], l["fc1_bias"], l["fc2"], l["fc2_bias"],
                eps=eps, i_block=ib, interpret=interpret,
            )
        else:
            residual = x
            h = layer_norm(x, l["ln2_scale"], l["ln2_bias"], eps)
            x = residual + (
                qm(quick_gelu(qm(h, l["fc1"]) + l["fc1_bias"]), l["fc2"])
                + l["fc2_bias"]
            )
        return x, None

    sliced = jax.tree.map(lambda a: a[:n_blocks], layers)
    x, _ = jax.lax.scan(block, x, sliced)
    return x[:, :T]
