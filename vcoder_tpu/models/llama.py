"""Llama (Vicuna v1.5) decoder in functional JAX.

Replaces the reference's HF ``LlamaForCausalLM`` + CUDA flash-attn stack
(reference: vcoder_llava/model/language_model/llava_llama.py:75-103 and
train/llama_flash_attn_monkey_patch.py) with a TPU-first design:

* Parameters are a plain pytree with **layer-stacked** weights (leading axis
  = num_layers) so the decoder runs as a single ``lax.scan`` — one compiled
  block regardless of depth, with optional per-layer rematerialization.
* Matrices are stored ``[in, out]`` (``x @ W``); the checkpoint importer
  transposes HF's ``[out, in]`` Linear layout.
* KV cache is a preallocated static-size pytree updated with
  ``dynamic_update_slice`` — no dynamic shapes anywhere, decode compiles to
  one step graph.
* RoPE/RMSNorm/SwiGLU match HF Llama numerics exactly (validated by the
  parity tests in tests/test_llama_parity.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vcoder_tpu.config import TextConfig
from vcoder_tpu.ops.attention import multi_head_attention
from vcoder_tpu.ops.quant import qmatmul as qm


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------


def init_llama_params(
    rng: jax.Array, cfg: TextConfig, dtype=jnp.float32
) -> dict:
    """Random-normal init (scale 0.02), layer-stacked. For tests/training
    from scratch; production weights come from the checkpoint importer."""
    L, D, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    H, KH, HD = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    V = cfg.vocab_size
    keys = jax.random.split(rng, 8)

    def nrm(key, shape):
        # Sample directly in the target dtype: a [L, D, I] f32 intermediate
        # would transiently cost ~6 GB at 7B scale (OOM on one 16 GB chip).
        return jax.random.normal(key, shape, dtype) * jnp.asarray(0.02, dtype)

    return {
        "embed_tokens": nrm(keys[0], (V, D)),
        "layers": {
            "input_layernorm": jnp.ones((L, D), dtype),
            "post_attention_layernorm": jnp.ones((L, D), dtype),
            "q_proj": nrm(keys[1], (L, D, H * HD)),
            "k_proj": nrm(keys[2], (L, D, KH * HD)),
            "v_proj": nrm(keys[3], (L, D, KH * HD)),
            "o_proj": nrm(keys[4], (L, H * HD, D)),
            "gate_proj": nrm(keys[5], (L, D, I)),
            "up_proj": nrm(keys[6], (L, D, I)),
            "down_proj": nrm(keys[7], (L, I, D)),
        },
        "norm": jnp.ones((D,), dtype),
        "lm_head": nrm(jax.random.fold_in(rng, 99), (D, V)),
    }


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


# Largest multi-token window that takes the scale-folded int8-KV
# attention route (k_scale forces XLA attention, correct at any T)
# instead of materializing a dequantized bf16 cache copy for the flash
# kernel. The copy is full-cache HBM traffic per layer per dispatch —
# only true prefills (T in the hundreds, paid once per request) should
# ever take it. Bounds the engines' speculative windows.
QUANT_FOLD_T_MAX = 32


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """HF LlamaRMSNorm: normalize in f32, scale in input dtype."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x.astype(dtype)) * weight


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, theta: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HF-convention rotary tables. positions: [B, T] -> [B, T, head_dim]."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [B,T,hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """x: [B, T, H, D]; cos/sin: [B, T, D] (HF rotate-half convention)."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    out = x * cos[:, :, None, :] + rotated * sin[:, :, None, :]
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class KVCache:
    """Static-size per-layer KV cache (pytree).

    k, v: [L, B, S_max, KH, HD]; kv_mask: [B, S_max] validity of each slot;
    length: [B] number of populated slots per row (ragged batches
    supported). With ``quantized=True`` storage, k/v hold int8 and
    k_scale/v_scale hold per-vector f32 scales [L, B, S_max, KH, 1] —
    halving cache HBM (the serving capacity limit at 13B); values
    dequantize at the attention read.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    kv_mask: jnp.ndarray
    length: jnp.ndarray
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @staticmethod
    def create(
        cfg: TextConfig,
        batch: int,
        max_len: int,
        dtype=jnp.float32,
        quantized: bool = False,
    ) -> "KVCache":
        L, KH, HD = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
        if quantized:
            return KVCache(
                k=jnp.zeros((L, batch, max_len, KH, HD), jnp.int8),
                v=jnp.zeros((L, batch, max_len, KH, HD), jnp.int8),
                kv_mask=jnp.zeros((batch, max_len), bool),
                length=jnp.zeros((batch,), jnp.int32),
                k_scale=jnp.zeros((L, batch, max_len, KH, 1), jnp.float32),
                v_scale=jnp.zeros((L, batch, max_len, KH, 1), jnp.float32),
            )
        return KVCache(
            k=jnp.zeros((L, batch, max_len, KH, HD), dtype),
            v=jnp.zeros((L, batch, max_len, KH, HD), dtype),
            kv_mask=jnp.zeros((batch, max_len), bool),
            length=jnp.zeros((batch,), jnp.int32),
        )


jax.tree_util.register_dataclass(
    KVCache,
    data_fields=["k", "v", "kv_mask", "length", "k_scale", "v_scale"],
    meta_fields=[],
)


def _kv_quantize(x: jnp.ndarray):
    """[B, T, KH, HD] -> (int8 values, f32 per-vector scales)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)
    return q, scale


# ---------------------------------------------------------------------------
# Decoder forward
# ---------------------------------------------------------------------------


def llama_forward(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,
    *,
    attn_mask: jnp.ndarray,
    position_ids: jnp.ndarray,
    cache: Optional[KVCache] = None,
    write_offset: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    remat: bool = False,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Run the decoder stack.

    Args:
      inputs_embeds: [B, T, D] (the multimodal splice provides these; token
        embedding happens upstream, mirroring the reference where
        ``prepare_inputs_labels_for_multimodal`` returns embeddings).
      attn_mask: [B, T] validity of the *current* positions.
      position_ids: [B, T] absolute positions (RoPE + causal masking).
      cache: optional KV cache. With a cache, keys/values are written at
        ``write_offset + arange(T)`` per row and attention spans the whole
        cache; without one, self-attention is over the T positions.
      write_offset: [B] starting slot per row; defaults to ``cache.length``.

    Returns: (hidden_states [B, T, D], updated cache or None)
    """
    B, T, D = inputs_embeds.shape
    H, KH, HD = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    eps = cfg.rms_norm_eps

    cos, sin = rope_cos_sin(position_ids, HD, cfg.rope_theta)

    use_cache = cache is not None
    if use_cache and write_offset is None:
        write_offset = cache.length

    if use_cache:
        s_max = cache.k.shape[2]
        # Contract: attn_mask is prefix-contiguous per row (right-padded
        # batches), so the valid new slots are [offset, offset + n_valid).
        n_valid = attn_mask.astype(jnp.int32).sum(axis=1)  # [B]
        pos_s = jnp.arange(s_max, dtype=jnp.int32)[None, :]
        new_kv_mask = cache.kv_mask | (
            (pos_s >= write_offset[:, None])
            & (pos_s < (write_offset + n_valid)[:, None])
        )
        # K/V write: in-place token scatter at (layer, row, offset+t) on
        # the FULL [L, B, S, ...] cache, which rides the scan CARRY. The
        # cache must never be a scan xs->ys pair: XLA does not alias the
        # stacked ys onto the consumed xs buffer, so every decode step
        # would re-copy the whole cache (measured 23 -> 6 ms/step for the
        # attention+cache path at 7B/B=8/S=704 when switched to the
        # carried scatter). Padding rows do write garbage past their
        # valid region, but the kv_mask never marks those slots, and any
        # later write at the same offset overwrites them.
        rows_ix = jnp.arange(B, dtype=jnp.int32)[:, None]  # [B, 1]
        write_pos = (
            write_offset[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        )  # [B, T]

        def _write_tokens(c_all, l, new_rows):
            # c_all: [L, B, S, KH, HD|1]; new_rows: [B, T, KH, HD|1]
            return c_all.at[l, rows_ix, write_pos].set(
                new_rows.astype(c_all.dtype)
            )

    def layer(carry, per_layer):
        lp = per_layer["p"]
        l = per_layer["idx"]
        x, kv = carry
        residual = x
        h = rms_norm(x, lp["input_layernorm"], eps)
        q = qm(h, lp["q_proj"]).reshape(B, T, H, HD)
        k = qm(h, lp["k_proj"]).reshape(B, T, KH, HD)
        v = qm(h, lp["v_proj"]).reshape(B, T, KH, HD)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if use_cache:
            k_sc = v_sc = None
            if cache.quantized:
                ck_all, cv_all, cks_all, cvs_all = kv
                kq, ks = _kv_quantize(k)
                vq, vs = _kv_quantize(v)
                ck_all = _write_tokens(ck_all, l, kq)
                cv_all = _write_tokens(cv_all, l, vq)
                cks_all = _write_tokens(cks_all, l, ks)
                cvs_all = _write_tokens(cvs_all, l, vs)
                kv = (ck_all, cv_all, cks_all, cvs_all)
                if T <= QUANT_FOLD_T_MAX:
                    # Decode / speculative verify: fold the scales into
                    # the attention math instead of materializing a
                    # dequantized bf16 cache copy — that copy is pure
                    # HBM traffic (~21 ms/step at 7B/B=8/S=2048).
                    k_at = ck_all[l]
                    v_at = cv_all[l]
                    k_sc = cks_all[l][..., 0]
                    v_sc = cvs_all[l][..., 0]
                else:
                    # Prefill-into-quantized-cache: the flash kernel has
                    # no scale operands; dequantize (once per request).
                    k_at = (
                        ck_all[l].astype(x.dtype)
                        * cks_all[l].astype(x.dtype)
                    )
                    v_at = (
                        cv_all[l].astype(x.dtype)
                        * cvs_all[l].astype(x.dtype)
                    )
            else:
                ck_all, cv_all = kv
                ck_all = _write_tokens(ck_all, l, k)
                cv_all = _write_tokens(cv_all, l, v)
                kv = (ck_all, cv_all)
                k_at, v_at = ck_all[l], cv_all[l]
            attn_out = multi_head_attention(
                q,
                k_at,
                v_at,
                causal=True,
                q_positions=position_ids,
                kv_mask=new_kv_mask,
                impl=attn_impl,
                k_scale=k_sc,
                v_scale=v_sc,
                # build_splice_plan emits arange positions over the
                # right-padded batch, so pos[b, t] <= (S - T) + t holds
                # and the flash route may use its triangular grid.
                bounded_positions=True,
            )
        else:
            attn_out = multi_head_attention(
                q,
                k,
                v,
                causal=True,
                q_positions=position_ids,
                kv_mask=attn_mask,
                impl=attn_impl,
                bounded_positions=True,  # arange right-padded contract
            )
        attn_out = qm(attn_out.reshape(B, T, H * HD), lp["o_proj"])
        x = residual + attn_out

        residual = x
        h = rms_norm(x, lp["post_attention_layernorm"], eps)
        mlp = qm(
            jax.nn.silu(qm(h, lp["gate_proj"])) * qm(h, lp["up_proj"]),
            lp["down_proj"],
        )
        x = residual + mlp
        return (x, kv), None

    if remat == "dots":
        # Save matmul outputs, recompute elementwise — trades a little
        # activation memory for skipping most of the recompute that full
        # per-layer remat pays in the backward.
        layer = jax.checkpoint(
            layer,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    elif remat:
        layer = jax.checkpoint(layer)

    L = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]
    per_layer_inputs = {
        "p": params["layers"],
        "idx": jnp.arange(L, dtype=jnp.int32),
    }
    if use_cache:
        kv0 = (
            (cache.k, cache.v, cache.k_scale, cache.v_scale)
            if cache.quantized
            else (cache.k, cache.v)
        )
    else:
        kv0 = ()

    (x, kv_out), _ = jax.lax.scan(
        layer, (inputs_embeds, kv0), per_layer_inputs
    )

    new_cache = None
    if use_cache:
        new_len = write_offset + attn_mask.astype(jnp.int32).sum(axis=1)
        new_cache = KVCache(
            k=kv_out[0],
            v=kv_out[1],
            kv_mask=new_kv_mask,
            length=new_len,
            k_scale=kv_out[2] if cache.quantized else None,
            v_scale=kv_out[3] if cache.quantized else None,
        )

    x = rms_norm(x, params["norm"], eps)
    return x, new_cache


def llama_paged_decode(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # [B, 1, D]
    positions: jnp.ndarray,  # [B] absolute position of the new token
    k_pages: jnp.ndarray,  # [L, n_pages, KH, page, HD] (int8 if quantized)
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,  # [B, P_max] int32
    lengths: jnp.ndarray,  # [B] tokens BEFORE this step
    active: jnp.ndarray,  # [B] bool
    *,
    k_scale: Optional[jnp.ndarray] = None,  # [L, n_pages, KH, page] f32
    v_scale: Optional[jnp.ndarray] = None,
    interpret: bool = False,
):
    """One decode step over paged KV storage (vLLM-style).

    Appends the step's K/V into each row's current page, then attends with
    the Pallas paged kernel (ops/paged_attention.py). Returns
    (hidden [B, 1, D], new_k_pages, new_v_pages) — plus the updated scale
    pools when ``k_scale``/``v_scale`` are given (int8 pages with
    per-token-per-head scales, the dense cache's ``quantized`` scheme).
    """
    from vcoder_tpu.ops.paged_attention import (
        FUSED_APPEND,
        append_scale_layer,
        append_token_layer,
        carry_paged_attention,
        carry_paged_attention_fused,
        carry_paged_attention_q8,
        sharded_append_scale_layer,
        sharded_append_token_layer,
        sharded_carry_paged_attention,
        sharded_carry_paged_attention_fused,
        sharded_carry_paged_attention_q8,
    )
    from vcoder_tpu.parallel.mesh import current_mesh

    B, T, D = inputs_embeds.shape
    assert T == 1
    H, KH, HD = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    eps = cfg.rms_norm_eps
    page = k_pages.shape[3]
    quantized = k_scale is not None

    mesh = current_mesh()
    if mesh is not None and mesh.size > 1:
        # Pallas calls are opaque to GSPMD: shard_map the kernel (rows over
        # data x fsdp, heads over model). Page ids in the table/engine are
        # GLOBAL; the wrappers rebase per shard.
        _append = lambda pk, l, kv, rp, off, act: sharded_append_token_layer(
            pk, l, kv, rp, off, act, mesh
        )
        _append_s = lambda ps, l, s, rp, off, act: sharded_append_scale_layer(
            ps, l, s, rp, off, act, mesh
        )
        _attend = lambda q, pk, pv, ln, l: sharded_carry_paged_attention(
            q, pk, pv, page_table, ln, l, mesh, interpret=interpret
        )
        _attend_q8 = (
            lambda q, pk, pv, ks, vs, ln, l: sharded_carry_paged_attention_q8(
                q, pk, pv, ks, vs, page_table, ln, l, mesh,
                interpret=interpret,
            )
        )
        _fused = lambda q, nk, nv, pk, pv, ln, l, **kw: (
            sharded_carry_paged_attention_fused(
                q, nk, nv, pk, pv, page_table, ln, positions, active, l,
                mesh, window=1, interpret=interpret, **kw
            )
        )
    else:
        _append = append_token_layer
        _append_s = append_scale_layer
        _attend = lambda q, pk, pv, ln, l: carry_paged_attention(
            q, pk, pv, page_table, ln, l, interpret=interpret
        )
        _attend_q8 = lambda q, pk, pv, ks, vs, ln, l: carry_paged_attention_q8(
            q, pk, pv, ks, vs, page_table, ln, l, interpret=interpret
        )
        _fused = lambda q, nk, nv, pk, pv, ln, l, **kw: (
            carry_paged_attention_fused(
                q, nk, nv, pk, pv, page_table, ln, positions, active, l,
                window=1, interpret=interpret, **kw
            )
        )

    cos, sin = rope_cos_sin(positions[:, None], HD, cfg.rope_theta)
    row_pages = jnp.take_along_axis(
        page_table, (positions // page)[:, None], axis=1
    )[:, 0]
    offsets = positions % page
    # Attention spans the pre-existing tokens plus the one just written.
    attn_lengths = lengths + active.astype(jnp.int32)

    # The stacked page pools ride the CARRY: the token append is an
    # in-place scatter and the attention kernel passes the pools through
    # input_output_aliases — pools as scan xs->ys would be re-copied
    # wholesale every step, and a non-aliased pallas operand that is
    # live-out gets safety-copied every layer (docs/PERFORMANCE.md).
    def layer(carry, per_layer):
        lp = per_layer["p"]
        l = per_layer["idx"]
        x, pools = carry
        residual = x
        h = rms_norm(x, lp["input_layernorm"], eps)
        q = qm(h, lp["q_proj"]).reshape(B, 1, H, HD)
        k = qm(h, lp["k_proj"]).reshape(B, 1, KH, HD)
        v = qm(h, lp["v_proj"]).reshape(B, 1, KH, HD)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if quantized:
            pk_all, pv_all, ks_all, vs_all = pools
            kq, ks = _kv_quantize(k[:, 0])  # [B, KH, HD], [B, KH, 1]
            vq, vs = _kv_quantize(v[:, 0])
            if FUSED_APPEND:
                # Append+attend in ONE kernel: the token's KV enters as a
                # VMEM operand (attended as a virtual page) and streams
                # out to its page slot with fire-and-forget DMAs — no
                # scatter + page re-read round trip through HBM.
                attn, pk_all, pv_all, ks_all, vs_all = _fused(
                    q, kq[:, None], vq[:, None], pk_all, pv_all,
                    attn_lengths, l,
                    k_scale=ks_all, v_scale=vs_all,
                    new_ks=ks[..., 0][:, None], new_vs=vs[..., 0][:, None],
                )
                attn = attn[:, 0]
            else:
                pk_all = _append(pk_all, l, kq, row_pages, offsets, active)
                pv_all = _append(pv_all, l, vq, row_pages, offsets, active)
                ks_all = _append_s(
                    ks_all, l, ks, row_pages, offsets, active
                )
                vs_all = _append_s(
                    vs_all, l, vs, row_pages, offsets, active
                )
                attn, pk_all, pv_all, ks_all, vs_all = _attend_q8(
                    q[:, 0], pk_all, pv_all, ks_all, vs_all,
                    attn_lengths, l,
                )  # [B, H, HD]
            pools = (pk_all, pv_all, ks_all, vs_all)
        else:
            pk_all, pv_all = pools
            if FUSED_APPEND:
                attn, pk_all, pv_all = _fused(
                    q, k.astype(pk_all.dtype), v.astype(pv_all.dtype),
                    pk_all, pv_all, attn_lengths, l,
                )
                attn = attn[:, 0]
            else:
                pk_all = _append(
                    pk_all, l, k[:, 0], row_pages, offsets, active
                )
                pv_all = _append(
                    pv_all, l, v[:, 0], row_pages, offsets, active
                )
                attn, pk_all, pv_all = _attend(
                    q[:, 0], pk_all, pv_all, attn_lengths, l
                )  # [B, H, HD]
            pools = (pk_all, pv_all)
        x = residual + qm(attn.reshape(B, 1, H * HD), lp["o_proj"])
        residual = x
        h = rms_norm(x, lp["post_attention_layernorm"], eps)
        mlp = qm(
            jax.nn.silu(qm(h, lp["gate_proj"])) * qm(h, lp["up_proj"]),
            lp["down_proj"],
        )
        return (residual + mlp, pools), None

    L = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]
    per_layer = {
        "p": params["layers"],
        "idx": jnp.arange(L, dtype=jnp.int32),
    }
    pools0 = (
        (k_pages, v_pages, k_scale, v_scale)
        if quantized
        else (k_pages, v_pages)
    )
    (x, pools), _ = jax.lax.scan(layer, (inputs_embeds, pools0), per_layer)
    x = rms_norm(x, params["norm"], eps)
    return (x,) + pools


def llama_paged_verify(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,  # [B, k, D] window (current tok + drafts)
    positions: jnp.ndarray,  # [B, k] absolute positions of the window
    k_pages: jnp.ndarray,  # [L, n_pages, KH, page, HD] (int8 if quantized)
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,  # [B, P_max] int32
    lengths: jnp.ndarray,  # [B] tokens BEFORE this window
    active: jnp.ndarray,  # [B] bool
    *,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    page_aligned: bool = False,
):
    """Speculative-verify forward over paged KV: append the window's k
    tokens (which may straddle a page boundary — the engine pre-allocates
    the pages) and attend each token causally up to its own position via
    the multi-query carry kernels. The engine trims ``lengths`` after
    acceptance; rejected slots are simply overwritten by the next window.

    Returns (hidden [B, k, D], k_pages, v_pages[, k_scale, v_scale]).
    """
    from vcoder_tpu.ops.paged_attention import (
        FUSED_APPEND,
        append_page_scales_layer,
        append_pages_layer,
        append_token_scales_layer,
        append_tokens_layer,
        carry_paged_attention_fused,
        carry_paged_attention_multi,
        carry_paged_attention_multi_q8,
        sharded_append_page_scales_layer,
        sharded_append_pages_layer,
        sharded_append_token_scales_layer,
        sharded_append_tokens_layer,
        sharded_carry_paged_attention_fused,
        sharded_carry_paged_attention_multi,
        sharded_carry_paged_attention_multi_q8,
    )
    from vcoder_tpu.parallel.mesh import current_mesh

    B, k, D = inputs_embeds.shape
    H, KH, HD = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    eps = cfg.rms_norm_eps
    quantized = k_scale is not None
    # Fused append+attend holds the whole window in VMEM and unrolls one
    # write DMA per window token — right for speculative-verify windows
    # (k <= ~8), wrong for chunk-prefill windows (k = 128+): gate on k.
    # The window must be position-CONTIGUOUS per row (the kernel writes
    # to positions[:, 0] + t), which both callers guarantee.
    use_fused = FUSED_APPEND and k <= 16
    # Page-granular append for page-aligned chunk windows: the token
    # scatter's cost is its ~B*k*KH advanced indices (~179 ms per int8
    # pool per G=8/kc=256 chunk on v5e), not its bytes. ``page_aligned``
    # is the CALLER'S guarantee that positions[:, 0] % page == 0 (the
    # chunk-prefill path: region starts are m*page and off advances by
    # kc); k % page == 0 completes page coverage.
    page_size = k_pages.shape[3]
    use_pages = page_aligned and not use_fused and k % page_size == 0

    mesh = current_mesh()
    if mesh is not None and mesh.size > 1:
        if use_pages:
            _append = lambda pk, l, kv: sharded_append_pages_layer(
                pk, l, kv, positions, page_table, active, mesh
            )
            _append_s = lambda ps, l, s: sharded_append_page_scales_layer(
                ps, l, s, positions, page_table, active, mesh
            )
        else:
            _append = lambda pk, l, kv: sharded_append_tokens_layer(
                pk, l, kv, positions, page_table, active, mesh
            )
            _append_s = lambda ps, l, s: (
                sharded_append_token_scales_layer(
                    ps, l, s, positions, page_table, active, mesh
                )
            )
        _attend = lambda q, pk, pv, ln, l: (
            sharded_carry_paged_attention_multi(
                q, pk, pv, page_table, ln, l, mesh, window=k,
                interpret=interpret,
            )
        )
        _attend_q8 = lambda q, pk, pv, ks, vs, ln, l: (
            sharded_carry_paged_attention_multi_q8(
                q, pk, pv, ks, vs, page_table, ln, l, mesh, window=k,
                interpret=interpret,
            )
        )
        _fused = lambda q, nk, nv, pk, pv, ln, l, **kw: (
            sharded_carry_paged_attention_fused(
                q, nk, nv, pk, pv, page_table, ln, positions[:, 0],
                active, l, mesh, window=k, interpret=interpret, **kw
            )
        )
    else:
        if use_pages:
            _append = lambda pk, l, kv: append_pages_layer(
                pk, l, kv, positions, page_table, active
            )
            _append_s = lambda ps, l, s: append_page_scales_layer(
                ps, l, s, positions, page_table, active
            )
        else:
            _append = lambda pk, l, kv: append_tokens_layer(
                pk, l, kv, positions, page_table, active
            )
            _append_s = lambda ps, l, s: append_token_scales_layer(
                ps, l, s, positions, page_table, active
            )
        _attend = lambda q, pk, pv, ln, l: carry_paged_attention_multi(
            q, pk, pv, page_table, ln, l, window=k, interpret=interpret
        )
        _attend_q8 = lambda q, pk, pv, ks, vs, ln, l: (
            carry_paged_attention_multi_q8(
                q, pk, pv, ks, vs, page_table, ln, l, window=k,
                interpret=interpret,
            )
        )
        _fused = lambda q, nk, nv, pk, pv, ln, l, **kw: (
            carry_paged_attention_fused(
                q, nk, nv, pk, pv, page_table, ln, positions[:, 0],
                active, l, window=k, interpret=interpret, **kw
            )
        )

    cos, sin = rope_cos_sin(positions, HD, cfg.rope_theta)
    # Kernel lengths INCLUDE the window for active rows.
    attn_lengths = lengths + k * active.astype(jnp.int32)

    def layer(carry, per_layer):
        lp = per_layer["p"]
        l = per_layer["idx"]
        x, pools = carry
        residual = x
        h = rms_norm(x, lp["input_layernorm"], eps)
        q = qm(h, lp["q_proj"]).reshape(B, k, H, HD)
        kk = qm(h, lp["k_proj"]).reshape(B, k, KH, HD)
        v = qm(h, lp["v_proj"]).reshape(B, k, KH, HD)
        q = apply_rope(q, cos, sin)
        kk = apply_rope(kk, cos, sin)
        if quantized:
            pk_all, pv_all, ks_all, vs_all = pools
            kq, ks = _kv_quantize(kk)  # [B, k, KH, HD], [B, k, KH, 1]
            vq, vs = _kv_quantize(v)
            if use_fused:
                attn, pk_all, pv_all, ks_all, vs_all = _fused(
                    q, kq, vq, pk_all, pv_all, attn_lengths, l,
                    k_scale=ks_all, v_scale=vs_all,
                    new_ks=ks[..., 0], new_vs=vs[..., 0],
                )
            else:
                pk_all = _append(pk_all, l, kq)
                pv_all = _append(pv_all, l, vq)
                ks_all = _append_s(ks_all, l, ks)
                vs_all = _append_s(vs_all, l, vs)
                attn, pk_all, pv_all, ks_all, vs_all = _attend_q8(
                    q, pk_all, pv_all, ks_all, vs_all, attn_lengths, l
                )  # [B, k, H, HD]
            pools = (pk_all, pv_all, ks_all, vs_all)
        else:
            pk_all, pv_all = pools
            if use_fused:
                attn, pk_all, pv_all = _fused(
                    q, kk.astype(pk_all.dtype), v.astype(pv_all.dtype),
                    pk_all, pv_all, attn_lengths, l,
                )
            else:
                pk_all = _append(pk_all, l, kk)
                pv_all = _append(pv_all, l, v)
                attn, pk_all, pv_all = _attend(
                    q, pk_all, pv_all, attn_lengths, l
                )
            pools = (pk_all, pv_all)
        x = residual + qm(attn.reshape(B, k, H * HD), lp["o_proj"])
        residual = x
        h = rms_norm(x, lp["post_attention_layernorm"], eps)
        mlp = qm(
            jax.nn.silu(qm(h, lp["gate_proj"])) * qm(h, lp["up_proj"]),
            lp["down_proj"],
        )
        return (residual + mlp, pools), None

    L = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]
    per_layer = {
        "p": params["layers"],
        "idx": jnp.arange(L, dtype=jnp.int32),
    }
    pools0 = (
        (k_pages, v_pages, k_scale, v_scale)
        if quantized
        else (k_pages, v_pages)
    )
    (x, pools), _ = jax.lax.scan(layer, (inputs_embeds, pools0), per_layer)
    x = rms_norm(x, params["norm"], eps)
    return (x,) + pools


def lm_head(params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """[B, T, D] -> [B, T, V] logits (f32 for stable softmax/sampling)."""
    return jnp.asarray(qm(hidden, params["lm_head"]), dtype=jnp.float32)


def embed_tokens(params: dict, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["embed_tokens"], ids, axis=0)
