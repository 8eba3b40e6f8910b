"""Fused flash-attention Pallas TPU kernel.

Replaces the reference's external CUDA flash-attn dependency (reference:
vcoder_llava/train/llama_flash_attn_monkey_patch.py:79-91 uses
``flash_attn_unpadded_qkvpacked_func``) with a TPU-native online-softmax
kernel:

* Grid ``(B, H, num_q_blocks, num_k_blocks)`` — the KV-block axis is the
  innermost (sequential) grid dimension, so the running max/sum/accumulator
  live in VMEM scratch across KV steps (classic flash-attention recurrence).
* Both matmuls ride the MXU with f32 accumulation
  (``preferred_element_type``); inputs stay in their storage dtype (bf16 in
  production).
* Causality is *position-based*, not index-based: queries carry absolute
  positions (``q_positions``), which makes the same kernel serve ragged
  right-padded prefill batches and KV-cache attention where ``T != S``.
* ``kv_mask`` handles padded/unwritten cache slots; fully-masked query rows
  produce 0 (guarded divide), never NaN.
* Causal early-exit: KV blocks strictly above the diagonal are skipped via
  predication.

Decode steps (T == 1) dispatch to the specialized kernel in
ops/decode_attention.py via :func:`vcoder_tpu.ops.attention.multi_head_attention`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _flash_kernel(
    qpos_ref,  # [1, 1, bq] int32
    kmask_ref,  # [1, 1, bk] int32
    q_ref,  # [1, 1, bq, D]
    k_ref,  # [1, 1, bk, D]
    v_ref,  # [1, 1, bk, D]
    o_ref,  # [1, 1, bq, D]
    m_scr,  # [bq, 128] f32
    l_scr,  # [bq, 128] f32
    acc_scr,  # [bq, D] f32
    *,
    scale: float,
    causal: bool,
    block_k: int,
):
    j = pl.program_id(3)
    nk = pl.num_programs(3)
    bq = q_ref.shape[2]
    bk = k_ref.shape[2]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
        l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)

    q_pos = qpos_ref[0, 0, :]  # [bq]

    if causal:
        # Skip KV blocks strictly above the causal diagonal for every query
        # in this block.
        should_compute = jnp.max(q_pos) >= j * block_k
    else:
        should_compute = True

    @pl.when(should_compute)
    def _compute():
        q = q_ref[0, 0, :, :]
        k = k_ref[0, 0, :, :]
        v = v_ref[0, 0, :, :]

        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bk]
        s = s * scale

        mask = kmask_ref[0, 0, :].astype(bool)[None, :]  # [1, bk]
        if causal:
            k_ids = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 1
            )
            mask = mask & (k_ids <= q_pos[:, None])
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, :1]  # [bq, 1]
        l_prev = l_scr[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)  # [bq, 1]
        p = jnp.exp(s - m_new)  # [bq, bk]
        # Fully-masked rows: m_new == NEG_INF -> s - m_new == 0 -> p == 1,
        # which would pollute l. Zero them via the mask.
        p = jnp.where(mask, p, 0.0)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        pv = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, D]
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out = acc_scr[:] / l_safe
        o_ref[0, 0, :, :] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jnp.ndarray,  # [B, T, H, D]
    k: jnp.ndarray,  # [B, S, KH, D]
    v: jnp.ndarray,  # [B, S, KH, D]
    *,
    causal: bool,
    q_positions: Optional[jnp.ndarray] = None,  # [B, T] int32
    kv_mask: Optional[jnp.ndarray] = None,  # [B, S] bool
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention. Semantics identical to ops.attention.xla_attention."""
    B, T, H, D = q.shape
    S, KH = k.shape[1], k.shape[2]
    assert H % KH == 0, (H, KH)
    group = H // KH
    scale = D**-0.5

    if q_positions is None:
        q_positions = jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.int32)[None, :] + (S - T), (B, T)
        )
    if kv_mask is None:
        kv_mask = jnp.ones((B, S), dtype=jnp.int32)

    bq = min(block_q, _round_up(T, 128))
    bk = min(block_k, _round_up(S, 128))
    Tp = _round_up(T, bq)
    Sp = _round_up(S, bk)

    if Tp != T:
        q = jnp.pad(q, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
        # Padded queries get position 0: cheap, non-NaN, sliced off below.
        q_positions = jnp.pad(q_positions, ((0, 0), (0, Tp - T)))
    if Sp != S:
        k = jnp.pad(k, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, Sp - S)))

    # Kernel-native layout: [B, H, T, D] so every block's trailing two dims
    # are (seq, head_dim) — tileable without sublane padding.
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    q_positions = q_positions.astype(jnp.int32)[:, None, :]  # [B, 1, Tp]
    kv_mask = kv_mask.astype(jnp.int32)[:, None, :]  # [B, 1, Sp]

    grid = (B, H, Tp // bq, Sp // bk)

    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, block_k=bk
    )

    flops_mask = 0.5 if causal else 1.0
    cost = pl.CostEstimate(
        flops=int(4 * B * H * Tp * Sp * D * flops_mask),
        bytes_accessed=int(
            q.size * q.dtype.itemsize
            + (k.size + v.size) * k.dtype.itemsize * group
            + q.size * q.dtype.itemsize
        ),
        transcendentals=int(B * H * Tp * Sp * flops_mask),
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, bq),
                lambda b, h, i, j: (b, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bk),
                lambda b, h, i, j: (b, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bq, D),
                lambda b, h, i, j: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bk, D),
                lambda b, h, i, j, g=group: (b, h // g, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bk, D),
                lambda b, h, i, j, g=group: (b, h // g, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, D),
            lambda b, h, i, j: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(q_positions, kv_mask, q, k, v)

    out = out.transpose(0, 2, 1, 3)  # back to [B, Tp, H, D]
    if Tp != T:
        out = out[:, :T]
    return out
