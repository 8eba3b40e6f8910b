"""Fused flash-attention Pallas TPU kernels (forward + backward).

Replaces the reference's external CUDA flash-attn dependency (reference:
vcoder_llava/train/llama_flash_attn_monkey_patch.py:79-91 uses
``flash_attn_unpadded_qkvpacked_func``) with TPU-native online-softmax
kernels:

* Forward grid ``(B, H, num_q_blocks, num_k_blocks)`` — the KV-block axis
  is the innermost (sequential) grid dimension, so the running
  max/sum/accumulator live in VMEM scratch across KV steps. The kernel also
  emits the per-row log-sum-exp residual for the backward pass.
* Backward is two kernels (flash-attention-2 style): dQ over
  ``(B, H, nq, nk)`` and dK/dV over ``(B, KH, nk, group*nq)``, each
  recomputing the probability block from Q/K and the saved LSE — O(T)
  memory, no materialized attention matrix. Wired as ``jax.custom_vjp``.
  GQA (grouped KV heads) is supported end-to-end: the dK/dV grid fuses
  (query-head-in-group, q-block) into its innermost sequential dimension
  so the VMEM accumulator sums each KV head's gradient over all of its
  query heads.
* Causality is *position-based*: queries carry absolute positions
  (``q_positions``), so the same kernel serves ragged right-padded prefill
  batches and KV-cache attention where T != S. ``kv_mask`` handles
  padded/unwritten cache slots; fully-masked rows produce 0, never NaN.
* Scalar row statistics (LSE, the dO·O delta) travel as ``[..., 8]``
  lane-broadcast tensors so every block meets the (8, 128) tiling rule.

Decode steps (T == 1) dispatch to the XLA matvec path in
:func:`vcoder_tpu.ops.attention.multi_head_attention`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 8  # row-stat lane padding

# Trace-time bench knob: force every block down the masked slow path so the
# clean-block fast path can be A/B'd on hardware (scripts/bench_flash.py
# flips it and jax.clear_caches() to retrace). Never set in production.
FORCE_MASKED = False

# Trace-time bench knob: force the causal forward onto the rectangular
# (B, H, nq, nk) grid even when the triangular pair grid is eligible, so
# the dead above-diagonal steps can be A/B'd on hardware. Never set in
# production.
FORCE_RECT = False


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _pick_block(n: int, max_block: int) -> int:
    """Largest block size <= max_block that minimizes sequence padding.

    A fixed 512 block pads CLIP's 577 tokens to 1024 (+77% wasted MACs)
    and a 1280-token prefill to 1536; trying 512/256/128 picks 128 and 256
    respectively at zero/minimal padding.
    """
    best_b, best_pad = None, None
    for b in (512, 384, 256, 128):
        if b > max_block:
            continue
        pad = _round_up(n, b) - n
        if best_pad is None or pad < best_pad:
            best_b, best_pad = b, pad
    if best_b is None:
        best_b = min(max_block, _round_up(n, 128))
    if best_b % 128 != 0:
        # A non-lane-aligned block reaches BlockSpec as-is and dies in
        # Mosaic with a tiling error far from the bad argument.
        raise ValueError(
            f"flash-attention block sizes must be multiples of 128, "
            f"got max_block={max_block}"
        )
    return best_b


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


# Finite stand-in for -inf as a row max: exp(NEG_INF - M_FLOOR) == 0 in
# f32, so masked scores vanish from p without a second where pass, while
# a fully-masked block keeps alpha/p finite (no NaN from -inf - -inf).
M_FLOOR = -1e20


def _fwd_step(
    j,  # traced int32: KV-block index of this grid step
    is_first,  # traced bool: first KV step for this q block (init)
    is_last,  # traced bool: last KV step for this q block (finalize)
    qpos_ref,  # [1, 1, bq] int32
    kmask_ref,  # [1, 1, bk] int32
    q_ref,  # [1, 1, bq, D] (pre-scaled by D**-0.5)
    k_ref,  # [1, 1, bk, D]
    v_ref,  # [1, 1, bk, D]
    o_ref,  # [1, 1, bq, D]
    lse_ref,  # [1, 1, bq, LANES] f32
    m_scr,  # [bq, 128] f32
    l_scr,  # [bq, 128] f32
    acc_scr,  # [bq, D] f32
    *,
    causal: bool,
    block_k: int,
):
    bq = q_ref.shape[2]
    bk = k_ref.shape[2]

    @pl.when(is_first)
    def _init():
        m_scr[:] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
        l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)

    q_pos = qpos_ref[0, 0, :]  # [bq]
    kmask = kmask_ref[0, 0, :]  # [bk] int32

    if causal:
        should_compute = jnp.max(q_pos) >= j * block_k
    else:
        should_compute = True

    # Blocks strictly below the causal diagonal with every KV slot valid
    # need NO mask at all — skip the iota/compare/select passes (the VPU,
    # not the MXU, bounds this kernel; 3 fewer [bq, bk] passes is ~25%).
    all_valid = jnp.min(kmask) == 1
    if causal:
        clean = all_valid & ((j + 1) * block_k - 1 <= jnp.min(q_pos))
    else:
        clean = all_valid
    if FORCE_MASKED:
        clean = jnp.bool_(False)

    def _update(s, masked: bool):
        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        if masked:
            # Keep the running max finite so exp() zeroes masked scores.
            m_new = jnp.maximum(m_new, M_FLOOR)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, 0, :, :]
        pv = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    def _scores():
        return jax.lax.dot_general(
            q_ref[0, 0, :, :],
            k_ref[0, 0, :, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(should_compute & clean)
    def _compute_clean():
        _update(_scores(), masked=False)

    @pl.when(should_compute & jnp.logical_not(clean))
    def _compute_masked():
        s = _scores()
        mask = kmask.astype(bool)[None, :]
        if causal:
            k_ids = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 1
            )
            mask = mask & (k_ids <= q_pos[:, None])
        s = jnp.where(mask, s, NEG_INF)
        _update(s, masked=True)

    @pl.when(is_last)
    def _finalize():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        # Rows that never saw a valid key carry m == NEG_INF or M_FLOOR
        # with l == 0: output 0, LSE finite garbage (unused downstream —
        # the backward recomputes p under the same mask).
        o_ref[0, 0, :, :] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        lse = m_scr[:, :1] + jnp.log(l_safe)
        lse_ref[0, 0, :, :] = jnp.broadcast_to(
            lse, (lse.shape[0], LANES)
        )


def _fwd_kernel(qpos_ref, kmask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, causal: bool, block_k: int):
    """Rectangular grid (B, H, nq, nk): the KV axis is the inner loop."""
    j = pl.program_id(3)
    nk = pl.num_programs(3)
    _fwd_step(
        j, j == 0, j == nk - 1, qpos_ref, kmask_ref, q_ref, k_ref, v_ref,
        o_ref, lse_ref, m_scr, l_scr, acc_scr,
        causal=causal, block_k=block_k,
    )


def _fwd_kernel_tri(pi_ref, pj_ref, plast_ref, qpos_ref, kmask_ref,
                    q_ref, k_ref, v_ref, o_ref, lse_ref,
                    m_scr, l_scr, acc_scr, *, block_k: int):
    """Triangular pair grid (B, H, NP): only (q block, KV block) pairs at
    or below the causal diagonal exist as grid steps. The rectangular
    causal grid spends ~40% of its steps on above-diagonal blocks that
    compute nothing but still pay the per-step DMA/pipeline overhead —
    this kernel is VPU/overhead-bound, not MXU-bound, so those dead
    steps are a measured ~25% of wall time (scripts/bench_flash.py).
    pair_i/pair_j/pair_last are scalar-prefetch tables built at trace
    time from the static diagonal; valid only under the repo's
    prefix-contiguous right-padded contract (q_pos[b, t] <= (S-T) + t),
    which the wrapper checks before routing here."""
    p = pl.program_id(2)
    j = pj_ref[p]
    _fwd_step(
        j, j == 0, plast_ref[p] == 1, qpos_ref, kmask_ref, q_ref, k_ref,
        v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
        causal=True, block_k=block_k,
    )


def _diag_pairs(Tv, Sv, Tp, Sp, bq, bk):
    """Static lower-triangle (q block, KV block) pair tables for a causal
    attention where query row t sits at absolute position (Sv-Tv) + t
    (the right-padded contract). Returns (pair_i, pair_j, pair_last)
    int32 arrays, row-major so each q block's KV steps are contiguous
    (the online-softmax scratch accumulates across them)."""
    off = Sv - Tv
    nq, nk = Tp // bq, Sp // bk
    pi, pj, plast = [], [], []
    for i in range(nq):
        # Highest KV position any valid query in block i can see.
        hi_pos = off + min((i + 1) * bq, Tv) - 1
        hi = min(max(hi_pos // bk, 0), nk - 1)
        for j in range(hi + 1):
            pi.append(i)
            pj.append(j)
            plast.append(1 if j == hi else 0)
    return (
        np.asarray(pi, np.int32),
        np.asarray(pj, np.int32),
        np.asarray(plast, np.int32),
    )


def _flash_fwd(q, k, v, q_positions, kv_mask, causal, bq, bk, interpret,
               diag=None):
    """q: [B, H, Tp, D]; k/v: [B, KH, Sp, D] (already padded/laid out).
    ``diag=(T, S)`` (unpadded) routes to the triangular pair grid — see
    _fwd_kernel_tri; the caller guarantees q_pos[b, t] <= (S-T) + t."""
    B, H, Tp, D = q.shape
    KH, Sp = k.shape[1], k.shape[2]
    group = H // KH
    # Fold the softmax scale into q: one pass over [T, D] instead of a
    # per-step multiply over every [bq, bk] score block.
    q = (q.astype(jnp.float32) * (D**-0.5)).astype(q.dtype)
    grid = (B, H, Tp // bq, Sp // bk)

    kernel = functools.partial(_fwd_kernel, causal=causal, block_k=bk)
    flops_mask = 0.5 if causal else 1.0
    cost = pl.CostEstimate(
        flops=int(4 * B * H * Tp * Sp * D * flops_mask),
        bytes_accessed=int(
            2 * q.size * q.dtype.itemsize
            + (k.size + v.size) * k.dtype.itemsize * group
        ),
        transcendentals=int(B * H * Tp * Sp * flops_mask),
    )
    if causal and diag is not None:
        pair_i, pair_j, pair_last = _diag_pairs(
            diag[0], diag[1], Tp, Sp, bq, bk
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, H, len(pair_i)),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, bq), lambda b, h, p, pi, pj, pL: (b, 0, pi[p]),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, bk), lambda b, h, p, pi, pj, pL: (b, 0, pj[p]),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, bq, D),
                    lambda b, h, p, pi, pj, pL: (b, h, pi[p], 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, bk, D),
                    lambda b, h, p, pi, pj, pL, g=group: (
                        b, h // g, pj[p], 0
                    ),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, bk, D),
                    lambda b, h, p, pi, pj, pL, g=group: (
                        b, h // g, pj[p], 0
                    ),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, 1, bq, D),
                    lambda b, h, p, pi, pj, pL: (b, h, pi[p], 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, bq, LANES),
                    lambda b, h, p, pi, pj, pL: (b, h, pi[p], 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
        )
        out, lse = pl.pallas_call(
            functools.partial(_fwd_kernel_tri, block_k=bk),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
                jax.ShapeDtypeStruct((B, H, Tp, LANES), jnp.float32),
            ],
            cost_estimate=cost,
            interpret=interpret,
        )(pair_i, pair_j, pair_last, q_positions, kv_mask, q, k, v)
        return out, lse
    out, lse = pl.pallas_call(
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
        out_specs=[
            pl.BlockSpec(
                (1, 1, bq, D),
                lambda b, h, i, j: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bq, LANES),
                lambda b, h, i, j: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tp, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(q_positions, kv_mask, q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _recompute_p(q, k, lse, mask, q_pos, j, bk, scale, causal):
    """Rebuild the probability block from saved LSE. Shapes: q [bq, D],
    k [bk, D], lse [bq, 1] f32, mask [1/bq, bk] bool.

    Scores must match the FORWARD's computation exactly: _flash_fwd
    folds the softmax scale into q and rounds back to q.dtype BEFORE the
    dot, so the recompute does the same — scaling after the dot would
    push the bf16 rounding delta through exp() as a systematic
    normalization bias in every gradient (p rows would not sum to 1
    under the saved LSE).

    ``mask=None`` is the clean-block fast path (every KV slot valid and,
    for causal, the block strictly below the diagonal): skips the
    iota/compare and both where passes, same as the forward's
    _compute_clean — this kernel is VPU-bound, not MXU-bound."""
    bq = q.shape[0]
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    s = jax.lax.dot_general(
        qs,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if mask is None:
        return jnp.exp(s - lse)
    if causal:
        k_ids = j * bk + jax.lax.broadcasted_iota(
            jnp.int32, (bq, k.shape[0]), 1
        )
        mask = mask & (k_ids <= q_pos[:, None])
    p = jnp.exp(jnp.where(mask, s, NEG_INF) - lse)
    return jnp.where(mask, p, 0.0)


def _bwd_dq_kernel(
    qpos_ref, kmask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dq_scr,
    *, scale, causal, block_k,
):
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros(dq_scr.shape, jnp.float32)

    q_pos = qpos_ref[0, 0, :]
    kmask = kmask_ref[0, 0, :]
    should = jnp.max(q_pos) >= j * block_k if causal else True
    all_valid = jnp.min(kmask) == 1
    if causal:
        clean = all_valid & ((j + 1) * block_k - 1 <= jnp.min(q_pos))
    else:
        clean = all_valid
    if FORCE_MASKED:
        clean = jnp.bool_(False)

    def _compute(masked: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, :, :1]
        delta = delta_ref[0, 0, :, :1]
        mask = kmask.astype(bool)[None, :] if masked else None
        p = _recompute_p(q, k, lse, mask, q_pos, j, block_k, scale, causal)
        dp = jax.lax.dot_general(
            do, v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dq_scr[:] += scale * jax.lax.dot_general(
            ds.astype(k.dtype), k,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(should & clean)
    def _compute_clean():
        _compute(masked=False)

    @pl.when(should & jnp.logical_not(clean))
    def _compute_masked():
        _compute(masked=True)

    @pl.when(j == nk - 1)
    def _finalize():
        dq_ref[0, 0, :, :] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    qpos_ref, kmask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale, causal, block_k,
):
    j = pl.program_id(2)  # kv block
    i = pl.program_id(3)  # q block (inner loop)
    ni = pl.num_programs(3)

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros(dk_scr.shape, jnp.float32)
        dv_scr[:] = jnp.zeros(dv_scr.shape, jnp.float32)

    q_pos = qpos_ref[0, 0, :]
    kmask = kmask_ref[0, 0, :]
    should = jnp.max(q_pos) >= j * block_k if causal else True
    all_valid = jnp.min(kmask) == 1
    if causal:
        clean = all_valid & ((j + 1) * block_k - 1 <= jnp.min(q_pos))
    else:
        clean = all_valid
    if FORCE_MASKED:
        clean = jnp.bool_(False)

    def _compute(masked: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, :, :1]
        delta = delta_ref[0, 0, :, :1]
        mask = kmask.astype(bool)[None, :] if masked else None
        p = _recompute_p(q, k, lse, mask, q_pos, j, block_k, scale, causal)
        # dV += P^T dO
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        # dK += dS^T Q
        dk_scr[:] += scale * jax.lax.dot_general(
            ds.astype(q.dtype), q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(should & clean)
    def _compute_clean():
        _compute(masked=False)

    @pl.when(should & jnp.logical_not(clean))
    def _compute_masked():
        _compute(masked=True)

    @pl.when(i == ni - 1)
    def _finalize():
        dk_ref[0, 0, :, :] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0, :, :] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, q_positions, kv_mask, out, lse, g,
               causal, bq, bk, interpret):
    B, H, Tp, D = q.shape
    KH, Sp = k.shape[1], k.shape[2]
    group = H // KH
    scale = D**-0.5

    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # [B, H, Tp]
    delta = jnp.broadcast_to(delta[..., None], (B, H, Tp, LANES))

    qpos_spec = pl.BlockSpec(
        (1, 1, bq), lambda b, h, x, y: (b, 0, x), memory_space=pltpu.VMEM
    )
    # dq grid: x = q block (i), y = kv block (j)
    dq_specs = dict(
        kmask=pl.BlockSpec(
            (1, 1, bk), lambda b, h, i, j: (b, 0, j),
            memory_space=pltpu.VMEM,
        ),
        q=pl.BlockSpec(
            (1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
        kv=pl.BlockSpec(
            (1, 1, bk, D), lambda b, h, i, j, g=group: (b, h // g, j, 0),
            memory_space=pltpu.VMEM,
        ),
        row=pl.BlockSpec(
            (1, 1, bq, LANES), lambda b, h, i, j: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, causal=causal, block_k=bk
        ),
        grid=(B, H, Tp // bq, Sp // bk),
        in_specs=[
            qpos_spec, dq_specs["kmask"], dq_specs["q"], dq_specs["kv"],
            dq_specs["kv"], dq_specs["q"], dq_specs["row"], dq_specs["row"],
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        interpret=interpret,
    )(q_positions, kv_mask, q, k, v, g, lse, delta)

    # dkv grid: h = KV head, x = kv block (j), inner m fuses
    # (query-head-in-group, q block): m -> head kh*group + m // nq,
    # q block m % nq. The accumulator init/finalize fire at m == 0 /
    # m == group*nq - 1, so each KV head's dK/dV sums over all its
    # query heads — GQA without a separate reduction pass.
    nq = Tp // bq

    def _qhead(h, m):
        return h * group + m // nq

    dkv_qpos = pl.BlockSpec(
        (1, 1, bq), lambda b, h, j, m: (b, 0, m % nq),
        memory_space=pltpu.VMEM,
    )
    dkv_specs = dict(
        kmask=pl.BlockSpec(
            (1, 1, bk), lambda b, h, j, m: (b, 0, j),
            memory_space=pltpu.VMEM,
        ),
        q=pl.BlockSpec(
            (1, 1, bq, D), lambda b, h, j, m: (b, _qhead(h, m), m % nq, 0),
            memory_space=pltpu.VMEM,
        ),
        kv=pl.BlockSpec(
            (1, 1, bk, D), lambda b, h, j, m: (b, h, j, 0),
            memory_space=pltpu.VMEM,
        ),
        row=pl.BlockSpec(
            (1, 1, bq, LANES),
            lambda b, h, j, m: (b, _qhead(h, m), m % nq, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, causal=causal, block_k=bk
        ),
        grid=(B, KH, Sp // bk, group * nq),
        in_specs=[
            dkv_qpos, dkv_specs["kmask"], dkv_specs["q"], dkv_specs["kv"],
            dkv_specs["kv"], dkv_specs["q"], dkv_specs["row"],
            dkv_specs["row"],
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, bk, D), lambda b, h, j, m: (b, h, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bk, D), lambda b, h, j, m: (b, h, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, KH, Sp, D), k.dtype),
            jax.ShapeDtypeStruct((B, KH, Sp, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
        interpret=interpret,
    )(q_positions, kv_mask, q, k, v, g, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp core ([B, H, T, D] layout, pre-padded)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_core(q, k, v, q_positions, kv_mask, causal, bq, bk, interpret,
                diag):
    out, _ = _flash_fwd(
        q, k, v, q_positions, kv_mask, causal, bq, bk, interpret, diag
    )
    return out


def _flash_core_fwd(q, k, v, q_positions, kv_mask, causal, bq, bk,
                    interpret, diag):
    out, lse = _flash_fwd(
        q, k, v, q_positions, kv_mask, causal, bq, bk, interpret, diag
    )
    return out, (q, k, v, q_positions, kv_mask, out, lse)


def _flash_core_bwd(causal, bq, bk, interpret, diag, res, g):
    q, k, v, q_positions, kv_mask, out, lse = res
    dq, dk, dv = _flash_bwd(
        q, k, v, q_positions, kv_mask, out, lse, g,
        causal, bq, bk, interpret,
    )
    return dq, dk, dv, None, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


# ---------------------------------------------------------------------------
# Public wrapper ([B, T, H, D] layout, arbitrary lengths)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "block_q", "block_k", "interpret", "bounded_positions"
    ),
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
    bounded_positions: bool = False,
) -> jnp.ndarray:
    """Flash attention; semantics identical to ops.attention.xla_attention.
    Differentiable (Pallas backward) for both MHA and GQA (KH < H).

    ``bounded_positions=True`` asserts q_positions[b, t] <= (S - T) + t
    for every valid query (the repo's prefix-contiguous right-padded
    contract — multimodal.build_splice_plan emits arange positions), which
    lets the causal forward run on the triangular pair grid (no dead
    above-diagonal steps). Auto-enabled when q_positions is None (the
    default positions ARE the bound).
    """
    B, T, H, D = q.shape
    S, KH = k.shape[1], k.shape[2]
    assert H % KH == 0, (H, KH)

    use_diag = causal and S >= T and not FORCE_RECT and (
        bounded_positions or q_positions is None
    )

    if q_positions is None:
        q_positions = jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.int32)[None, :] + (S - T), (B, T)
        )
    if kv_mask is None:
        kv_mask = jnp.ones((B, S), dtype=jnp.int32)

    bq = _pick_block(T, block_q)
    bk = _pick_block(S, block_k)
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

    # Kernel-native layout: [B, H, T, D].
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    q_positions = q_positions.astype(jnp.int32)[:, None, :]
    kv_mask = kv_mask.astype(jnp.int32)[:, None, :]

    out = _flash_core(
        q, k, v, q_positions, kv_mask, causal, bq, bk, interpret,
        (T, S) if use_diag else None,
    )
    out = out.transpose(0, 2, 1, 3)
    if Tp != T:
        out = out[:, :T]
    return out
