"""Flash-attention kernel vs the XLA oracle (interpret mode on CPU).

The Pallas kernel runs in interpreter mode here; on TPU the same code path
compiles via Mosaic (exercised by bench.py / __graft_entry__ on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcoder_tpu.ops.attention import xla_attention
from vcoder_tpu.ops.flash_attention import flash_attention


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


def _check(q, k, v, *, causal, q_positions=None, kv_mask=None, atol=2e-5):
    ref = xla_attention(
        q, k, v, causal=causal, q_positions=q_positions, kv_mask=kv_mask
    )
    out = flash_attention(
        q,
        k,
        v,
        causal=causal,
        q_positions=q_positions,
        kv_mask=kv_mask,
        block_q=128,
        block_k=128,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=atol, rtol=1e-4
    )


def test_bidirectional_self_attention():
    # CLIP-like: 577 tokens (not block-aligned), head_dim 64.
    q = _rand(0, (2, 130, 4, 64))
    k = _rand(1, (2, 130, 4, 64))
    v = _rand(2, (2, 130, 4, 64))
    _check(q, k, v, causal=False)


def test_causal_self_attention():
    q = _rand(3, (2, 256, 4, 32))
    k = _rand(4, (2, 256, 4, 32))
    v = _rand(5, (2, 256, 4, 32))
    _check(q, k, v, causal=True)


def test_causal_unaligned_with_padding_mask():
    B, T = 2, 200
    q = _rand(6, (B, T, 2, 32))
    k = _rand(7, (B, T, 2, 32))
    v = _rand(8, (B, T, 2, 32))
    lens = jnp.array([150, 200])
    kv_mask = jnp.arange(T)[None, :] < lens[:, None]
    q_positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    _check(q, k, v, causal=True, q_positions=q_positions, kv_mask=kv_mask)


def test_gqa_grouped_kv_heads():
    q = _rand(9, (1, 128, 8, 32))
    k = _rand(10, (1, 128, 2, 32))
    v = _rand(11, (1, 128, 2, 32))
    _check(q, k, v, causal=True)


def test_kv_cache_cross_attention():
    # Prefill against a larger (partially unwritten) cache: T < S.
    B, T, S = 2, 128, 384
    q = _rand(12, (B, T, 4, 32))
    k = _rand(13, (B, S, 4, 32))
    v = _rand(14, (B, S, 4, 32))
    lens = jnp.array([100, 128])
    kv_mask = jnp.arange(S)[None, :] < lens[:, None]
    q_positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    _check(q, k, v, causal=True, q_positions=q_positions, kv_mask=kv_mask)


def test_fully_masked_rows_are_zero_not_nan():
    B, T = 1, 128
    q = _rand(15, (B, T, 2, 32))
    k = _rand(16, (B, T, 2, 32))
    v = _rand(17, (B, T, 2, 32))
    kv_mask = jnp.zeros((B, T), bool)
    out = flash_attention(
        q, k, v, causal=False, kv_mask=kv_mask, interpret=True
    )
    assert not np.any(np.isnan(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), 0.0)


def _grad_check(q, k, v, *, causal, q_positions=None, kv_mask=None,
                atol=3e-4):
    def loss_flash(q, k, v):
        o = flash_attention(
            q, k, v, causal=causal, q_positions=q_positions,
            kv_mask=kv_mask, block_q=128, block_k=128, interpret=True,
        )
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        o = xla_attention(
            q, k, v, causal=causal, q_positions=q_positions,
            kv_mask=kv_mask,
        )
        return jnp.sum(jnp.sin(o))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=atol, rtol=1e-3,
            err_msg=f"d{name}",
        )


def test_backward_causal():
    q = _rand(30, (2, 256, 2, 32))
    k = _rand(31, (2, 256, 2, 32))
    v = _rand(32, (2, 256, 2, 32))
    _grad_check(q, k, v, causal=True)


def test_backward_bidirectional_unaligned():
    q = _rand(33, (1, 130, 2, 64))
    k = _rand(34, (1, 130, 2, 64))
    v = _rand(35, (1, 130, 2, 64))
    _grad_check(q, k, v, causal=False)


def test_backward_gqa_grouped_kv_heads():
    # dK/dV must SUM over the 4 query heads sharing each KV head.
    q = _rand(40, (2, 256, 8, 32))
    k = _rand(41, (2, 256, 2, 32))
    v = _rand(42, (2, 256, 2, 32))
    _grad_check(q, k, v, causal=True)


def test_backward_gqa_ragged_bidirectional():
    B, T = 2, 200
    q = _rand(43, (B, T, 6, 32))
    k = _rand(44, (B, T, 3, 32))
    v = _rand(45, (B, T, 3, 32))
    lens = jnp.array([130, 200])
    kv_mask = jnp.arange(T)[None, :] < lens[:, None]
    _grad_check(q, k, v, causal=False, kv_mask=kv_mask)


def test_backward_with_ragged_mask():
    import jax.numpy as jnp

    B, T = 2, 200
    q = _rand(36, (B, T, 2, 32))
    k = _rand(37, (B, T, 2, 32))
    v = _rand(38, (B, T, 2, 32))
    lens = jnp.array([150, 200])
    kv_mask = jnp.arange(T)[None, :] < lens[:, None]
    q_positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    _grad_check(
        q, k, v, causal=True, q_positions=q_positions, kv_mask=kv_mask
    )


def test_bfloat16_inputs():
    q = _rand(18, (1, 256, 4, 64)).astype(jnp.bfloat16)
    k = _rand(19, (1, 256, 4, 64)).astype(jnp.bfloat16)
    v = _rand(20, (1, 256, 4, 64)).astype(jnp.bfloat16)
    ref = xla_attention(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(ref, np.float32),
        atol=0.06,
        rtol=0.05,
    )


# ---------------------------------------------------------------------------
# Triangular pair grid (bounded_positions): the causal forward skips
# above-diagonal (q block, KV block) pairs entirely. Auto-enabled when
# q_positions is None; explicit positions need bounded_positions=True.
# ---------------------------------------------------------------------------


def _check_diag(q, k, v, *, q_positions=None, kv_mask=None, atol=2e-5):
    """Diag route vs the XLA oracle AND vs the forced-rectangular grid."""
    from vcoder_tpu.ops import flash_attention as fa

    ref = xla_attention(
        q, k, v, causal=True, q_positions=q_positions, kv_mask=kv_mask
    )
    out = flash_attention(
        q, k, v, causal=True, q_positions=q_positions, kv_mask=kv_mask,
        block_q=128, block_k=128, interpret=True, bounded_positions=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=atol, rtol=1e-4
    )
    fa.FORCE_RECT = True
    jax.clear_caches()
    try:
        rect = flash_attention(
            q, k, v, causal=True, q_positions=q_positions,
            kv_mask=kv_mask, block_q=128, block_k=128, interpret=True,
            bounded_positions=True,
        )
    finally:
        fa.FORCE_RECT = False
        jax.clear_caches()
    # The two grids run identical per-block arithmetic in the same order —
    # the diag route only skips blocks whose contribution is exactly zero —
    # so in interpret mode the outputs must match bit-for-bit.
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(rect),
        err_msg="diag grid disagrees with rectangular grid",
    )


def test_diag_explicit_bounded_positions_ragged():
    # Right-padded ragged batch: pos[b, t] = t <= (S - T) + t holds.
    B, T = 2, 300  # 300 pads to 384 with bq=128 — padded q rows too
    q = _rand(50, (B, T, 2, 32))
    k = _rand(51, (B, T, 2, 32))
    v = _rand(52, (B, T, 2, 32))
    lens = jnp.array([180, 300])
    kv_mask = jnp.arange(T)[None, :] < lens[:, None]
    q_positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    _check_diag(q, k, v, q_positions=q_positions, kv_mask=kv_mask)


def test_diag_cache_prefill_t_lt_s():
    # Chunked prefill against a larger cache: T < S, offset diagonal.
    B, T, S = 2, 128, 384
    q = _rand(53, (B, T, 4, 32))
    k = _rand(54, (B, S, 4, 32))
    v = _rand(55, (B, S, 4, 32))
    # Queries continue positions S-T..S-1 (the tightest bound).
    q_positions = jnp.broadcast_to(
        jnp.arange(T)[None, :] + (S - T), (B, T)
    )
    _check_diag(q, k, v, q_positions=q_positions)


def test_diag_gqa_unaligned():
    q = _rand(56, (1, 200, 8, 32))
    k = _rand(57, (1, 200, 2, 32))
    v = _rand(58, (1, 200, 2, 32))
    _check_diag(q, k, v)


def test_diag_backward_matches_oracle():
    # Forward on the pair grid, backward on the rectangular grid — the
    # custom_vjp residuals must line up across the two grids.
    B, T = 2, 256
    q = _rand(59, (B, T, 2, 32))
    k = _rand(60, (B, T, 2, 32))
    v = _rand(61, (B, T, 2, 32))
    lens = jnp.array([200, 256])
    kv_mask = jnp.arange(T)[None, :] < lens[:, None]
    q_positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))

    def loss_flash(q, k, v):
        o = flash_attention(
            q, k, v, causal=True, q_positions=q_positions,
            kv_mask=kv_mask, block_q=128, block_k=128, interpret=True,
            bounded_positions=True,
        )
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        o = xla_attention(
            q, k, v, causal=True, q_positions=q_positions, kv_mask=kv_mask
        )
        return jnp.sum(jnp.sin(o))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=1e-3,
            err_msg=f"d{name}",
        )
