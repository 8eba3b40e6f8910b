"""shard_map'd flash attention over the 8-device CPU mesh (interpret
mode) vs the XLA oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from vcoder_tpu.ops.attention import sharded_flash_attention, xla_attention
from vcoder_tpu.parallel import make_mesh


def test_sharded_flash_matches_oracle():
    mesh = make_mesh(jax.devices(), data=2, fsdp=2, model=2)
    B, T, H, D = 4, 128, 4, 32
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D))
    lens = jnp.array([100, 128, 80, 64])
    kv_mask = jnp.arange(T)[None, :] < lens[:, None]
    qpos = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))

    out = sharded_flash_attention(
        q, k, v, mesh, causal=True, q_positions=qpos, kv_mask=kv_mask,
        interpret=True,
    )
    ref = xla_attention(
        q, k, v, causal=True, q_positions=qpos, kv_mask=kv_mask
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4
    )


def test_sharded_returns_none_on_indivisible():
    mesh = make_mesh(jax.devices(), data=2, fsdp=2, model=2)
    q = jax.random.normal(jax.random.PRNGKey(0), (3, 128, 4, 32))
    out = sharded_flash_attention(q, q, q, mesh, causal=False)
    assert out is None  # batch 3 not divisible by 4


def test_sharded_flash_gqa_matches_oracle():
    """Grouped KV heads under model-axis sharding: q heads 4, kv heads 2
    over model=2 leaves each shard with 2 q heads sharing 1 kv head — the
    geometry every 7B+GQA serving config hits (round-3 VERDICT #7)."""
    mesh = make_mesh(jax.devices(), data=2, fsdp=2, model=2)
    B, T, H, KH, D = 4, 128, 4, 2, 32
    q = jax.random.normal(jax.random.PRNGKey(3), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(4), (B, T, KH, D))
    v = jax.random.normal(jax.random.PRNGKey(5), (B, T, KH, D))
    lens = jnp.array([100, 128, 80, 64])
    kv_mask = jnp.arange(T)[None, :] < lens[:, None]
    qpos = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))

    out = sharded_flash_attention(
        q, k, v, mesh, causal=True, q_positions=qpos, kv_mask=kv_mask,
        interpret=True,
    )
    ref = xla_attention(
        q, k, v, causal=True, q_positions=qpos, kv_mask=kv_mask
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4
    )


def test_sharded_flash_gqa_indivisible_kv_heads():
    """kv_heads=3 doesn't divide model=2: must decline (None), not shard
    the group boundary."""
    mesh = make_mesh(jax.devices(), data=2, fsdp=2, model=2)
    q = jax.random.normal(jax.random.PRNGKey(6), (4, 128, 6, 32))
    k = jax.random.normal(jax.random.PRNGKey(7), (4, 128, 3, 32))
    out = sharded_flash_attention(q, k, k, mesh, causal=False)
    assert out is None
