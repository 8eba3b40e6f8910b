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
