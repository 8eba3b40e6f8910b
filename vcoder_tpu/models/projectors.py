"""Vision-to-LM projector heads (``mlpNx_gelu`` / ``linear`` / ``identity``).

reference: vcoder_llava/model/multimodal_projector/builder.py:33-51 and the
seg/depth adapter factories (multimodal_adapter/builder.py,
multimodal_depth_adapter/builder.py) — all three share the same shapes, so a
single parameterized module covers mm_projector, mm2_projector,
seg_mm_projector and depth_mm_projector.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from vcoder_tpu.config import projector_depth
from vcoder_tpu.ops.quant import qmatmul as qm


def init_projector_params(
    rng: jax.Array,
    projector_type: str,
    in_dim: int,
    out_dim: int,
    dtype=jnp.float32,
) -> dict:
    """Layers: in_dim -> out_dim, then out_dim -> out_dim (N-1 times),
    GELU between (matches mlpNx_gelu: Linear(in,out) + [GELU, Linear(out,out)]*(N-1))."""
    depth = projector_depth(projector_type)
    ws, bs = [], []
    for i in range(depth):
        d_in = in_dim if i == 0 else out_dim
        key = jax.random.fold_in(rng, i)
        ws.append(
            jax.random.normal(key, (d_in, out_dim), dtype)
            * jnp.asarray(0.02, dtype)
        )
        bs.append(jnp.zeros((out_dim,), dtype))
    return {"w": ws, "b": bs}


def apply_projector(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """GELU (erf-exact, matching torch nn.GELU default) between layers."""
    ws: List[jnp.ndarray] = params["w"]
    bs: List[jnp.ndarray] = params["b"]
    if not ws:  # identity
        return x
    for i, (w, b) in enumerate(zip(ws, bs)):
        if i > 0:
            x = jax.nn.gelu(x, approximate=False)
        x = qm(x, w) + b
    return x
