"""LoRA: low-rank adapters as weight wrappers.

Replaces the reference's PEFT integration (reference: train/train.py
LoRA args + find_all_linear_names:167-180, model/builder.py:44-81 LoRA
merge path, scripts/merge_lora_weights.py) with a pytree-native design:
a :class:`LoraWeight` wraps any matmul leaf; ``qmatmul`` computes
``x @ W + scale * (x @ A) @ B`` without ever materializing the merged
matrix, so the frozen base can stay int8-quantized underneath. Training
masks target the ``a``/``b`` leaves (stage ``lora`` / ``it_lora``).

``merge_lora`` folds adapters back into plain weights for serving — the
analog of PEFT ``merge_and_unload``.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

from vcoder_tpu.ops.quant import QuantizedTensor, dequantize
from vcoder_tpu.parallel.sharding import _path_str

# The reference LoRA-targets every linear in the LM
# (find_all_linear_names skips mm projector / lm_head / vision tower).
DEFAULT_TARGETS = [
    r"^lm/layers/[qkv]_proj$",
    r"^lm/layers/o_proj$",
    r"^lm/layers/(gate|up|down)_proj$",
]


@dataclasses.dataclass
class LoraWeight:
    """base: [..., in, out] (plain or quantized); a: [..., in, r];
    b: [..., r, out]; scale = alpha / r (static)."""

    base: Any
    a: jnp.ndarray
    b: jnp.ndarray
    scale: float

    @property
    def shape(self):
        return self.base.shape

    @property
    def ndim(self):
        return self.base.ndim


jax.tree_util.register_dataclass(
    LoraWeight, data_fields=["base", "a", "b"], meta_fields=["scale"]
)


def add_lora(
    params: Any,
    rng: jax.Array,
    *,
    rank: int = 128,
    alpha: float = 256.0,
    targets: Sequence[str] = tuple(DEFAULT_TARGETS),
    dtype=None,
) -> Any:
    """Wrap matching weight leaves with fresh LoRA adapters.

    A is kaiming-ish normal, B zero (standard LoRA init: adapters start
    as identity). Defaults mirror scripts/v1_5/finetune_lora.sh
    (lora_r 128, lora_alpha 256).
    """
    patterns = [re.compile(p) for p in targets]
    counter = [0]

    def leaf(path, x):
        s = _path_str(path)
        if not any(p.match(s) for p in patterns):
            return x
        if isinstance(x, LoraWeight):
            return x
        shape = x.shape
        in_dim, out_dim = shape[-2], shape[-1]
        lead = shape[:-2]
        key = jax.random.fold_in(rng, counter[0])
        counter[0] += 1
        if dtype is not None:
            dt = dtype
        elif isinstance(x, QuantizedTensor):
            dt = jnp.bfloat16  # adapters can't train in the base's int8
        else:
            dt = x.dtype
        a = jax.random.normal(key, lead + (in_dim, rank), dt) * jnp.asarray(
            in_dim**-0.5, dt
        )
        b = jnp.zeros(lead + (rank, out_dim), dt)
        return LoraWeight(base=x, a=a, b=b, scale=float(alpha) / rank)

    return jax.tree_util.tree_map_with_path(
        leaf, params, is_leaf=lambda x: isinstance(x, QuantizedTensor)
    )


def merge_lora(params: Any) -> Any:
    """Fold every LoraWeight into a plain dense weight (serving path;
    analog of PEFT merge_and_unload, scripts/merge_lora_weights.py)."""

    def leaf(x):
        if not isinstance(x, LoraWeight):
            return x
        base = x.base
        if isinstance(base, QuantizedTensor):
            base = dequantize(base, dtype=x.a.dtype)
        delta = jnp.einsum(
            "...ir,...ro->...io", x.a.astype(jnp.float32),
            x.b.astype(jnp.float32),
        ) * x.scale
        return (base.astype(jnp.float32) + delta).astype(base.dtype)

    return jax.tree.map(
        leaf, params, is_leaf=lambda x: isinstance(x, (LoraWeight,))
    )


def lora_qmatmul(x: jnp.ndarray, w: LoraWeight) -> jnp.ndarray:
    """x @ W_eff without materializing the merged matrix."""
    from vcoder_tpu.ops.quant import qmatmul

    y = qmatmul(x, w.base)
    lo = (x @ w.a.astype(x.dtype)) @ w.b.astype(x.dtype)
    return y + jnp.asarray(w.scale, x.dtype) * lo
