"""Weight-only int8/int4 quantization.

TPU-native replacement for the reference's bitsandbytes 8-bit/NF4 loading
(reference: vcoder_llava/model/builder.py:28-37). Symmetric per-output-
channel scales: ``W ~= q * scale`` with the scale factored out of the
matmul, so dequantization is a fused epilogue multiply —

    x @ W  ==  (x @ q) * scale

Weights stream from HBM at 1/2 (int8) or 1/4 (int4) the bf16 byte count;
the MXU consumes them upcast in-register. NF4 double-quantization has no
TPU analog; deltas vs the CUDA path are documented in SURVEY.md §7.3.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class QuantizedTensor:
    """q: [..., in, out] int8/int4; scale: [..., 1, out] f32."""

    q: jnp.ndarray
    scale: jnp.ndarray

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim


jax.tree_util.register_dataclass(
    QuantizedTensor, data_fields=["q", "scale"], meta_fields=[]
)


def quantize(w: jnp.ndarray, bits: int = 8) -> QuantizedTensor:
    """Symmetric per-output-channel quantization over the input axis."""
    if bits == 8:
        qmax, dtype = 127.0, jnp.int8
    elif bits == 4:
        qmax, dtype = 7.0, jnp.int4
    else:
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / qmax
    q = jnp.clip(jnp.round(w32 / scale), -qmax, qmax).astype(dtype)
    return QuantizedTensor(q=q, scale=scale)


def dequantize(w: QuantizedTensor, dtype=jnp.float32) -> jnp.ndarray:
    return (w.q.astype(jnp.float32) * w.scale).astype(dtype)


def base_weight_dtype(w):
    """Effective storage dtype of a weight leaf, unwrapping LoraWeight
    and QuantizedTensor (a LoRA adapter over an int8 base is int8; a
    plain or LoRA-wrapped bf16 matrix is bf16). Callers use this to pick
    execution strategies that depend on whether the stacked projections
    are quantized (e.g. fused-loop vs unrolled decode windows)."""
    while type(w).__name__ in ("LoraWeight", "MultiLoraWeight"):
        w = w.base
    if isinstance(w, QuantizedTensor):
        return w.q.dtype
    return w.dtype


def qmatmul(x: jnp.ndarray, w) -> jnp.ndarray:
    """``x @ w`` for plain, quantized, or LoRA-wrapped weights."""
    if isinstance(w, QuantizedTensor):
        y = x @ w.q.astype(x.dtype)
        # scale is [..., 1, out]: broadcast as-is against y [..., T, out].
        # (Squeezing the 1-axis right-aligns a stacked [L, out] scale
        # against the TOKEN axis — silent corruption when T == L.)
        return y * w.scale.astype(x.dtype)
    if type(w).__name__ == "LoraWeight":  # avoid circular import
        from vcoder_tpu.lora import lora_qmatmul

        return lora_qmatmul(x, w)
    if type(w).__name__ == "MultiLoraWeight":
        from vcoder_tpu.lora import multilora_qmatmul

        return multilora_qmatmul(x, w)
    return x @ w
