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
import math
import os

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class QuantizedTensor:
    """q: [..., in, out] int8, or int4 packed two-per-byte along the
    input axis ([..., in//2, out] int8, ``bits == 4``); scale:
    [..., 1, out] f32.

    int4 uses NIBBLE-PACKED int8 storage, never ``jnp.int4`` arrays: on
    the tunneled TPU backend a ``jnp.int4`` jit entry argument dies in a
    device_put/relayout recursion (upstream bug, reproduced round 4 with
    a 4-line jit), and packed bytes are also what a Pallas unpack kernel
    would want. Row 2i lives in the low nibble, row 2i+1 in the high."""

    q: jnp.ndarray
    scale: jnp.ndarray
    bits: int = 8

    @property
    def shape(self):
        """LOGICAL [..., in, out] shape (unpacked for int4)."""
        if self.bits == 4:
            return (
                *self.q.shape[:-2],
                self.q.shape[-2] * 2,
                self.q.shape[-1],
            )
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim


jax.tree_util.register_dataclass(
    QuantizedTensor, data_fields=["q", "scale"], meta_fields=["bits"]
)


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """[..., in, out] int8 nibble values in [-8, 7] -> [..., in//2, out]
    packed bytes (row 2i -> low nibble, row 2i+1 -> high nibble)."""
    lo = q[..., 0::2, :]
    hi = q[..., 1::2, :]
    return ((lo & 0x0F) | (hi << 4)).astype(jnp.int8)


def unpack_int4(qp: jnp.ndarray) -> jnp.ndarray:
    """Packed [..., in//2, out] bytes -> [..., in, out] int8 values.
    Arithmetic shifts sign-extend the nibbles."""
    lo = jnp.right_shift(jnp.left_shift(qp, 4), 4)
    hi = jnp.right_shift(qp, 4)
    w = jnp.stack([lo, hi], axis=-2)  # [..., in//2, 2, out]
    return w.reshape(*qp.shape[:-2], qp.shape[-2] * 2, qp.shape[-1])


def quantize(w: jnp.ndarray, bits: int = 8) -> QuantizedTensor:
    """Symmetric per-output-channel quantization over the input axis."""
    if bits == 8:
        qmax = 127.0
    elif bits == 4:
        qmax = 7.0
    else:
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / qmax
    q = jnp.clip(jnp.round(w32 / scale), -qmax, qmax).astype(jnp.int8)
    if bits == 4:
        if w.shape[-2] % 2:
            raise ValueError(
                f"int4 packing needs an even input dim, got {w.shape}"
            )
        return QuantizedTensor(q=pack_int4(q), scale=scale, bits=4)
    return QuantizedTensor(q=q, scale=scale)


def dequantize(w: QuantizedTensor, dtype=jnp.float32) -> jnp.ndarray:
    q = unpack_int4(w.q) if w.bits == 4 else w.q
    return (q.astype(jnp.float32) * w.scale).astype(dtype)


def base_weight_dtype(w):
    """Effective storage dtype of a weight leaf, unwrapping LoraWeight
    and QuantizedTensor (a LoRA adapter over an int8 base is int8; a
    plain or LoRA-wrapped bf16 matrix is bf16; a packed int4 tensor
    reports jnp.int4 even though its storage bytes are int8). Callers
    use this to pick execution strategies that depend on whether the
    stacked projections are quantized (e.g. fused-loop vs unrolled
    decode windows)."""
    while type(w).__name__ in ("LoraWeight", "MultiLoraWeight"):
        w = w.base
    if isinstance(w, QuantizedTensor):
        return jnp.int4 if w.bits == 4 else w.q.dtype
    return w.dtype


# ---------------------------------------------------------------------------
# W8A8 prefill: int8 activations x int8 weights on the int8 MXU path.
#
# The v5e MXU runs dot(s8, s8) -> s32 at ~2x the bf16 rate (measured
# 391.8 vs 195.1 TFLOP/s at M=1792 K=5120 N=13824 — scripts/
# bench_int8_matmul.py; round 3 recorded this path as *slower* than
# bf16, but that number was fetch-dominated tunnel noise). For
# compute-bound token counts we therefore quantize activations
# per-token (dynamic symmetric int8) and keep the whole matmul in
# integers; the f32 rescale (row scale x per-output-channel weight
# scale) fuses into the epilogue. Below the threshold (decode,
# speculative verify windows) the weight-streaming upcast path stays —
# those are HBM-bound, and per-token quant would only add VPU work.
# ---------------------------------------------------------------------------

#: Minimum token count (product of leading dims) for the W8A8 path.
#: Measured crossover is well below this (the s8s8 dot wins from
#: M~256 up), but small-T callers are memory-bound anyway.
W8A8_MIN_TOKENS = 256

_W8A8_ENABLED = os.environ.get("VCODER_W8A8_PREFILL", "1") != "0"

#: Fused Pallas int4 matmul (ops/int4_matmul.py) vs the XLA nibble-split
#: two-dot form. Hardware A/B at 7B decode: statistically even at B=1
#: (57.8 vs 57.6 tok/s), split slightly ahead at B=4 (294 vs 278) — both
#: are VPU-unpack-bound, and Mosaic cannot lower int8-lane shifts or s8
#: pallas dots (remote-compile crash) that would lift that ceiling. The
#: kernel reads HALF the HBM bytes, which matters when weight traffic
#: competes with big KV pools (the 13B B=16 capacity case).
_INT4_KERNEL = os.environ.get("VCODER_INT4_KERNEL", "1") != "0"


def w8a8_enabled() -> bool:
    return _W8A8_ENABLED


def set_w8a8(enabled: bool) -> None:
    """Toggle the W8A8 prefill path (trace-time; re-jit to apply)."""
    global _W8A8_ENABLED
    _W8A8_ENABLED = bool(enabled)


@jax.custom_vjp
def _w8a8_matmul(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray):
    """``x @ dequant(q, scale)`` computed as s8s8->s32 on the MXU.

    x: [M, K] float; q: [K, N] int8; scale: [1, N] f32.
    Activation quantization is per-row dynamic symmetric int8.
    """
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x32 / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * xs * scale).astype(x.dtype)


def _w8a8_fwd(x, q, scale):
    # The zero-size array only carries x's dtype (dtypes themselves are
    # not valid custom_vjp residuals).
    return _w8a8_matmul(x, q, scale), (q, scale, jnp.zeros((0,), x.dtype))


def _w8a8_bwd(res, g):
    # Straight-through: treat the forward as x @ (q * scale). The round()
    # in the activation quant has zero gradient, so without this a LoRA
    # adapter trained over an int8 base would silently get dx == 0
    # through every base matmul. The matmul runs in bf16 with f32
    # accumulation — exactly what autodiff of the upcast path produces
    # (an f32 dot here is the same FLOPs at 1/4 the MXU rate).
    q, scale, xproto = res
    gs = (g.astype(jnp.float32) * scale).astype(jnp.bfloat16)
    dx = jax.lax.dot_general(
        gs,
        q.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(xproto.dtype)
    return dx, None, None


_w8a8_matmul.defvjp(_w8a8_fwd, _w8a8_bwd)


def qmatmul(x: jnp.ndarray, w) -> jnp.ndarray:
    """``x @ w`` for plain, quantized, or LoRA-wrapped weights."""
    if isinstance(w, QuantizedTensor):
        if (
            _W8A8_ENABLED
            and w.q.dtype == jnp.int8
            and w.q.ndim == 2
            and x.ndim >= 2
            and math.prod(x.shape[:-1]) >= W8A8_MIN_TOKENS
        ):
            # int4 rides the same s8s8 MXU path: unpacked nibbles are
            # int8 values in [-8, 7] (compute-bound token counts amortize
            # the unpack temp).
            q = unpack_int4(w.q) if w.bits == 4 else w.q
            x2 = x.reshape(-1, x.shape[-1])
            y = _w8a8_matmul(x2, q, w.scale)
            return y.reshape(*x.shape[:-1], q.shape[-1])
        if w.bits == 4:
            if (
                _INT4_KERNEL
                and w.q.ndim == 2
                and x.ndim >= 2
                and jax.default_backend() == "tpu"
            ):
                from vcoder_tpu.ops.int4_matmul import (
                    int4_matmul,
                    int4_matmul_supported,
                )

                K2, N = w.q.shape
                if int4_matmul_supported(2 * K2, N):
                    # Fused Pallas kernel: packed bytes stream from HBM
                    # ONCE, nibbles sign-extend on the VPU in VMEM
                    # (hardware A/B in ops/int4_matmul.py docstring).
                    x2 = x.reshape(-1, x.shape[-1])
                    y = int4_matmul(x2, w.q).reshape(*x.shape[:-1], N)
                    return y * w.scale.astype(x.dtype)
            # Split by nibble instead of unpacking: with row 2i in the
            # low nibble and row 2i+1 in the high,
            #   x @ W == x[..., 0::2] @ lo(q) + x[..., 1::2] @ hi(q).
            # The shifts are elementwise on the dot operands (no
            # stack/reshape materializing an unpacked copy), the form
            # XLA can fuse into the weight read like the int8 astype.
            lo = jnp.right_shift(jnp.left_shift(w.q, 4), 4)
            hi = jnp.right_shift(w.q, 4)
            y = (
                x[..., 0::2] @ lo.astype(x.dtype)
                + x[..., 1::2] @ hi.astype(x.dtype)
            )
            return y * w.scale.astype(x.dtype)
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
