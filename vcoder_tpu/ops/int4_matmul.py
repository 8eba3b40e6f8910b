"""Fused int4 (nibble-packed) matmul kernel for decode-sized batches.

The packed-int4 storage (ops/quant.py) holds two signed nibbles per int8
byte. The XLA routes measured on hardware (7B decode B=1):

* stack+reshape unpack: 10.1 tok/s — XLA materializes the unpacked copy
  in HBM (3x the int8 traffic).
* nibble-split two-dot form (x_even @ lo + x_odd @ hi, shifts fused into
  the operand reads): 57.6 tok/s — the packed bytes stream from HBM
  TWICE (once per dot), i.e. int8-equivalent traffic.

This kernel reads each packed byte ONCE: the grid walks output-column
blocks, each step DMAs a [K/2, Nb] packed block into VMEM, sign-extends
both nibbles on the VPU in-register, and runs the two MXU dots against
the even/odd activation rows. Traffic = true int4 bytes; the remaining
ceiling is VPU unpack throughput. Weight-only decode path; prefill-sized
token counts take the W8A8 int8-MXU route instead (ops/quant.py).

Reference parity point: bitsandbytes NF4 serving
(/root/reference/vcoder_llava/model/builder.py:30-38) — the reference
runs 4-bit via CUDA kernels; this is the TPU analog.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Sublane tiling: int8 VMEM tiles are (32, 128); f32/bf16 are (8, 128).
_LANES = 128
_SUB_I8 = 32


def _pick_nb(k_half: int, n: int, vmem_budget: int = 2 * 1024 * 1024) -> int:
    """Largest 128-multiple output-block width dividing n whose packed
    [k_half, nb] block fits the VMEM budget (double-buffered by pallas)."""
    nb = max(_LANES, min(512, (vmem_budget // max(k_half, 1)) // _LANES * _LANES))
    while nb > _LANES and n % nb:
        nb -= _LANES
    return nb if n % nb == 0 else _LANES


def _kernel(xe_ref, xo_ref, qp_ref, o_ref):
    qp = qp_ref[...].astype(jnp.int32)  # sign-extends the byte
    lo = jnp.right_shift(jnp.left_shift(qp, 28), 28)  # low nibble, signed
    hi = jnp.right_shift(qp, 4)  # high nibble (byte already sign-extended)
    acc = jnp.dot(
        xe_ref[...], lo.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    acc += jnp.dot(
        xo_ref[...], hi.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matmul(x: jnp.ndarray, qp: jnp.ndarray, *, interpret: bool = False):
    """``x @ unpack(qp)`` reading the packed bytes once.

    x: [B, K] float (B small — decode); qp: [K//2, N] packed int8.
    Returns [B, N] in x.dtype (f32 accumulation). Scale epilogue is the
    caller's (it fuses into the surrounding graph).
    """
    B, K = x.shape
    k_half, N = qp.shape
    assert K == 2 * k_half, (x.shape, qp.shape)
    xe = x[:, 0::2].astype(jnp.bfloat16)  # pairs with low nibbles
    xo = x[:, 1::2].astype(jnp.bfloat16)
    # Mosaic wants >=8 sublanes on the f32/bf16 operands.
    Bp = -(-B // 8) * 8
    if Bp != B:
        pad = ((0, Bp - B), (0, 0))
        xe = jnp.pad(xe, pad)
        xo = jnp.pad(xo, pad)
    nb = _pick_nb(k_half, N)
    out = pl.pallas_call(
        _kernel,
        grid=(N // nb,),
        in_specs=[
            pl.BlockSpec((Bp, k_half), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, k_half), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_half, nb), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bp, nb), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, N), x.dtype),
        interpret=interpret,
    )(xe, xo, qp)
    return out[:B]


def int4_matmul_supported(k: int, n: int) -> bool:
    """Shapes the kernel's tiling handles: even K with K//2 a sublane
    multiple, N a lane multiple (all decoder/vision matmul dims are)."""
    return k % (2 * _SUB_I8) == 0 and n % _LANES == 0
