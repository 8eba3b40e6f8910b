"""Microbench: can Pallas reach the v5e int8 MXU rate XLA leaves behind?

docs/PERFORMANCE.md records XLA `dot(s8,s8)->s32` at 134 TFLOP/s vs
bf16 at 178 — the round-3 W8A8 dead end. The v5e MXU is rated 394 TOPS
int8, so that number says XLA never engages the int8 systolic path.
This script A/Bs, at the 13B prefill shapes (M=1792 tokens):

  1. bf16 `jnp.dot`                       (the current dequant-matmul rate)
  2. XLA  `dot(s8,s8) -> s32`             (the recorded dead end)
  3. Pallas int8 kernel, s32 accumulate   (the candidate W8A8 path)
  4. Pallas int8 kernel + fused row/col scale epilogue -> bf16

Timing per CLAUDE.md: on-device fori_loop windows, one device_get per
window (the tunnel costs ~15 ms/dispatch, ~40 ms/fetch).

    python scripts/bench_int8_matmul.py [--iters 20] [--windows 5]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_time(fn, *args, iters, windows, probe_s=0.0):
    """Median seconds per call, timed in on-device fori_loop windows.

    `probe_s` is the measured cost of an empty dispatch+fetch round trip
    (tunnel submit + blocking fetch), subtracted from each window."""
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        times.append((time.perf_counter() - t0 - probe_s) / iters)
    return float(np.median(times))


def _probe_roundtrip(windows=7):
    """Median seconds for a trivial dispatch + scalar fetch."""
    x = jnp.zeros((), jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    jax.device_get(f(x))
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        jax.device_get(f(x))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _loop(step, iters):
    @jax.jit
    def run(*args):
        def body(_, carry):
            return step(*args, carry)

        init = step(*args, None)
        out = jax.lax.fori_loop(0, iters - 1, body, init)
        # Reduce on-device: fetching the full [M, N] output through the
        # tunnel costs seconds and would swamp the matmul being timed.
        return out[::128, ::128].astype(jnp.float32).sum()

    return run


# ---- Pallas int8 matmul ----------------------------------------------------


def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, k_steps):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=jnp.int32
    )

    @pl.when(k == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _mm_scaled_kernel(a_ref, b_ref, sa_ref, sb_ref, o_ref, acc_ref, *, k_steps):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=jnp.int32
    )

    @pl.when(k == k_steps - 1)
    def _():
        scale = sa_ref[:].astype(jnp.float32) * sb_ref[:].astype(jnp.float32)
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * scale).astype(jnp.bfloat16)


def pallas_int8_mm(a, b, *, bm=256, bn=512, bk=1280, scaled=False, sa=None, sb=None):
    M, K = a.shape
    _, N = b.shape
    k_steps = K // bk
    grid = (M // bm, N // bn, k_steps)
    if scaled:
        kernel = functools.partial(_mm_scaled_kernel, k_steps=k_steps)
        out_dtype = jnp.bfloat16
        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ]
        args = (a, b, sa, sb)
    else:
        kernel = functools.partial(_mm_kernel, k_steps=k_steps)
        out_dtype = jnp.int32
        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        ]
        args = (a, b)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*args)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--M", type=int, nargs="+", default=[1792])
    ap.add_argument("--K", type=int, default=5120)
    ap.add_argument("--N", type=int, default=13824)
    args = ap.parse_args()

    for M in args.M:
        _run_shape(M, args.K, args.N, args.iters, args.windows)


def _run_shape(M, K, N, iters, windows):
    flops = 2 * M * K * N
    rng = np.random.RandomState(0)
    a8 = jnp.asarray(rng.randint(-127, 127, size=(M, K), dtype=np.int8))
    b8 = jnp.asarray(rng.randint(-127, 127, size=(K, N), dtype=np.int8))
    abf = (a8.astype(jnp.bfloat16) / 127.0)
    bbf = (b8.astype(jnp.bfloat16) / 127.0)
    sa = jnp.asarray(rng.rand(M, 1), dtype=jnp.float32)
    sb = jnp.asarray(rng.rand(1, N), dtype=jnp.float32)

    print(f"shapes M={M} K={K} N={N}  ({flops/1e12:.2f} TFLOP/call)")

    # Each variant: step(carry) reuses carry to defeat hoisting.
    def bf16_step(a, b, carry):
        if carry is not None:
            a = jax.lax.dynamic_update_slice(
                a, carry[:1, :1].astype(a.dtype), (0, 0)
            )
        return jnp.dot(a, b)

    def xla_int8_step(a, b, carry):
        if carry is not None:
            a = jax.lax.dynamic_update_slice(
                a, carry[:1, :1].astype(a.dtype), (0, 0)
            )
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    def pallas_step(a, b, carry):
        if carry is not None:
            a = jax.lax.dynamic_update_slice(
                a, carry[:1, :1].astype(a.dtype), (0, 0)
            )
        return pallas_int8_mm(a, b)

    def pallas_scaled_step(a, b, sa_, sb_, carry):
        if carry is not None:
            a = jax.lax.dynamic_update_slice(
                a, carry[:1, :1].astype(a.dtype), (0, 0)
            )
        return pallas_int8_mm(a, b, scaled=True, sa=sa_, sb=sb_)

    def w8a8_e2e_step(a, b, sb_, carry):
        # The real deployment path: bf16 activations -> per-token dynamic
        # int8 quant -> s8s8 MXU dot -> fused f32 scale epilogue -> bf16.
        if carry is not None:
            a = jax.lax.dynamic_update_slice(
                a, carry[:1, :1].astype(a.dtype), (0, 0)
            )
        amax = jnp.max(jnp.abs(a.astype(jnp.float32)), axis=-1, keepdims=True)
        xs = jnp.maximum(amax, 1e-8) / 127.0
        xq = jnp.clip(
            jnp.round(a.astype(jnp.float32) / xs), -127, 127
        ).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (acc.astype(jnp.float32) * xs * sb_).astype(jnp.bfloat16)

    # correctness first (small sanity on the real kernel output)
    ref = np.asarray(
        jax.device_get(
            jax.lax.dot_general(
                a8[:256], b8[:, :512], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        )
    )
    got = np.asarray(jax.device_get(pallas_int8_mm(a8, b8)))[:256, :512]
    np.testing.assert_array_equal(ref, got)
    print("pallas int8 kernel bit-matches XLA int8 oracle")

    probe = _probe_roundtrip()
    print(f"tunnel round trip (subtracted per window): {probe*1e3:.1f} ms")

    for name, fn, fargs in [
        ("bf16  jnp.dot        ", bf16_step, (abf, bbf)),
        ("XLA   s8s8->s32      ", xla_int8_step, (a8, b8)),
        ("Pallas s8s8->s32     ", pallas_step, (a8, b8)),
        ("Pallas s8s8+scale    ", pallas_scaled_step, (a8, b8, sa, sb)),
        ("W8A8 e2e (XLA, bf16->)", w8a8_e2e_step, (abf, b8, sb)),
    ]:
        run = _loop(fn, iters)
        try:
            jax.device_get(run(*fargs))  # compile + warm
            sec = _window_time(
                run, *fargs,
                iters=iters, windows=windows, probe_s=probe,
            )
            print(f"{name}: {sec*1e3:8.3f} ms  {flops/sec/1e12:7.1f} TFLOP/s")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
