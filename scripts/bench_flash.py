"""Flash-attention clean-block A/B bench: fast path vs forced-masked.

The fwd/bwd kernels skip the iota/compare/where mask passes on blocks
that are fully valid and (for causal) strictly below the diagonal
(flash_attention.py `clean`). The forward A/B was measured in round 2
(~25% of a mask-bound kernel is VPU mask work); this script measures the
BACKWARD on hardware — it recomputes p, so the win applies to 3 kernels
per train step. Run on the real chip:

    python scripts/bench_flash.py

Flips `flash_attention.FORCE_MASKED` (a trace-time knob) between
variants and `jax.clear_caches()` to retrace; timing methodology is
bench.py's probe-corrected pipelined windows (tunnel RTT subtracted).

`python scripts/bench_flash.py --diag` instead A/Bs the triangular
causal forward grid against a forced-rectangular one (flips the
`flash_attention.FORCE_RECT` trace-time knob) at the same shapes.
"""

import sys

sys.path.insert(0, ".")

from bench import _p50, _wait_for_healthy_tunnel  # noqa: E402


SHAPES = [
    # (tag, B, T, H, KH, D) — stage-3 train step and max-ctx prefill
    ("train B=2 T=1280", 2, 1280, 32, 32, 128),
    ("prefill B=1 T=2048", 1, 2048, 32, 32, 128),
]


def main():
    _wait_for_healthy_tunnel()

    import jax
    import jax.numpy as jnp

    from vcoder_tpu.ops import flash_attention as fa

    for tag, B, T, H, KH, D in SHAPES:
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (B, T, H, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, T, KH, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, T, KH, D), jnp.bfloat16)

        # Causal: ~half the score blocks compute. 2 matmuls fwd, 5 bwd.
        flops_fwd = 2 * B * H * T * T * D
        flops_bwd = flops_fwd * 2.5

        for forced in (False, True):
            fa.FORCE_MASKED = forced
            jax.clear_caches()

            @jax.jit
            def fwd(q, k, v):
                return fa.flash_attention(q, k, v, causal=True).mean()

            @jax.jit
            def bwd(q, k, v):
                def loss(q, k, v):
                    o = fa.flash_attention(q, k, v, causal=True)
                    return o.astype(jnp.float32).sum()

                dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
                return dq.mean() + dk.mean() + dv.mean()

            name = "forced-masked" if forced else "clean-fastpath"
            s_f = _p50(fwd, q, k, v, iters=10)
            s_b = _p50(bwd, q, k, v, iters=10)
            print(
                f"{tag:20s} {name:15s} fwd {s_f * 1e3:7.2f} ms"
                f" ({flops_fwd / s_f / 1e12:5.1f} TF/s)"
                f"  fwd+bwd {s_b * 1e3:7.2f} ms"
                f" ({(flops_fwd + flops_bwd) / s_b / 1e12:5.1f} TF/s)",
                flush=True,
            )
        fa.FORCE_MASKED = False
        jax.clear_caches()


def main_diag():
    """Triangular pair grid vs rectangular causal grid (forward only —
    the backward always runs rectangular). Flips `FORCE_RECT` at trace
    time; the diag grid has ~half the steps, so the win is the dead
    above-diagonal steps' DMA/pipeline overhead."""
    _wait_for_healthy_tunnel()

    import jax
    import jax.numpy as jnp

    from vcoder_tpu.ops import flash_attention as fa

    for tag, B, T, H, KH, D in SHAPES + [
        ("prefill B=4 T=640", 4, 640, 32, 32, 128),
    ]:
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (B, T, H, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, T, KH, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, T, KH, D), jnp.bfloat16)
        flops_fwd = 2 * B * H * T * T * D  # causal ~= half dense x2 mm

        for rect in (False, True):
            fa.FORCE_RECT = rect
            jax.clear_caches()

            @jax.jit
            def fwd(q, k, v):
                return fa.flash_attention(q, k, v, causal=True).mean()

            name = "rectangular" if rect else "triangular"
            s_f = _p50(fwd, q, k, v, iters=10)
            print(
                f"{tag:20s} {name:12s} fwd {s_f * 1e3:7.2f} ms"
                f" ({flops_fwd / s_f / 1e12:5.1f} TF/s)",
                flush=True,
            )
        fa.FORCE_RECT = False
        jax.clear_caches()


if __name__ == "__main__":
    if "--diag" in sys.argv:
        main_diag()
    else:
        main()
