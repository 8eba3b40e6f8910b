"""W8A8 prefill path: int8 activations x int8 weights on the MXU.

The weight-only int8 path upcasts q to bf16 and runs the matmul at the
bf16 rate; for compute-bound token counts qmatmul instead quantizes
activations per-token and keeps the dot in integers (2x the MXU rate on
v5e — scripts/bench_int8_matmul.py). These tests pin the dispatch rules,
the numerics envelope, and the straight-through gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcoder_tpu.ops import quant


@pytest.fixture()
def wq():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 96), dtype=jnp.float32) * 0.05
    return quant.quantize(w, bits=8)


def _tokens(n, k=64, seed=1):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(n, k), dtype=jnp.bfloat16)


def test_w8a8_engages_above_threshold(wq, monkeypatch):
    """At or above W8A8_MIN_TOKENS the integer path runs; its output is
    exactly _w8a8_matmul's, not the upcast path's."""
    x = _tokens(quant.W8A8_MIN_TOKENS)
    got = quant.qmatmul(x, wq)
    want = quant._w8a8_matmul(x, wq.q, wq.scale)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_below_threshold_uses_upcast_path(wq):
    x = _tokens(quant.W8A8_MIN_TOKENS - 1)
    got = quant.qmatmul(x, wq)
    want = (x @ wq.q.astype(x.dtype)) * wq.scale.astype(x.dtype)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_disabled_flag_uses_upcast_path(wq, monkeypatch):
    monkeypatch.setattr(quant, "_W8A8_ENABLED", False)
    x = _tokens(quant.W8A8_MIN_TOKENS)
    got = quant.qmatmul(x, wq)
    want = (x @ wq.q.astype(x.dtype)) * wq.scale.astype(x.dtype)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int4_rides_w8a8_after_unpack():
    """Packed int4 nibbles unpack to int8 values in [-8, 7], which are
    valid s8s8 MXU operands — prefill-sized int4 matmuls take the same
    integer path as int8 (round-4 packed-storage rework)."""
    rng = np.random.RandomState(0)
    w4 = quant.quantize(
        jnp.asarray(rng.randn(64, 96), dtype=jnp.float32) * 0.05, bits=4
    )
    x = _tokens(quant.W8A8_MIN_TOKENS)
    got = quant.qmatmul(x, w4)
    want = quant._w8a8_matmul(x, quant.unpack_int4(w4.q), w4.scale)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int4_below_threshold_takes_nibble_split_path():
    """Decode-sized int4 matmuls run the nibble-SPLIT form
    (x_even @ lo + x_odd @ hi — measured 5.7x the naive unpack at 7B
    B=1 on hardware: XLA materializes a stack+reshape unpack but fuses
    elementwise shifts into the dot operand reads). Must equal the
    unpacked oracle bit-for-bit."""
    rng = np.random.RandomState(0)
    w4 = quant.quantize(
        jnp.asarray(rng.randn(64, 96), dtype=jnp.float32) * 0.05, bits=4
    )
    x = _tokens(quant.W8A8_MIN_TOKENS - 1)
    got = quant.qmatmul(x, w4)
    q = quant.unpack_int4(w4.q)
    want = (x @ q.astype(x.dtype)) * w4.scale.astype(x.dtype)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    # And on a stacked [L, in, out] leaf (the lax.scan layout).
    w3 = quant.quantize(
        jnp.asarray(rng.randn(2, 64, 96), dtype=jnp.float32) * 0.05,
        bits=4,
    )
    x3 = jnp.stack([x[:8], x[8:16]])
    got3 = quant.qmatmul(x3, w3)
    want3 = jnp.einsum(
        "lti,lio->lto", x3, quant.unpack_int4(w3.q).astype(x.dtype)
    ) * w3.scale.astype(x.dtype)
    np.testing.assert_allclose(
        np.asarray(got3, np.float32), np.asarray(want3, np.float32),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.parametrize("B,K,N", [(1, 128, 256), (4, 256, 384), (7, 128, 128)])
def test_int4_pallas_kernel_matches_unpacked_oracle(B, K, N):
    """The fused Pallas int4 matmul (interpret mode) must equal the
    unpacked-bf16 dot bit-for-bit-close, including the B < 8 sublane
    padding path and non-default block widths."""
    from vcoder_tpu.ops.int4_matmul import int4_matmul, int4_matmul_supported

    assert int4_matmul_supported(K, N)
    rng = np.random.RandomState(B)
    vals = rng.randint(-7, 8, (K, N)).astype(np.int8)
    packed = quant.pack_int4(jnp.asarray(vals))
    x = jnp.asarray(rng.randn(B, K), jnp.bfloat16)
    got = int4_matmul(x, packed, interpret=True)
    want = (x @ jnp.asarray(vals, jnp.bfloat16)).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=2e-1
    )


def test_int4_pack_roundtrip_and_logical_shape():
    rng = np.random.RandomState(3)
    vals = jnp.asarray(
        rng.randint(-7, 8, (2, 64, 96)).astype(np.int8)
    )
    packed = quant.pack_int4(vals)
    assert packed.shape == (2, 32, 96) and packed.dtype == jnp.int8
    np.testing.assert_array_equal(
        np.asarray(quant.unpack_int4(packed)), np.asarray(vals)
    )
    w = np.asarray(rng.randn(64, 96), np.float32)
    w4 = quant.quantize(jnp.asarray(w), bits=4)
    assert w4.q.shape == (32, 96)  # packed storage
    assert w4.shape == (64, 96)  # logical shape
    # dequantize reconstructs within half a quantization step everywhere
    deq = np.asarray(quant.dequantize(w4))
    step = np.asarray(w4.scale)  # one int4 step per output channel
    assert np.all(np.abs(deq - w) <= 0.5 * step + 1e-6)


def test_stacked_3d_weight_stays_on_upcast_path(wq):
    """Inside lax.scan weights are 2-D; a stacked [L, in, out] leaf fed
    directly must not take the W8A8 branch (its scale is [L, 1, out])."""
    stacked = quant.QuantizedTensor(
        q=jnp.stack([wq.q, wq.q]), scale=jnp.stack([wq.scale, wq.scale])
    )
    x = _tokens(quant.W8A8_MIN_TOKENS).reshape(2, -1, 64)[:, : quant.W8A8_MIN_TOKENS // 2]
    got = quant.qmatmul(x, stacked)
    want = (x @ stacked.q.astype(x.dtype)) * stacked.scale.astype(x.dtype)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_w8a8_exact_when_activations_representable(wq):
    """Rows built as (int8 grid) * row_scale round-trip the activation
    quantizer exactly, so W8A8 == integer oracle with zero activation
    error — isolates the int path from rounding."""
    rng = np.random.RandomState(2)
    M, K = quant.W8A8_MIN_TOKENS, 64
    xq = rng.randint(-127, 128, size=(M, K)).astype(np.float32)
    # Force each row's absmax to exactly 127 so xs = absmax/127 = row_scale.
    xq[:, 0] = 127.0
    row_scale = (rng.rand(M, 1).astype(np.float32) + 0.5) / 64.0
    x = jnp.asarray(xq * row_scale, dtype=jnp.float32)
    got = np.asarray(quant.qmatmul(x, wq), dtype=np.float64)
    acc = xq.astype(np.int64) @ np.asarray(wq.q, dtype=np.int64)
    want = acc.astype(np.float64) * row_scale * np.asarray(
        wq.scale, dtype=np.float64
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_w8a8_close_to_dequant_path(wq):
    """On random bf16 activations the per-token int8 quantization keeps
    the result within ~1% relative of the weight-only path."""
    x = _tokens(512, seed=3)
    got = np.asarray(quant._w8a8_matmul(x, wq.q, wq.scale), dtype=np.float64)
    want = np.asarray(
        (x @ wq.q.astype(x.dtype)) * wq.scale.astype(x.dtype),
        dtype=np.float64,
    )
    denom = np.linalg.norm(want) + 1e-9
    assert np.linalg.norm(got - want) / denom < 0.01
    cos = (got * want).sum() / (
        np.linalg.norm(got) * np.linalg.norm(want) + 1e-9
    )
    assert cos > 0.9999


def test_w8a8_gradient_is_straight_through(wq):
    """grad through the W8A8 matmul equals the dequant-matmul grad (the
    round() would otherwise zero dx for LoRA-over-int8 training)."""
    x = _tokens(quant.W8A8_MIN_TOKENS, seed=4).astype(jnp.float32)
    g = jnp.asarray(
        np.random.RandomState(5).randn(quant.W8A8_MIN_TOKENS, 96),
        dtype=jnp.float32,
    )

    def f_w8a8(xx):
        return (quant.qmatmul(xx, wq) * g).sum()

    w_deq = quant.dequantize(wq, dtype=jnp.float32)

    def f_ref(xx):
        return ((xx @ w_deq) * g).sum()

    dx = np.asarray(jax.grad(f_w8a8)(x), dtype=np.float64)
    dx_ref = np.asarray(jax.grad(f_ref)(x), dtype=np.float64)
    # The bwd matmul runs in bf16 (f32 accumulation) like the upcast
    # path's autodiff would; compare at the bf16 noise floor.
    denom = np.linalg.norm(dx_ref) + 1e-9
    assert np.linalg.norm(dx - dx_ref) / denom < 5e-3
    cos = (dx * dx_ref).sum() / (
        np.linalg.norm(dx) * np.linalg.norm(dx_ref) + 1e-9
    )
    assert cos > 0.99999


def test_prefill_parity_w8a8_vs_upcast(monkeypatch):
    """Tiny-model 13B-analog: int8-quantized prefill logits with W8A8 on
    vs off agree to quantization tolerance and produce the same argmax.
    The tiny prompt is ~60 tokens, so the threshold is lowered to make
    the branch engage exactly as it does at 13B scale."""
    from vcoder_tpu.config import VCoderConfig
    from vcoder_tpu.models import vcoder as model_mod
    from vcoder_tpu.models.vcoder import init_vcoder_params
    from vcoder_tpu.quant import quantize_params
    import vcoder_tpu.ops.quant as q

    from __graft_entry__ import _example_batch

    cfg = VCoderConfig.tiny("vcoder_ds_llava")
    params = init_vcoder_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = quantize_params(params, bits=8, destroy=False)
    batch = _example_batch(cfg, batch_size=1)
    monkeypatch.setattr(q, "W8A8_MIN_TOKENS", 16)
    assert batch["safe_ids"].shape[1] >= 16

    def run():
        logits, _ = model_mod.prefill(
            qparams, cfg, batch, batch["images"], batch["segs"],
            batch["depths"], use_vcoder_emb=cfg.use_vcoder_lm_emb,
        )
        return np.asarray(logits, dtype=np.float64)

    on = run()
    monkeypatch.setattr(q, "_W8A8_ENABLED", False)
    off = run()

    assert not np.array_equal(on, off)  # the branch really engaged
    denom = np.linalg.norm(off) + 1e-9
    assert np.linalg.norm(on - off) / denom < 0.05
    np.testing.assert_array_equal(on.argmax(-1), off.argmax(-1))
