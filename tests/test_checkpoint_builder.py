"""Checkpoint round-trip + load_pretrained_model API + quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcoder_tpu.builder import load_pretrained_model
from vcoder_tpu.checkpoint import (
    export_vcoder,
    import_vcoder,
    load_hf_checkpoint,
    save_pretrained,
)
from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.constants import IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.quant import quantize_params
from vcoder_tpu.ops.quant import QuantizedTensor, dequantize, qmatmul, quantize


def _tiny_params(cfg, seed=0):
    return model_mod.init_vcoder_params(jax.random.PRNGKey(seed), cfg)


def test_export_import_roundtrip_exact():
    cfg = VCoderConfig.tiny("vcoder_ds_llava")
    params = _tiny_params(cfg)
    state = export_vcoder(params, cfg)
    back = import_vcoder({k: np.asarray(v) for k, v in state.items()}, cfg)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = {tuple(str(k) for k in p): v
              for p, v in jax.tree_util.tree_flatten_with_path(back)[0]}
    for path, leaf in flat_a:
        key = tuple(str(k) for k in path)
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[key]), err_msg=str(key)
        )


def test_save_load_pretrained_roundtrip(tmp_path, fake_tokenizer):
    cfg = VCoderConfig.tiny("vcoder_ds_llava")
    params = _tiny_params(cfg)
    save_pretrained(str(tmp_path / "vcoder_ds_llava-tiny"), params, cfg)

    tok, model, ip, seg_ip, depth_ip, ctx = load_pretrained_model(
        str(tmp_path / "vcoder_ds_llava-tiny"),
        dtype=None,
        tokenizer=fake_tokenizer,
    )
    assert model.config.model_type == "vcoder_ds_llava"
    assert model.config.use_depth and model.config.use_mm2_proj
    assert seg_ip is ip and depth_ip is ip  # name contains 'vcoder' + 'ds'
    assert ctx == 2048

    # Loaded params produce identical prefill logits.
    ids = [[1, 5, 6, IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX, 7, 8]]
    from vcoder_tpu.multimodal import build_splice_plan

    plan = build_splice_plan(
        ids,
        num_patches=cfg.vision.num_patches,
        has_seg=True,
        ds_mode=True,
        pad_multiple=16,
    )
    arrays = model_mod.plan_to_arrays(plan)
    hw = cfg.vision.image_size
    px = jax.random.normal(jax.random.PRNGKey(1), (1, hw, hw, 3))
    l1, _ = model_mod.prefill(
        params, cfg, arrays, px, px, use_vcoder_emb=True, attn_impl="xla"
    )
    l2, _ = model_mod.prefill(
        model.params, cfg, arrays, px, px, use_vcoder_emb=True,
        attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l2), atol=1e-5, rtol=1e-5
    )


def test_llava_name_gating(tmp_path, fake_tokenizer):
    cfg = VCoderConfig.tiny("llava")
    params = _tiny_params(cfg)
    save_pretrained(str(tmp_path / "llava-v1.5-tiny"), params, cfg)
    tok, model, ip, seg_ip, depth_ip, ctx = load_pretrained_model(
        str(tmp_path / "llava-v1.5-tiny"),
        dtype=None,
        tokenizer=fake_tokenizer,
    )
    assert seg_ip is None and depth_ip is None
    assert model.config.model_type == "llava"


def test_quantize_int8_numerics():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
    qt = quantize(w, bits=8)
    assert isinstance(qt, QuantizedTensor)
    assert qt.q.dtype == jnp.int8
    w_hat = dequantize(qt)
    rel = np.abs(np.asarray(w_hat - w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.01

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
    y_ref = np.asarray(x @ w)
    y_q = np.asarray(qmatmul(x, qt))
    assert np.abs(y_q - y_ref).max() / np.abs(y_ref).max() < 0.05


def test_qmatmul_stacked_layers():
    """Layer-stacked QuantizedTensor [L, in, out] with x [L, T, in] must
    apply each LAYER's scale — including the T == L trap where a wrongly
    squeezed [L, out] scale would broadcast against the token axis and
    silently corrupt activations."""
    L, IN, OUT = 3, 16, 8
    w = jax.random.normal(jax.random.PRNGKey(3), (L, IN, OUT))
    qt = quantize(w, bits=8)
    assert qt.scale.shape == (L, 1, OUT)
    for T in (L, 5):
        x = jax.random.normal(jax.random.PRNGKey(4), (L, T, IN))
        y_ref = np.asarray(
            jnp.einsum("lti,lio->lto", x, dequantize(qt, x.dtype))
        )
        y_q = np.asarray(qmatmul(x, qt))
        assert y_q.shape == (L, T, OUT)
        np.testing.assert_allclose(y_q, y_ref, rtol=2e-2, atol=2e-2)


def test_int4_model_matches_its_dequantized_twin():
    """An int4 (packed-storage) model must decode token-for-token like a
    bf16 model whose weights are the DEQUANTIZED int4 values — the exact
    functional contract of weight-only quantization (the absolute
    quality-vs-bf16 gap is a property of 4-bit quantization itself, not
    of this implementation)."""
    from vcoder_tpu.generation import generate
    from vcoder_tpu.ops.quant import unpack_int4

    cfg = VCoderConfig.tiny("vcoder_llava")
    params = _tiny_params(cfg)
    q4 = quantize_params(params, bits=4, destroy=False)
    lay = q4["lm"]["layers"]["q_proj"]
    assert isinstance(lay, QuantizedTensor) and lay.bits == 4
    assert lay.q.dtype == jnp.int8  # packed bytes, never jnp.int4
    assert lay.q.shape[-2] * 2 == params["lm"]["layers"]["q_proj"].shape[-2]

    twin = jax.tree.map(
        lambda x: (
            dequantize(x, jnp.bfloat16).astype(params["lm"]["lm_head"].dtype)
            if isinstance(x, QuantizedTensor)
            else x
        ),
        q4,
        is_leaf=lambda x: isinstance(x, QuantizedTensor),
    )
    hw = cfg.vision.image_size
    px = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (1, hw, hw, 3)))
    ids = [1, 5, 6, IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX, 7, 8, 9]
    outs = []
    for p in (q4, twin):
        r = generate(
            p, cfg, [ids], jnp.asarray(px), jnp.asarray(px), None,
            max_new_tokens=8, temperature=0.0, attn_impl="xla", pad_to=128,
        )
        outs.append(
            [int(t) for t in r.sequences[0][: int(r.num_generated[0])]]
        )
    assert outs[0] == outs[1], outs

    # unpack/pack consistency at the model level: dequantize sees the
    # same values qmatmul's in-graph unpack computes.
    np.testing.assert_array_equal(
        np.asarray(unpack_int4(lay.q).astype(jnp.float32) * lay.scale),
        np.asarray(dequantize(lay)),
    )


def test_quantized_model_forward_close():
    cfg = VCoderConfig.tiny("vcoder_llava")
    params = _tiny_params(cfg)
    qparams = quantize_params(params, bits=8)
    assert isinstance(qparams["lm"]["layers"]["q_proj"], QuantizedTensor)
    assert not isinstance(qparams["lm"]["embed_tokens"], QuantizedTensor)

    from vcoder_tpu.multimodal import build_splice_plan

    ids = [[1, 5, 6, IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX, 7, 8, 9]]
    plan = build_splice_plan(
        ids, num_patches=cfg.vision.num_patches, has_seg=True,
        pad_multiple=16,
    )
    arrays = model_mod.plan_to_arrays(plan)
    hw = cfg.vision.image_size
    px = jax.random.normal(jax.random.PRNGKey(2), (1, hw, hw, 3))
    l_ref, _ = model_mod.prefill(
        params, cfg, arrays, px, px, use_vcoder_emb=True, attn_impl="xla"
    )
    l_q, _ = model_mod.prefill(
        qparams, cfg, arrays, px, px, use_vcoder_emb=True, attn_impl="xla"
    )
    # int8 weight-only on a tiny random model: logits track closely.
    ref = np.asarray(l_ref)
    err = np.abs(np.asarray(l_q) - ref).max()
    scale = np.abs(ref).max()
    assert err / scale < 0.1, (err, scale)


def test_generate_via_builder_model(tmp_path, fake_tokenizer):
    cfg = VCoderConfig.tiny("vcoder_llava")
    params = _tiny_params(cfg)
    save_pretrained(str(tmp_path / "vcoder_llava-tiny"), params, cfg)
    _, model, *_ = load_pretrained_model(
        str(tmp_path / "vcoder_llava-tiny"),
        dtype=None,
        tokenizer=fake_tokenizer,
    )
    hw = cfg.vision.image_size
    px = np.random.RandomState(0).randn(1, hw, hw, 3).astype(np.float32)
    out = model.generate(
        [[1, 5, IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX, 9]],
        images=px,
        segs=px,
        max_new_tokens=4,
        pad_to=None,
    )
    assert out.sequences.shape == (1, 4)


def test_import_bare_linear_projector():
    """A 'linear' projector checkpoint stores '{prefix}.weight' (no
    Sequential index); the import gate must accept that form, not
    silently drop trained seg/depth projectors."""
    import dataclasses as _dc

    from vcoder_tpu.checkpoint import export_vcoder, import_vcoder

    cfg = VCoderConfig.tiny("vcoder_ds_llava")
    cfg = _dc.replace(
        cfg,
        seg_mm_projector_type="linear",
        depth_mm_projector_type="linear",
    )
    params = _tiny_params(cfg)
    # Force depth-1 projector trees (what a linear checkpoint holds).
    d_in = params["seg_projector"]["w"][0].shape[0]
    d_out = params["lm"]["embed_tokens"].shape[1]
    for name in ("seg_projector", "depth_projector"):
        params[name] = {
            "w": [jnp.ones((d_in, d_out)) * 0.01],
            "b": [jnp.zeros((d_out,))],
        }
    state = export_vcoder(params, cfg)
    # A bare-Linear HF checkpoint has no '.0.' Sequential index.
    state = {
        k.replace("seg_mm_projector.0.", "seg_mm_projector.").replace(
            "depth_mm_projector.0.", "depth_mm_projector."
        ): v
        for k, v in state.items()
    }
    loaded = import_vcoder(state, cfg)
    assert "seg_projector" in loaded and "depth_projector" in loaded
    np.testing.assert_allclose(
        np.asarray(loaded["seg_projector"]["w"][0]),
        np.asarray(params["seg_projector"]["w"][0]),
        rtol=1e-6,
    )
