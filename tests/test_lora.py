"""LoRA tests: identity at init, merge equivalence, training updates only
adapters, int8-base compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.constants import IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX
from vcoder_tpu.lora import LoraWeight, add_lora, merge_lora
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.multimodal import build_splice_plan
from vcoder_tpu.ops.quant import qmatmul
from vcoder_tpu.quant import quantize_params
from vcoder_tpu.train.step import (
    init_opt_state,
    make_optimizer,
    make_train_step,
    trainable_mask,
)


def _logits(params, cfg, px):
    ids = [[1, 5, 6, IMAGE_TOKEN_INDEX, SEG_TOKEN_INDEX, 7, 8]]
    plan = build_splice_plan(
        ids, num_patches=cfg.vision.num_patches, has_seg=True,
        pad_multiple=16,
    )
    arrays = model_mod.plan_to_arrays(plan)
    l, _ = model_mod.prefill(
        params, cfg, arrays, px, px, use_vcoder_emb=True, attn_impl="xla"
    )
    return np.asarray(l)


def test_lora_identity_at_init_and_merge():
    cfg = VCoderConfig.tiny("vcoder_llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    hw = cfg.vision.image_size
    px = jax.random.normal(jax.random.PRNGKey(1), (1, hw, hw, 3))

    base_logits = _logits(params, cfg, px)
    lparams = add_lora(params, jax.random.PRNGKey(2), rank=4, alpha=8)
    assert isinstance(lparams["lm"]["layers"]["q_proj"], LoraWeight)
    # B starts at zero -> identity behavior.
    np.testing.assert_allclose(
        _logits(lparams, cfg, px), base_logits, atol=1e-5
    )

    # Perturb B; merged dense weights must match the wrapped forward.
    lw = lparams["lm"]["layers"]["q_proj"]
    lparams["lm"]["layers"]["q_proj"] = LoraWeight(
        base=lw.base,
        a=lw.a,
        b=jax.random.normal(jax.random.PRNGKey(3), lw.b.shape) * 0.1,
        scale=lw.scale,
    )
    wrapped = _logits(lparams, cfg, px)
    merged = merge_lora(lparams)
    assert not isinstance(merged["lm"]["layers"]["q_proj"], LoraWeight)
    np.testing.assert_allclose(
        _logits(merged, cfg, px), wrapped, atol=1e-4, rtol=1e-4
    )


def test_lora_qmatmul_math():
    w = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
    a = jax.random.normal(jax.random.PRNGKey(1), (16, 2))
    b = jax.random.normal(jax.random.PRNGKey(2), (2, 8))
    lw = LoraWeight(base=w, a=a, b=b, scale=0.5)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 16))
    np.testing.assert_allclose(
        np.asarray(qmatmul(x, lw)),
        np.asarray(x @ w + 0.5 * (x @ a @ b)),
        atol=1e-5,
    )


def test_lora_over_int8_base():
    cfg = VCoderConfig.tiny("vcoder_llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params, bits=8, destroy=False)
    lq = add_lora(qparams, jax.random.PRNGKey(2), rank=4, alpha=8)
    lw = lq["lm"]["layers"]["q_proj"]
    assert isinstance(lw, LoraWeight)
    assert type(lw.base).__name__ == "QuantizedTensor"
    hw = cfg.vision.image_size
    px = jax.random.normal(jax.random.PRNGKey(1), (1, hw, hw, 3))
    out = _logits(lq, cfg, px)
    assert np.isfinite(out).all()


def test_lora_training_updates_only_adapters():
    cfg = VCoderConfig.tiny("llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    lparams = add_lora(params, jax.random.PRNGKey(2), rank=4, alpha=8)

    mask = trainable_mask(lparams, "lora")
    # mask mirrors the pytree structure: LoraWeight nodes carry bool fields
    assert mask["lm"]["layers"]["q_proj"].a is True
    assert mask["lm"]["layers"]["q_proj"].base is False
    assert mask["mm_projector"]["w"][0] is True
    assert mask["lm"]["embed_tokens"] is False

    from vcoder_tpu.constants import IGNORE_INDEX

    ids = [[1, 5, 6, IMAGE_TOKEN_INDEX, 7, 8, 9, 10]]
    labels = [[IGNORE_INDEX] * 4 + [7, 8, 9, 10]]
    plan = build_splice_plan(
        ids, num_patches=cfg.vision.num_patches, labels=labels,
        pad_multiple=16,
    )
    batch = model_mod.plan_to_arrays(plan, include_labels=True)
    hw = cfg.vision.image_size
    batch["images"] = jax.random.normal(
        jax.random.PRNGKey(1), (1, hw, hw, 3)
    )

    opt = make_optimizer(1e-2, total_steps=5)
    opt_state = init_opt_state(lparams, opt, "lora")
    step = make_train_step(
        cfg, opt, stage="lora", attn_impl="xla", remat=False
    )
    base_before = np.asarray(
        lparams["lm"]["layers"]["q_proj"].base
    ).copy()
    b_before = np.asarray(lparams["lm"]["layers"]["q_proj"].b).copy()
    # two steps: the cosine warmup schedule starts at lr=0
    lparams, opt_state, metrics = step(lparams, opt_state, batch)
    lparams, opt_state, metrics = step(lparams, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_array_equal(
        np.asarray(lparams["lm"]["layers"]["q_proj"].base), base_before
    )
    assert np.abs(
        np.asarray(lparams["lm"]["layers"]["q_proj"].b) - b_before
    ).max() > 0


def test_adapter_scale_rslora():
    """PEFT use_rslora scales by alpha/sqrt(r); rank/alpha patterns are
    rejected loudly instead of silently mis-scaling."""
    from vcoder_tpu.lora import adapter_scale

    assert adapter_scale({"r": 8, "lora_alpha": 16}) == 2.0
    assert adapter_scale(
        {"r": 16, "lora_alpha": 32, "use_rslora": True}
    ) == 32 / 4.0
    with pytest.raises(ValueError, match="rank_pattern"):
        adapter_scale({"r": 8, "lora_alpha": 16, "rank_pattern": {"q": 4}})


def test_stack_adapters_rejects_out_dim_mismatch():
    """A B-matrix trained for a different out_dim must fail with a
    precise error, not a generic stack-shape TypeError."""
    import jax

    from vcoder_tpu.lora import stack_adapters

    base = {"lm": {"layers": {"q_proj": jnp.ones((2, 8, 8))}}}
    bad = {
        "lm/layers/q_proj": (
            jnp.ones((2, 8, 4)),
            jnp.ones((2, 4, 16)),  # out_dim 16 != base 8
            1.0,
        )
    }
    with pytest.raises(ValueError, match="out_dim"):
        stack_adapters(base, {"x": bad}, max_batch=2)


def test_stack_adapters_rejects_2d_base():
    """multilora factors gather per layer slice; a 2-D (non-stacked)
    target must be rejected up front, not crash at trace time."""
    from vcoder_tpu.lora import stack_adapters

    base = {"lm": {"lm_head": jnp.ones((8, 8))}}
    tree = {"lm/lm_head": (jnp.ones((8, 4)), jnp.ones((4, 8)), 1.0)}
    with pytest.raises(ValueError, match="layer-stacked"):
        stack_adapters(base, {"x": tree}, max_batch=2)


def test_add_lora_idempotent():
    """add_lora over an already-wrapped tree must not double-wrap (the
    guard needs LoraWeight as a tree leaf to ever fire)."""
    import jax

    from vcoder_tpu.lora import LoraWeight, add_lora

    params = {"lm": {"layers": {"q_proj": jnp.ones((2, 8, 8))}}}
    once = add_lora(params, jax.random.PRNGKey(0), rank=4)
    twice = add_lora(once, jax.random.PRNGKey(1), rank=4)
    w = twice["lm"]["layers"]["q_proj"]
    assert isinstance(w, LoraWeight)
    assert not isinstance(w.base, LoraWeight)
