"""Numerical parity of the JAX CLIP tower vs HF CLIPVisionModel (torch CPU).

Validates the matmul patch-embed (vs Conv2d), quick-GELU, pre-LN blocks and
the select_layer/select_feature semantics (reference:
vcoder_llava/model/multimodal_encoder/clip_encoder.py:29-51).
"""

import numpy as np
import pytest

from vcoder_tpu.config import VisionConfig

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_clip():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    cfg = VisionConfig(
        image_size=28,
        patch_size=14,
        hidden_size=32,
        intermediate_size=64,
        num_layers=3,
        num_heads=4,
    )
    hf_cfg = CLIPVisionConfig(
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        hidden_act="quick_gelu",
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()
    state = {k: v.numpy() for k, v in hf.state_dict().items()}

    from vcoder_tpu.checkpoint import import_clip

    params = import_clip(state, cfg, prefix="vision_model.")
    return hf, params, cfg


def _hf_hidden(hf, pixel_values, select_layer):
    with torch.no_grad():
        out = hf(torch.tensor(pixel_values), output_hidden_states=True)
    return out.hidden_states[select_layer].numpy()


@pytest.mark.parametrize("select_layer", [-2, -1, -3])
def test_select_layer_parity(tiny_clip, select_layer):
    import dataclasses

    import jax.numpy as jnp

    from vcoder_tpu.models.clip import clip_encode

    hf, params, cfg = tiny_clip
    cfg = dataclasses.replace(cfg, select_layer=select_layer, select_feature="patch")

    rng = np.random.default_rng(0)
    # HF takes [B, C, H, W]; ours takes [B, H, W, C].
    pix = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    ref = _hf_hidden(hf, pix, select_layer)[:, 1:, :]  # drop CLS

    got = clip_encode(
        params, cfg, jnp.asarray(pix.transpose(0, 2, 3, 1)), attn_impl="xla"
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_cls_patch_feature(tiny_clip):
    import dataclasses

    import jax.numpy as jnp

    from vcoder_tpu.models.clip import clip_encode

    hf, params, cfg = tiny_clip
    cfg = dataclasses.replace(cfg, select_feature="cls_patch")
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    ref = _hf_hidden(hf, pix, -2)
    got = clip_encode(
        params, cfg, jnp.asarray(pix.transpose(0, 2, 3, 1)), attn_impl="xla"
    )
    assert got.shape == ref.shape  # CLS retained
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_golden_vectors_anchor_clip():
    """Patch features must match the COMMITTED HF CLIP activations
    (tests/golden/hf_golden.npz) — select_layer -2, CLS dropped."""
    import os

    import jax.numpy as jnp

    from vcoder_tpu.checkpoint import import_clip
    from vcoder_tpu.models.clip import clip_encode

    path = os.path.join(os.path.dirname(__file__), "golden", "hf_golden.npz")
    g = np.load(path, allow_pickle=False)
    state = {
        k[len("clip.state."):]: g[k]
        for k in g.files
        if k.startswith("clip.state.")
    }
    cfg = VisionConfig(
        image_size=28,
        patch_size=14,
        hidden_size=32,
        intermediate_size=64,
        num_layers=3,
        num_heads=4,
    )
    params = import_clip(state, cfg, prefix="vision_model.")
    pix = g["clip.pixel_values"]
    got = clip_encode(
        params, cfg, jnp.asarray(pix.transpose(0, 2, 3, 1)), attn_impl="xla"
    )
    ref = g["clip.hidden_m2"][:, 1:, :]
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)
