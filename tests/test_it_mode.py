"""VCoder-IT splice mode + adapter bootstrap from a plain LLaVA base."""

import jax
import numpy as np
import pytest

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.constants import (
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
    SEG_TOKEN_INDEX,
)
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.models.vcoder import initialize_missing_modules
from vcoder_tpu.multimodal import build_splice_plan


def test_it_mode_seg_drops_preceding_text():
    ids = [[1, 5, IMAGE_TOKEN_INDEX, 6, 7, SEG_TOKEN_INDEX, 8]]
    plan = build_splice_plan(
        ids, num_patches=4, has_seg=True, it_mode=True, pad_multiple=8
    )
    # text(2) + img(4) + seg(4, preceding 6,7 dropped) + tail(1) = 11
    assert plan.seq_lens[0] == 2 + 4 + 4 + 1
    # same input in plain vcoder mode keeps the middle text
    plan_v = build_splice_plan(
        ids, num_patches=4, has_seg=True, pad_multiple=8
    )
    assert plan_v.seq_lens[0] == 2 + 4 + 2 + 4 + 1


def test_it_mode_seg_zero_rows_skip_seg():
    ids = [
        [1, 5, IMAGE_TOKEN_INDEX, 6],
        [1, 5, IMAGE_TOKEN_INDEX, 6],
    ]
    plan = build_splice_plan(
        ids,
        num_patches=4,
        has_seg=True,
        it_mode=True,
        is_seg_zero=[False, True],
        pad_multiple=8,
    )
    # Row 0 has no <seg> sentinel -> seg loop no-op, both rows equal here;
    # check the flag plumbs without error and lengths match the image-only
    # expansion for the zero row.
    assert plan.seq_lens[1] == 3 + 4


def test_it_mode_passthrough_without_image():
    ids = [[1, 5, 6, 7]]
    plan = build_splice_plan(
        ids, num_patches=4, has_seg=True, it_mode=True, pad_multiple=8
    )
    assert plan.seq_lens[0] == 4
    assert plan.is_text[0, :4].all()


def test_initialize_missing_modules_from_llava_base():
    base_cfg = VCoderConfig.tiny("llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), base_cfg)
    assert "seg_projector" not in params

    import dataclasses

    from vcoder_tpu.config import _variant_flags

    ds_cfg = dataclasses.replace(
        base_cfg,
        model_type="vcoder_ds_llava",
        **_variant_flags("vcoder_ds_llava"),
    )
    params = initialize_missing_modules(
        params, ds_cfg, jax.random.PRNGKey(1)
    )
    assert "seg_projector" in params and "depth_projector" in params
    # mm2 bootstraps as a copy of the pretrained vision projector.
    np.testing.assert_array_equal(
        np.asarray(params["mm2_projector"]["w"][0]),
        np.asarray(params["mm_projector"]["w"][0]),
    )
    np.testing.assert_array_equal(
        np.asarray(params["vcoder_lm_emb"]),
        np.asarray(params["lm"]["embed_tokens"]),
    )

    # IT variant: seg projector copies the vision projector.
    params2 = model_mod.init_vcoder_params(
        jax.random.PRNGKey(0), base_cfg
    )
    it_cfg = dataclasses.replace(
        base_cfg,
        model_type="vcoder_it_llava",
        **_variant_flags("vcoder_it_llava"),
    )
    params2 = initialize_missing_modules(
        params2, it_cfg, jax.random.PRNGKey(1)
    )
    np.testing.assert_array_equal(
        np.asarray(params2["seg_projector"]["w"][0]),
        np.asarray(params2["mm_projector"]["w"][0]),
    )
