"""Weight surgery round-trip + full train-driver smoke test."""

import json
import os
import sys

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end driver runs (see pyproject markers)

from vcoder_tpu.checkpoint import (
    load_safetensors_state,
    save_pretrained,
)
from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.simple_tokenizer import SimpleTokenizer
from vcoder_tpu.weight_surgery import apply_delta, consolidate, make_delta

PIL = pytest.importorskip("PIL.Image")


def test_delta_roundtrip(tmp_path):
    cfg = VCoderConfig.tiny("vcoder_llava")
    base = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    target = model_mod.init_vcoder_params(jax.random.PRNGKey(1), cfg)
    save_pretrained(str(tmp_path / "base"), base, cfg)
    save_pretrained(str(tmp_path / "target"), target, cfg)
    make_delta(
        str(tmp_path / "base"), str(tmp_path / "target"),
        str(tmp_path / "delta"),
    )
    apply_delta(
        str(tmp_path / "base"), str(tmp_path / "delta"),
        str(tmp_path / "restored"),
    )
    a = load_safetensors_state(str(tmp_path / "target"))
    b = load_safetensors_state(str(tmp_path / "restored"))
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)


def test_consolidate(tmp_path):
    cfg = VCoderConfig.tiny("llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    save_pretrained(str(tmp_path / "src"), params, cfg)
    consolidate(str(tmp_path / "src"), str(tmp_path / "dst"))
    assert os.path.exists(str(tmp_path / "dst" / "model.safetensors"))
    assert os.path.exists(str(tmp_path / "dst" / "config.json"))


def test_train_driver_end_to_end(tmp_path):
    """python -m vcoder_tpu.train.vcoder_train on synthetic COST data,
    starting from a PLAIN llava base (exercises the stage-2 adapter
    bootstrap: seg projector + mm2 + vcoder_lm_emb get initialized)."""
    from tests.test_train_pipeline import _make_cost_tree

    # tiny plain-LLaVA base checkpoint with tokenizer
    ckpt = tmp_path / "llava-tiny"
    cfg = VCoderConfig.tiny("llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    save_pretrained(str(ckpt), params, cfg)
    tok = SimpleTokenizer.build_from_texts(
        [
            "A chat between a curious user and an artificial intelligence"
            " assistant. The assistant gives helpful, detailed, and polite"
            " answers to the user's questions. USER: ASSISTANT: What"
            " objects can be seen in the image? The objects present in the"
            " image are: two people, a car, wall semantic instance panoptic"
            " Perceive as done for segmentation"
        ]
    )
    tok.save_pretrained(str(ckpt))

    data_root = tmp_path / "cost"
    _make_cost_tree(str(data_root))

    from vcoder_tpu.train.drivers import build_arg_parser, run_stage

    args = build_arg_parser().parse_args(
        [
            "--model-path", str(ckpt),
            "--output-dir", str(tmp_path / "out"),
            "--image-folder", str(data_root),
            "--seg-data-path", str(data_root),
            "--per-device-train-batch-size", "2",
            "--num-train-epochs", "1",
            "--max-steps", "2",
            "--save-steps", "100",
            "--mesh-data", "1",
            "--mesh-fsdp", "1",
            "--mesh-model", "1",
        ]
    )
    run_stage("vcoder", args)
    out = tmp_path / "out"
    assert os.path.exists(str(out / "metrics.jsonl"))
    assert os.path.exists(str(out / "adapters.safetensors"))
    assert os.path.exists(str(out / "final" / "model.safetensors"))
    assert os.path.exists(str(out / "final" / "vcoder_tokenizer.json"))


def test_train_driver_it_stage(tmp_path):
    """The IT stage: seg projector bootstraps as a COPY of mm_projector and
    the it trainable mask includes the LLM."""
    import numpy as np

    from tests.test_train_pipeline import _make_cost_tree
    from vcoder_tpu.train.drivers import build_arg_parser, run_stage

    ckpt = tmp_path / "llava-tiny"
    cfg = VCoderConfig.tiny("llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    save_pretrained(str(ckpt), params, cfg)
    tok = SimpleTokenizer.build_from_texts(
        [
            "A chat between a curious user and an artificial intelligence"
            " assistant. The assistant gives helpful, detailed, and polite"
            " answers to the user's questions. USER: ASSISTANT: What"
            " objects can be seen in the image? The objects present in the"
            " image are: two people, a car, wall semantic instance panoptic"
        ]
    )
    tok.save_pretrained(str(ckpt))
    data_root = tmp_path / "cost"
    _make_cost_tree(str(data_root))

    args = build_arg_parser().parse_args(
        [
            "--model-path", str(ckpt),
            "--output-dir", str(tmp_path / "out"),
            "--image-folder", str(data_root),
            "--seg-data-path", str(data_root),
            "--per-device-train-batch-size", "2",
            "--num-train-epochs", "1",
            "--max-steps", "2",
            "--mesh-data", "1", "--mesh-fsdp", "1", "--mesh-model", "1",
        ]
    )
    run_stage("it", args)
    assert os.path.exists(str(tmp_path / "out" / "metrics.jsonl"))
    lines = open(str(tmp_path / "out" / "metrics.jsonl")).readlines()
    assert len(lines) >= 2
    loss = json.loads(lines[-1])["loss"]
    assert np.isfinite(loss)


def test_train_driver_it_lora_stage(tmp_path):
    """--lora-enable on the IT stage: LM linears get LoRA-wrapped, only
    a/b leaves + seg projector train, adapters export the a/b leaves, and
    final/ holds a merged plain checkpoint that reloads."""
    import numpy as np
    from safetensors.numpy import load_file

    from tests.test_train_pipeline import _make_cost_tree
    from vcoder_tpu.train.drivers import build_arg_parser, run_stage

    ckpt = tmp_path / "llava-tiny"
    cfg = VCoderConfig.tiny("llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    save_pretrained(str(ckpt), params, cfg)
    tok = SimpleTokenizer.build_from_texts(
        [
            "A chat between a curious user and an artificial intelligence"
            " assistant. The assistant gives helpful, detailed, and polite"
            " answers to the user's questions. USER: ASSISTANT: What"
            " objects can be seen in the image? The objects present in the"
            " image are: two people, a car, wall semantic instance panoptic"
        ]
    )
    tok.save_pretrained(str(ckpt))
    data_root = tmp_path / "cost"
    _make_cost_tree(str(data_root))

    args = build_arg_parser().parse_args(
        [
            "--model-path", str(ckpt),
            "--output-dir", str(tmp_path / "out"),
            "--image-folder", str(data_root),
            "--seg-data-path", str(data_root),
            "--lora-enable", "--lora-r", "4", "--lora-alpha", "8",
            "--per-device-train-batch-size", "2",
            "--num-train-epochs", "1",
            "--max-steps", "2",
            "--mesh-data", "1", "--mesh-fsdp", "1", "--mesh-model", "1",
        ]
    )
    run_stage("it", args)
    out = tmp_path / "out"
    loss = json.loads(open(str(out / "metrics.jsonl")).readlines()[-1])["loss"]
    assert np.isfinite(loss)
    adapters = load_file(str(out / "adapters.safetensors"))
    assert any(k.endswith("/a") for k in adapters)
    assert any(k.startswith("seg_projector") for k in adapters)
    assert not any("/base" in k for k in adapters), "frozen bases leaked"
    # Merged final checkpoint reloads as a plain model.
    from vcoder_tpu.builder import load_pretrained_model

    _, model2, *_ = load_pretrained_model(str(out / "final"))
    assert model2.config.model_type == "vcoder_it_llava"
