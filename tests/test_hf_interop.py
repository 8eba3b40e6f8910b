"""HF interop: torch .bin checkpoint loading + PEFT-format LoRA merge."""

import json
import os

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vcoder_tpu.builder import load_pretrained_model
from vcoder_tpu.checkpoint import (
    export_vcoder,
    load_hf_checkpoint,
    load_lora_checkpoint,
    save_pretrained,
)
from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.models import vcoder as model_mod


def _write_torch_bin_ckpt(d, params, cfg):
    os.makedirs(d, exist_ok=True)
    state = export_vcoder(params, cfg)
    torch_state = {
        k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()
    }
    torch.save(torch_state, os.path.join(d, "pytorch_model.bin"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg.to_hf_config(), f)


def test_torch_bin_checkpoint_roundtrip(tmp_path):
    cfg = VCoderConfig.tiny("vcoder_llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    d = str(tmp_path / "bin_ckpt")
    _write_torch_bin_ckpt(d, params, cfg)

    cfg2, params2 = load_hf_checkpoint(d, dtype=None)
    assert cfg2.model_type == "vcoder_llava"
    np.testing.assert_allclose(
        np.asarray(params2["lm"]["layers"]["q_proj"]),
        np.asarray(params["lm"]["layers"]["q_proj"]),
        atol=1e-6,
    )


def test_peft_lora_merge(tmp_path):
    cfg = VCoderConfig.tiny("llava")
    base_params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    base_dir = str(tmp_path / "base")
    save_pretrained(base_dir, base_params, cfg)

    # Build a synthetic PEFT adapter dir: rank-2 LoRA on layer-0 q_proj.
    lora_dir = str(tmp_path / "llava-lora")
    os.makedirs(lora_dir)
    with open(os.path.join(lora_dir, "config.json"), "w") as f:
        json.dump(cfg.to_hf_config(), f)
    r, alpha = 2, 4
    with open(os.path.join(lora_dir, "adapter_config.json"), "w") as f:
        json.dump({"r": r, "lora_alpha": alpha}, f)
    D = cfg.text.hidden_size
    rng = np.random.RandomState(0)
    A = rng.randn(r, D).astype(np.float32) * 0.1  # [r, in]
    B = rng.randn(D, r).astype(np.float32) * 0.1  # [out, r]
    torch.save(
        {
            "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight":
                torch.from_numpy(A),
            "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight":
                torch.from_numpy(B),
        },
        os.path.join(lora_dir, "adapter_model.bin"),
    )
    # non-LoRA trainables: a perturbed mm_projector bias.
    new_bias = rng.randn(D).astype(np.float32)
    torch.save(
        {
            "base_model.model.model.mm_projector.2.bias":
                torch.from_numpy(new_bias),
        },
        os.path.join(lora_dir, "non_lora_trainables.bin"),
    )

    cfg2, merged = load_lora_checkpoint(lora_dir, base_dir, dtype=None)

    # q_proj layer 0 received + scale * (B@A)^T in [in, out] layout.
    scale = alpha / r
    expected = (
        np.asarray(base_params["lm"]["layers"]["q_proj"][0])
        + scale * (B @ A).T
    )
    np.testing.assert_allclose(
        np.asarray(merged["lm"]["layers"]["q_proj"][0]), expected,
        atol=1e-4, rtol=1e-4,
    )
    # Other layers untouched.
    np.testing.assert_allclose(
        np.asarray(merged["lm"]["layers"]["q_proj"][1]),
        np.asarray(base_params["lm"]["layers"]["q_proj"][1]),
        atol=1e-6,
    )
    # non-LoRA overlay applied.
    np.testing.assert_allclose(
        np.asarray(merged["mm_projector"]["b"][1]), new_bias, atol=1e-6
    )

    # builder dispatch: 'lora' in name + base -> merged model
    from vcoder_tpu.simple_tokenizer import SimpleTokenizer

    SimpleTokenizer.build_from_texts(["hi"]).save_pretrained(lora_dir)
    tok, model, *_ = load_pretrained_model(
        lora_dir, base_dir, "llava-lora", dtype=None
    )
    np.testing.assert_allclose(
        np.asarray(model.params["lm"]["layers"]["q_proj"][0]),
        expected, atol=1e-4, rtol=1e-4,
    )
