"""Checkpoint interop: HuggingFace safetensors -> vcoder_tpu param pytrees.

Imports the published checkpoints (``shi-labs/vcoder_*_llava-v1.5-*``,
``liuhaotian/llava-v1.5-*``) into the framework's layer-stacked pytree
layout. Key transforms:

* HF ``nn.Linear`` stores ``[out, in]``; we store ``[in, out]`` -> transpose.
* Per-layer tensors are stacked along a new leading ``num_layers`` axis.
* The CLIP patch-embedding Conv2d kernel ``[D, C, P, P]`` flattens to a
  ``[C*P*P, D]`` matmul weight (see models/clip.py::patchify for the
  matching patch flattening order).

Weight-name map of the reference checkpoints (reference:
vcoder_llava/model/vcoder_ds_llava_arch.py:30-49 module attributes and HF
Llama/CLIP conventions):

    model.embed_tokens.weight                     model.layers.{i}.*
    model.norm.weight                             lm_head.weight
    model.vision_tower.vision_tower.vision_model.*   (CLIPVisionModel)
    model.mm_projector.{0,2}.{weight,bias}        (mlp2x_gelu Sequential)
    model.mm2_projector.{0,2}.{weight,bias}
    model.seg_mm_projector.{0,2}.{weight,bias}
    model.depth_mm_projector.{0,2}.{weight,bias}
    model.vcoder_lm_emb.weight
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from vcoder_tpu.config import TextConfig, VCoderConfig, VisionConfig, projector_depth

Array = np.ndarray
StateDict = Dict[str, Array]


def _t(x: Array) -> Array:
    return np.ascontiguousarray(x.T)


def _stack(state: StateDict, fmt: str, n: int, transpose: bool) -> jnp.ndarray:
    mats = [state[fmt.format(i=i)] for i in range(n)]
    if transpose:
        mats = [_t(m) for m in mats]
    return jnp.asarray(np.stack(mats, axis=0))


def import_llama(
    state: StateDict, cfg: TextConfig, prefix: str = "model."
) -> dict:
    """HF LlamaForCausalLM state dict -> llama params pytree."""
    L = cfg.num_layers
    p = prefix

    def lay(name, transpose=True):
        return _stack(state, p + "layers.{i}." + name, L, transpose)

    params = {
        "embed_tokens": jnp.asarray(state[p + "embed_tokens.weight"]),
        "layers": {
            "input_layernorm": lay("input_layernorm.weight", transpose=False),
            "post_attention_layernorm": lay(
                "post_attention_layernorm.weight", transpose=False
            ),
            "q_proj": lay("self_attn.q_proj.weight"),
            "k_proj": lay("self_attn.k_proj.weight"),
            "v_proj": lay("self_attn.v_proj.weight"),
            "o_proj": lay("self_attn.o_proj.weight"),
            "gate_proj": lay("mlp.gate_proj.weight"),
            "up_proj": lay("mlp.up_proj.weight"),
            "down_proj": lay("mlp.down_proj.weight"),
        },
        "norm": jnp.asarray(state[p + "norm.weight"]),
        "lm_head": jnp.asarray(_t(state["lm_head.weight"])),
    }
    return params


def import_clip(
    state: StateDict, cfg: VisionConfig, prefix: str = "vision_model."
) -> dict:
    """HF CLIPVisionModel state dict -> clip params pytree.

    Note HF's historical typo: the pre-layernorm is ``pre_layrnorm``.
    """
    L = cfg.num_layers
    D = cfg.hidden_size
    p = prefix

    conv = state[p + "embeddings.patch_embedding.weight"]  # [D, C, P, P]
    patch_w = _t(conv.reshape(D, -1))  # [C*P*P, D]

    pre_key = (
        p + "pre_layrnorm.weight"
        if p + "pre_layrnorm.weight" in state
        else p + "pre_layernorm.weight"
    )
    pre_bias_key = pre_key.replace("weight", "bias")

    def lay(name, transpose=True):
        return _stack(state, p + "encoder.layers.{i}." + name, L, transpose)

    return {
        "class_embedding": jnp.asarray(
            state[p + "embeddings.class_embedding"].reshape(D)
        ),
        "patch_embedding": jnp.asarray(patch_w),
        "position_embedding": jnp.asarray(
            state[p + "embeddings.position_embedding.weight"]
        ),
        "pre_layernorm": {
            "scale": jnp.asarray(state[pre_key]),
            "bias": jnp.asarray(state[pre_bias_key]),
        },
        "layers": {
            "ln1_scale": lay("layer_norm1.weight", transpose=False),
            "ln1_bias": lay("layer_norm1.bias", transpose=False),
            "ln2_scale": lay("layer_norm2.weight", transpose=False),
            "ln2_bias": lay("layer_norm2.bias", transpose=False),
            "q_proj": lay("self_attn.q_proj.weight"),
            "q_bias": lay("self_attn.q_proj.bias", transpose=False),
            "k_proj": lay("self_attn.k_proj.weight"),
            "k_bias": lay("self_attn.k_proj.bias", transpose=False),
            "v_proj": lay("self_attn.v_proj.weight"),
            "v_bias": lay("self_attn.v_proj.bias", transpose=False),
            "out_proj": lay("self_attn.out_proj.weight"),
            "out_bias": lay("self_attn.out_proj.bias", transpose=False),
            "fc1": lay("mlp.fc1.weight"),
            "fc1_bias": lay("mlp.fc1.bias", transpose=False),
            "fc2": lay("mlp.fc2.weight"),
            "fc2_bias": lay("mlp.fc2.bias", transpose=False),
        },
    }


def import_projector(
    state: StateDict, prefix: str, projector_type: str = "mlp2x_gelu"
) -> dict:
    """HF Sequential(Linear, GELU, Linear, ...) -> projector pytree.

    Sequential indices go 0, 2, 4, ... for the Linears. A bare Linear
    projector stores ``{prefix}.weight`` directly.
    """
    depth = projector_depth(projector_type)
    if depth == 0:
        return {"w": [], "b": []}
    if prefix + ".weight" in state:  # plain Linear module
        return {
            "w": [jnp.asarray(_t(state[prefix + ".weight"]))],
            "b": [jnp.asarray(state[prefix + ".bias"])],
        }
    ws, bs = [], []
    for i in range(depth):
        idx = 2 * i
        ws.append(jnp.asarray(_t(state[f"{prefix}.{idx}.weight"])))
        bs.append(jnp.asarray(state[f"{prefix}.{idx}.bias"]))
    return {"w": ws, "b": bs}


def import_vcoder(state: StateDict, cfg: VCoderConfig) -> dict:
    """Full VCoder/LLaVA checkpoint state dict -> model params pytree."""
    params = {
        "lm": import_llama(state, cfg.text, prefix="model."),
        "mm_projector": import_projector(
            state, "model.mm_projector", cfg.mm_projector_type
        ),
    }
    vt_prefix = None
    for cand in (
        "model.vision_tower.vision_tower.vision_model.",
        "model.vision_tower.vision_model.",
        "vision_model.",
    ):
        if cand + "embeddings.class_embedding" in state:
            vt_prefix = cand
            break
    if vt_prefix is not None:
        params["vision_tower"] = import_clip(state, cfg.vision, vt_prefix)

    def _has_proj(prefix: str) -> bool:
        # Sequential ({prefix}.0.weight) OR bare-Linear ({prefix}.weight):
        # import_projector reads both forms, so the gate must too — a
        # 'linear' projector checkpoint must not silently drop weights.
        return f"{prefix}.0.weight" in state or f"{prefix}.weight" in state

    if cfg.use_mm2_proj and _has_proj("model.mm2_projector"):
        params["mm2_projector"] = import_projector(
            state, "model.mm2_projector", cfg.mm_projector_type
        )
    if cfg.use_seg and _has_proj("model.seg_mm_projector"):
        params["seg_projector"] = import_projector(
            state, "model.seg_mm_projector", cfg.seg_mm_projector_type
        )
    if cfg.use_depth and _has_proj("model.depth_mm_projector"):
        params["depth_projector"] = import_projector(
            state, "model.depth_mm_projector", cfg.depth_mm_projector_type
        )
    if cfg.use_vcoder_lm_emb:
        key = "model.vcoder_lm_emb.weight"
        emb = state.get(key, state["model.embed_tokens.weight"])
        params["vcoder_lm_emb"] = jnp.asarray(emb)
    return params


# ---------------------------------------------------------------------------
# File-level loading
# ---------------------------------------------------------------------------


def load_safetensors_state(model_dir: str) -> StateDict:
    """Load all weight shards in a checkpoint directory as numpy.

    Prefers *.safetensors; falls back to torch ``pytorch_model*.bin``
    shards (the published liuhaotian/llava-v1.5 checkpoints ship .bin)."""
    state: StateDict = {}
    files = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if files:
        from safetensors import safe_open

        for fname in files:
            with safe_open(
                os.path.join(model_dir, fname), framework="np"
            ) as f:
                for key in f.keys():
                    state[key] = f.get_tensor(key)
        return state

    # Exclude non-weight pickles shipped alongside HF checkpoints —
    # training_args.bin etc. are arbitrary objects torch.load(weights_only)
    # refuses.
    _SKIP = ("optimizer", "training_args", "trainer_state", "scheduler",
             "rng_state")
    bins = sorted(
        f
        for f in os.listdir(model_dir)
        if f.endswith(".bin") and not f.startswith(_SKIP)
    )
    if not bins:
        raise FileNotFoundError(
            f"No .safetensors or .bin weight files in {model_dir}"
        )
    for fname in bins:
        state.update(load_torch_bin(os.path.join(model_dir, fname)))
    return state


def load_torch_bin(path: str) -> StateDict:
    """Load a torch-pickle state dict to numpy (CPU torch is available in
    the image; bf16 tensors convert via ml_dtypes view)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    state: StateDict = {}
    for k, v in raw.items():
        if v.dtype == torch.bfloat16:
            import ml_dtypes

            state[k] = (
                v.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
            )
        else:
            state[k] = v.numpy()
    return state


def auto_upgrade(model_dir: str, assume_yes: bool = False) -> None:
    """Upgrade a v0-era checkpoint whose config still says
    ``model_type: llama`` to ``llava`` (reference:
    vcoder_llava/model/utils.py:4-20). Rewrites config.json in place."""
    cfg_path = os.path.join(model_dir, "config.json")
    with open(cfg_path) as f:
        hf = json.load(f)
    if "llava" in model_dir and "llava" not in hf.get("model_type", ""):
        assert hf.get("model_type") == "llama", hf.get("model_type")
        print(
            "You are using newer LLaVA code base, while the checkpoint of"
            " v0 is from older code base."
        )
        if not assume_yes:
            confirm = input(
                "Please confirm that you want to upgrade the checkpoint."
                " [Y/N]"
            )
            if confirm.lower() not in ("y", "yes"):
                raise SystemExit("Checkpoint upgrade aborted.")
        hf["model_type"] = "llava"
        hf["architectures"] = ["LlavaLlamaForCausalLM"]
        with open(cfg_path, "w") as f:
            json.dump(hf, f, indent=2)
        print("Checkpoint upgraded.")


# ---------------------------------------------------------------------------
# Export (pytree -> HF layout)
# ---------------------------------------------------------------------------


def _unstack(
    out: StateDict, fmt: str, stacked: Array, transpose: bool
) -> None:
    # ONE host fetch for the whole stack, then numpy slicing: per-layer
    # np.asarray(stacked[i]) would issue L blocking device->host
    # transfers per tensor (~670 tunnel round trips for a 7B export).
    host = np.asarray(stacked)
    for i in range(host.shape[0]):
        m = host[i]
        out[fmt.format(i=i)] = _t(m) if transpose else m


def export_llama(params: dict, prefix: str = "model.") -> StateDict:
    out: StateDict = {
        prefix + "embed_tokens.weight": np.asarray(params["embed_tokens"]),
        prefix + "norm.weight": np.asarray(params["norm"]),
        "lm_head.weight": _t(np.asarray(params["lm_head"])),
    }
    lay = params["layers"]
    name_map = [
        ("input_layernorm.weight", "input_layernorm", False),
        ("post_attention_layernorm.weight", "post_attention_layernorm", False),
        ("self_attn.q_proj.weight", "q_proj", True),
        ("self_attn.k_proj.weight", "k_proj", True),
        ("self_attn.v_proj.weight", "v_proj", True),
        ("self_attn.o_proj.weight", "o_proj", True),
        ("mlp.gate_proj.weight", "gate_proj", True),
        ("mlp.up_proj.weight", "up_proj", True),
        ("mlp.down_proj.weight", "down_proj", True),
    ]
    for hf_name, ours, tr in name_map:
        _unstack(out, prefix + "layers.{i}." + hf_name, lay[ours], tr)
    return out


def export_clip(
    params: dict, cfg: VisionConfig, prefix: str
) -> StateDict:
    D = cfg.hidden_size
    P, C = cfg.patch_size, cfg.num_channels
    out: StateDict = {
        prefix + "embeddings.class_embedding": np.asarray(
            params["class_embedding"]
        ),
        prefix + "embeddings.patch_embedding.weight": _t(
            np.asarray(params["patch_embedding"])
        ).reshape(D, C, P, P),
        prefix + "embeddings.position_embedding.weight": np.asarray(
            params["position_embedding"]
        ),
        prefix + "pre_layrnorm.weight": np.asarray(
            params["pre_layernorm"]["scale"]
        ),
        prefix + "pre_layrnorm.bias": np.asarray(
            params["pre_layernorm"]["bias"]
        ),
    }
    lay = params["layers"]
    name_map = [
        ("layer_norm1.weight", "ln1_scale", False),
        ("layer_norm1.bias", "ln1_bias", False),
        ("layer_norm2.weight", "ln2_scale", False),
        ("layer_norm2.bias", "ln2_bias", False),
        ("self_attn.q_proj.weight", "q_proj", True),
        ("self_attn.q_proj.bias", "q_bias", False),
        ("self_attn.k_proj.weight", "k_proj", True),
        ("self_attn.k_proj.bias", "k_bias", False),
        ("self_attn.v_proj.weight", "v_proj", True),
        ("self_attn.v_proj.bias", "v_bias", False),
        ("self_attn.out_proj.weight", "out_proj", True),
        ("self_attn.out_proj.bias", "out_bias", False),
        ("mlp.fc1.weight", "fc1", True),
        ("mlp.fc1.bias", "fc1_bias", False),
        ("mlp.fc2.weight", "fc2", True),
        ("mlp.fc2.bias", "fc2_bias", False),
    ]
    for hf_name, ours, tr in name_map:
        _unstack(out, prefix + "encoder.layers.{i}." + hf_name, lay[ours], tr)
    return out


def export_projector(params: dict, prefix: str) -> StateDict:
    out: StateDict = {}
    for i, (w, b) in enumerate(zip(params["w"], params["b"])):
        idx = 2 * i
        out[f"{prefix}.{idx}.weight"] = _t(np.asarray(w))
        out[f"{prefix}.{idx}.bias"] = np.asarray(b)
    return out


def export_vcoder(params: dict, cfg: VCoderConfig) -> StateDict:
    """Inverse of :func:`import_vcoder` (HF-layout state dict)."""
    state = export_llama(params["lm"], prefix="model.")
    state.update(
        export_projector(params["mm_projector"], "model.mm_projector")
    )
    if "vision_tower" in params:
        state.update(
            export_clip(
                params["vision_tower"],
                cfg.vision,
                "model.vision_tower.vision_tower.vision_model.",
            )
        )
    if "mm2_projector" in params:
        state.update(
            export_projector(params["mm2_projector"], "model.mm2_projector")
        )
    if "seg_projector" in params:
        state.update(
            export_projector(
                params["seg_projector"], "model.seg_mm_projector"
            )
        )
    if "depth_projector" in params:
        state.update(
            export_projector(
                params["depth_projector"], "model.depth_mm_projector"
            )
        )
    if "vcoder_lm_emb" in params:
        state["model.vcoder_lm_emb.weight"] = np.asarray(
            params["vcoder_lm_emb"]
        )
    return state


def save_pretrained(model_dir: str, params: dict, cfg: VCoderConfig) -> None:
    """Write an HF-format checkpoint directory (config.json +
    model.safetensors) loadable by :func:`load_hf_checkpoint` — and by the
    reference's ``from_pretrained`` for the overlapping weight names."""
    from safetensors.numpy import save_file

    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(cfg.to_hf_config(), f, indent=2)
    state = export_vcoder(params, cfg)
    # safetensors requires contiguous arrays; bf16 numpy arrays come out of
    # jax as ml_dtypes and serialize fine.
    state = {k: np.ascontiguousarray(v) for k, v in state.items()}
    save_file(state, os.path.join(model_dir, "model.safetensors"))


def load_lora_checkpoint(
    model_path: str,
    model_base: str,
    dtype=jnp.bfloat16,
):
    """Load a PEFT-format LoRA checkpoint dir over a base model and merge.

    Mirrors the reference's LoRA path (reference: model/builder.py:44-81):
    base weights + ``non_lora_trainables.bin`` overlay (with the
    ``base_model.model.`` prefix strip) + PEFT ``merge_and_unload``
    (W += alpha/r * B @ A in HF [out, in] layout). Returns (config, params).
    """
    with open(os.path.join(model_path, "config.json")) as f:
        cfg = VCoderConfig.from_hf_config(json.load(f))

    state = load_safetensors_state(model_base)

    # non-LoRA trainables: projectors / vcoder_lm_emb / embeddings.
    nlt_path = os.path.join(model_path, "non_lora_trainables.bin")
    if os.path.exists(nlt_path):
        non_lora = load_torch_bin(nlt_path)
        non_lora = {
            (k[11:] if k.startswith("base_model.") else k): v
            for k, v in non_lora.items()
        }
        # Reference semantics (model/builder.py:60-63): if ANY key starts
        # with 'model.model.', strip 'model.' from EVERY 'model.'-prefixed
        # key — this turns 'model.lm_head.weight' into 'lm_head.weight'
        # too, not just the doubly-prefixed ones.
        if any(k.startswith("model.model.") for k in non_lora):
            non_lora = {
                (k[6:] if k.startswith("model.") else k): v
                for k, v in non_lora.items()
            }
        state.update(non_lora)

    # adapter weights + scale
    adapter_cfg = {}
    acfg_path = os.path.join(model_path, "adapter_config.json")
    if os.path.exists(acfg_path):
        adapter_cfg = json.load(open(acfg_path))
    from vcoder_tpu.lora import adapter_scale

    scale = adapter_scale(adapter_cfg)
    adapter_file = None
    for cand in ("adapter_model.safetensors", "adapter_model.bin"):
        p = os.path.join(model_path, cand)
        if os.path.exists(p):
            adapter_file = p
            break
    if adapter_file is None:
        raise FileNotFoundError(f"No adapter_model.* in {model_path}")
    if adapter_file.endswith(".safetensors"):
        from safetensors import safe_open

        adapters: StateDict = {}
        with safe_open(adapter_file, framework="np") as f:
            for key in f.keys():
                adapters[key] = f.get_tensor(key)
    else:
        adapters = load_torch_bin(adapter_file)

    for key, a in adapters.items():
        if ".lora_A." not in key:
            continue
        b = adapters[key.replace(".lora_A.", ".lora_B.")]
        w_name = (
            key.replace("base_model.model.", "")
            .replace(".lora_A.weight", ".weight")
        )
        if w_name not in state:
            raise KeyError(f"LoRA target {w_name} missing from base")
        w = state[w_name].astype(np.float32)
        # HF layout [out, in]: delta = B [out, r] @ A [r, in]
        delta = scale * (b.astype(np.float32) @ a.astype(np.float32))
        state[w_name] = (w + delta).astype(state[w_name].dtype)

    params = import_vcoder(state, cfg)
    if dtype is not None:
        import jax

        params = jax.tree.map(lambda x: x.astype(dtype), params)
    return cfg, params


def load_hf_checkpoint(
    model_dir: str,
    dtype=jnp.bfloat16,
    config_override: Optional[VCoderConfig] = None,
    state_overlay: Optional[StateDict] = None,
    config_dir: Optional[str] = None,
):
    """Load a local HF-format VCoder/LLaVA checkpoint directory.

    Returns (config, params). Mirrors the role of the reference's
    ``load_pretrained_model`` weight-loading core (reference:
    vcoder_llava/model/builder.py:93-143); tokenizer/processor assembly
    lives in vcoder_tpu/builder.py. ``state_overlay`` entries replace the
    loaded state before import (adapter-over-base loading);
    ``config_dir`` reads config.json from a different directory.
    """
    if config_override is None:
        with open(
            os.path.join(config_dir or model_dir, "config.json")
        ) as f:
            cfg = VCoderConfig.from_hf_config(json.load(f))
    else:
        cfg = config_override
    state = load_safetensors_state(model_dir)
    if state_overlay:
        state.update(state_overlay)
    params = import_vcoder(state, cfg)
    if dtype is not None:
        import jax

        params = jax.tree.map(lambda x: x.astype(dtype), params)
    return cfg, params
