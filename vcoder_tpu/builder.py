"""Model loading: the ``load_pretrained_model`` public API.

Mirrors the reference's 6-tuple contract (reference:
vcoder_llava/model/builder.py:25-154):

    load_pretrained_model(model_path, model_base, model_name, ...) ->
        (tokenizer, model, image_processor,
         seg_image_processor, depth_image_processor, context_len)

with the same name-based dispatch ('vcoder_it_llava' -> IT,
'vcoder_ds_llava' -> DS, 'vcoder_llava' -> VCoder, else LLaVA), the same
seg/depth-processor gating on 'vcoder'/'ds' in the model name
(builder.py:145-151), and the same ``context_len`` resolution
(builder.py:133-136). Quantized loading maps ``load_8bit``/``load_4bit``
to int8/int4 weight-only quantization (bitsandbytes NF4 has no TPU
analog; SURVEY.md §7.3).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from vcoder_tpu import generation as gen_mod
from vcoder_tpu.checkpoint import load_hf_checkpoint
from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.mm_tokens import get_model_name_from_path
from vcoder_tpu.preprocess import process_images


class VCoderImageProcessor:
    """CLIPImageProcessor-protocol shim over the on-device pipeline."""

    image_mean = (0.48145466, 0.4578275, 0.40821073)

    def __init__(self, size: int = 336, image_aspect_ratio: str = "pad"):
        self.size = size
        self.image_aspect_ratio = image_aspect_ratio
        self.crop_size = {"height": size, "width": size}

    def preprocess(self, images, return_tensors: str = "np", **kw):
        if not isinstance(images, (list, tuple)):
            images = [images]
        arr = process_images(
            images,
            image_aspect_ratio=kw.get(
                "image_aspect_ratio", self.image_aspect_ratio
            ),
            size=self.size,
        )
        return {"pixel_values": np.asarray(arr)}

    def __call__(self, images, **kw):
        return self.preprocess(images, **kw)


class VCoderForCausalLM:
    """Bundled (config, params) with HF-generate-like semantics.

    ``generate(input_ids, images=, segs=, depths=, ...)`` mirrors the
    forward kwargs of the reference model classes (reference:
    vcoder_llava/model/language_model/*.py).
    """

    def __init__(self, cfg: VCoderConfig, params: dict):
        self.config = cfg
        self.params = params

    def generate(
        self,
        input_ids: Sequence[Sequence[int]],
        images=None,
        segs=None,
        depths=None,
        *,
        max_new_tokens: int = 512,
        temperature: float = 0.0,
        top_p: float = 1.0,
        do_sample: Optional[bool] = None,
        tokenizer=None,
        stopping_criteria=None,
        seed: int = 0,
        lookahead: int = 0,
        **kw,
    ) -> gen_mod.GenerationResult:
        if do_sample is False:
            temperature = 0.0
        elif do_sample and temperature <= 0.0:
            # HF semantics: do_sample=True with no temperature samples
            # at T=1.0; temperature 0 here would silently run greedy.
            temperature = 1.0
        if images is not None:
            images = jnp.asarray(images)
        if segs is not None:
            segs = jnp.asarray(segs)
        if depths is not None:
            depths = jnp.asarray(depths)
        return gen_mod.generate(
            self.params,
            self.config,
            input_ids,
            images,
            segs,
            depths,
            max_new_tokens=max_new_tokens,
            temperature=temperature,
            top_p=top_p,
            seed=seed,
            tokenizer=tokenizer,
            stopping_criteria=stopping_criteria,
            lookahead=lookahead,
            # Forward only kwargs generate() knows; unknown HF-generate
            # kwargs (use_cache, top_k, ...) are accepted and ignored
            # like the HF API does.
            **{
                k: v
                for k, v in kw.items()
                if k in (
                    "pad_to",
                    "attn_impl",
                    "is_depth_zero",
                    "is_seg_zero",
                    "num_beams",
                    "length_penalty",
                )
            },
        )


def _load_tokenizer(model_path: str):
    from vcoder_tpu import simple_tokenizer

    if os.path.exists(os.path.join(model_path, simple_tokenizer.FILENAME)):
        return simple_tokenizer.SimpleTokenizer.from_pretrained(model_path)
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(model_path, use_fast=False)
    except Exception:
        try:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(model_path)
        except Exception:
            return None


def load_pretrained_model(
    model_path: str,
    model_base: Optional[str] = None,
    model_name: Optional[str] = None,
    load_8bit: bool = False,
    load_4bit: bool = False,
    device_map: str = "auto",
    device: str = "tpu",
    *,
    dtype=jnp.bfloat16,
    tokenizer=None,
):
    """Load a local HF-format VCoder/LLaVA checkpoint directory.

    Returns the reference 6-tuple. ``model_base`` supports the
    projector-only path (adapter dir with mm_projector weights over a full
    base checkpoint, reference builder.py:82-91).
    """
    if model_name is None:
        model_name = get_model_name_from_path(model_path)

    if model_base is not None and "lora" in model_name.lower():
        # PEFT-format LoRA dir over a base model (reference
        # builder.py:44-81): merge_and_unload equivalent.
        from vcoder_tpu.checkpoint import load_lora_checkpoint

        cfg, params = load_lora_checkpoint(
            model_path, model_base, dtype=dtype
        )
    elif model_base is not None:
        # Adapter-only checkpoint over a base model (reference
        # builder.py:82-91): the adapter dir holds only projector /
        # vcoder_lm_emb weights, so load its raw state dict (never a full
        # model import) and overlay onto the base's HF state.
        from vcoder_tpu.checkpoint import load_safetensors_state

        overlay = {}
        for k, v in load_safetensors_state(model_path).items():
            # tolerate reference-style 'base_model.' / bare prefixes
            k = k.replace("base_model.model.", "")
            if not k.startswith(("model.", "lm_head.")):
                k = "model." + k
            overlay[k] = v
        cfg, params = load_hf_checkpoint(
            model_base,
            dtype=dtype,
            state_overlay=overlay,
            config_dir=model_path,
        )
    else:
        cfg, params = load_hf_checkpoint(model_path, dtype=dtype)

    if load_8bit or load_4bit:
        from vcoder_tpu.quant import quantize_params

        params = quantize_params(params, bits=8 if load_8bit else 4)

    if tokenizer is None:
        tokenizer = _load_tokenizer(model_path)

    model = VCoderForCausalLM(cfg, params)

    image_processor = VCoderImageProcessor(
        size=cfg.vision.image_size,
        image_aspect_ratio=cfg.image_aspect_ratio,
    )
    # Processor aliases gated on the model NAME, exactly like the reference
    # (builder.py:145-151).
    lname = model_name.lower()
    seg_image_processor = image_processor if "vcoder" in lname else None
    depth_image_processor = image_processor if "ds" in lname else None

    context_len = cfg.model_max_length or 2048

    return (
        tokenizer,
        model,
        image_processor,
        seg_image_processor,
        depth_image_processor,
        context_len,
    )
