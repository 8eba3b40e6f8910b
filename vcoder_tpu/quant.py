"""Whole-model weight-only quantization pass.

Maps the reference's ``load_8bit``/``load_4bit`` flags (reference:
vcoder_llava/model/builder.py:28-37, bitsandbytes int8/NF4) to TPU int8/int4
weight-only quantization of the large matmul weights. Embedding tables,
norms, biases, and the small projector MLPs stay in the original dtype
(matching bitsandbytes' skip of non-Linear modules).
"""

from __future__ import annotations

import re
from typing import Any

import jax

from vcoder_tpu.ops.quant import QuantizedTensor, quantize
from vcoder_tpu.parallel.sharding import _path_str

# Large matmul weights worth quantizing (the 7B/13B decoder dominates).
QUANTIZE_PATHS = [
    r"^lm/layers/[qkv]_proj$",
    r"^lm/layers/o_proj$",
    r"^lm/layers/(gate|up|down)_proj$",
    r"^lm/lm_head$",
    r"^vision_tower/layers/[qkv]_proj$",
    r"^vision_tower/layers/out_proj$",
    r"^vision_tower/layers/fc[12]$",
]


def quantize_params(params: Any, bits: int = 8, destroy: bool = True) -> Any:
    """Quantize the heavyweight matmul leaves of a model pytree.

    The per-leaf quantize runs jitted (XLA fuses the f32 upcast — an eager
    pass would materialize ~6 GB transients per stacked 7B tensor) and, with
    ``destroy=True`` (default), each full-precision leaf reference is
    replaced in the input tree's (mutated) containers as soon as its
    quantized replacement exists, so the bf16 buffer frees immediately and
    peak HBM stays near the model size instead of 2x it.
    """
    patterns = [re.compile(p) for p in QUANTIZE_PATHS]
    jq = jax.jit(quantize, static_argnames=("bits",))

    def walk(node, path):
        if isinstance(node, dict):
            items = node if destroy else dict(node)
            for k in list(items.keys()):
                items[k] = walk(items[k], path + (k,))
            return items
        if isinstance(node, list):
            items = node if destroy else list(node)
            for i in range(len(items)):
                items[i] = walk(items[i], path + (str(i),))
            return items
        s = "/".join(path)
        if any(p.match(s) for p in patterns):
            return jq(node, bits=bits)
        return node

    return walk(params, ())
