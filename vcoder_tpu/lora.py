"""LoRA: low-rank adapters as weight wrappers.

Replaces the reference's PEFT integration (reference: train/train.py
LoRA args + find_all_linear_names:167-180, model/builder.py:44-81 LoRA
merge path, scripts/merge_lora_weights.py) with a pytree-native design:
a :class:`LoraWeight` wraps any matmul leaf; ``qmatmul`` computes
``x @ W + scale * (x @ A) @ B`` without ever materializing the merged
matrix, so the frozen base can stay int8-quantized underneath. Training
masks target the ``a``/``b`` leaves (stage ``lora`` / ``it_lora``).

``merge_lora`` folds adapters back into plain weights for serving — the
analog of PEFT ``merge_and_unload``.
"""

from __future__ import annotations

import dataclasses
import logging
import math
import re
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

from vcoder_tpu.ops.quant import QuantizedTensor, dequantize
from vcoder_tpu.parallel.sharding import _path_str

# The reference LoRA-targets every linear in the LM
# (find_all_linear_names skips mm projector / lm_head / vision tower).
DEFAULT_TARGETS = [
    r"^lm/layers/[qkv]_proj$",
    r"^lm/layers/o_proj$",
    r"^lm/layers/(gate|up|down)_proj$",
]


@dataclasses.dataclass
class LoraWeight:
    """base: [..., in, out] (plain or quantized); a: [..., in, r];
    b: [..., r, out]; scale = alpha / r (static)."""

    base: Any
    a: jnp.ndarray
    b: jnp.ndarray
    scale: float

    @property
    def shape(self):
        return self.base.shape

    @property
    def ndim(self):
        return self.base.ndim


jax.tree_util.register_dataclass(
    LoraWeight, data_fields=["base", "a", "b"], meta_fields=["scale"]
)


def adapter_scale(acfg: dict) -> float:
    """PEFT adapter scaling: alpha/r, or alpha/sqrt(r) under rsLoRA.
    Per-module rank_pattern/alpha_pattern overrides change the scale per
    target — fail loudly rather than silently mis-scale the adapter."""
    if acfg.get("rank_pattern") or acfg.get("alpha_pattern"):
        raise ValueError(
            "adapters with rank_pattern/alpha_pattern are not supported"
        )
    r = float(acfg.get("r", 8))
    alpha = float(acfg.get("lora_alpha", 16))
    if acfg.get("use_rslora"):
        return alpha / math.sqrt(r)
    return alpha / r


def add_lora(
    params: Any,
    rng: jax.Array,
    *,
    rank: int = 128,
    alpha: float = 256.0,
    targets: Sequence[str] = tuple(DEFAULT_TARGETS),
    dtype=None,
) -> Any:
    """Wrap matching weight leaves with fresh LoRA adapters.

    A is kaiming-ish normal, B zero (standard LoRA init: adapters start
    as identity). Defaults mirror scripts/v1_5/finetune_lora.sh
    (lora_r 128, lora_alpha 256).
    """
    patterns = [re.compile(p) for p in targets]
    counter = [0]

    def leaf(path, x):
        s = _path_str(path)
        if not any(p.match(s) for p in patterns):
            return x
        if isinstance(x, LoraWeight):
            return x
        shape = x.shape
        in_dim, out_dim = shape[-2], shape[-1]
        lead = shape[:-2]
        key = jax.random.fold_in(rng, counter[0])
        counter[0] += 1
        if dtype is not None:
            dt = dtype
        elif isinstance(x, QuantizedTensor):
            dt = jnp.bfloat16  # adapters can't train in the base's int8
        else:
            dt = x.dtype
        a = jax.random.normal(key, lead + (in_dim, rank), dt) * jnp.asarray(
            in_dim**-0.5, dt
        )
        b = jnp.zeros(lead + (rank, out_dim), dt)
        return LoraWeight(base=x, a=a, b=b, scale=float(alpha) / rank)

    return jax.tree_util.tree_map_with_path(
        leaf,
        params,
        # LoraWeight must be a leaf here or tree_map recurses into its
        # a/b/base sub-arrays and the already-wrapped guard in `leaf`
        # can never fire (double-wrapping protection).
        is_leaf=lambda x: isinstance(x, (QuantizedTensor, LoraWeight)),
    )


def merge_lora(params: Any) -> Any:
    """Fold every LoraWeight into a plain dense weight (serving path;
    analog of PEFT merge_and_unload, scripts/merge_lora_weights.py)."""

    def leaf(x):
        if not isinstance(x, LoraWeight):
            return x
        base = x.base
        if isinstance(base, QuantizedTensor):
            base = dequantize(base, dtype=x.a.dtype)
        delta = jnp.einsum(
            "...ir,...ro->...io", x.a.astype(jnp.float32),
            x.b.astype(jnp.float32),
        ) * x.scale
        return (base.astype(jnp.float32) + delta).astype(base.dtype)

    return jax.tree.map(
        leaf, params, is_leaf=lambda x: isinstance(x, (LoraWeight,))
    )


def lora_qmatmul(x: jnp.ndarray, w: LoraWeight) -> jnp.ndarray:
    """x @ W_eff without materializing the merged matrix."""
    from vcoder_tpu.ops.quant import qmatmul

    y = qmatmul(x, w.base)
    lo = (x @ w.a.astype(x.dtype)) @ w.b.astype(x.dtype)
    return y + jnp.asarray(w.scale, x.dtype) * lo


# ---------------------------------------------------------------------------
# Multi-LoRA serving: N adapters on one base model, chosen per batch row.
# The reference can only merge ONE adapter into the weights at load time
# (model/builder.py:44-81); serving different adapters means one model
# copy each. Here the adapter stacks ride next to the frozen base and
# every decode row picks its own adapter by index — N personalities for
# the price of one base model + the (small) adapter stacks.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MultiLoraWeight:
    """base: [L, in, out] (plain or quantized); a: [L, n, in, R];
    b: [L, n, R, out] (per-adapter alpha/r folded in, ranks zero-padded
    to R, index 0 = the zero "no adapter"); idx: [L, B] int32 per-row
    adapter choice, replicated per layer so `lax.scan` over the layer
    axis slices every field uniformly (~1 KB of duplication)."""

    base: Any
    a: jnp.ndarray
    b: jnp.ndarray
    idx: jnp.ndarray

    @property
    def shape(self):
        return self.base.shape

    @property
    def ndim(self):
        return self.base.ndim


jax.tree_util.register_dataclass(
    MultiLoraWeight, data_fields=["base", "a", "b", "idx"], meta_fields=[]
)


def multilora_qmatmul(x: jnp.ndarray, w: MultiLoraWeight) -> jnp.ndarray:
    """x @ W_eff with a per-row adapter: rows gather their [in, R]/[R, out]
    factors from the stacks. x: [B, T, in] (decode T=1 / verify T=k)."""
    from vcoder_tpu.ops.quant import qmatmul

    y = qmatmul(x, w.base)
    a = jnp.take(w.a, w.idx, axis=0).astype(x.dtype)  # [B, in, R]
    b = jnp.take(w.b, w.idx, axis=0).astype(x.dtype)  # [B, R, out]
    lo = jnp.einsum("bti,bir->btr", x, a)
    return y + jnp.einsum("btr,bro->bto", lo, b)


def extract_adapters(tree: Any) -> dict:
    """{path_str: (a, b, scale)} for every LoraWeight in a params tree
    (what `add_lora` / training produce). Dicts of that shape pass
    through unchanged."""
    if isinstance(tree, dict) and tree and all(
        isinstance(v, tuple) and len(v) == 3 for v in tree.values()
    ):
        return dict(tree)
    out = {}

    def leaf(path, x):
        if isinstance(x, LoraWeight):
            out[_path_str(path)] = (x.a, x.b, x.scale)
        return x

    jax.tree_util.tree_map_with_path(
        leaf, tree, is_leaf=lambda x: isinstance(x, (LoraWeight,
                                                     QuantizedTensor))
    )
    return out


def stack_adapters(
    params: Any, adapters: "dict[str, Any]", max_batch: int
) -> "tuple[Any, dict]":
    """Build the multi-adapter serving params: every weight path any
    adapter targets becomes a MultiLoraWeight whose stacks hold [zero,
    adapter_1, ..., adapter_n] (sorted by name), ranks zero-padded to the
    max and each adapter's alpha/r folded into its b. Returns
    (wrapped_params, {name: index}); index 0 is reserved for "no
    adapter"."""
    names = sorted(adapters)
    trees = {n: extract_adapters(adapters[n]) for n in names}
    for n in names:
        if not trees[n]:
            raise ValueError(f"adapter {n!r} has no LoRA targets")
    paths = sorted({p for t in trees.values() for p in t})
    if not paths:
        raise ValueError("no LoRA targets found in any adapter")
    name_to_idx = {n: i + 1 for i, n in enumerate(names)}
    wrapped_paths: set = set()

    def wrap(path, x):
        s = _path_str(path)
        if s not in paths:
            return x
        wrapped_paths.add(s)
        in_dim, out_dim = x.shape[-2], x.shape[-1]
        if x.ndim != 3:
            # multilora_qmatmul gathers per-layer-sliced factors; a 2-D
            # base would crash at trace time with an opaque rank error.
            raise ValueError(
                f"multi-LoRA target {s} must be layer-stacked "
                f"[L, in, out]; got shape {tuple(x.shape)}"
            )
        L = x.shape[0]
        entries = [trees[n].get(s) for n in names]
        for n, e in zip(names, entries):
            if e is None:
                continue
            got = e[0].shape[0] if e[0].ndim == 3 else 1
            if got != L or e[0].shape[-2] != in_dim:
                raise ValueError(
                    f"adapter {n!r} at {s}: A is {tuple(e[0].shape)} but "
                    f"the base weight is stacked over {L} layers with "
                    f"in_dim {in_dim} — a partial-layer adapter "
                    f"(layers_to_transform) is not supported"
                )
            if e[1].shape[-1] != out_dim:
                raise ValueError(
                    f"adapter {n!r} at {s}: B is {tuple(e[1].shape)} but "
                    f"the base weight's out_dim is {out_dim} (adapter "
                    f"trained on a different architecture?)"
                )
        R = max(e[0].shape[-1] for e in entries if e is not None)
        dt = next(e[0].dtype for e in entries if e is not None)
        a_stack = [jnp.zeros((L, in_dim, R), dt)]
        b_stack = [jnp.zeros((L, R, out_dim), dt)]
        for e in entries:
            if e is None:
                a_stack.append(jnp.zeros((L, in_dim, R), dt))
                b_stack.append(jnp.zeros((L, R, out_dim), dt))
                continue
            a, b, scale = e
            a = a.reshape(L, in_dim, -1).astype(dt)
            b = (b.reshape(L, -1, out_dim).astype(jnp.float32)
                 * float(scale)).astype(dt)
            r = a.shape[-1]
            a = jnp.pad(a, ((0, 0), (0, 0), (0, R - r)))
            b = jnp.pad(b, ((0, 0), (0, R - r), (0, 0)))
            a_stack.append(a)
            b_stack.append(b)
        return MultiLoraWeight(
            base=x,
            a=jnp.stack(a_stack, axis=1),  # [L, n+1, in, R]
            b=jnp.stack(b_stack, axis=1),
            idx=jnp.zeros((L, max_batch), jnp.int32),
        )

    wrapped = jax.tree_util.tree_map_with_path(
        wrap, params,
        is_leaf=lambda x: isinstance(x, (QuantizedTensor, LoraWeight)),
    )
    # An adapter none of whose target paths exist in this param tree
    # would otherwise serve as an all-zero (base-model) adapter.
    for n in names:
        if not (set(trees[n]) & wrapped_paths):
            raise ValueError(
                f"adapter {n!r} targets no parameter of this model "
                f"(paths: {sorted(trees[n])[:4]}...)"
            )
    return wrapped, name_to_idx


def set_row_adapter(params: Any, slot: int, adapter_idx: int) -> Any:
    """Point one batch row at an adapter (0 = none). Tiny on-device
    scatters into the [L, B] idx leaves; shapes are unchanged so jitted
    graphs keep their caches."""

    def leaf(x):
        if isinstance(x, MultiLoraWeight):
            return dataclasses.replace(
                x, idx=x.idx.at[:, slot].set(adapter_idx)
            )
        return x

    return jax.tree.map(
        leaf, params,
        is_leaf=lambda x: isinstance(x, (MultiLoraWeight, LoraWeight,
                                         QuantizedTensor)),
    )


def single_adapter_view(params: Any, adapter_idx: int) -> Any:
    """B=1 prefill view: slice adapter ``adapter_idx`` out of every
    MultiLoraWeight as a plain LoraWeight (scale already folded into b).
    idx 0 slices the zero adapter, so the view's structure — and the
    prefill jit cache — is identical with or without an adapter."""

    def leaf(x):
        if isinstance(x, MultiLoraWeight):
            return LoraWeight(
                base=x.base, a=x.a[:, adapter_idx], b=x.b[:, adapter_idx],
                scale=1.0,
            )
        return x

    return jax.tree.map(
        leaf, params,
        is_leaf=lambda x: isinstance(x, (MultiLoraWeight, LoraWeight,
                                         QuantizedTensor)),
    )


def load_lora_adapter_dir(model_path: str) -> dict:
    """Parse a PEFT-format adapter dir into {path: (a, b, scale)} WITHOUT
    merging (the multi-LoRA serving input; `load_lora_checkpoint` is the
    reference-parity merge path). HF keys
    ``...model.layers.{i}.self_attn.q_proj.lora_A.weight`` [r, in] /
    ``lora_B`` [out, r] stack to our [L, in, r] / [L, r, out] layout."""
    import json as _json
    import os

    import numpy as np

    from vcoder_tpu.checkpoint import load_torch_bin

    acfg = {}
    acfg_path = os.path.join(model_path, "adapter_config.json")
    if os.path.exists(acfg_path):
        acfg = _json.load(open(acfg_path))
    scale = adapter_scale(acfg)

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

        state = {}
        with safe_open(adapter_file, framework="np") as f:
            for key in f.keys():
                state[key] = f.get_tensor(key)
    else:
        state = load_torch_bin(adapter_file)

    per_proj: dict = {}
    pat = re.compile(
        r"layers\.(\d+)\.(?:self_attn|mlp)\.(\w+_proj)\.lora_([AB])\.weight$"
    )
    skipped = []
    for key, v in state.items():
        m = pat.search(key)
        if m is None:
            if "lora_" in key or "modules_to_save" in key:
                skipped.append(key)
            continue
        li, proj, ab = int(m.group(1)), m.group(2), m.group(3)
        per_proj.setdefault(proj, {}).setdefault(ab, {})[li] = np.asarray(v)
    if skipped:
        # Serving a half-applied adapter silently degrades outputs —
        # make the gap loud (embed_tokens/lm_head/vision targets and
        # modules_to_save aren't stackable per-layer factors).
        logging.getLogger("vcoder_tpu").warning(
            "load_lora_adapter_dir(%s): %d adapter tensors target "
            "unsupported modules and were skipped (e.g. %s)",
            model_path, len(skipped), skipped[0],
        )

    out = {}
    for proj, mats in per_proj.items():
        if set(mats.get("A", {})) != set(mats.get("B", {})):
            raise ValueError(
                f"{model_path}: {proj} lora_A/lora_B cover different "
                f"layers ({sorted(mats.get('A', {}))} vs "
                f"{sorted(mats.get('B', {}))})"
            )
        layers = sorted(mats["A"])
        # torch [r, in] / [out, r] -> [L, in, r] / [L, r, out]
        a = jnp.asarray(
            np.stack([mats["A"][i].T for i in layers])
        )
        b = jnp.asarray(
            np.stack([mats["B"][i].T for i in layers])
        )
        out[f"lm/layers/{proj}"] = (a, b, scale)
    return out
