"""Parameter and activation sharding rules.

Declarative path→PartitionSpec rules over the model pytree. The layout is
Megatron-style tensor parallelism on the ``model`` axis (column-parallel
up-projections, row-parallel down-projections, head-sharded attention)
combined with ZeRO-3-style parameter sharding on the ``fsdp`` axis — XLA's
SPMD partitioner materializes the all-gathers/reduce-scatters that DeepSpeed
performs explicitly in the reference (reference: scripts/zero3.json,
train/train.py:113-124).

Layer-stacked weights have a leading ``num_layers`` axis (axis 0 of every
``layers/*`` rule below) that is never sharded — it is the ``lax.scan``
carrier dimension.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, PartitionSpec). First match wins. Paths are '/'-joined key
# sequences, e.g. "lm/layers/q_proj" or "mm_projector/w/0".
PARAM_RULES = [
    # --- Llama decoder ---
    (r"^lm/embed_tokens$", P("fsdp", "model")),
    (r"^lm/layers/(input|post_attention)_layernorm$", P()),
    (r"^lm/layers/[qkv]_proj$", P(None, "fsdp", "model")),
    (r"^lm/layers/o_proj$", P(None, "model", "fsdp")),
    (r"^lm/layers/(gate|up)_proj$", P(None, "fsdp", "model")),
    (r"^lm/layers/down_proj$", P(None, "model", "fsdp")),
    (r"^lm/norm$", P()),
    (r"^lm/lm_head$", P("fsdp", "model")),
    (r"^vcoder_lm_emb$", P("fsdp", "model")),
    # --- CLIP tower ---
    (r"^vision_tower/class_embedding$", P()),
    (r"^vision_tower/patch_embedding$", P("fsdp", "model")),
    (r"^vision_tower/position_embedding$", P(None, "model")),
    (r"^vision_tower/pre_layernorm/.*$", P()),
    (r"^vision_tower/layers/ln[12]_(scale|bias)$", P()),
    (r"^vision_tower/layers/[qkv]_proj$", P(None, "fsdp", "model")),
    (r"^vision_tower/layers/[qkv]_bias$", P(None, "model")),
    (r"^vision_tower/layers/out_proj$", P(None, "model", "fsdp")),
    (r"^vision_tower/layers/out_bias$", P()),
    (r"^vision_tower/layers/fc1$", P(None, "fsdp", "model")),
    (r"^vision_tower/layers/fc1_bias$", P(None, "model")),
    (r"^vision_tower/layers/fc2$", P(None, "model", "fsdp")),
    (r"^vision_tower/layers/fc2_bias$", P()),
    # --- projectors (mm / mm2 / seg / depth): small MLPs, fsdp-shard the
    # matrices, replicate biases ---
    (r"^(mm|mm2|seg|depth)_projector/w/\d+$", P("fsdp", None)),
    (r"^(mm|mm2|seg|depth)_projector/b/\d+$", P()),
]

# Batch-bearing activations shard their leading axis over (data, fsdp) —
# fsdp devices process distinct samples, their parameter shards are gathered
# at use (ZeRO-3 semantics).
BATCH_AXES = ("data", "fsdp")


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):  # DictKey
            parts.append(str(p.key))
        elif hasattr(p, "idx"):  # SequenceKey
            parts.append(str(p.idx))
        elif hasattr(p, "name"):  # GetAttrKey (registered dataclasses)
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


_WRAPPER_FIELDS = {"q", "scale", "base", "a", "b", "idx"}


def _unwrap_path(path):
    """Strip trailing QuantizedTensor/LoraWeight FIELD components —
    identified as dataclass attributes (GetAttrKey), so a dict key
    literally named 'scale' (a layernorm) is never eaten."""
    parts = list(path)
    while (
        parts
        and not hasattr(parts[-1], "key")  # not a DictKey
        and hasattr(parts[-1], "name")  # GetAttrKey
        and str(parts[-1].name).lstrip(".") in _WRAPPER_FIELDS
    ):
        parts.pop()
    return parts


def spec_for_path(path_str: str) -> P:
    # Quantized weights carry '/q' + '/scale' leaf suffixes and LoRA wraps
    # add '/base', '/a', '/b'; all shard like the underlying weight
    # (incompatible dims drop axes via _shrink_to_fit). String-level
    # fallback for callers without key-path objects; param_shardings
    # strips type-aware via _unwrap_path.
    path_str = re.sub(r"(/(q|scale|base|a|b))+$", "", path_str)
    for pattern, spec in PARAM_RULES:
        if re.match(pattern, path_str):
            return spec
    return P()  # replicate by default


def _shrink_to_fit(spec: P, shape, mesh: Mesh) -> P:
    """Drop mesh axes from a spec when the dimension isn't divisible by the
    axis size (tiny test configs) or the spec has more dims than the leaf."""
    if len(spec) > len(shape):
        return P()
    out = []
    for dim, names in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if names is None:
            out.append(None)
            continue
        names_t = names if isinstance(names, tuple) else (names,)
        size = 1
        for nm in names_t:
            size *= mesh.shape[nm]
        out.append(names if dim % size == 0 else None)
    while out and out[-1] is None:
        out.pop()
    return P(*out)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedSharding mirroring ``params``."""

    def leaf(path, x):
        spec = spec_for_path(_path_str(_unwrap_path(path)))
        spec = _shrink_to_fit(spec, x.shape, mesh)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place ``params`` on the mesh according to the rules. One batched
    device_put over the whole pytree: per-leaf calls would pay one
    dispatch each (~15 ms over the tunnel, seconds for a 7B tree)."""
    return jax.device_put(params, param_shardings(params, mesh))


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Leading-axis batch sharding for inputs of rank ``ndim``
    (scalars replicate)."""
    if ndim == 0:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(BATCH_AXES, *([None] * (ndim - 1))))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every array in a batch pytree over its leading axis."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), batch
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---- host offload (the zero3_offload analog) ----
#
# reference: scripts/zero3_offload.json — DeepSpeed ZeRO-3 with
# offload_optimizer {device: cpu, pin_memory: true} for memory-tight
# full-LLM finetunes. The TPU-native analog parks pytree leaves in
# pinned host memory via sharding memory_kind='pinned_host' (same mesh,
# same PartitionSpec — each host holds its devices' shards); the train
# step streams them to device at use. At 7B the f32 Adam moments are
# 8 bytes/param = ~54 GB — the largest training-only footprint.


def _with_memory_kind(x, mesh: Mesh, memory_kind) -> NamedSharding:
    spec = (
        x.sharding.spec
        if isinstance(getattr(x, "sharding", None), NamedSharding)
        else P()
    )
    if memory_kind is None:
        return NamedSharding(mesh, spec)
    return NamedSharding(mesh, spec, memory_kind=memory_kind)


def host_shardings(tree: Any, mesh: Mesh) -> Any:
    """Pytree of pinned-host NamedShardings mirroring each leaf's current
    spec (replicated for leaves without a NamedSharding).

    Scalar (rank-0) leaves — optimizer step counts and the like — keep the
    DEFAULT memory kind (no annotation): offloading them saves nothing,
    and any explicit memory-kind on a jit ``out_shardings`` leaf lowers to
    a side-effecting ``annotate_device_placement`` custom-call that the
    SPMD partitioner RET_CHECKs on for a bare ``s32[]`` (scalars never
    receive a sharding annotation, unlike shaped leaves). Leaving them
    unannotated lets the whole offloaded train step compile under SPMD."""
    return jax.tree.map(
        lambda x: _with_memory_kind(
            x, mesh,
            "pinned_host" if getattr(x, "ndim", 0) else None,
        ),
        tree,
    )


def device_shardings_like(host_sh: Any) -> Any:
    """Device-memory twins of a host-sharding pytree (leaves the default
    memory kind untouched — see the scalar note in :func:`host_shardings`)."""
    return jax.tree.map(
        lambda s: (
            NamedSharding(s.mesh, s.spec, memory_kind="device")
            if s.memory_kind == "pinned_host"
            else NamedSharding(s.mesh, s.spec)
        ),
        host_sh,
    )


def offload_to_host(tree: Any, mesh: Mesh) -> Any:
    """Move a pytree into pinned host memory, keeping its mesh layout
    (one batched device_put, not one dispatch per leaf)."""
    return jax.device_put(tree, host_shardings(tree, mesh))
