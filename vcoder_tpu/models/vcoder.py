"""Unified VCoder model: one functional model covering all four variants.

Replaces the reference's four-class mixin pyramid (reference:
vcoder_llava/model/llava_arch.py, vcoder_llava_arch.py,
vcoder_ds_llava_arch.py, vcoder_it_llava_arch.py and the four
``language_model/*_llama.py`` wrappers) with config-driven branches:

* ``encode_vision`` runs the *shared* CLIP tower ONCE over the stacked
  ``[RGB; seg; depth]`` batch (the reference runs three sequential tower
  passes, vcoder_ds_llava_arch.py:135-171) and applies the per-modality
  projector heads.
* ``assemble_embeddings`` consumes a host-built :class:`SplicePlan` and
  materializes the spliced embedding sequence with two gathers and a
  select — no dynamic shapes, fuses into the prefill graph.
* ``prefill`` / ``decode_step`` are the jittable inference entry points.
* ``train_forward`` returns the shifted-CE loss of the reference
  (llava_llama.py:85-103).

Projector routing quirks preserved for checkpoint fidelity:

* When segs are present and ``use_mm2_proj``, RGB features go through
  ``mm2_projector`` (not ``mm_projector``) — vcoder_llava_arch.py:141-144.
* Depth features go through the *seg* projector when
  ``depth_through_seg_projector`` (vcoder_ds_llava_arch.py:111-114).
* Text embeds use ``vcoder_lm_emb`` when segs are present
  (vcoder_llava_arch.py:221,236,250); at inference this table equals
  ``embed_tokens`` (the reference re-clones it every forward, :180).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.models import clip as clip_mod
from vcoder_tpu.models import llama as llama_mod
from vcoder_tpu.models.projectors import apply_projector, init_projector_params
from vcoder_tpu.multimodal import SplicePlan


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_vcoder_params(
    rng: jax.Array, cfg: VCoderConfig, dtype=jnp.float32
) -> dict:
    keys = jax.random.split(rng, 8)
    D_v, D_t = cfg.vision.hidden_size, cfg.text.hidden_size
    params = {
        "lm": llama_mod.init_llama_params(keys[0], cfg.text, dtype),
        "vision_tower": clip_mod.init_clip_params(keys[1], cfg.vision, dtype),
        "mm_projector": init_projector_params(
            keys[2], cfg.mm_projector_type, D_v, D_t, dtype
        ),
    }
    if cfg.use_mm2_proj:
        params["mm2_projector"] = init_projector_params(
            keys[3], cfg.mm_projector_type, D_v, D_t, dtype
        )
    if cfg.use_seg:
        params["seg_projector"] = init_projector_params(
            keys[4], cfg.seg_mm_projector_type, D_v, D_t, dtype
        )
    if cfg.use_depth:
        params["depth_projector"] = init_projector_params(
            keys[5], cfg.depth_mm_projector_type, D_v, D_t, dtype
        )
    if cfg.use_vcoder_lm_emb:
        # A real copy, not an alias: it is an independent trainable in the
        # reference (cloned from embed_tokens, vcoder_llava_arch.py:180),
        # and aliased buffers break donation in the jitted train step.
        params["vcoder_lm_emb"] = params["lm"]["embed_tokens"] + 0
    return params


def initialize_missing_modules(
    params: dict, cfg: VCoderConfig, rng: jax.Array
) -> dict:
    """Add the adapter branches a stage trains when starting from a plain
    LLaVA base checkpoint.

    Mirrors the reference's initialize_{seg,depth}_modules + the mm2/vcoder
    bootstrap (reference: vcoder_llava_arch.py:95-120 random seg projector,
    vcoder_train.py:663-665 mm2 from pretrain mm_projector.bin,
    vcoder_it_llava_arch.py:101-107 seg projector FROM the vision
    mm_projector for IT, vcoder_llava_arch.py:180 vcoder_lm_emb clone).
    """
    keys = jax.random.split(rng, 4)
    D_v, D_t = cfg.vision.hidden_size, cfg.text.hidden_size
    dtype = params["lm"]["embed_tokens"].dtype
    if cfg.use_seg and "seg_projector" not in params:
        if cfg.model_type == "vcoder_it_llava":
            # IT initializes the seg projector from the vision projector.
            params["seg_projector"] = jax.tree.map(
                lambda x: x + 0, params["mm_projector"]
            )
        else:
            params["seg_projector"] = init_projector_params(
                keys[0], cfg.seg_mm_projector_type, D_v, D_t, dtype
            )
    if cfg.use_depth and "depth_projector" not in params:
        params["depth_projector"] = init_projector_params(
            keys[1], cfg.depth_mm_projector_type, D_v, D_t, dtype
        )
    if cfg.use_mm2_proj and "mm2_projector" not in params:
        # Frozen copy of the pretrained vision projector
        # (vcoder_train.py:663-665).
        params["mm2_projector"] = jax.tree.map(
            lambda x: x + 0, params["mm_projector"]
        )
    if cfg.use_vcoder_lm_emb and "vcoder_lm_emb" not in params:
        params["vcoder_lm_emb"] = params["lm"]["embed_tokens"] + 0
    return params


# ---------------------------------------------------------------------------
# Vision encode (single fused tower pass)
# ---------------------------------------------------------------------------


def encode_vision(
    params: dict,
    cfg: VCoderConfig,
    images: Optional[jnp.ndarray],
    segs: Optional[jnp.ndarray] = None,
    depths: Optional[jnp.ndarray] = None,
    *,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """Encode up to three modalities in ONE tower call.

    Args:
      images/segs/depths: [B, H, W, C] preprocessed pixel arrays — or
        [B, N, H, W, C] for multi-occurrence prompts (N sentinel
        occurrences per row; the reference consumes the next image's
        features per occurrence, llava_arch.py:141-162).

    Returns the per-sample vision feature table
    [B, (N_img + N_seg + N_dep)*576, D_t] laid out in the fixed
    (image-occurrences, seg-occurrences, depth-occurrences) order that
    ``multimodal.build_splice_plan`` indexes into.
    """
    # Normalize to [B, N, H, W, C]; N == 1 for the production single-
    # occurrence prompts.
    def _norm(x):
        return None if x is None else (x[:, None] if x.ndim == 4 else x)

    images, segs, depths = _norm(images), _norm(segs), _norm(depths)
    stacks = [x for x in (images, segs, depths) if x is not None]
    if not stacks:
        raise ValueError("encode_vision requires at least one modality")
    B = stacks[0].shape[0]
    hw_c = stacks[0].shape[2:]
    # Flatten occurrence-major per modality, concat into ONE tower batch.
    stacked = jnp.concatenate(
        [x.reshape((-1,) + hw_c) for x in stacks], axis=0
    )  # [B*N_img + B*N_seg + B*N_dep, H, W, C]
    feats = clip_mod.clip_encode(
        params["vision_tower"], cfg.vision, stacked, attn_impl=attn_impl
    )  # [sum(B*N_m), 576, D_v]
    P, D_v = feats.shape[1], feats.shape[2]

    def _take(x, offset):
        n = x.shape[1]
        f = feats[offset : offset + B * n]  # [B*n, 576, D_v]
        return f.reshape(B, n * P, D_v), offset + B * n

    outs = []
    offset = 0
    if images is not None:
        img_f, offset = _take(images, offset)
        # mm2_projector replaces mm_projector when segs ride along
        # (vcoder_llava_arch.py:141-144).
        if segs is not None and cfg.use_mm2_proj and "mm2_projector" in params:
            outs.append(apply_projector(params["mm2_projector"], img_f))
        else:
            outs.append(apply_projector(params["mm_projector"], img_f))
    if segs is not None:
        seg_f, offset = _take(segs, offset)
        outs.append(apply_projector(params["seg_projector"], seg_f))
    if depths is not None:
        dep_f, offset = _take(depths, offset)
        if cfg.depth_through_seg_projector:
            # Reference quirk: depth encodes through the seg projector
            # (vcoder_ds_llava_arch.py:111-114).
            outs.append(apply_projector(params["seg_projector"], dep_f))
        else:
            outs.append(apply_projector(params["depth_projector"], dep_f))
    return jnp.concatenate(outs, axis=1)  # [B, sum(N_m)*576, D_t]


# ---------------------------------------------------------------------------
# Embedding assembly (the compiled splice)
# ---------------------------------------------------------------------------


def assemble_embeddings(
    params: dict,
    cfg: VCoderConfig,
    safe_ids: jnp.ndarray,  # [B, T] int32
    is_text: jnp.ndarray,  # [B, T] bool
    vis_idx: jnp.ndarray,  # [B, T] int32
    vis_table: Optional[jnp.ndarray],  # [B, N_vis, D] or None (text-only)
    *,
    use_vcoder_emb: bool,
) -> jnp.ndarray:
    """Two gathers + select: the whole multimodal splice, statically shaped."""
    table = (
        params["vcoder_lm_emb"]
        if (use_vcoder_emb and "vcoder_lm_emb" in params)
        else params["lm"]["embed_tokens"]
    )
    text_e = jnp.take(table, safe_ids, axis=0)  # [B, T, D]
    if vis_table is None:
        return text_e
    vis_e = jnp.take_along_axis(
        vis_table, vis_idx[:, :, None], axis=1
    )  # [B, T, D]
    return jnp.where(is_text[:, :, None], text_e, vis_e.astype(text_e.dtype))


# ---------------------------------------------------------------------------
# Inference entry points
# ---------------------------------------------------------------------------


def prefill(
    params: dict,
    cfg: VCoderConfig,
    plan_arrays: dict,
    images: Optional[jnp.ndarray],
    segs: Optional[jnp.ndarray] = None,
    depths: Optional[jnp.ndarray] = None,
    *,
    cache: Optional[llama_mod.KVCache] = None,
    use_vcoder_emb: bool = False,
    attn_impl: str = "auto",
) -> Tuple[jnp.ndarray, Optional[llama_mod.KVCache]]:
    """Single fused prefill graph: vision encode -> splice -> decoder.

    Args:
      plan_arrays: dict with the SplicePlan arrays (safe_ids, is_text,
        vis_idx, attn_mask, position_ids, seq_lens) as jnp arrays.

    Returns (last_logits [B, V], updated cache).
    """
    vis_table = None
    if images is not None or segs is not None or depths is not None:
        # Gate on ANY modality: a seg/depth-only prompt (images=None)
        # has a valid splice plan and must encode, or its 576-feature
        # positions silently splice pad-token embeddings.
        vis_table = encode_vision(
            params, cfg, images, segs, depths, attn_impl=attn_impl
        )
    embeds = assemble_embeddings(
        params,
        cfg,
        plan_arrays["safe_ids"],
        plan_arrays["is_text"],
        plan_arrays["vis_idx"],
        vis_table,
        use_vcoder_emb=use_vcoder_emb,
    )
    hidden, cache = llama_mod.llama_forward(
        params["lm"],
        cfg.text,
        embeds,
        attn_mask=plan_arrays["attn_mask"],
        position_ids=plan_arrays["position_ids"],
        cache=cache,
        write_offset=(
            jnp.zeros_like(plan_arrays["seq_lens"]) if cache is not None else None
        ),
        attn_impl=attn_impl,
    )
    # Logits at each row's last real position.
    last = jnp.clip(plan_arrays["seq_lens"] - 1, 0, None)
    last_hidden = jnp.take_along_axis(
        hidden, last[:, None, None], axis=1
    )[:, 0]
    logits = llama_mod.lm_head(params["lm"], last_hidden[:, None, :])[:, 0]
    return logits, cache


def decode_step(
    params: dict,
    cfg: VCoderConfig,
    token: jnp.ndarray,  # [B] int32
    positions: jnp.ndarray,  # [B] absolute position of this token
    cache: llama_mod.KVCache,
    *,
    attn_impl: str = "auto",
) -> Tuple[jnp.ndarray, llama_mod.KVCache]:
    """One decode step. Returns (logits [B, V], cache)."""
    embeds = llama_mod.embed_tokens(params["lm"], token[:, None])
    hidden, cache = llama_mod.llama_forward(
        params["lm"],
        cfg.text,
        embeds,
        attn_mask=jnp.ones_like(token, bool)[:, None],
        position_ids=positions[:, None],
        cache=cache,
        write_offset=positions,
        attn_impl=attn_impl,
    )
    logits = llama_mod.lm_head(params["lm"], hidden)[:, 0]
    return logits, cache


# ---------------------------------------------------------------------------
# Training forward
# ---------------------------------------------------------------------------


def train_forward(
    params: dict,
    cfg: VCoderConfig,
    plan_arrays: dict,
    images: Optional[jnp.ndarray],
    segs: Optional[jnp.ndarray] = None,
    depths: Optional[jnp.ndarray] = None,
    *,
    use_vcoder_emb: bool = False,
    attn_impl: str = "auto",
    remat: bool = True,
) -> jnp.ndarray:
    """Shifted cross-entropy over label positions (llava_llama.py:85-103).

    In training the reference re-clones ``vcoder_lm_emb`` from the (frozen)
    ``embed_tokens`` each forward *only at init time semantics*; here the
    two tables are independent parameters and the trainable mask decides
    which one learns — equivalent behavior without the per-step copy.
    """
    from vcoder_tpu.constants import IGNORE_INDEX

    vis_table = None
    if images is not None or segs is not None or depths is not None:
        # Gate on ANY modality: a seg/depth-only prompt (images=None)
        # has a valid splice plan and must encode, or its 576-feature
        # positions silently splice pad-token embeddings.
        vis_table = encode_vision(
            params, cfg, images, segs, depths, attn_impl=attn_impl
        )
    embeds = assemble_embeddings(
        params,
        cfg,
        plan_arrays["safe_ids"],
        plan_arrays["is_text"],
        plan_arrays["vis_idx"],
        vis_table,
        use_vcoder_emb=use_vcoder_emb,
    )
    hidden, _ = llama_mod.llama_forward(
        params["lm"],
        cfg.text,
        embeds,
        attn_mask=plan_arrays["attn_mask"],
        position_ids=plan_arrays["position_ids"],
        attn_impl=attn_impl,
        remat=remat,
    )
    logits = llama_mod.lm_head(params["lm"], hidden)  # [B, T, V] f32

    labels = plan_arrays["labels"]
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(valid.sum(), 1)
    return (nll * valid).sum() / denom


def plan_to_arrays(plan: SplicePlan, include_labels: bool = False) -> dict:
    """SplicePlan (numpy) -> dict of jnp arrays for the jitted entry points."""
    out = {
        "safe_ids": jnp.asarray(plan.safe_ids),
        "is_text": jnp.asarray(plan.is_text),
        "vis_idx": jnp.asarray(plan.vis_idx),
        "attn_mask": jnp.asarray(plan.attn_mask),
        "position_ids": jnp.asarray(plan.position_ids),
        "seq_lens": jnp.asarray(plan.seq_lens),
    }
    if include_labels and plan.labels is not None:
        out["labels"] = jnp.asarray(plan.labels)
    return out
