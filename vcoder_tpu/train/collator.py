"""Batch collation: per-sample dicts -> static-shape training batch.

Replaces the reference's pad-to-longest torch collators (reference:
train/train.py:862-893, vcoder_train.py:465-503,
vcoder_ds_train.py:775-821) with a direct build of the SplicePlan arrays —
the batch is ready for the compiled train step with no further reshaping.
Samples lacking a modality get zero pixel tensors (the reference does the
same, vcoder_train.py:456-460); their rows splice as pure text.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from vcoder_tpu.models.vcoder import plan_to_arrays
from vcoder_tpu.multimodal import build_splice_plan, validate_features


def collate_batch(
    samples: List[dict],
    *,
    num_patches: int,
    ds_mode: bool = False,
    it_mode: bool = False,
    use_seg: bool = False,
    use_depth: bool = False,
    image_size: int = 336,
    pad_to: Optional[int] = None,
    pad_multiple: int = 128,
    as_jnp: bool = True,
) -> Dict[str, np.ndarray]:
    """samples: dicts with input_ids, labels, and optional image/seg/depth
    pixel arrays [H, W, 3]."""
    input_ids = [s["input_ids"] for s in samples]
    labels = [s["labels"] for s in samples]
    has_image = any("image" in s for s in samples)
    has_seg = use_seg and has_image
    has_depth = use_depth and has_image

    zeros = np.zeros((image_size, image_size, 3), np.float32)

    def px(s, key):
        arr = s.get(key)
        return np.asarray(arr, np.float32) if arr is not None else zeros

    plan = build_splice_plan(
        input_ids,
        num_patches=num_patches,
        has_image=has_image,
        has_seg=has_seg,
        has_depth=has_depth,
        ds_mode=ds_mode,
        it_mode=it_mode,
        # Zero-pixel placeholders feed the reference's all-black skips
        # (vcoder_ds_llava_arch.py:160-171; vcoder_it_llava_arch.py:148).
        is_depth_zero=[("depth" not in s) for s in samples]
        if has_depth
        else None,
        is_seg_zero=[("seg" not in s) for s in samples]
        if (has_seg and it_mode)
        else None,
        labels=labels,
        pad_to=pad_to,
        pad_multiple=pad_multiple,
    )
    batch = plan_to_arrays(plan, include_labels=True)
    if has_image:
        # Training streams carry one pixel stack per modality per sample;
        # fail loudly if a conversation smuggled in extra sentinels.
        validate_features(
            plan,
            zeros[None] if has_image else None,
            zeros[None] if has_seg else None,
            zeros[None] if has_depth else None,
        )
        batch["images"] = np.stack([px(s, "image") for s in samples])
    if has_seg:
        batch["segs"] = np.stack([px(s, "seg") for s in samples])
    if has_depth:
        batch["depths"] = np.stack([px(s, "depth") for s in samples])
    if as_jnp:
        import jax.numpy as jnp

        batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return batch
