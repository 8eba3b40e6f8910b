"""Tests for the static-shape splice plan against reference splice semantics.

Expected layouts are derived from the reference's per-sample splice loops
(reference: vcoder_llava/model/llava_arch.py:99-200,
vcoder_llava_arch.py:185-296, vcoder_ds_llava_arch.py:126-314).
"""

import numpy as np
import pytest

from vcoder_tpu.constants import (
    DEPTH_TOKEN_INDEX as DEP,
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX as IMG,
    SEG_TOKEN_INDEX as SEG,
)
from vcoder_tpu.multimodal import build_splice_plan

N = 4  # tiny num_patches for tests


def segments(plan, row=0):
    """Decode a plan row into a readable [('T', id) | ('V', idx)] list."""
    out = []
    L = plan.seq_lens[row]
    for t in range(L):
        if plan.is_text[row, t]:
            out.append(("T", int(plan.safe_ids[row, t])))
        else:
            out.append(("V", int(plan.vis_idx[row, t])))
    return out


def test_llava_single_image():
    ids = [[1, 10, 11, IMG, 20, 21]]
    plan = build_splice_plan(ids, num_patches=N, pad_multiple=8)
    expect = (
        [("T", 1), ("T", 10), ("T", 11)]
        + [("V", i) for i in range(N)]
        + [("T", 20), ("T", 21)]
    )
    assert segments(plan) == expect
    assert plan.seq_lens[0] == 6 - 1 + N
    assert plan.seq_len % 8 == 0
    assert not plan.use_vcoder_emb
    assert plan.vis_table_size == N


def test_vcoder_seg_cluster():
    """Cluster [IMG, SEG] -> [text, img feats, seg feats, text]."""
    ids = [[1, 10, IMG, SEG, 20]]
    plan = build_splice_plan(
        ids, num_patches=N, has_seg=True, ds_mode=False, pad_multiple=8
    )
    expect = (
        [("T", 1), ("T", 10)]
        + [("V", i) for i in range(N)]  # image block at base 0
        + [("V", N + i) for i in range(N)]  # seg block at base N
        + [("T", 20)]
    )
    assert segments(plan) == expect
    assert plan.use_vcoder_emb
    assert plan.vis_table_size == 2 * N


def test_ds_depth_sentinel_dropped():
    """DS quirk: cluster [IMG, DEP, SEG] -> depth features NEVER spliced;
    the -400 sentinel is consumed by the seg loop without emitting anything
    (vcoder_ds_llava_arch.py:233-244)."""
    ids = [[1, 10, IMG, DEP, SEG, 20]]
    plan = build_splice_plan(
        ids,
        num_patches=N,
        has_seg=True,
        has_depth=True,
        ds_mode=True,
        is_depth_zero=[False],
        pad_multiple=8,
    )
    expect = (
        [("T", 1), ("T", 10)]
        + [("V", i) for i in range(N)]  # image
        + [("V", N + i) for i in range(N)]  # seg
        + [("T", 20)]
    )
    assert segments(plan) == expect
    # Depth block exists in the table but is never referenced.
    assert plan.vis_table_size == 3 * N
    used = set(plan.vis_idx[0][~plan.is_text[0] & plan.attn_mask[0]])
    assert all(u < 2 * N for u in used)


def test_ds_depth_after_seg_is_spliced():
    """A -400 after the last -300 WOULD be spliced (depth loop reachable)."""
    ids = [[1, IMG, SEG, 30, DEP, 40]]
    plan = build_splice_plan(
        ids,
        num_patches=N,
        has_seg=True,
        has_depth=True,
        ds_mode=True,
        is_depth_zero=[False],
        pad_multiple=8,
    )
    expect = (
        [("T", 1)]
        + [("V", i) for i in range(N)]
        + [("V", N + i) for i in range(N)]
        + [("T", 30)]
        + [("V", 2 * N + i) for i in range(N)]
        + [("T", 40)]
    )
    assert segments(plan) == expect


def test_ds_seg_loop_drops_preceding_text():
    """DS seg loop emits only features; text between IMG and SEG is dropped
    (vcoder_ds_llava_arch.py:238)."""
    ids = [[1, IMG, 30, 31, SEG, 40]]
    plan = build_splice_plan(
        ids, num_patches=N, has_seg=True, ds_mode=True, pad_multiple=8
    )
    expect = (
        [("T", 1)]
        + [("V", i) for i in range(N)]
        + [("V", N + i) for i in range(N)]  # 30, 31 dropped!
        + [("T", 40)]
    )
    assert segments(plan) == expect


def test_vcoder_seg_loop_keeps_preceding_text():
    """Non-DS seg loop embeds the preceding text (vcoder_llava_arch.py:236)."""
    ids = [[1, IMG, 30, 31, SEG, 40]]
    plan = build_splice_plan(
        ids, num_patches=N, has_seg=True, ds_mode=False, pad_multiple=8
    )
    expect = (
        [("T", 1)]
        + [("V", i) for i in range(N)]
        + [("T", 30), ("T", 31)]
        + [("V", N + i) for i in range(N)]
        + [("T", 40)]
    )
    assert segments(plan) == expect


def test_labels_ignore_over_features_and_ds_drop():
    ids = [[1, IMG, 30, SEG, 40]]
    labels = [[-100, -100, 300, -100, 400]]
    plan = build_splice_plan(
        ids,
        num_patches=N,
        has_seg=True,
        ds_mode=True,
        labels=labels,
        pad_multiple=8,
    )
    L = plan.seq_lens[0]
    lab = list(plan.labels[0][:L])
    # [1] + N img + N seg + [40]; label of text '30' dropped with it.
    assert lab == [-100] + [IGNORE_INDEX] * N + [IGNORE_INDEX] * N + [400]
    # Padding labels are IGNORE.
    assert all(v == IGNORE_INDEX for v in plan.labels[0][L:])


def test_passthrough_rows():
    # llava: no image token -> pure text
    plan = build_splice_plan([[1, 5, 6]], num_patches=N, pad_multiple=8)
    assert segments(plan) == [("T", 1), ("T", 5), ("T", 6)]

    # vcoder arch: image present but seg missing -> passthrough (OR cond)
    plan = build_splice_plan(
        [[1, IMG, 5]], num_patches=N, has_seg=True, ds_mode=False, pad_multiple=8
    )
    L = plan.seq_lens[0]
    assert L == 3
    assert plan.is_text[0, :L].all()

    # ds arch: image present, seg missing -> NOT passthrough (AND cond)
    plan = build_splice_plan(
        [[1, IMG, 5]], num_patches=N, has_seg=True, ds_mode=True, pad_multiple=8
    )
    assert plan.seq_lens[0] == 2 + N


def test_ragged_batch_padding():
    ids = [[1, IMG, 5], [1, 2, 3]]
    plan = build_splice_plan(ids, num_patches=N, pad_multiple=8)
    assert plan.seq_lens.tolist() == [2 + N, 3]
    assert plan.attn_mask[0, : 2 + N].all() and not plan.attn_mask[0, 2 + N :].any()
    assert plan.attn_mask[1, :3].all() and not plan.attn_mask[1, 3:].any()
    np.testing.assert_array_equal(
        plan.position_ids[1, :3], np.arange(3, dtype=np.int32)
    )


def test_multi_occurrence_consumes_successive_blocks():
    """Repeated <image> sentinels consume SUCCESSIVE feature blocks, like
    the reference's cur_image_idx += 1 walk (llava_arch.py:141-162)."""
    plan = build_splice_plan(
        [[1, IMG, 5, IMG, 6]], num_patches=N, pad_multiple=8
    )
    expect = (
        [("T", 1)]
        + [("V", i) for i in range(N)]  # occurrence 0 -> block 0
        + [("T", 5)]
        + [("V", N + i) for i in range(N)]  # occurrence 1 -> block 1
        + [("T", 6)]
    )
    assert segments(plan) == expect
    assert plan.n_image == 2
    assert plan.vis_table_size == 2 * N


def test_multi_occurrence_ragged_batch_and_seg_base():
    """The table is laid out for the batch-wide max occurrence count; the
    seg base shifts past ALL image blocks, and rows with fewer sentinels
    never index the surplus block."""
    ids = [
        [1, IMG, 5, IMG, SEG, 6],  # 2 images + 1 seg
        [1, IMG, SEG, 7],  # 1 image + 1 seg
    ]
    plan = build_splice_plan(
        ids, num_patches=N, has_seg=True, ds_mode=False, pad_multiple=8
    )
    assert plan.n_image == 2 and plan.n_seg == 1
    assert plan.vis_table_size == 3 * N
    seg_base = 2 * N
    expect0 = (
        [("T", 1)]
        + [("V", i) for i in range(N)]
        + [("T", 5)]
        + [("V", N + i) for i in range(N)]
        + [("V", seg_base + i) for i in range(N)]
        + [("T", 6)]
    )
    expect1 = (
        [("T", 1)]
        + [("V", i) for i in range(N)]
        + [("V", seg_base + i) for i in range(N)]
        + [("T", 7)]
    )
    assert segments(plan, 0) == expect0
    assert segments(plan, 1) == expect1


def test_multi_occurrence_encode_vision_layout():
    """encode_vision with [B, N, H, W, C] lays the table out occurrence-
    major per modality, matching what the plan indexes into."""
    import jax
    import jax.numpy as jnp

    from vcoder_tpu.config import VCoderConfig
    from vcoder_tpu.models import vcoder as model_mod

    cfg = VCoderConfig.tiny("vcoder_llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    hw = cfg.vision.image_size
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 2, hw, hw, 3))
    segs = jax.random.normal(jax.random.PRNGKey(2), (2, hw, hw, 3))

    table = model_mod.encode_vision(params, cfg, imgs, segs)
    P = cfg.vision.num_patches
    assert table.shape[1] == 3 * P  # 2 image blocks + 1 seg block

    # Occurrence k of the image modality == encoding image k alone.
    for k in range(2):
        single = model_mod.encode_vision(params, cfg, imgs[:, k], segs)
        np.testing.assert_allclose(
            np.asarray(table[:, k * P : (k + 1) * P]),
            np.asarray(single[:, :P]),
            atol=1e-5,
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(table[:, 2 * P :]),
            np.asarray(single[:, P:]),
            atol=1e-5,
            rtol=1e-5,
        )


def test_image_sentinel_without_features_not_spliced():
    """has_image=False with an <image> sentinel in the row: the table
    has ZERO image blocks, so splicing would alias another modality's
    offset-0 block. The sentinel must fall through as an attended pad
    text position instead (the stand-in for the reference's raw embed
    of the negative id when images are absent)."""
    plan = build_splice_plan(
        [[1, IMG, 5, SEG, 6]],
        num_patches=4,
        has_image=False,
        has_seg=True,
    )
    assert plan.n_image == 0 and plan.n_seg == 1
    L = int(plan.seq_lens[0])
    # Exactly the seg block's 4 positions are vision; the <image>
    # position is text (pad) and attended.
    assert int((~plan.is_text[0, :L]).sum()) == 4
    assert plan.vis_idx[0, ~plan.is_text[0]].max() < 4  # seg block only
    assert bool(plan.attn_mask[0, 1])
    assert plan.safe_ids[0, 1] == 0  # pad-mapped sentinel


def test_validate_features_rejects_unplanned_stacks():
    """Features provided for a modality the plan has no blocks for
    (depths on a non-DS prompt) must fail loudly, not silently drop."""
    import numpy as np

    from vcoder_tpu.multimodal import validate_features

    plan = build_splice_plan(
        [[1, IMG, 5]], num_patches=4, has_image=True
    )
    px = np.zeros((1, 8, 8, 3), np.float32)
    validate_features(plan, px)  # planned: fine
    with pytest.raises(ValueError, match="no <depth> blocks"):
        validate_features(plan, px, depths=px)
