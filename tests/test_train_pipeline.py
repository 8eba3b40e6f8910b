"""Training pipeline tests: preprocessing masks, COST streams on a
synthetic data tree, collation, and a short end-to-end Trainer run with
checkpoint resume."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.constants import (
    DEPTH_TOKEN_INDEX,
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
    SEG_TOKEN_INDEX,
)
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.train.collator import collate_batch
from vcoder_tpu.train.datasets import (
    VCoderDataset,
    build_seg_cost_entries,
    get_depth_data_split,
    get_extra_count_data_split,
    obtain_seg_texts,
)
from vcoder_tpu.train.preprocess import (
    preprocess,
    preprocess_plain,
    preprocess_v1,
    relocate_sentinels,
)
from vcoder_tpu.train.sampler import LengthGroupedSampler
from vcoder_tpu.train.trainer import TrainArgs, Trainer


def test_relocate_sentinels():
    sources = [[
        {"from": "human", "value": "What is this?\n<image>\n<seg>"},
        {"from": "gpt", "value": "A dog."},
    ]]
    out = relocate_sentinels(sources, use_seg=True)
    assert out[0][0]["value"] == "<seg>\n<image>\nWhat is this?"


def test_preprocess_v1_masks_instructions(fake_tokenizer):
    sources = [[
        {"from": "human", "value": "<seg>\n<image>\nWhat objects are there?"},
        {"from": "gpt", "value": "two people and a car"},
    ]]
    out = preprocess_v1(sources, fake_tokenizer, mode="seg")
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert len(ids) == len(labels)
    assert IMAGE_TOKEN_INDEX in ids and SEG_TOKEN_INDEX in ids
    # Instruction + sentinels masked; answer visible.
    n_vis = sum(1 for l in labels if l != IGNORE_INDEX)
    assert 0 < n_vis < len(labels)
    # The visible span ends with the answer tokens + EOS. (The -2 offset is
    # exact for Llama sentencepiece; with the word-level test tokenizer it
    # leaves one extra boundary token visible, same as the reference would.)
    ans_ids = fake_tokenizer("two people and a car").input_ids[1:]
    vis = [l for l in labels if l != IGNORE_INDEX]
    assert vis[-len(ans_ids) - 1 : -1] == ans_ids
    assert vis[-1] == fake_tokenizer.eos_token_id


def test_preprocess_depth_offset(fake_tokenizer):
    sources = [[
        {
            "from": "human",
            "value": "<depth>\n<seg>\n<image>\nWhat objects are there?",
        },
        {"from": "gpt", "value": "a car"},
    ]]
    out = preprocess_v1(sources, fake_tokenizer, mode="depth_seg")
    ids = out["input_ids"][0]
    assert DEPTH_TOKEN_INDEX in ids
    # depth rounds use the -3 instruction offset: one extra visible token
    # vs the -2 variant on identical text.
    out_seg = preprocess_v1(
        [[
            {"from": "human", "value": "<seg>\n<image>\nWhat objects are there?"},
            {"from": "gpt", "value": "a car"},
        ]],
        fake_tokenizer,
        mode="seg",
    )
    vis_depth = sum(1 for l in out["labels"][0] if l != IGNORE_INDEX)
    vis_seg = sum(1 for l in out_seg["labels"][0] if l != IGNORE_INDEX)
    assert vis_depth == vis_seg + 1


def test_preprocess_plain(fake_tokenizer):
    sources = [[
        {"from": "human", "value": "<image>\nrandom stuff"},
        {"from": "gpt", "value": "a red bus parked"},
    ]]
    out = preprocess_plain(sources, fake_tokenizer)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert ids[1] == IMAGE_TOKEN_INDEX
    assert labels[0] == IGNORE_INDEX and labels[1] == IGNORE_INDEX
    assert labels[2] != IGNORE_INDEX


# ---------------------------------------------------------------------------
# Synthetic COST tree
# ---------------------------------------------------------------------------

KEYS = [f"img{i}.jpg" for i in range(6)]


def _make_cost_tree(root):
    from PIL import Image

    rng = np.random.RandomState(0)
    for bucket in ("train", "unlabeled", "test"):
        segm = os.path.join(root, "coco_segm_text", bucket)
        os.makedirs(segm, exist_ok=True)
        for task in ("panoptic", "semantic", "instance"):
            with open(os.path.join(segm, f"{task}.txt"), "w") as f:
                for k in KEYS:
                    f.write(
                        f"<IMG>{k}<IMG>The objects present in the image"
                        f" are: two people, a car, wall ({task})\n"
                    )
            inf_dir = os.path.join(segm, f"{task}_inference")
            os.makedirs(inf_dir, exist_ok=True)
            for k in KEYS:
                Image.fromarray(
                    rng.randint(0, 255, (48, 64, 3), np.uint8)
                ).save(os.path.join(inf_dir, k))
        # depth
        ddir = os.path.join(root, "coco_segm_text", "depth", bucket)
        os.makedirs(os.path.join(ddir, "depth"), exist_ok=True)
        with open(os.path.join(ddir, "panoptic_order.txt"), "w") as f:
            for k in KEYS:
                f.write(
                    f"<IMG>{k}<IMG>The depth order for the objects present"
                    f" in the image is: person, car, wall\n"
                )
        for k in KEYS:
            Image.fromarray(
                rng.randint(0, 255, (48, 64, 3), np.uint8)
            ).save(os.path.join(ddir, "depth", k))
        # rgb images
        img_dir = os.path.join(root, "coco", f"{bucket}2017")
        os.makedirs(img_dir, exist_ok=True)
        for k in KEYS:
            Image.fromarray(
                rng.randint(0, 255, (48, 64, 3), np.uint8)
            ).save(os.path.join(img_dir, k))


def test_obtain_seg_texts_dedup(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("<IMG>a.jpg<IMG>wall, person, wall, window, window\n")
    out = obtain_seg_texts(str(p))
    assert out["a.jpg"].count("wall") == 1
    assert out["a.jpg"].count("window") == 1


def test_build_seg_cost_entries(tmp_path):
    _make_cost_tree(str(tmp_path))
    entries = build_seg_cost_entries(str(tmp_path), seed=0)
    assert len(entries) == len(KEYS) * 3  # 3 buckets
    e = entries[0]
    assert set(e) >= {"conversations", "image", "seg", "seg_folder"}
    assert e["conversations"][0]["value"].endswith("\n<image>\n<seg>")
    # depth variant
    d = build_seg_cost_entries(str(tmp_path), seed=0, with_depth=True)
    assert d[0]["conversations"][0]["value"].endswith(
        "\n<image>\n<seg>\n<depth>"
    )
    assert "depth_folder" in d[0]


def test_depth_and_count_streams(tmp_path):
    _make_cost_tree(str(tmp_path))
    depth_entries = get_depth_data_split(str(tmp_path), seed=0)
    assert len(depth_entries) == len(KEYS) * 3
    assert "depth" in depth_entries[0]
    count_entries = get_extra_count_data_split(str(tmp_path), seed=0)
    # 1% gate on 6 keys -> usually 0; just ensure structure when present
    for e in count_entries:
        assert "conversations" in e and "seg" in e


def _tiny_dataset(tmp_path, fake_tokenizer, cfg):
    _make_cost_tree(str(tmp_path))
    entries = build_seg_cost_entries(
        str(tmp_path), buckets=("train",), seed=0, with_depth=True
    )
    return VCoderDataset(
        entries,
        fake_tokenizer,
        image_folder=str(tmp_path),
        seg_data_path=str(tmp_path),
        depth_data_path=str(tmp_path),
        image_size=cfg.vision.image_size,
        use_seg=True,
        use_depth=True,
        model_max_length=cfg.model_max_length,
    )


def test_dataset_getitem_and_collate(tmp_path, fake_tokenizer):
    cfg = VCoderConfig.tiny("vcoder_ds_llava")
    ds = _tiny_dataset(tmp_path, fake_tokenizer, cfg)
    sample = ds[0]
    assert {"input_ids", "labels", "image", "seg", "depth"} <= set(sample)
    assert sample["image"].shape == (28, 28, 3)

    batch = collate_batch(
        [ds[0], ds[1]],
        num_patches=cfg.vision.num_patches,
        ds_mode=True,
        use_seg=True,
        use_depth=True,
        image_size=cfg.vision.image_size,
        pad_multiple=16,
        as_jnp=False,
    )
    assert batch["safe_ids"].shape[0] == 2
    assert batch["images"].shape == (2, 28, 28, 3)
    assert (batch["labels"] != IGNORE_INDEX).sum() > 0


def test_sampler_covers_all_indices():
    lengths = [10, -5, 8, -3, 12, 7, -9, 11]
    s = LengthGroupedSampler(
        2, 2, lengths, seed=0, group_by_modality=True
    )
    idx = list(iter(s))
    assert sorted(idx) == list(range(len(lengths)))


def test_trainer_end_to_end_with_resume(tmp_path, fake_tokenizer):
    cfg = VCoderConfig.tiny("vcoder_ds_llava")
    ds = _tiny_dataset(tmp_path / "data", fake_tokenizer, cfg)
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)

    args = TrainArgs(
        output_dir=str(tmp_path / "out"),
        stage="vcoder_ds",
        learning_rate=1e-3,
        per_device_train_batch_size=2,
        num_train_epochs=1,
        save_steps=2,
        attn_impl="xla",
        remat=False,
    )
    trainer = Trainer(cfg, params, ds, args)
    history = trainer.train(max_steps=3)
    assert len(history) == 3
    assert all(np.isfinite(h["loss"]) for h in history)
    assert os.path.exists(str(tmp_path / "out" / "checkpoint-2"))
    assert os.path.exists(str(tmp_path / "out" / "metrics.jsonl"))

    # Adapter-only export contains exactly the stage's trainables.
    path = trainer.save_adapters()
    from safetensors import safe_open

    with safe_open(path, framework="np") as f:
        keys = list(f.keys())
    assert any("seg_projector" in k for k in keys)
    assert not any("embed_tokens" in k and "vcoder" not in k for k in keys)

    # Resume restores the step counter and params.
    params2 = model_mod.init_vcoder_params(jax.random.PRNGKey(1), cfg)
    trainer2 = Trainer(cfg, params2, ds, args)
    assert trainer2.maybe_resume()
    assert trainer2.step == 2
    np.testing.assert_array_equal(
        np.asarray(trainer2.params["seg_projector"]["w"][0]).shape,
        np.asarray(trainer.params["seg_projector"]["w"][0]).shape,
    )


def test_resume_equivalence(tmp_path, fake_tokenizer):
    """Crash-recovery guarantee: interrupt-at-2 + resume must produce
    BITWISE the same params and optimizer state as an uninterrupted
    4-step run — full state (params + opt_state + step) round-trips
    through Orbax and the data stream fast-forwards past consumed
    batches (the reference inherits this from HF Trainer +
    DeepSpeed checkpoints; train/train.py:1079-1082)."""
    cfg = VCoderConfig.tiny("vcoder_ds_llava")
    ds = _tiny_dataset(tmp_path / "data", fake_tokenizer, cfg)

    def args(sub):
        return TrainArgs(
            output_dir=str(tmp_path / sub),
            stage="vcoder_ds",
            learning_rate=1e-3,
            per_device_train_batch_size=2,
            num_train_epochs=2,
            save_steps=2,
            attn_impl="xla",
            remat=False,
        )

    # step_fn donates params/opt_state buffers — each run needs its own
    # freshly initialized (identical, seed-0) tree.
    def init():
        return model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)

    straight = Trainer(cfg, init(), ds, args("straight"))
    straight.train(max_steps=4)

    # Interrupted run: 2 steps (checkpoint-2 lands via save_steps),
    # then a FRESH trainer with different init resumes and finishes.
    first = Trainer(cfg, init(), ds, args("resumed"))
    first.train(max_steps=2)
    other = model_mod.init_vcoder_params(jax.random.PRNGKey(9), cfg)
    second = Trainer(cfg, other, ds, args("resumed"))
    assert second.maybe_resume() and second.step == 2
    second.train(max_steps=4)

    flat_a = jax.tree_util.tree_leaves_with_path(straight.params)
    flat_b = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(second.params)
    )
    assert len(flat_a) == len(flat_b)
    for k, va in flat_a:
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(flat_b[jax.tree_util.keystr(k)]),
            err_msg=f"param {jax.tree_util.keystr(k)} diverged on resume",
        )
    for va, vb in zip(
        jax.tree_util.tree_leaves(straight.opt_state),
        jax.tree_util.tree_leaves(second.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_depth_stream_is_panoptic_only(tmp_path):
    """The depth-object stream mirrors get_object_data_depth_split
    (vcoder_ds_train.py:461-497): PANOPTIC answers only (no task mix)
    and the 50000-entry post-shuffle cap applies to with_depth only."""
    _make_cost_tree(str(tmp_path / "d"))
    d = build_seg_cost_entries(
        str(tmp_path / "d"), seed=0, with_depth=True
    )
    assert d, "empty stream"
    assert all(
        e["seg_folder"].endswith("panoptic_inference") for e in d
    )
    # The seg-only stream still mixes tasks (uncapped).
    s = build_seg_cost_entries(str(tmp_path / "d"), seed=0)
    folders = {e["seg_folder"].rsplit("/", 1)[-1] for e in s}
    assert len(folders) > 1, folders


def test_it_stage_trains_mm_projector():
    """The IT recipe leaves mm_projector trainable (vcoder_it.py:713-722
    sets neither tune_ nor freeze_mm_mlp_adapter); it_lora passes
    --mm_projector_lr. Both stages must include it."""
    from vcoder_tpu.train.step import trainable_mask

    params = {
        "mm_projector": {"w": [jnp.ones((2, 2))]},
        "seg_projector": {"w": [jnp.ones((2, 2))]},
        "lm": {"layers": {"q_proj": jnp.ones((1, 2, 2))}},
    }
    for stage in ("it", "it_lora"):
        mask = trainable_mask(params, stage)
        assert mask["mm_projector"]["w"][0], stage


def test_depth_offset_applies_to_every_round(fake_tokenizer):
    """-3 is a CONVERSATION-level offset (has_depth flag), applied to
    every round even when only round 1 carries the <depth> sentinel
    (vcoder_ds_train.py:214-217)."""
    two_round = [[
        {
            "from": "human",
            "value": "<depth>\n<seg>\n<image>\nWhat objects are there?",
        },
        {"from": "gpt", "value": "a car"},
        {"from": "human", "value": "How many people are there?"},
        {"from": "gpt", "value": "two people"},
    ]]
    out = preprocess_v1(two_round, fake_tokenizer, mode="depth_seg")
    seg_variant = [[
        {
            "from": "human",
            "value": "<seg>\n<image>\nWhat objects are there?",
        },
        {"from": "gpt", "value": "a car"},
        {"from": "human", "value": "How many people are there?"},
        {"from": "gpt", "value": "two people"},
    ]]
    out_seg = preprocess_v1(seg_variant, fake_tokenizer, mode="seg")
    vis_depth = sum(1 for l in out["labels"][0] if l != IGNORE_INDEX)
    vis_seg = sum(1 for l in out_seg["labels"][0] if l != IGNORE_INDEX)
    # One extra visible token PER ROUND (2 rounds).
    assert vis_depth == vis_seg + 2


def test_preprocess_version_dispatch(fake_tokenizer):
    """preprocess(version=) must select the named conversation template
    (llava_v1 has a different system prompt than vicuna_v1)."""
    from vcoder_tpu.train.preprocess import preprocess as pp

    src = [[
        {"from": "human", "value": "What objects are there?"},
        {"from": "gpt", "value": "a car"},
    ]]
    a = pp(src, fake_tokenizer, version="v1")["input_ids"][0]
    b = pp(src, fake_tokenizer, version="llava_v1")["input_ids"][0]
    assert a != b  # different system prompts tokenize differently
    with pytest.raises(ValueError, match="unknown conversation"):
        pp(src, fake_tokenizer, version="nope")


def test_modality_lengths_double_negation():
    """Sign flips once per missing modality — the reference's exact
    (quirky) rule: text-only samples flip twice back to POSITIVE
    (vcoder_train.py:393-400)."""
    ds = VCoderDataset.__new__(VCoderDataset)
    ds.entries = [
        {"conversations": [{"value": "a b c"}], "image": "i", "seg": "s"},
        {"conversations": [{"value": "a b c"}], "image": "i"},
        {"conversations": [{"value": "a b c"}]},
    ]
    assert ds.modality_lengths == [3, -3, 3]


def test_threaded_loader_matches_inline(tmp_path, fake_tokenizer):
    """dataloader_workers>0 must yield bit-identical batches in the same
    order as inline loading (pool.map preserves order), so the threaded
    input pipeline cannot perturb resume determinism."""
    cfg = VCoderConfig.tiny("vcoder_ds_llava")
    ds = _tiny_dataset(tmp_path / "data", fake_tokenizer, cfg)
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)

    def batches(workers):
        args = TrainArgs(
            output_dir=str(tmp_path / f"out{workers}"),
            stage="vcoder_ds",
            per_device_train_batch_size=2,
            dataloader_workers=workers,
            prefetch_batches=0,
            attn_impl="xla",
            remat=False,
        )
        tr = Trainer(cfg, params, ds, args)
        return list(tr._epoch_batches(epoch=0, skip=0))

    inline, threaded = batches(0), batches(4)
    assert len(inline) == len(threaded) > 0
    for a, b in zip(inline, threaded):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_prefetch_overlaps_and_preserves_stream(tmp_path, fake_tokenizer):
    """_prefetched must (a) yield the generator's items unchanged and in
    order, and (b) actually run the producer AHEAD of the consumer —
    while the consumer holds batch 0, the background thread should have
    assembled further batches (the overlap that hides host decode +
    collate behind the device step)."""
    import time as _time

    cfg = VCoderConfig.tiny("vcoder_ds_llava")
    ds = _tiny_dataset(tmp_path / "data", fake_tokenizer, cfg)
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    args = TrainArgs(
        output_dir=str(tmp_path / "out"),
        stage="vcoder_ds",
        per_device_train_batch_size=2,
        prefetch_batches=2,
        attn_impl="xla",
        remat=False,
    )
    tr = Trainer(cfg, params, ds, args)

    produced = []

    def gen():
        for i in range(5):
            produced.append(i)
            yield {"i": np.asarray(i)}

    it = tr._prefetched(gen())
    first = next(it)
    assert int(first["i"]) == 0
    # Producer runs ahead: batch 0 consumed + 2 staged in the queue + 1
    # blocked in put() => all 5 tiny batches produced while we sit here.
    deadline = _time.time() + 5.0
    while len(produced) < 4 and _time.time() < deadline:
        _time.sleep(0.01)
    assert len(produced) >= 4, produced
    rest = [int(b["i"]) for b in it]
    assert rest == [1, 2, 3, 4]


def test_prefetch_propagates_producer_error(tmp_path, fake_tokenizer):
    cfg = VCoderConfig.tiny("vcoder_ds_llava")
    ds = _tiny_dataset(tmp_path / "data", fake_tokenizer, cfg)
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    args = TrainArgs(
        output_dir=str(tmp_path / "out"),
        stage="vcoder_ds",
        per_device_train_batch_size=2,
        prefetch_batches=1,
        attn_impl="xla",
        remat=False,
    )
    tr = Trainer(cfg, params, ds, args)

    def gen():
        yield {"i": np.asarray(0)}
        raise RuntimeError("decode failed")

    with pytest.raises(RuntimeError, match="decode failed"):
        list(tr._prefetched(gen()))
