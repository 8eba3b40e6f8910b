"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Exercises the dp/fsdp/tp mesh layout, parameter sharding rules, and the full
sharded training step (SURVEY.md §4 implication: multi-device tests without
TPU hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.constants import (
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
    SEG_TOKEN_INDEX,
)
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.multimodal import build_splice_plan
from vcoder_tpu.parallel import (
    make_mesh,
    param_shardings,
    shard_batch,
    shard_params,
)
from vcoder_tpu.train.step import (
    init_opt_state,
    make_optimizer,
    make_train_step,
    trainable_mask,
)


def _mesh():
    return make_mesh(jax.devices(), data=2, fsdp=2, model=2)


def test_mesh_axes():
    mesh = _mesh()
    assert dict(mesh.shape) == {"data": 2, "fsdp": 2, "model": 2}


def test_param_sharding_rules_applied():
    cfg = VCoderConfig.tiny("vcoder_ds_llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    mesh = _mesh()
    shardings = param_shardings(params, mesh)

    q_spec = shardings["lm"]["layers"]["q_proj"].spec
    assert tuple(q_spec) == (None, "fsdp", "model")
    emb_spec = shardings["lm"]["embed_tokens"].spec
    assert tuple(emb_spec) == ("fsdp", "model")
    norm_spec = shardings["lm"]["norm"].spec
    assert tuple(norm_spec) == ()

    sharded = shard_params(params, mesh)
    q = sharded["lm"]["layers"]["q_proj"]
    assert not q.sharding.is_fully_replicated
    # Numerics unchanged by placement.
    np.testing.assert_array_equal(
        np.asarray(q), np.asarray(params["lm"]["layers"]["q_proj"])
    )


def test_trainable_mask_stages():
    cfg = VCoderConfig.tiny("vcoder_ds_llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    mask = trainable_mask(params, "vcoder_ds")
    assert mask["seg_projector"]["w"][0] is True
    assert mask["depth_projector"]["w"][0] is True
    assert mask["vcoder_lm_emb"] is True
    assert mask["lm"]["embed_tokens"] is False
    assert mask["mm_projector"]["w"][0] is False
    assert mask["vision_tower"]["patch_embedding"] is False

    mask_pre = trainable_mask(params, "pretrain")
    assert mask_pre["mm_projector"]["w"][0] is True
    assert mask_pre["seg_projector"]["w"][0] is False


def _make_batch(cfg, batch_size):
    np.random.seed(0)
    rows, label_rows = [], []
    for _ in range(batch_size):
        ids = [1] + list(np.random.randint(5, 250, size=12))
        ids[3] = IMAGE_TOKEN_INDEX
        ids[4] = SEG_TOKEN_INDEX
        labels = [IGNORE_INDEX] * 6 + ids[6:]
        rows.append(ids)
        label_rows.append(labels)
    plan = build_splice_plan(
        rows,
        num_patches=cfg.vision.num_patches,
        has_image=True,
        has_seg=True,
        has_depth=True,
        ds_mode=True,
        labels=label_rows,
        pad_multiple=16,
    )
    batch = model_mod.plan_to_arrays(plan, include_labels=True)
    hw = cfg.vision.image_size
    batch["images"] = jnp.asarray(
        np.random.randn(batch_size, hw, hw, 3), jnp.float32
    )
    batch["segs"] = jnp.asarray(
        np.random.randn(batch_size, hw, hw, 3), jnp.float32
    )
    batch["depths"] = jnp.asarray(
        np.random.randn(batch_size, hw, hw, 3), jnp.float32
    )
    return batch


@pytest.mark.slow
def test_sharded_train_step_runs_and_learns():
    cfg = VCoderConfig.tiny("vcoder_ds_llava")
    mesh = _mesh()
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    params = shard_params(params, mesh)

    optimizer = make_optimizer(1e-2, total_steps=10)
    opt_state = init_opt_state(params, optimizer, "vcoder_ds")
    step = make_train_step(
        cfg, optimizer, stage="vcoder_ds", attn_impl="xla", remat=False
    )

    batch = shard_batch(_make_batch(cfg, 4), mesh)
    frozen_before = np.asarray(params["lm"]["layers"]["q_proj"]).copy()
    seg_before = np.asarray(params["seg_projector"]["w"][0]).copy()

    losses = []
    for _ in range(3):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # adapters are learning
    # Frozen params untouched; trainable params moved.
    np.testing.assert_array_equal(
        np.asarray(params["lm"]["layers"]["q_proj"]), frozen_before
    )
    assert np.abs(
        np.asarray(params["seg_projector"]["w"][0]) - seg_before
    ).max() > 0


def test_data_parallel_batch_sharding():
    mesh = _mesh()
    x = jnp.arange(4 * 8, dtype=jnp.float32).reshape(4, 8)
    sharded = shard_batch({"x": x}, mesh)["x"]
    spec = sharded.sharding.spec
    assert tuple(spec)[0] == ("data", "fsdp")
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(x))


@pytest.mark.slow
def test_offloaded_full_finetune_matches_resident():
    """zero3_offload analog: the 'full' stage with the optimizer state
    pinned in host memory must produce the SAME parameters as the
    device-resident step (the offload is a placement change, not a
    numerics change), and the returned opt state must live in
    pinned_host."""
    from vcoder_tpu.parallel.sharding import (
        device_shardings_like,
        host_shardings,
    )

    cfg = VCoderConfig.tiny("vcoder_ds_llava")
    mesh = _mesh()
    batch = shard_batch(_make_batch(cfg, 4), mesh)

    def run(offload: bool):
        params = shard_params(
            model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg), mesh
        )
        optimizer = make_optimizer(1e-2, total_steps=10)
        opt_state = init_opt_state(params, optimizer, "full")
        offload_shardings = None
        if offload:
            host_sh = host_shardings(opt_state, mesh)
            opt_state = jax.tree.map(
                jax.device_put, opt_state, host_sh
            )
            offload_shardings = (
                device_shardings_like(host_sh), host_sh,
            )
        step = make_train_step(
            cfg, optimizer, stage="full", attn_impl="xla", remat=False,
            offload_shardings=offload_shardings,
        )
        for _ in range(2):
            params, opt_state, metrics = step(params, opt_state, batch)
        return params, opt_state, float(metrics["loss"])

    params_res, _, loss_res = run(offload=False)
    params_off, opt_off, loss_off = run(offload=True)

    assert np.isclose(loss_off, loss_res, rtol=1e-5)
    # The 'full' stage trains the LM: q_proj must match across modes.
    np.testing.assert_allclose(
        np.asarray(params_off["lm"]["layers"]["q_proj"]),
        np.asarray(params_res["lm"]["layers"]["q_proj"]),
        rtol=1e-6, atol=1e-7,
    )
    # Shaped leaves (the Adam moments, the footprint) sit in pinned host
    # memory; rank-0 step counters deliberately stay device-side
    # (parallel/sharding.py host_shardings scalar note).
    kinds = {
        x.sharding.memory_kind for x in jax.tree.leaves(opt_off)
        if hasattr(x, "sharding") and x.ndim > 0
    }
    assert kinds == {"pinned_host"}


def test_pinned_jit_outputs_spmd_canary():
    """Canary for the upstream XLA limitation that forces the offloaded
    train step's eager fallback on multi-device meshes (train/step.py):
    a jit with a host-pinned out_sharding whose value is replicated
    across any mesh axis must FAIL to compile under SPMD — the
    memory-kind annotation lowers to a side-effecting
    annotate_device_placement custom-call the partitioner rejects.

    If this test ever XPASSES after a jax/XLA upgrade, the pinned path
    works again: re-enable the `mode == ["pinned"]` assertion in
    __graft_entry__.dryrun_multichip and drop this canary."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _mesh()
    host = NamedSharding(mesh, P(("data", "fsdp")), memory_kind="pinned_host")
    dev = NamedSharding(mesh, P(("data", "fsdp")), memory_kind="device")
    # 4-way sharded over data x fsdp, replicated over model — the shape
    # every FSDP opt-state moment has.
    x = jax.device_put(jnp.arange(16.0), host)

    def step(x):
        return jax.device_put(x, dev) * 2.0

    with pytest.raises(Exception, match="Side-effect"):
        jax.block_until_ready(jax.jit(step, out_shardings=host)(x))


def test_trainer_offload_requires_mesh(tmp_path):
    from vcoder_tpu.train.trainer import TrainArgs, Trainer

    cfg = VCoderConfig.tiny("vcoder_ds_llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    args = TrainArgs(
        output_dir=str(tmp_path), stage="full", offload_opt_state=True,
    )
    with pytest.raises(ValueError, match="mesh"):
        Trainer(cfg, params, dataset=[], args=args)
