"""Quantify the offloaded-opt-state EAGER fallback's per-step cost.

On multi-device meshes the host-pinned jit-output path cannot compile on
this jax/XLA pin (docs/ROADMAP.md #5; canary in tests/test_parallel.py),
so `make_train_step(offload_shardings=...)` latches an eager post-step
`device_put` of the opt state to pinned host memory. This script measures
what that costs per step vs the device-resident step, on the 8-device
virtual CPU mesh (where the fallback actually engages) at a config whose
Adam moments are big enough to matter:

    python scripts/bench_offload.py [--devices 8] [--layers 8]
        [--hidden 512] [--steps 5]

Reports: device-resident step time, eager-offloaded step time, the delta,
and the opt-state bytes moved per step (the delta should track 2x those
bytes over host-link bandwidth; on the CPU mesh "host link" is memcpy, so
the delta is a LOWER bound for a real PCIe/DCN link).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    os.environ.setdefault("VCODER_TPU_PLATFORM", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _example_batch
    from vcoder_tpu.config import TextConfig, VCoderConfig, VisionConfig
    from vcoder_tpu.models import vcoder as model_mod
    from vcoder_tpu.parallel import make_mesh, shard_batch, shard_params, use_mesh
    from vcoder_tpu.parallel.sharding import (
        device_shardings_like,
        host_shardings,
    )
    from vcoder_tpu.train.step import (
        init_opt_state,
        make_optimizer,
        make_train_step,
    )

    base = VCoderConfig.tiny("vcoder_ds_llava")
    cfg = dataclasses.replace(
        base,
        vision=VisionConfig(
            image_size=28, patch_size=14, hidden_size=64,
            intermediate_size=128, num_layers=2, num_heads=2,
        ),
        text=TextConfig(
            vocab_size=4096,
            hidden_size=args.hidden,
            intermediate_size=4 * args.hidden,
            num_layers=args.layers,
            num_heads=8,
            num_kv_heads=8,
            max_position_embeddings=1024,
        ),
    )

    mesh = make_mesh(jax.devices()[: args.devices], data=2, fsdp=2, model=2)
    with use_mesh(mesh):
        batch = shard_batch(
            _example_batch(cfg, 4, pad_multiple=16, with_labels=True), mesh
        )
        optimizer = make_optimizer(1e-3, total_steps=100)

        def build(offload):
            params = shard_params(
                model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg),
                mesh,
            )
            opt = init_opt_state(params, optimizer, "full")
            off = None
            if offload:
                host_sh = host_shardings(opt, mesh)
                opt = jax.device_put(opt, host_sh)
                off = (device_shardings_like(host_sh), host_sh)
            step = make_train_step(
                cfg, optimizer, stage="full", attn_impl="xla",
                remat=False, offload_shardings=off,
            )
            return params, opt, step

        report = {}
        for mode in ("resident", "offloaded"):
            params, opt, step = build(mode == "offloaded")
            params, opt, m = step(params, opt, batch)  # compile
            jax.block_until_ready(m["loss"])
            t0 = time.perf_counter()
            for _ in range(args.steps):
                params, opt, m = step(params, opt, batch)
            jax.block_until_ready(m["loss"])
            report[mode] = (time.perf_counter() - t0) / args.steps
            if mode == "offloaded":
                report["latched"] = getattr(step, "mode", ["?"])[0]
            opt_bytes = sum(
                x.size * x.dtype.itemsize for x in jax.tree.leaves(opt)
                if hasattr(x, "size")
            )

        delta = report["offloaded"] - report["resident"]
        print(
            f"mesh={dict(mesh.shape)} layers={args.layers} "
            f"hidden={args.hidden} opt_state={opt_bytes / 1e6:.0f} MB "
            f"(mode latched: {report['latched']})\n"
            f"device-resident step : {report['resident'] * 1e3:8.1f} ms\n"
            f"eager-offloaded step : {report['offloaded'] * 1e3:8.1f} ms\n"
            f"per-step overhead    : {delta * 1e3:8.1f} ms "
            f"({delta / report['resident'] * 100:.0f}% of the resident "
            f"step; ~{2 * opt_bytes / max(delta, 1e-9) / 1e9:.1f} GB/s "
            "implied round-trip bandwidth)"
        )


if __name__ == "__main__":
    main()
