"""Training loop: sharded steps, bucketing, checkpoint/resume, logging.

Replaces the reference's HF-Trainer + DeepSpeed stack (reference:
train/llava_trainer.py, train/vcoder_*_trainer.py, the ``train()`` drivers)
with a compact TPU-native loop:

* batches collate into bucketed static sequence lengths so XLA compiles a
  handful of shapes, not one per batch;
* parameters/optimizer shard over the (data, fsdp, model) mesh; the step
  is the jitted FSDP step from train/step.py;
* Orbax checkpoints (params + opt_state + step) with resume-from-latest
  matching the reference's ``checkpoint-*`` glob behavior
  (train/train.py:1079-1082);
* adapter-only export mirroring ``mm_projector.bin``-style saves
  (train/llava_trainer.py:239-258) as safetensors;
* metrics stream to JSONL (the reference logs to wandb, SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import time
from typing import Any, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.train.collator import collate_batch
from vcoder_tpu.train.sampler import LengthGroupedSampler
from vcoder_tpu.train.step import (
    init_opt_state,
    make_optimizer,
    make_train_step,
    partition,
    trainable_mask,
)

BUCKETS = (256, 512, 768, 1024, 1536, 2048, 2560, 3072, 4096)


def bucket_length(n: int, buckets=BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclasses.dataclass
class TrainArgs:
    """Hyperparameters mirroring scripts/v1_5/*.sh (reference defaults:
    lr 1e-3 adapters / 2e-5 full, cosine, warmup 0.03, bs 32x8,
    model_max_length 2048, bf16)."""

    output_dir: str = "./output"
    stage: str = "vcoder_ds"
    learning_rate: float = 1e-3
    num_train_epochs: int = 1
    per_device_train_batch_size: int = 4
    gradient_accumulation_steps: int = 1
    warmup_ratio: float = 0.03
    weight_decay: float = 0.0
    max_grad_norm: float = 1.0
    logging_steps: int = 1
    save_steps: int = 1100
    save_total_limit: int = 1
    model_max_length: int = 2048
    group_by_modality_length: bool = True
    seed: int = 42
    remat: object = "dots"  # True | "dots" | False
    attn_impl: str = "auto"
    # zero3_offload analog (reference: scripts/zero3_offload.json): park
    # the optimizer state in pinned host memory, streamed to device per
    # step. Pays host<->device bandwidth for ~8 bytes/trainable-param of
    # HBM back — the relief valve for full-LLM stages (at 7B 'full', f32
    # Adam moments are ~54 GB: ~6.75 GB/chip back on a v5e-8 fsdp mesh).
    # Requires a mesh (wrap a single chip in a 1-device mesh).
    offload_opt_state: bool = False
    # Host input pipeline: threads decoding samples in parallel (the
    # native IO decoder drops the GIL, so threads scale) and how many
    # assembled batches to stage ahead of the device step. 0 workers =
    # inline loading (tests/debug).
    dataloader_workers: int = 8
    prefetch_batches: int = 2


class Trainer:
    def __init__(
        self,
        cfg: VCoderConfig,
        params: Any,
        dataset,
        args: TrainArgs,
        *,
        mesh=None,
    ):
        self.cfg = cfg
        self.args = args
        self.dataset = dataset
        self.mesh = mesh

        world = 1
        if mesh is not None:
            world = mesh.shape["data"] * mesh.shape["fsdp"]
        self.global_batch = args.per_device_train_batch_size * world
        self.accum = max(args.gradient_accumulation_steps, 1)
        # self.step / total_steps count MICRO-batches; the LR schedule runs
        # in optimizer updates (MultiSteps advances it every accum steps).
        self.micro_per_epoch = max(len(dataset) // self.global_batch, 1)
        self.total_steps = self.micro_per_epoch * args.num_train_epochs
        total_updates = max(self.total_steps // self.accum, 1)

        self.optimizer = make_optimizer(
            args.learning_rate,
            total_updates,
            warmup_ratio=args.warmup_ratio,
            weight_decay=args.weight_decay,
            max_grad_norm=args.max_grad_norm,
            accum_steps=self.accum,
        )
        if mesh is not None:
            from vcoder_tpu.parallel import shard_params

            params = shard_params(params, mesh)
        self.params = params
        self.opt_state = init_opt_state(params, self.optimizer, args.stage)
        offload_shardings = None
        if args.offload_opt_state:
            if mesh is None:
                raise ValueError(
                    "offload_opt_state requires a mesh (host-pinned "
                    "shardings are mesh-relative; wrap a single chip in "
                    "a 1-device Mesh)"
                )
            from vcoder_tpu.parallel.sharding import (
                device_shardings_like,
                host_shardings,
            )

            host_sh = host_shardings(self.opt_state, mesh)
            # ONE batched device_put (per-leaf dispatches cost ~15 ms
            # each through the tunnel — scripts/bench_offload.py).
            self.opt_state = jax.device_put(self.opt_state, host_sh)
            offload_shardings = (device_shardings_like(host_sh), host_sh)
        self.step_fn = make_train_step(
            cfg,
            self.optimizer,
            stage=args.stage,
            attn_impl=args.attn_impl,
            remat=args.remat,
            offload_shardings=offload_shardings,
        )
        self.step = 0
        os.makedirs(args.output_dir, exist_ok=True)
        self._metrics_path = os.path.join(args.output_dir, "metrics.jsonl")

    # ---- data ----

    def _epoch_batches(self, epoch: int, skip: int = 0) -> Iterator[dict]:
        """Yield collated batches; ``skip`` drops the first N batches by
        slicing the sampler order (no image loading / collation for
        skipped batches — resume at step 50k must not redo 50k batches of
        pixel decode)."""
        args = self.args
        sampler = LengthGroupedSampler(
            args.per_device_train_batch_size,
            max(self.global_batch // args.per_device_train_batch_size, 1),
            self.dataset.modality_lengths
            if args.group_by_modality_length
            else [abs(l) for l in self.dataset.modality_lengths],
            seed=args.seed,
            group_by_modality=args.group_by_modality_length,
        )
        sampler.set_epoch(epoch)
        order = list(iter(sampler))
        pool = None
        if args.dataloader_workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            # Threads, not processes: the native decoder (native/
            # vcoder_io.cpp) releases the GIL around decode+pad+resize,
            # so threads scale to real parallelism with zero pickling
            # (the reference pays a per-rank PIL DataLoader instead —
            # vcoder_llava/train/train.py:774-859).
            pool = ThreadPoolExecutor(args.dataloader_workers)
        try:
            yield from self._assemble(order, skip, pool)
        finally:
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)

    def _assemble(self, order, skip, pool) -> Iterator[dict]:
        for i in range(skip * self.global_batch,
                       len(order) - self.global_batch + 1,
                       self.global_batch):
            idxs = order[i:i + self.global_batch]
            if pool is not None:
                samples = list(pool.map(self.dataset.__getitem__, idxs))
            else:
                samples = [self.dataset[j] for j in idxs]
            max_ids = max(len(s["input_ids"]) for s in samples)
            n_mod = 1 + int(self.cfg.use_seg) + int(self.cfg.use_depth)
            expanded = max_ids + n_mod * self.cfg.vision.num_patches
            pad_to = bucket_length(min(expanded, BUCKETS[-1]))
            batch = collate_batch(
                samples,
                num_patches=self.cfg.vision.num_patches,
                ds_mode=self.cfg.model_type == "vcoder_ds_llava",
                it_mode=self.cfg.model_type == "vcoder_it_llava",
                use_seg=self.cfg.use_seg,
                use_depth=self.cfg.use_depth,
                image_size=self.cfg.vision.image_size,
                pad_to=pad_to,
            )
            if self.mesh is not None:
                from vcoder_tpu.parallel import shard_batch

                batch = shard_batch(batch, self.mesh)
            yield batch

    def _prefetched(self, gen: Iterator[dict]) -> Iterator[dict]:
        """Stage up to ``args.prefetch_batches`` assembled batches ahead
        of the consumer in a background thread, so host decode/collate/
        H2D of the NEXT batches overlaps the device step even across the
        blocking metric fetches at logging steps."""
        n = self.args.prefetch_batches
        if n <= 0:
            yield from gen
            return
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=n)
        DONE = object()
        stop = [False]
        err: list = []

        def work():
            try:
                for b in gen:
                    while not stop[0]:
                        try:
                            q.put(b, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if stop[0]:
                        return
            except BaseException as e:  # surface in the consumer
                err.append(e)
            finally:
                # Blocking put with the same stop-polling loop as above:
                # put_nowait could drop DONE when the queue is full (the
                # error path with n staged batches), hanging the consumer.
                while not stop[0]:
                    try:
                        q.put(DONE, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=work, daemon=True, name="prefetch")
        t.start()
        try:
            while True:
                b = q.get()
                if b is DONE:
                    break
                yield b
        finally:
            stop[0] = True
        if err:
            raise err[0]

    # ---- checkpointing ----

    def _ckpt_dir(self, step: int) -> str:
        return os.path.join(self.args.output_dir, f"checkpoint-{step}")

    def save_checkpoint(self) -> str:
        import orbax.checkpoint as ocp

        path = os.path.abspath(self._ckpt_dir(self.step))
        if os.path.exists(os.path.join(path, "state")):
            # Already saved at this step (the end-of-training save lands
            # on a save_steps boundary whenever total_steps % save_steps
            # == 0); orbax refuses to overwrite an existing destination.
            return path
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                os.path.join(path, "state"),
                {
                    "params": self.params,
                    "opt_state": self.opt_state,
                    "step": self.step,
                },
            )
        # Rotate old checkpoints (save_total_limit).
        ckpts = sorted(
            glob.glob(os.path.join(self.args.output_dir, "checkpoint-*")),
            key=lambda p: int(p.rsplit("-", 1)[-1]),
        )
        while len(ckpts) > self.args.save_total_limit:
            victim = ckpts.pop(0)
            if victim != path:
                import shutil

                shutil.rmtree(victim, ignore_errors=True)
        return path

    def maybe_resume(self) -> bool:
        """Resume from the newest checkpoint-* dir if present
        (reference: train/train.py:1079-1082)."""
        import orbax.checkpoint as ocp

        ckpts = sorted(
            glob.glob(os.path.join(self.args.output_dir, "checkpoint-*")),
            key=lambda p: int(p.rsplit("-", 1)[-1]),
        )
        if not ckpts:
            return False
        path = os.path.abspath(ckpts[-1])
        with ocp.StandardCheckpointer() as ckptr:
            target = {
                "params": self.params,
                "opt_state": self.opt_state,
                "step": self.step,
            }
            restored = ckptr.restore(
                os.path.join(path, "state"),
                target=target,
            )
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.step = int(restored["step"])
        return True

    def save_adapters(self) -> str:
        """Trainable-subtree-only export, the analog of the reference's
        mm_projector.bin adapter checkpoints
        (train/llava_trainer.py:239-258)."""
        from safetensors.numpy import save_file

        from vcoder_tpu.parallel.sharding import _path_str

        mask = trainable_mask(self.params, self.args.stage)
        t_params, _ = partition(self.params, mask)
        flat = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(t_params)[0]:
            flat[_path_str(path)] = np.ascontiguousarray(np.asarray(leaf))
        out = os.path.join(self.args.output_dir, "adapters.safetensors")
        save_file(flat, out)
        return out

    # ---- loop ----

    def train(self, max_steps: Optional[int] = None) -> List[dict]:
        history = []
        t_start = time.time()
        budget = max_steps or self.total_steps
        # On resume, fast-forward past already-consumed batches so the run
        # sees the same data stream as an uninterrupted one (the reference
        # HF Trainer skips consumed batches too).
        steps_per_epoch = self.micro_per_epoch
        start_epoch = self.step // steps_per_epoch
        skip_in_epoch = self.step % steps_per_epoch
        for epoch in range(start_epoch, self.args.num_train_epochs):
            to_skip = skip_in_epoch if epoch == start_epoch else 0
            for batch in self._prefetched(
                self._epoch_batches(epoch, skip=to_skip)
            ):
                if self.step >= budget:
                    break
                t0 = time.time()
                self.params, self.opt_state, metrics = self.step_fn(
                    self.params, self.opt_state, batch
                )
                self.step += 1
                if self.step % self.args.logging_steps == 0:
                    rec = {
                        "step": self.step,
                        "loss": float(metrics["loss"]),
                        "grad_norm": float(metrics["grad_norm"]),
                        "step_time_s": round(time.time() - t0, 4),
                        "elapsed_s": round(time.time() - t_start, 1),
                    }
                    history.append(rec)
                    with open(self._metrics_path, "a") as f:
                        f.write(json.dumps(rec) + "\n")
                if self.step % self.args.save_steps == 0:
                    self.save_checkpoint()
            if self.step >= budget:
                break
        return history
