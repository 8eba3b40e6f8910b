"""Stage training drivers: the ``deepspeed <entry>_mem.py``-equivalents.

Mirrors the flags of the reference launch scripts (reference:
scripts/v1_5/{pretrain,finetune,vcoder_train,vcoder_ds_train,vcoder_it}.sh
and the HfArgumentParser dataclasses in train/*.py) as one argparse CLI
per stage:

    python -m vcoder_tpu.train.vcoder_train    --model-path ... --seg-data-path ...
    python -m vcoder_tpu.train.vcoder_ds_train --model-path ... ...

Instead of DeepSpeed's process-per-GPU launcher, one process drives the
whole (data, fsdp, model) mesh; dataset construction happens once, not
per-rank (the reference re-parses ~5 min of txt per rank,
SURVEY.md §3.2).
"""

from __future__ import annotations

import argparse
import os

import jax


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    # model
    p.add_argument("--model-path", type=str, required=True,
                   help="base checkpoint dir (e.g. imported llava-v1.5-7b)")
    p.add_argument("--version", type=str, default="v1")
    p.add_argument("--output-dir", type=str, required=True)
    # data
    p.add_argument("--data-path", type=str, default=None,
                   help="LLaVA-mix json (stage-3 streams)")
    p.add_argument("--image-folder", type=str, default="")
    p.add_argument("--seg-data-path", type=str, default="",
                   help="COST root with coco_segm_text/")
    p.add_argument("--depth-data-path", type=str, default="")
    p.add_argument("--image-aspect-ratio", type=str, default="pad")
    p.add_argument(
        "--group-by-modality-length",
        action=argparse.BooleanOptionalAction,
        default=True,
    )
    # optimization (reference: scripts/v1_5/vcoder_train.sh)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--num-train-epochs", type=int, default=2)
    p.add_argument("--per-device-train-batch-size", type=int, default=4)
    p.add_argument("--gradient-accumulation-steps", type=int, default=1)
    p.add_argument("--warmup-ratio", type=float, default=0.03)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--model-max-length", type=int, default=2048)
    p.add_argument("--save-steps", type=int, default=1100)
    p.add_argument("--save-total-limit", type=int, default=1)
    p.add_argument("--logging-steps", type=int, default=1)
    p.add_argument(
        "--gradient-checkpointing",
        action=argparse.BooleanOptionalAction,
        default=True,
    )
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max-steps", type=int, default=None)
    # LoRA (reference: scripts/v1_5/finetune_lora.sh, vcoder_it_lora.sh —
    # lora_r 128, lora_alpha 256; adapters over every LM linear)
    p.add_argument(
        "--lora-enable",
        action=argparse.BooleanOptionalAction,
        default=False,
    )
    p.add_argument("--lora-r", type=int, default=128)
    p.add_argument("--lora-alpha", type=float, default=256.0)
    # mesh
    p.add_argument("--mesh-data", type=int, default=None)
    p.add_argument("--mesh-fsdp", type=int, default=None)
    p.add_argument("--mesh-model", type=int, default=None)
    # zero3_offload analog (reference: scripts/zero3_offload.json):
    # optimizer state pinned in host memory, streamed per step.
    p.add_argument(
        "--offload-opt-state",
        action=argparse.BooleanOptionalAction,
        default=False,
    )
    return p


def run_stage(stage: str, args) -> None:
    from vcoder_tpu.builder import load_pretrained_model
    from vcoder_tpu.parallel import make_mesh, use_mesh
    from vcoder_tpu.train.datasets import (
        VCoderDataset,
        build_seg_cost_entries,
        get_depth_data_split,
        get_extra_count_data_split,
        obtain_seg_data_splits,
        obtain_seg_depth_data_splits,
    )
    from vcoder_tpu.train.trainer import TrainArgs, Trainer

    tokenizer, model, *_ = load_pretrained_model(args.model_path)
    cfg = model.config
    if tokenizer is None:
        raise SystemExit(
            "model-path must contain tokenizer files (or a"
            " vcoder_tokenizer.json)"
        )

    # Upgrade the config to the stage's model variant and bootstrap the
    # adapter branches a plain LLaVA base checkpoint lacks (reference:
    # the initialize_*_modules calls in each train driver).
    import dataclasses as _dc

    import jax as _jax

    from vcoder_tpu.config import VCoderConfig, _variant_flags
    from vcoder_tpu.models.vcoder import initialize_missing_modules

    target_type = {
        "pretrain": "llava",
        "full": "llava",
        "vcoder": "vcoder_llava",
        "vcoder_ds": "vcoder_ds_llava",
        "it": "vcoder_it_llava",
    }[stage]
    if cfg.model_type != target_type and target_type != "llava":
        cfg = _dc.replace(
            cfg, model_type=target_type, **_variant_flags(target_type)
        )
        model.params = initialize_missing_modules(
            model.params, cfg, _jax.random.PRNGKey(args.seed)
        )
        model.config = cfg

    # LoRA stages wrap every LM linear with fresh adapters and train only
    # the a/b leaves (+ the stage's projector) — see step.STAGE_TRAINABLE.
    train_stage = stage
    lora_enable = bool(getattr(args, "lora_enable", False))
    if lora_enable:
        if stage not in ("full", "it"):
            raise SystemExit(
                "--lora-enable applies to the full-finetune and it stages "
                "(reference: scripts/v1_5/finetune_lora.sh, vcoder_it_lora.sh)"
            )
        from vcoder_tpu.lora import add_lora

        model.params = add_lora(
            model.params,
            _jax.random.PRNGKey(args.seed + 17),
            rank=args.lora_r,
            alpha=args.lora_alpha,
        )
        train_stage = "lora" if stage == "full" else "it_lora"

    seed = args.seed
    if stage in ("pretrain", "full"):
        # LLaVA stage-1/2: json dataset of {conversations, image?}
        # (reference: train/train.py LazySupervisedDataset).
        import json as _json

        entries = _json.load(open(args.data_path))
        use_seg, use_depth = False, False
    elif stage == "vcoder":
        entries = build_seg_cost_entries(args.seg_data_path, seed=seed)
        use_seg, use_depth = True, False
    elif stage == "vcoder_ds":
        entries = []
        if args.data_path:
            entries += obtain_seg_data_splits(
                args.data_path, args.image_folder, args.seg_data_path,
                seed=seed,
            )
            entries += obtain_seg_depth_data_splits(
                args.data_path, args.image_folder,
                args.depth_data_path or args.seg_data_path, seed=seed + 1,
            )
        entries += build_seg_cost_entries(
            args.seg_data_path, seed=seed + 2, with_depth=True
        )
        entries += build_seg_cost_entries(
            args.seg_data_path, seed=seed + 3
        )
        entries += get_depth_data_split(
            args.depth_data_path or args.seg_data_path, seed=seed + 4
        )
        entries += get_extra_count_data_split(
            args.seg_data_path, seed=seed + 5
        )
        use_seg, use_depth = True, True
    elif stage == "it":
        entries = build_seg_cost_entries(args.seg_data_path, seed=seed)
        use_seg, use_depth = True, False
    else:
        raise ValueError(f"unknown stage {stage}")

    dataset = VCoderDataset(
        entries,
        tokenizer,
        image_folder=args.image_folder,
        seg_data_path=args.seg_data_path,
        depth_data_path=args.depth_data_path or args.seg_data_path,
        image_size=cfg.vision.image_size,
        image_aspect_ratio=args.image_aspect_ratio,
        version=args.version,
        model_max_length=args.model_max_length,
        use_seg=use_seg,
        use_depth=use_depth,
    )

    mesh = make_mesh(
        jax.devices(),
        data=args.mesh_data,
        fsdp=args.mesh_fsdp,
        model=args.mesh_model,
    )
    targs = TrainArgs(
        output_dir=args.output_dir,
        stage=train_stage,
        learning_rate=args.learning_rate,
        num_train_epochs=args.num_train_epochs,
        per_device_train_batch_size=args.per_device_train_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        warmup_ratio=args.warmup_ratio,
        weight_decay=args.weight_decay,
        logging_steps=args.logging_steps,
        save_steps=args.save_steps,
        save_total_limit=args.save_total_limit,
        model_max_length=args.model_max_length,
        group_by_modality_length=args.group_by_modality_length,
        seed=args.seed,
        # --gradient_checkpointing True selects the "dots" policy
        # (save matmuls, recompute elementwise: 791 vs 892 ms/step at
        # the 7B stage-3 config, same memory envelope).
        remat="dots" if args.gradient_checkpointing else False,
        offload_opt_state=args.offload_opt_state,
    )
    with use_mesh(mesh):
        trainer = Trainer(cfg, model.params, dataset, targs, mesh=mesh)
        if trainer.maybe_resume():
            print(f"Resumed from step {trainer.step}")
        trainer.train(max_steps=args.max_steps)
        trainer.save_checkpoint()
        trainer.save_adapters()

        from vcoder_tpu.checkpoint import save_pretrained

        final_params = trainer.params
        if lora_enable:
            # Fold adapters into dense weights so final/ is a plain
            # checkpoint (the reference instead saves adapter_model.bin and
            # merges at load — scripts/merge_lora_weights.py; adapters.
            # safetensors above keeps the unmerged a/b leaves).
            from vcoder_tpu.lora import merge_lora

            final_params = merge_lora(final_params)
        save_pretrained(
            os.path.join(args.output_dir, "final"), final_params, cfg
        )
        if hasattr(tokenizer, "save_pretrained"):
            try:
                tokenizer.save_pretrained(
                    os.path.join(args.output_dir, "final")
                )
            except Exception:
                pass
    print("training complete:", args.output_dir)
