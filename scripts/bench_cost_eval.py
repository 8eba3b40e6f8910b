"""Single-chip COST-eval throughput through the REAL loader (VERDICT r4 #6).

Drives `vcoder_tpu.eval.cost_loader.eval_model` — the actual batched
loader the eval shells run — end-to-end on hardware: random 7B VCoder-DS
weights saved as a real checkpoint (eos_token_id=-1 in the saved config
so greedy decode on random weights generates the full 512 tokens per
image instead of stopping at a spurious EOS after ~25), synthetic
val2017-style jpg folders for all three modalities, real native-IO
decode, real prompt building, real batched generate, real answers file.

Pass 1 (warm) pays checkpoint load + XLA compiles; pass 2 is timed and
reports images/hour plus the projected 5k-image val2017 wall time for 1
and 8 chips, vs the reference's 8-GPU chunk fan-out
(/root/reference/scripts/v1_5/eval/cost.sh:10-22).

Usage: python scripts/bench_cost_eval.py [--images 48] [--warm 8]
          [--batch-size 8] [--ckpt /tmp/cost_eval_ckpt7b] [--tiny]
"""

import argparse
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_images(root: str, n: int, hw: int = 480) -> None:
    from PIL import Image

    rng = np.random.RandomState(0)
    for sub in ("val2017", "panoptic_inference", "depth"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in range(n):
        name = f"{i:012d}.jpg"
        for sub in ("val2017", "panoptic_inference", "depth"):
            p = os.path.join(root, sub, name)
            if not os.path.exists(p):
                arr = rng.randint(0, 255, (hw, hw + 160, 3), np.uint8)
                Image.fromarray(arr).save(p, quality=85)


def make_ckpt(path: str, tiny: bool) -> None:
    """Random VCoder-DS checkpoint with EOS disabled, built on CPU."""
    if os.path.exists(os.path.join(path, "config.json")):
        print(f"checkpoint exists: {path}", flush=True)
        return
    import dataclasses

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from vcoder_tpu.checkpoint import save_pretrained
    from vcoder_tpu.config import VCoderConfig
    from vcoder_tpu.models import vcoder as model_mod
    from vcoder_tpu.simple_tokenizer import SimpleTokenizer

    cfg = (
        VCoderConfig.tiny("vcoder_ds_llava")
        if tiny
        else VCoderConfig.standard("vcoder_ds_llava", "7b")
    )
    # Bench-only: never stop before max_new_tokens (greedy decode on
    # random weights otherwise hits the real EOS within ~25 tokens).
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, eos_token_id=-1)
    )
    t0 = time.time()
    params = model_mod.init_vcoder_params(
        jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16
    )
    print(f"init (cpu): {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    save_pretrained(path, params, cfg)
    tok = SimpleTokenizer.build_from_texts([
        "A chat between a curious human and an artificial intelligence"
        " assistant. The assistant gives helpful, detailed, and polite"
        " answers to the human's questions. USER: ASSISTANT: What"
        " objects can be seen in the image? The objects present in the"
        " image are: two people, a car. What is the depth order of"
        " objects?"
    ])
    tok.save_pretrained(path)
    print(f"saved {path}: {time.time()-t0:.0f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--warm", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--data", default="/tmp/cost_eval_data")
    # Dir name must contain "vcoder" + "ds" (eval_model keys use_seg/
    # use_depth off the model name, mirroring the reference loaders).
    ap.add_argument("--ckpt", default="/tmp/ckpts/vcoder_ds_llava-7b-bench")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--task", default="panoptic")
    ap.add_argument("--make-ckpt-only", action="store_true",
                    help="internal: build the checkpoint on CPU and exit")
    args = ap.parse_args()
    if args.tiny:
        os.environ.setdefault("VCODER_TPU_PLATFORM", "cpu")
        args.ckpt = args.ckpt + "_tiny"
    if args.make_ckpt_only:
        make_ckpt(args.ckpt, args.tiny)
        return

    make_images(args.data, max(args.images, args.warm))

    # Checkpoint build runs in a subprocess so its CPU-platform jax
    # config never touches this process's TPU backend.
    if not os.path.exists(os.path.join(args.ckpt, "config.json")):
        import subprocess

        env = dict(os.environ, VCODER_TPU_PLATFORM="cpu")
        cmd = [sys.executable, os.path.abspath(__file__),
               "--make-ckpt-only", "--ckpt", args.ckpt]
        if args.tiny:
            # --tiny re-appends the suffix in the child; pass the raw dir.
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--make-ckpt-only", "--tiny",
                   "--ckpt", args.ckpt[: -len("_tiny")]]
        subprocess.run(cmd, check=True, env=env)

    from vcoder_tpu.builder import load_pretrained_model
    from vcoder_tpu.eval import cost_loader

    # Load once; both eval_model passes reuse the same model (the load
    # cost is reported separately — the metric is steady-state img/h).
    t0 = time.time()
    loaded = load_pretrained_model(
        args.ckpt, None, "vcoder_ds_llava-7b"
    )
    load_s = time.time() - t0
    print(f"model load: {load_s:.0f}s", flush=True)
    cost_loader.load_pretrained_model = lambda *a, **kw: loaded

    base = types.SimpleNamespace(
        model_path=args.ckpt, model_base=None,
        image_folder=os.path.join(args.data, "val2017"),
        use_seg=True,
        seg_image_folder=os.path.join(args.data, "$TASK_inference"),
        use_depth=True,
        depth_image_folder=os.path.join(args.data, "depth"),
        output_file="/tmp/cost_eval_out/answers",
        conv_mode="llava_v1", num_chunks=1, chunk_idx=0,
        temperature=0.0, top_p=None, num_beams=1,
        batch_size=args.batch_size, seed=0, lookahead=0,
        max_samples=args.warm,
    )
    t0 = time.time()
    cost_loader.eval_model(base, args.task)
    print(f"warm pass ({args.warm} imgs): {time.time()-t0:.0f}s",
          flush=True)

    base.max_samples = args.images
    t0 = time.time()
    out = cost_loader.eval_model(base, args.task)
    dt = time.time() - t0
    per_img = dt / args.images
    rec = {
        "images": args.images,
        "batch_size": args.batch_size,
        "wall_s": round(dt, 1),
        "img_per_hour": round(3600 / per_img, 1),
        "val2017_5k_hours_1chip": round(5000 * per_img / 3600, 2),
        "val2017_5k_hours_8chip": round(5000 * per_img / 3600 / 8, 2),
        "answers_file": out,
    }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
