"""Host input-pipeline throughput vs the train step's image demand.

The train loop's host side must decode+pad+resize+normalize 3 modality
images per sample (RGB/seg/depth) faster than the device consumes them.
This measures the dataset's actual `_load_pixels` path (native C++
decoder when built, PIL fallback) at 1..N threads over synthetic
COCO-sized JPEGs, and reports images/s against a given step demand.

    python scripts/bench_input_pipeline.py [--images 256] \
        [--step-ms 749 --batch 2]   # demand = 3*batch imgs per step

Context (docs/PERFORMANCE.md round-5 input-pipeline row): the round-4
loader normalized each image ON DEVICE ([1, S, S, 3] dispatch + fetch
through the axon tunnel, ~55 ms each => ~18 img/s/thread hard cap);
round 5 moved normalization to the host and threaded the decode
(reference bottleneck being avoided: per-rank PIL DataLoader,
vcoder_llava/train/train.py:774-859).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("VCODER_TPU_PLATFORM", "cpu")


class _DS:
    """Just enough dataset surface for _load_pixels."""

    image_size = 336
    image_aspect_ratio = "pad"

    def __init__(self):
        from vcoder_tpu.train.datasets import VCoderDataset as LazyVCoderDataset

        self._load_pixels = LazyVCoderDataset._load_pixels.__get__(self)


def _make_jpegs(n: int, root: str):
    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        # COCO val-ish geometry; random noise compresses worst-case.
        arr = rng.randint(0, 255, (480, 640, 3), np.uint8)
        p = os.path.join(root, f"im{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    return paths


def _measure(load, paths, workers: int) -> float:
    t0 = time.perf_counter()
    if workers <= 1:
        for p in paths:
            load(p)
    else:
        with ThreadPoolExecutor(workers) as pool:
            list(pool.map(load, paths))
    return len(paths) / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--step-ms", type=float, default=749.0,
                    help="measured train step time at --batch")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from vcoder_tpu.native import io as nio

    with tempfile.TemporaryDirectory() as root:
        paths = _make_jpegs(args.images, root)
        ds = _DS()

        rows = {}
        native = nio.is_available()
        rows["native_available"] = native
        if native:
            for w in (1, 4, 8, 16):
                rows[f"native_t{w}_img_s"] = round(
                    _measure(ds._load_pixels, paths, w), 1
                )
        # PIL fallback (force by hiding the native lib).
        real = nio.is_available
        nio.is_available = lambda: False
        try:
            for w in (1, 8):
                rows[f"pil_t{w}_img_s"] = round(
                    _measure(ds._load_pixels, paths, w), 1
                )
        finally:
            nio.is_available = real

        demand = 3 * args.batch / (args.step_ms / 1e3)
        rows["step_demand_img_s"] = round(demand, 1)
        best = max(
            v for k, v in rows.items() if k.endswith("img_s")
            and not k.startswith("step")
        )
        rows["headroom_x"] = round(best / demand, 1)
        if args.json:
            import json

            print(json.dumps(rows))
        else:
            for k, v in rows.items():
                print(f"{k}: {v}")


if __name__ == "__main__":
    main()
