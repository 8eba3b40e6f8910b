"""Shell-level rehearsal of the seven training harnesses
(scripts/v1_5/{pretrain,finetune,finetune_lora,vcoder_train,
vcoder_ds_train,vcoder_it,vcoder_it_lora}.sh) on a tiny checkpoint +
synthetic data — two real optimizer steps each, through the exact bash
entry points a real run would use (reference: the deepspeed launch
scripts under /root/reference/scripts/v1_5/).

What this proves: env-var wiring, driver flag surfaces, stage/config
upgrades (llava base -> vcoder/_ds/_it variants), LoRA wrapping, the
data-path contracts of every stage, and that each run writes a
checkpoint + metrics. A real training launch may only fail on scale or
data, never on the harness.
"""

import json
import os
import subprocess

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end shell drives

from vcoder_tpu.checkpoint import save_pretrained
from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.simple_tokenizer import SimpleTokenizer

PIL = pytest.importorskip("PIL.Image")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
V15 = os.path.join(REPO, "scripts", "v1_5")


@pytest.fixture(scope="module")
def tiny_base(tmp_path_factory):
    """Tiny plain-llava base checkpoint (every stage starts from one)."""
    d = tmp_path_factory.mktemp("base") / "llava-tiny"
    cfg = VCoderConfig.tiny("llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    save_pretrained(str(d), params, cfg)
    tok = SimpleTokenizer.build_from_texts(
        [
            "A chat between a curious human and an artificial intelligence"
            " assistant. The assistant gives helpful, detailed, and polite"
            " answers to the human's questions. USER: ASSISTANT: What"
            " objects can be seen in the image? The objects present in the"
            " image are: two people, a car, wall. What is the depth order"
            " for the objects present in the image? person, car, wall."
            " How many people are there?"
        ]
    )
    tok.save_pretrained(str(d))
    return str(d)


@pytest.fixture(scope="module")
def cost_root(tmp_path_factory):
    from tests.test_train_pipeline import _make_cost_tree

    root = tmp_path_factory.mktemp("cost")
    _make_cost_tree(str(root))
    return str(root)


@pytest.fixture(scope="module")
def mix_json(tmp_path_factory):
    """Tiny llava_v1_5_mix665k-style json + matching image folder."""
    d = tmp_path_factory.mktemp("mix")
    rng = np.random.RandomState(0)
    names = [f"m{i}.jpg" for i in range(4)]
    for n in names:
        PIL.fromarray(rng.randint(0, 255, (32, 40, 3), np.uint8)).save(
            d / n
        )
    entries = [
        {
            "id": str(i),
            "image": n,
            "conversations": [
                {
                    "from": "human",
                    "value": "<image>\nWhat objects can be seen in the"
                    " image?",
                },
                {"from": "gpt", "value": "two people, a car"},
            ],
        }
        for i, n in enumerate(names)
    ]
    # One text-only row (the mix has plenty; collation must pad the
    # missing image).
    entries.append(
        {
            "id": "text",
            "conversations": [
                {"from": "human", "value": "How many people are there?"},
                {"from": "gpt", "value": "two people"},
            ],
        }
    )
    path = d / "mix.json"
    with open(path, "w") as f:
        json.dump(entries, f)
    return str(path), str(d)


COMMON_FLAGS = [
    "--max-steps", "2",
    "--model-max-length", "192",
    "--save-steps", "2",
    "--logging-steps", "1",
    # tiny datasets: epochs must not bind before max_steps does
    "--num-train-epochs", "8",
]


def _run(script, env_extra, out_dir, extra=()):
    env = dict(os.environ)
    env.update(
        PYTHONPATH=REPO,
        VCODER_TPU_PLATFORM="cpu",
        BATCH_SIZE="2",
        OUTPUT_DIR=str(out_dir),
        # The suite's conftest exports an 8-device CPU flag; a rehearsal
        # run is single-device (global batch 2, like a 1-chip launch).
        XLA_FLAGS="",
    )
    env.update(env_extra)
    proc = subprocess.run(
        ["bash", os.path.join(V15, script), *COMMON_FLAGS, *extra],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"{script} rc={proc.returncode}\n"
        + proc.stdout[-2000:]
        + proc.stderr[-2000:]
    )
    metrics = [
        json.loads(l) for l in open(os.path.join(out_dir, "metrics.jsonl"))
    ]
    assert len(metrics) >= 2
    assert all(np.isfinite(m["loss"]) for m in metrics)
    assert os.path.isdir(os.path.join(out_dir, "checkpoint-2"))
    return proc


def test_pretrain_sh(tiny_base, mix_json, tmp_path):
    data, imgs = mix_json
    _run(
        "pretrain.sh",
        {"MODEL_PATH": tiny_base, "DATA_PATH": data, "IMAGE_FOLDER": imgs},
        tmp_path / "out",
    )


def test_finetune_sh(tiny_base, mix_json, tmp_path):
    data, imgs = mix_json
    _run(
        "finetune.sh",
        {"MODEL_PATH": tiny_base, "DATA_PATH": data, "IMAGE_FOLDER": imgs},
        tmp_path / "out",
    )


@pytest.mark.weekly  # driver-level it/lora semantics are covered
# in test_weight_surgery_driver; this rehearses only the bash layer
def test_finetune_lora_sh(tiny_base, mix_json, tmp_path):
    data, imgs = mix_json
    _run(
        "finetune_lora.sh",
        {"MODEL_PATH": tiny_base, "DATA_PATH": data, "IMAGE_FOLDER": imgs},
        tmp_path / "out",
        # rank 128 > tiny hidden dims; shrink for the rehearsal
        extra=("--lora-r", "4", "--lora-alpha", "8"),
    )


def test_vcoder_train_sh(tiny_base, cost_root, tmp_path):
    _run(
        "vcoder_train.sh",
        {
            "MODEL_PATH": tiny_base,
            "SEG_DATA_PATH": cost_root,
            "IMAGE_FOLDER": cost_root,
        },
        tmp_path / "out",
    )


def test_vcoder_ds_train_sh(tiny_base, cost_root, tmp_path):
    # All SIX stage-3 streams: the two llava-mix-derived ones need mix
    # entries whose images live under IMAGE_FOLDER at a "coco" source
    # path with panoptic/depth renders in the COST tree — the cost_root
    # fixture's coco/train2017 images have exactly those.
    from tests.test_train_pipeline import KEYS

    mix = [
        {
            "id": str(i),
            "image": f"coco/train2017/{k}",
            "conversations": [
                {
                    "from": "human",
                    "value": "<image>\nWhat objects can be seen in the"
                    " image?",
                },
                {"from": "gpt", "value": "two people, a car"},
            ],
        }
        for i, k in enumerate(KEYS)
    ]
    data = tmp_path / "mix_coco.json"
    with open(data, "w") as f:
        json.dump(mix, f)
    _run(
        "vcoder_ds_train.sh",
        {
            "MODEL_PATH": tiny_base,
            "DATA_PATH": str(data),
            "SEG_DATA_PATH": cost_root,
            "DEPTH_DATA_PATH": cost_root,
            "IMAGE_FOLDER": cost_root,
        },
        tmp_path / "out",
    )


@pytest.mark.weekly  # driver-level it/lora semantics are covered
# in test_weight_surgery_driver; this rehearses only the bash layer
def test_vcoder_it_sh(tiny_base, cost_root, tmp_path):
    _run(
        "vcoder_it.sh",
        {
            "MODEL_PATH": tiny_base,
            "SEG_DATA_PATH": cost_root,
            "IMAGE_FOLDER": cost_root,
        },
        tmp_path / "out",
    )


@pytest.mark.weekly  # driver-level it/lora semantics are covered
# in test_weight_surgery_driver; this rehearses only the bash layer
def test_vcoder_it_lora_sh(tiny_base, cost_root, tmp_path):
    _run(
        "vcoder_it_lora.sh",
        {
            "MODEL_PATH": tiny_base,
            "SEG_DATA_PATH": cost_root,
            "IMAGE_FOLDER": cost_root,
        },
        tmp_path / "out",
        extra=("--lora-r", "4", "--lora-alpha", "8"),
    )
