"""scripts/validate_parity.sh end-to-end on a synthetic checkpoint + COST
tree — proves the blind parity runbook a networked host would run against
real weights (VERDICT round-1 item 6) executes start to finish."""

import json
import os
import subprocess

import jax
import pytest

pytestmark = pytest.mark.slow  # end-to-end driver runs (see pyproject markers)

from vcoder_tpu.checkpoint import save_pretrained
from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.simple_tokenizer import SimpleTokenizer

pytest.importorskip("PIL.Image")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_ds_setup(tmp_path):
    """Synthetic 'vcoder_ds' checkpoint + COST tree for runbook drives."""
    from tests.test_train_pipeline import _make_cost_tree

    # Name must carry 'vcoder' + 'ds' so the runbook picks seg+depth paths.
    ckpt = tmp_path / "vcoder_ds_llava-tiny"
    cfg = VCoderConfig.tiny("vcoder_ds_llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    save_pretrained(str(ckpt), params, cfg)
    tok = SimpleTokenizer.build_from_texts(
        [
            "A chat between a curious human and an artificial intelligence"
            " assistant. The assistant gives helpful, detailed, and polite"
            " answers to the human's questions. USER: ASSISTANT: What"
            " objects can be seen in the image? The objects present in the"
            " image are: two people, a car, wall"
        ]
    )
    tok.save_pretrained(str(ckpt))

    root = tmp_path / "cost"
    _make_cost_tree(str(root))
    return ckpt, root


def test_validate_parity_runbook(tmp_path):
    ckpt, root = _tiny_ds_setup(tmp_path)

    out = tmp_path / "parity_out"
    env = dict(os.environ)
    env.update(
        PYTHONPATH=REPO,
        OUT=str(out),
        TASKS="semantic",  # one seg task keeps the smoke fast
        VCODER_TPU_PLATFORM="cpu",
    )
    proc = subprocess.run(
        [
            "bash",
            os.path.join(REPO, "scripts", "validate_parity.sh"),
            str(ckpt),
            str(root / "coco" / "test2017"),
            str(root / "coco_segm_text" / "test"),
            "3",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    fp = json.load(open(out / "fingerprint.json"))
    assert fp["model_type"] == "vcoder_ds_llava"
    assert len(fp["golden_tokens"]) > 0
    scores = open(out / "scores.txt").read()
    assert "semantic segmentation" in scores
    assert "depth score" in scores
    assert os.path.exists(out / "output_semantic.txt")
    assert os.path.exists(out / "output_depth.txt")


def _run_runbook(tmp_path, ckpt, root, out, tasks):
    env = dict(os.environ)
    env.update(
        PYTHONPATH=REPO,
        OUT=str(out),
        TASKS=tasks,
        VCODER_TPU_PLATFORM="cpu",
    )
    return subprocess.run(
        [
            "bash",
            os.path.join(REPO, "scripts", "validate_parity.sh"),
            str(ckpt),
            str(root / "coco" / "test2017"),
            str(root / "coco_segm_text" / "test"),
            "2",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )


@pytest.mark.weekly  # test_validate_parity_runbook covers the flow on
# one task; the 3-task x 2-run byte-stability sweep is ~54 s of
# permutation coverage (VERDICT r4 #8)
def test_validate_parity_all_tasks_byte_stable(tmp_path):
    """The FULL runbook flow — all three seg tasks, greedy, plus the
    --use-depth pass and both scorers — run twice must produce byte-
    identical loader records and scores (round-3 VERDICT #5: the first
    networked run may only fail on weights, never on plumbing or
    nondeterminism)."""
    ckpt, root = _tiny_ds_setup(tmp_path)
    outs = []
    for name in ("run1", "run2"):
        out = tmp_path / name
        proc = _run_runbook(
            tmp_path, ckpt, root, out, "semantic,instance,panoptic"
        )
        assert proc.returncode == 0, (
            proc.stdout[-2000:] + proc.stderr[-2000:]
        )
        outs.append(out)
    for fname in (
        "output_semantic.txt",
        "output_instance.txt",
        "output_panoptic.txt",
        "output_depth.txt",
        "scores.txt",
        "fingerprint.json",
    ):
        a = (outs[0] / fname).read_bytes()
        b = (outs[1] / fname).read_bytes()
        assert a == b, f"{fname} not byte-stable across identical runs"
        assert a, f"{fname} empty"
    scores = (outs[0] / "scores.txt").read_text()
    for task in ("semantic", "instance", "panoptic"):
        assert f"{task} segmentation" in scores
    assert "depth score" in scores


def test_cost_chunk_fanout_concat_scores(tmp_path):
    """The reference's per-GPU chunk fan-out (cost.sh:10-40): run the
    loader as 2 chunks, concat the per-chunk files exactly like the shell
    harness, and score the concatenation. Every image must be answered
    exactly once and the scorer must accept the concatenated file."""
    import sys

    ckpt, root = _tiny_ds_setup(tmp_path)
    out = tmp_path / "chunks"
    out.mkdir()
    env = dict(os.environ)
    env.update(PYTHONPATH=REPO, VCODER_TPU_PLATFORM="cpu")
    gt = root / "coco_segm_text" / "test"
    for idx in range(2):
        proc = subprocess.run(
            [
                sys.executable, "-m", "vcoder_tpu.eval.cost_loader",
                "--model-path", str(ckpt),
                "--image-folder", str(root / "coco" / "test2017"),
                "--use-seg",
                "--seg-image-folder", str(gt / "$TASK_inference"),
                "--output-file", str(out / "output"),
                "--num-chunks", "2", "--chunk-idx", str(idx),
                "--temperature", "0", "--conv-mode", "vicuna_v1",
                "--tasks", "semantic",
            ],
            env=env, capture_output=True, text=True, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
    # cost.sh concat: cat output_{task}_{n}_{idx}.txt > output_{task}.txt
    concat = b"".join(
        (out / f"output_semantic_2_{i}.txt").read_bytes() for i in range(2)
    )
    (out / "output_semantic.txt").write_bytes(concat)
    n_images = len(
        list((root / "coco" / "test2017").glob("*.jpg"))
    ) + len(list((root / "coco" / "test2017").glob("*.png")))
    assert concat.count(b"Image:") == n_images
    proc = subprocess.run(
        [
            sys.executable, "-m", "vcoder_tpu.eval.seg_accuracy",
            "--gt_path", str(gt), "--pred_path", str(out),
            "--tasks", "semantic",
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "semantic segmentation" in proc.stdout
