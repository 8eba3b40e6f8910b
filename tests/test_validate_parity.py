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


def test_validate_parity_runbook(tmp_path):
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
