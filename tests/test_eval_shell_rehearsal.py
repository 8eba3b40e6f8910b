"""Shell-level rehearsal of the six general-QA eval harnesses
(scripts/v1_5/eval/{pope,gqa,mme,mmbench,vizwiz,vqav2}.sh) on a tiny
checkpoint + synthetic data trees — the same blind-runbook treatment
validate_parity.sh's tests give the COST scripts (round-3 VERDICT #5).

The tiny random model produces garbage answers; what these prove is the
exact shell plumbing a networked host would run (reference:
/root/reference/scripts/v1_5/eval/*.sh): env-var wiring, loader flags,
file-path contracts between loader -> converter -> scorer, and that each
scorer/converter accepts the loader's records. A first real run may only
fail on weights or data, never on the harness.
"""

import base64
import io
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
EVAL = os.path.join(REPO, "scripts", "v1_5", "eval")


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    # Plain llava variant: the general-QA scripts default to
    # llava-v1.5-7b (README: QA numbers are identical to base LLaVA).
    d = tmp_path_factory.mktemp("ck") / "llava-tiny"
    cfg = VCoderConfig.tiny("llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    save_pretrained(str(d), params, cfg)
    tok = SimpleTokenizer.build_from_texts(
        [
            "A chat between a curious human and an artificial intelligence"
            " assistant. The assistant gives helpful, detailed, and polite"
            " answers to the human's questions. USER: ASSISTANT: Is there"
            " a car in the image? What color is the sky? Answer the"
            " question using a single word or phrase. Answer with the"
            " option's letter from the given choices directly. A B C D"
            " yes no blue red"
        ]
    )
    tok.save_pretrained(str(d))
    return str(d)


def _img_bytes():
    rng = np.random.RandomState(0)
    img = PIL.fromarray(rng.randint(0, 255, (32, 40, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _write_images(folder, names):
    os.makedirs(folder, exist_ok=True)
    for n in names:
        path = os.path.join(folder, n)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(_img_bytes())


def _run(script, env_extra, timeout=900):
    env = dict(os.environ)
    env.update(PYTHONPATH=REPO, VCODER_TPU_PLATFORM="cpu")
    env.update(env_extra)
    proc = subprocess.run(
        ["bash", os.path.join(EVAL, script)],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"{script} rc={proc.returncode}\n"
        + proc.stdout[-2000:]
        + proc.stderr[-2000:]
    )
    return proc


def _questions_jsonl(path, names, text="Is there a car in the image?",
                     category=None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for i, n in enumerate(names):
            row = {"question_id": i, "image": n, "text": text}
            if category is not None:
                row["category"] = category
            f.write(json.dumps(row) + "\n")


def test_pope_sh(tiny_ckpt, tmp_path):
    d = tmp_path / "pope"
    names = [f"q{i}.jpg" for i in range(3)]
    _write_images(str(d / "val2014"), names)
    _questions_jsonl(
        str(d / "llava_pope_test.jsonl"), names, category="random"
    )
    os.makedirs(d / "coco")
    with open(d / "coco" / "coco_pope_random.json", "w") as f:
        for i in range(3):
            f.write(json.dumps({"question_id": i, "label": "no"}) + "\n")

    proc = _run("pope.sh", {"CKPT": tiny_ckpt, "D": str(d)})
    assert "Category: random" in proc.stdout
    assert "F1 score:" in proc.stdout
    assert os.path.exists(
        d / "answers" / (os.path.basename(tiny_ckpt) + ".jsonl")
    )


def test_gqa_sh(tiny_ckpt, tmp_path):
    d = tmp_path / "gqa"
    split = "llava_gqa_testdev_balanced"
    names = [f"n{i}.jpg" for i in range(2)]
    _write_images(str(d / "data" / "images"), names)
    _questions_jsonl(str(d / f"{split}.jsonl"), names,
                     text="What color is the sky?")
    # Official GQA question schema keyed by the same question ids.
    questions = {
        str(i): {
            "answer": "blue",
            "isBalanced": True,
            "question": "What color is the sky?",
            "types": {
                "structural": "query", "semantic": "attr", "detailed": "x",
            },
            "semantic": [
                {"operation": "select", "argument": "sky"},
                {"operation": "query: name", "argument": ""},
            ],
            "entailed": [],
            "groups": {"global": "color"},
        }
        for i in range(2)
    }
    os.makedirs(d / "data", exist_ok=True)
    with open(d / "data" / "testdev_balanced_questions.json", "w") as f:
        json.dump(questions, f)

    proc = _run("gqa.sh", {"CKPT": tiny_ckpt, "D": str(d), "SPLIT": split})
    assert "Accuracy:" in proc.stdout or "accuracy" in proc.stdout
    preds = json.load(open(d / "data" / "testdev_balanced_predictions.json"))
    assert {str(p["questionId"]) for p in preds} == {"0", "1"}


def test_mme_sh(tiny_ckpt, tmp_path):
    d = tmp_path / "mme"
    bench = d / "MME_Benchmark_release_version"
    q_text = "Is the sky blue? Please answer yes or no."
    names = ["existence/A.jpg", "existence/B.jpg"]
    _write_images(str(bench), names)
    _questions_jsonl(
        str(d / "llava_mme.jsonl"), names, text=q_text, category="existence"
    )
    # GT lives in the official release layout, not the questions file.
    gt_dir = bench / "existence" / "questions_answers_YN"
    os.makedirs(gt_dir)
    for stem in ("A", "B"):
        (gt_dir / f"{stem}.txt").write_text(f"{q_text}\tYes\n")

    proc = _run("mme.sh", {"CKPT": tiny_ckpt, "D": str(d)})
    assert "existence: score" in proc.stdout
    assert "perception total:" in proc.stdout
    name = os.path.basename(tiny_ckpt)
    out = d / "eval_tool" / "answers" / name / "existence.txt"
    lines = out.read_text().strip().split("\n")
    assert len(lines) == 2
    img, question, gt, pred = lines[0].split("\t")
    assert img == "A.jpg" and gt == "Yes" and question == q_text


def test_mmbench_sh(tiny_ckpt, tmp_path):
    pd = pytest.importorskip("pandas")
    d = tmp_path / "mmbench"
    split = "mmbench_dev_20230712"
    os.makedirs(d)
    b64 = base64.b64encode(_img_bytes()).decode()
    rows = [
        {
            "index": i,
            "question": "What color is the sky?",
            "hint": "Look up." if i == 0 else float("nan"),
            "A": "blue", "B": "red", "C": "green", "D": "yellow",
            "answer": "A",
            "image": b64,
            "category": "color", "source": "synthetic",
        }
        for i in range(2)
    ]
    pd.DataFrame(rows).to_csv(d / f"{split}.tsv", sep="\t", index=False)

    proc = _run("mmbench.sh", {"CKPT": tiny_ckpt, "D": str(d),
                               "SPLIT": split})
    name = os.path.basename(tiny_ckpt)
    upload = d / "answers_upload" / split
    # openpyxl absent in this image -> documented TSV fallback; xlsx on
    # hosts that have it.
    files = sorted(os.listdir(upload))
    assert files and files[0].startswith(name), files
    answers = [
        json.loads(l)
        for l in open(d / "answers" / split / f"{name}.jsonl")
    ]
    assert {a["question_id"] for a in answers} == {0, 1}
    # The loader embeds options + the single-pred instruction in the
    # prompt (reference model_vqa_mmbench.py semantics).
    assert "A. blue" in answers[0]["prompt"]


def test_vizwiz_sh(tiny_ckpt, tmp_path):
    d = tmp_path / "vizwiz"
    names = [f"v{i}.jpg" for i in range(2)]
    _write_images(str(d / "test"), names)
    _questions_jsonl(str(d / "llava_test.jsonl"), names)

    _run("vizwiz.sh", {"CKPT": tiny_ckpt, "D": str(d)})
    name = os.path.basename(tiny_ckpt)
    upload = json.load(open(d / "answers_upload" / f"{name}.json"))
    assert [u["image"] for u in upload] == names
    assert all("answer" in u for u in upload)


def test_vqav2_sh(tiny_ckpt, tmp_path):
    d = tmp_path / "vqav2"
    split = "llava_vqav2_mscoco_test-dev2015"
    names = [f"t{i}.jpg" for i in range(2)]
    _write_images(str(d / "test2015"), names)
    _questions_jsonl(str(d / f"{split}.jsonl"), names)
    # The converter maps answers onto the FULL test2015 split (reference
    # quirk: submission covers test2015 even when answering test-dev).
    _questions_jsonl(
        str(d / "llava_vqav2_mscoco_test2015.jsonl"),
        names + ["extra.jpg"],
    )

    _run("vqav2.sh", {"CKPT": tiny_ckpt, "D": str(d), "SPLIT": split})
    name = os.path.basename(tiny_ckpt)
    upload = json.load(
        open(d / "answers_upload" / split / f"{name}.json")
    )
    assert len(upload) == 3  # full test2015 split, unanswered -> ""
    assert upload[2]["answer"] == ""
