"""End-to-end eval harness tests on a tiny checkpoint: cost_loader ->
seg_accuracy scorer, and vqa_loader -> pope scorer. The tiny random model
produces garbage text; these tests validate the full mechanical loop
(globbing, chunking, batching, record formats, scorer parsing)."""

import json
import os
import types

import jax
import numpy as np
import pytest

from vcoder_tpu.checkpoint import save_pretrained
from vcoder_tpu.config import VCoderConfig
from vcoder_tpu.eval.cost_loader import eval_model as cost_eval_model
from vcoder_tpu.eval.cost_loader import get_chunk, split_list
from vcoder_tpu.eval.seg_accuracy import extract_conversations
from vcoder_tpu.eval.vqa_loader import eval_model as vqa_eval_model
from vcoder_tpu.models import vcoder as model_mod
from vcoder_tpu.simple_tokenizer import SimpleTokenizer

PIL = pytest.importorskip("PIL.Image")


def test_split_chunks():
    lst = list(range(10))
    chunks = split_list(lst, 3)
    assert sum(chunks, []) == lst
    assert get_chunk(lst, 3, 0) == chunks[0]


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("ck") / "vcoder_ds_llava-tiny"
    cfg = VCoderConfig.tiny("vcoder_ds_llava")
    params = model_mod.init_vcoder_params(jax.random.PRNGKey(0), cfg)
    save_pretrained(str(d), params, cfg)
    tok = SimpleTokenizer.build_from_texts(
        [
            "A chat between a curious human and an artificial intelligence"
            " assistant. The assistant gives helpful, detailed, and polite"
            " answers to the human's questions. USER: ASSISTANT: What"
            " objects can be seen in the image? The objects present in the"
            " image are: two people, a car"
        ]
    )
    tok.save_pretrained(str(d))
    return str(d)


def _write_images(folder, keys):
    os.makedirs(folder, exist_ok=True)
    rng = np.random.RandomState(0)
    for k in keys:
        PIL.fromarray(rng.randint(0, 255, (32, 40, 3), np.uint8)).save(
            os.path.join(folder, k)
        )


def test_cost_loader_end_to_end(tiny_ckpt, tmp_path):
    keys = [f"img{i}.jpg" for i in range(3)]
    img_dir = tmp_path / "val2017"
    seg_dir = tmp_path / "semantic_inference"
    _write_images(str(img_dir), keys)
    _write_images(str(seg_dir), keys)

    args = types.SimpleNamespace(
        model_path=tiny_ckpt,
        model_base=None,
        image_folder=str(img_dir),
        use_seg=True,
        seg_image_folder=str(tmp_path / "$TASK_inference"),
        use_depth=False,
        depth_image_folder="",
        output_file=str(tmp_path / "output"),
        conv_mode="llava_v1",
        num_chunks=1,
        chunk_idx=0,
        temperature=0.0,
        top_p=None,
        num_beams=1,
        batch_size=2,
        seed=0,
    )
    out = cost_eval_model(args, "semantic")
    assert os.path.exists(out)
    preds = extract_conversations(out)
    assert set(preds.keys()) == set(keys)


def test_vqa_loader_and_pope(tiny_ckpt, tmp_path, capsys):
    keys = [f"q{i}.jpg" for i in range(3)]
    img_dir = tmp_path / "imgs"
    _write_images(str(img_dir), keys)
    qfile = tmp_path / "questions.jsonl"
    with open(qfile, "w") as f:
        for i, k in enumerate(keys):
            f.write(
                json.dumps(
                    {
                        "question_id": i,
                        "image": k,
                        "text": "Is there a car in the image?",
                        "category": "random",
                    }
                )
                + "\n"
            )
    afile = tmp_path / "answers.jsonl"
    args = types.SimpleNamespace(
        model_path=tiny_ckpt,
        model_base=None,
        image_folder=str(img_dir),
        question_file=str(qfile),
        answers_file=str(afile),
        conv_mode="llava_v1",
        num_chunks=1,
        chunk_idx=0,
        temperature=0.0,
        top_p=None,
        num_beams=1,
        max_new_tokens=4,
        batch_size=2,
        single_pred_prompt=False,
    )
    vqa_eval_model(args)
    answers = [json.loads(l) for l in open(afile)]
    assert len(answers) == 3
    assert {"question_id", "prompt", "text", "answer_id", "model_id"} <= set(
        answers[0]
    )

    # POPE scorer over the generated answers
    ann_dir = tmp_path / "ann"
    os.makedirs(ann_dir)
    with open(ann_dir / "coco_pope_random.json", "w") as f:
        for i in range(3):
            f.write(json.dumps({"question_id": i, "label": "no"}) + "\n")
    import sys

    from vcoder_tpu.eval import pope

    sys.argv = [
        "pope",
        "--annotation-dir", str(ann_dir),
        "--question-file", str(qfile),
        "--result-file", str(afile),
    ]
    pope.main()
    out = capsys.readouterr().out
    assert "Accuracy:" in out and "F1 score:" in out


def test_cost_loader_lookahead_matches_plain(tiny_ckpt, tmp_path):
    """--lookahead must not change greedy COST answers (speculative
    decoding is output-identical), only the dispatch count."""
    keys = [f"img{i}.jpg" for i in range(2)]
    img_dir = tmp_path / "la_val2017"
    seg_dir = tmp_path / "la_semantic_inference"
    _write_images(str(img_dir), keys)
    _write_images(str(seg_dir), keys)

    def run(lookahead, tag):
        args = types.SimpleNamespace(
            model_path=tiny_ckpt,
            model_base=None,
            image_folder=str(img_dir),
            use_seg=True,
            seg_image_folder=str(tmp_path / "la_$TASK_inference"),
            use_depth=False,
            depth_image_folder="",
            output_file=str(tmp_path / f"out_{tag}"),
            conv_mode="llava_v1",
            num_chunks=1,
            chunk_idx=0,
            temperature=0.0,
            top_p=None,
            num_beams=1,
            batch_size=2,
            seed=0,
            lookahead=lookahead,
        )
        return extract_conversations(cost_eval_model(args, "semantic"))

    plain = run(0, "plain")
    spec = run(6, "spec")
    assert spec == plain
