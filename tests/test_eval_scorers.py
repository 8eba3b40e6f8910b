"""COST scorer tests: NLP core, extraction, CS/HS/DS math."""

import numpy as np
import pytest

from vcoder_tpu.data_utils import generate_qa_pairs
from vcoder_tpu.eval import nlp
from vcoder_tpu.eval.extraction import (
    build_word_to_com,
    get_num_nouns,
    obtain_nouns,
    remove_specific_word,
)
from vcoder_tpu.eval.depth_accuracy import calculate_depth_score, score_pair
from vcoder_tpu.eval.seg_accuracy import (
    calculate_accuracy_hallucination,
    extract_conversations,
    obtain_seg_texts,
)


def test_word_to_num():
    assert nlp.word_to_num("two") == 2
    assert nlp.word_to_num("eighteen") == 18
    assert nlp.word_to_num("twenty five") == 25
    assert nlp.word_to_num("twenty-five") == 25
    assert nlp.word_to_num("7") == 7
    with pytest.raises(ValueError):
        nlp.word_to_num("banana")


def test_num_to_words():
    assert nlp.num_to_words(1) == "one"
    assert nlp.num_to_words(18) == "eighteen"
    assert nlp.num_to_words(25) == "twenty-five"
    assert nlp.num_to_words(40) == "forty"


def test_plural_singular():
    assert nlp.plural("person") == "people"
    assert nlp.plural("car") == "cars"
    assert nlp.plural("bench") == "benches"
    assert nlp.plural("knife") == "knives"
    assert nlp.plural("wine glass") == "wine glasses"
    assert nlp.singular_noun("people") == "person"
    assert nlp.singular_noun("cars") == "car"
    assert nlp.singular_noun("benches") == "bench"
    assert nlp.singular_noun("car") is False
    assert nlp.singular_noun("grass") is False
    assert nlp.singular_noun("bus") is False


def test_remove_specific_word_dedup():
    text = "wall, person, wall, window, car, window"
    out = remove_specific_word(text, "wall")
    out = remove_specific_word(out, "window")
    assert out.count("wall") == 1
    assert out.count("window") == 1
    assert "person" in out and "car" in out


def test_get_num_nouns():
    text = (
        "The objects present in the image are: two people, a car, "
        "three buses, eighteen bottles."
    )
    out = get_num_nouns(text)
    assert out == {"people": 2, "buses": 3, "bottles": 18}


def test_obtain_nouns_counts_and_merge():
    text = (
        "The objects present in the image are: wall, dining table, "
        "two people, car"
    )
    out = obtain_nouns(text)
    assert out["people"] == 2
    assert out["wall"] == 1
    assert out["dining table"] == 1
    assert out["car"] == 1
    assert "image" not in out and "objects" not in out


def test_word_to_com_canonicalization():
    w2c = build_word_to_com(include_plurals=True)
    assert w2c["man"] == "person"
    assert w2c["men"] == "people"
    assert w2c["automobile"] == "car"
    # man + kid both canonicalize to person; count 2 -> pluralized
    # (same as the reference's p.plural on multi-count nouns).
    out = obtain_nouns("a man and a kid near an automobile", w2c)
    assert out == {"people": 2, "car": 1}


def _write_cost_files(tmp_path):
    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    gt_dir.mkdir()
    pred_dir.mkdir()
    for task in ("semantic", "instance", "panoptic"):
        (gt_dir / f"{task}.txt").write_text(
            "<IMG>img1.jpg<IMG>The objects present in the image are: "
            "two people, a car, wall\n"
            "<IMG>img2.jpg<IMG>The objects present in the image are: "
            "three dogs\n"
        )
        (pred_dir / f"output_{task}.txt").write_text(
            "Image: img1.jpg\n"
            "<<QUESTION>>: What objects can be seen in the image?\n"
            "<<ANSWER>>: The objects present in the image are: "
            "two people, a car, wall</s>\n"
            "--------\n"
            "Image: img2.jpg\n"
            "<<QUESTION>>: What objects can be seen in the image?\n"
            "<<ANSWER>>: The objects present in the image are: "
            "two dogs, a cat</s>\n"
            "--------\n"
        )
    return gt_dir, pred_dir


def test_cs_hs_scoring_end_to_end(tmp_path):
    gt_dir, pred_dir = _write_cost_files(tmp_path)
    acc, hall = calculate_accuracy_hallucination(
        str(gt_dir), str(pred_dir), write_json=False
    )
    for task in ("semantic", "instance", "panoptic"):
        # img1: perfect -> acc 1.0, hall 0.0
        # img2: gt {dogs:3}; pred {dogs:2, cat:1} -> acc = min/max = 2/3;
        #        hall = mean(1-2/3, 1.0) = 2/3
        np.testing.assert_allclose(acc[task][0], 1.0)
        np.testing.assert_allclose(hall[task][0], 0.0)
        np.testing.assert_allclose(acc[task][1], 2 / 3, atol=1e-6)
        np.testing.assert_allclose(hall[task][1], 2 / 3, atol=1e-6)


def test_ds_scoring(tmp_path):
    gt = tmp_path / "gt.txt"
    pred = tmp_path / "pred.txt"
    gt.write_text(
        "<IMG>img1.jpg<IMG>The depth order for the objects present in the "
        "image is: person, car, tree\n"
    )
    pred.write_text(
        "Image: img1.jpg\n"
        "<<QUESTION>>: q\n"
        "<<ANSWER>>: The depth order for the objects present in the image "
        "is: car, person, tree</s>\n"
    )
    scores = calculate_depth_score(str(gt), str(pred))
    # person |1-2|=1, car |2-1|=1, tree |3-3|=0 -> 2/3
    np.testing.assert_allclose(scores[0], 2 / 3, atol=1e-6)


def test_ds_missing_object_penalty():
    s = score_pair(
        "order: person, car",
        "order: person",
    )
    # person |1-1|=0; car missing -> 100; /2 objects
    np.testing.assert_allclose(s, 50.0)


def test_generate_qa_pairs():
    np.random.seed(0)
    import random

    random.seed(0)
    text = (
        "The objects present in the image are: wall, dining table, "
        "two people, eighteen bottles"
    )
    pairs = generate_qa_pairs(text)
    assert 1 <= len(pairs) <= 6
    for q, a in pairs:
        assert q.endswith("in the image?")
        assert a in ("Yes.", "No.") or a.endswith("in the image.")


# ---- GQA official scorer -------------------------------------------------


def _gqa_q(answer, structural="query", semantic="attr", detailed="x",
           question="what color is the car ?", steps=None, entailed=(),
           balanced=True, group=None):
    return {
        "answer": answer,
        "isBalanced": balanced,
        "question": question,
        "types": {
            "structural": structural,
            "semantic": semantic,
            "detailed": detailed,
        },
        "semantic": steps if steps is not None else [
            {"operation": "select", "argument": "car"},
            {"operation": "query: name", "argument": ""},
        ],
        "entailed": list(entailed),
        "groups": {"global": group},
    }


def test_gqa_official_accuracy_binary_open_and_balanced_filter():
    from vcoder_tpu.eval.gqa_eval import evaluate

    questions = {
        "q1": _gqa_q("red", structural="query"),
        "q2": _gqa_q("yes", structural="verify"),
        "q3": _gqa_q("no", structural="logical"),
        # unbalanced rows are excluded from every metric
        "q4": _gqa_q("blue", balanced=False),
    }
    preds = {"q1": "red", "q2": "no", "q3": "no"}
    out = evaluate(questions, preds)
    assert out["n"] == 3
    assert out["accuracy"] == round(2 / 3 * 100, 2)
    assert out["open"] == 100.0  # q1 only (structural == query)
    assert out["binary"] == 50.0  # q2 wrong, q3 right
    assert out["accuracyPerStructuralType"]["verify"] == (0.0, 1)


def test_gqa_official_validity_common_normalization():
    from vcoder_tpu.eval.gqa_eval import evaluate

    questions = {
        "q1": _gqa_q("red", detailed="typeVerifyC"),
        "q2": _gqa_q("red", detailed="chooseCommon"),
    }
    # q2's detailed type contains "Common": the group becomes
    # ["color","material","shape"] regardless of the choices file
    # (official belongs(), eval.py:232-237) — so "material" scores valid
    # AND plausible even though the choices lists don't contain it.
    choices = {
        "q1": {"valid": ["red", "blue"], "plausible": ["red"]},
        "q2": {"valid": ["red"], "plausible": ["red"]},
    }
    preds = {"q1": "green", "q2": "material"}
    out = evaluate(questions, preds, choices=choices)
    assert out["validity"] == 50.0  # q1 invalid; q2 valid via Common
    assert out["plausibility"] == 50.0


def test_gqa_official_consistency_and_missing_prediction():
    import pytest

    from vcoder_tpu.eval.gqa_eval import evaluate

    questions = {
        "q1": _gqa_q("red", entailed=["e1", "e2"]),
        "e1": _gqa_q("yes", structural="verify", balanced=False),
        "e2": _gqa_q("no", structural="verify", balanced=False),
    }
    preds = {"q1": "red", "e1": "yes", "e2": "yes"}
    out = evaluate(questions, preds, consistency=True)
    assert out["consistency"] == 50.0  # e1 right, e2 wrong
    # wrong source answer -> no consistency contribution
    out2 = evaluate(questions, {**preds, "q1": "blue"}, consistency=True)
    assert out2["consistency"] == 0.0
    # consistency demands predictions for ALL questions
    with pytest.raises(ValueError, match="no prediction"):
        evaluate(questions, {"q1": "red"}, consistency=True)


def test_gqa_official_distribution_and_steps():
    from vcoder_tpu.eval.gqa_eval import evaluate

    steps = [
        {"operation": "select", "argument": "car"},
        {"operation": "filter color", "argument": "red"},
        {"operation": "exist", "argument": "?"},  # excluded
    ]
    questions = {
        "q1": _gqa_q("red", group="color", steps=steps),
        "q2": _gqa_q("blue", group="color"),
    }
    preds = {"q1": "red", "q2": "red"}
    out = evaluate(questions, preds)
    # gold hist {red:1, blue:1}; predicted {red:2}:
    # chi = ((2-1)^2/1 + (0-1)^2/1) * 2 / 2 = 2.0; reported /100
    assert out["distribution"] == round(2.0 / 100.0, 2)
    # q1 counts 2 steps (exist excluded); q2's default counts 1
    assert out["accuracyPerSteps"][2] == (100.0, 1)
    assert out["accuracyPerSteps"][1] == (0.0, 1)


# ---- MME converter -> scorer round-trip ----------------------------------


def test_mme_converter_scorer_roundtrip(tmp_path):
    """convert_mme's per-category txt must feed mme_eval with eval_tool
    semantics: acc over questions, acc+ over images with both questions
    right, score = 100*(acc+acc+), perception/cognition group sums."""
    import json

    from vcoder_tpu.eval.converters import convert_mme
    from vcoder_tpu.eval.mme_eval import evaluate_dir, parse_pred

    qf = tmp_path / "llava_mme.jsonl"
    rf = tmp_path / "answers.jsonl"
    qs = [
        # existence: img A both right -> acc+ hit; img B one wrong
        {"question_id": 1, "image": "existence/A.jpg", "text": "Is there a dog?", "answer": "yes", "category": "existence"},
        {"question_id": 2, "image": "existence/A.jpg", "text": "Is there a cat?", "answer": "no", "category": "existence"},
        {"question_id": 3, "image": "existence/B.jpg", "text": "Is there a car?", "answer": "yes", "category": "existence"},
        {"question_id": 4, "image": "existence/B.jpg", "text": "Is there a bus?", "answer": "no", "category": "existence"},
        # code_reasoning (cognition): one image, both right
        {"question_id": 5, "image": "code_reasoning/C.jpg", "text": "Will it print 3?", "answer": "yes", "category": "code_reasoning"},
        {"question_id": 6, "image": "code_reasoning/C.jpg", "text": "Will it crash?", "answer": "no", "category": "code_reasoning"},
    ]
    answers = {1: "Yes, there is.", 2: "No", 3: "yes", 4: "Yes it is", 5: "yes", 6: "no."}
    with open(qf, "w") as f:
        for q in qs:
            f.write(json.dumps(q) + "\n")
    with open(rf, "w") as f:
        for qid, text in answers.items():
            f.write(json.dumps({"question_id": qid, "text": text}) + "\n")

    out_dir = tmp_path / "converted"
    convert_mme(str(qf), str(rf), str(out_dir))
    assert sorted(p.name for p in out_dir.glob("*.txt")) == [
        "code_reasoning.txt", "existence.txt",
    ]
    # Format: img \t question \t gt \t pred
    line = open(out_dir / "existence.txt").readline().rstrip("\n").split("\t")
    assert line[0] == "A.jpg" and line[2] == "yes"

    res = evaluate_dir(str(out_dir))
    ex = res["categories"]["existence"]
    assert ex["acc"] == 0.75  # q4 wrong ('Yes it is' vs 'no')
    assert ex["acc_plus"] == 0.5  # only image A fully right
    assert abs(ex["score"] - 125.0) < 1e-9
    cr = res["categories"]["code_reasoning"]
    assert cr["score"] == 200.0
    assert abs(res["perception"] - 125.0) < 1e-9
    assert res["cognition"] == 200.0
    # Prediction normalization: the eval_tool's EXACT rule (substring
    # of the first 4 chars) — published numbers depend on its quirks.
    assert parse_pred("Yes, there is") == "yes"
    assert parse_pred("Nothing") == "no"  # eval_tool: 'no' in 'noth'
    assert parse_pred(" NO.") == "no"
    assert parse_pred("maybe") == "other"
    assert parse_pred("unclear") == "other"


def test_singularization_roundtrip_over_scoring_vocab():
    """For every singular noun in the scoring vocabulary (synonyms.txt),
    singular_noun(plural(w)) must return w — naive suffix rules mangled
    real COCO classes ('ties'->'ty', 'houses'->'hous', 'gloves'->'glof')
    and the scorer then treated a correct prediction as a different
    noun."""
    import os

    from vcoder_tpu.eval import nlp

    path = os.path.join(
        os.path.dirname(nlp.__file__), "synonyms.txt"
    )
    words = set()
    for line in open(path):
        for w in line.split(","):
            w = w.strip().lower()
            if w and " " not in w:
                words.add(w)
    failures = []
    for w in sorted(words):
        if nlp.singular_noun(w):
            continue  # entry is already plural ('people', 'children')
        p = nlp.plural(w)
        back = nlp.singular_noun(p)
        # Accept an equivalent singular whose plural is the same form
        # (the vocab's 'knive' typo legitimately maps back to 'knife',
        # exactly as inflect does).
        if back != w and (not back or nlp.plural(back) != p):
            failures.append((w, p, back))
    assert not failures, failures


def test_singularization_known_cases():
    from vcoder_tpu.eval.nlp import singular_noun

    cases = {
        "ties": "tie", "houses": "house", "horses": "horse",
        "vases": "vase", "gloves": "glove", "shoes": "shoe",
        "toes": "toe", "buses": "bus", "boxes": "box",
        "benches": "bench", "glasses": "glass", "potatoes": "potato",
        "knives": "knife", "wolves": "wolf", "cities": "city",
        "purses": "purse", "waves": "wave",
    }
    got = {k: singular_noun(k) for k in cases}
    assert got == cases


def test_multiword_number_chunks_match_reference_quirk():
    """'twenty three bottles' stays ONE chunk (spacy span semantics);
    the consumer then reads count=20, noun='three bottles' exactly like
    the reference's split(' ')[0] parse (eval_seg_accuracy.py:128) —
    parity includes the quirk."""
    from vcoder_tpu.eval.extraction import get_num_nouns
    from vcoder_tpu.eval.nlp import extract_num_noun_chunks

    assert extract_num_noun_chunks("twenty three bottles") == [
        "twenty three bottles"
    ]
    assert get_num_nouns("twenty three bottles") == {"three bottles": 20}
    # Single-token numbers unaffected.
    assert get_num_nouns("two people and three buses") == {
        "people": 2, "buses": 3,
    }


def test_obtain_seg_texts_tolerates_blank_lines(tmp_path):
    from vcoder_tpu.eval.extraction import obtain_seg_texts

    f = tmp_path / "gt.txt"
    f.write_text("<IMG>a.jpg<IMG>two people, a car\n\n\n")
    labels = obtain_seg_texts(str(f))
    assert labels == {"a.jpg": "two people, a car"}


def test_convert_mme_reads_benchmark_gt(tmp_path):
    """The stock llava_mme.jsonl has NO answer field; GT must come from
    the official benchmark layout — and silently-empty GT (which zeroes
    the whole benchmark) must be impossible."""
    import json

    from vcoder_tpu.eval.converters import convert_mme

    q = tmp_path / "q.jsonl"
    q.write_text(json.dumps({
        "question_id": 1, "image": "color/0001.jpg",
        "text": "Is the sky blue? Please answer yes or no.",
        "category": "color",
    }) + "\n")
    r = tmp_path / "r.jsonl"
    r.write_text(json.dumps({"question_id": 1, "text": "Yes"}) + "\n")

    bench = tmp_path / "bench" / "color" / "questions_answers_YN"
    bench.mkdir(parents=True)
    (bench / "0001.txt").write_text(
        "Is the sky blue? Please answer yes or no.\tYes\n"
    )
    out = tmp_path / "out"
    convert_mme(str(q), str(r), str(out), benchmark_dir=str(tmp_path / "bench"))
    line = (out / "color.txt").read_text().strip()
    img, question, gt, pred = line.split("\t")
    assert gt == "Yes" and pred == "Yes"

    # No GT anywhere -> loud failure, not a zeroed benchmark.
    with pytest.raises(ValueError, match="no ground truth"):
        convert_mme(str(q), str(r), str(tmp_path / "out2"))
