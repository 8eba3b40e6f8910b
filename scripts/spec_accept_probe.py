"""Narrow the speculative-accept bracket with realistic COST answers.

The DRAFT side of prompt-lookup speculative decoding is model-free:
given the text a checkpoint WOULD emit, replaying it teacher-forced
through the engine's drafter (`speculative.ngram_draft_np`) and
acceptance rule (`speculative.accept_window` semantics: every dispatch
emits 1 model token + the longest draft prefix matching the model's
continuation) yields exactly the accept/dispatch a greedy COST eval
would realize on a checkpoint producing those answers. Random-weight
hardware runs bracket accept at 1.33-1.60 (gibberish) vs 4.0-12.0
(surgically repetitive); this probe pins where COST-formatted answers
land between them — no trained weights needed (docs/ROADMAP.md #7).

Corpus: COST answer shapes synthesized from the repo's own metric data —
the 79 COCO classes of `eval/synonyms.txt`, the count-in-words format
the paragraph instructions demand (reference answer format:
vcoder_llava/eval/eval_seg_accuracy.py:157-170), and the depth-order
"noun[-k]" lists the DS scorer parses — prompted with the real question
banks + conv_vicuna_v1 template the eval loaders use.

Caveat: word-level tokenization (`simple_tokenizer`; no sentencepiece
assets in this offline image). Llama BPE splits rare words into common
subwords, which only ADDS repeated n-grams, so these accepts are
conservative for the real tokenizer.

    python scripts/spec_accept_probe.py [--samples 200] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("VCODER_TPU_PLATFORM", "cpu")

NUM_WORDS = ["two", "three", "four", "five", "six", "seven", "eight"]


def _coco_classes():
    from vcoder_tpu.eval import seg_accuracy  # noqa: F401 (path anchor)

    path = os.path.join(
        os.path.dirname(os.path.abspath(seg_accuracy.__file__)),
        "synonyms.txt",
    )
    classes = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                classes.append(line.split(",")[0].strip())
    return classes


def _seg_answer(rng, classes):
    """Panoptic-style answer: 4-11 objects, word counts when > 1
    (reference format: 'two people, car, wall, sky')."""
    n = rng.integers(4, 12)
    picks = rng.choice(len(classes), size=n, replace=False)
    parts = []
    for i in picks:
        c = classes[i]
        r = rng.random()
        if r < 0.30:
            k = int(np.clip(rng.geometric(0.55), 2, 8))
            noun = c + ("s" if not c.endswith("s") else "")
            parts.append(f"{NUM_WORDS[k - 2]} {noun}")
        else:
            parts.append(c)
    return "The objects present in the image are: " + ", ".join(parts)


def _depth_answer(rng, classes):
    """Depth-order answer: repeated instances carry '-k' suffixes
    ('bicycle, bicycle-2, person, road, sky')."""
    n = rng.integers(4, 12)
    picks = rng.choice(len(classes), size=max(n // 2, 2), replace=False)
    parts = []
    for i in picks:
        c = classes[i]
        reps = int(np.clip(rng.geometric(0.6), 1, 4))
        parts.append(c)
        for r in range(2, reps + 1):
            parts.append(f"{c}-{r}")
    rng.shuffle(parts)
    return (
        "The depth order for the objects present in the image is: "
        + ", ".join(parts[:n])
    )


def _prompt(rng, task, *, with_inputs):
    """The eval loader's exact prompt: question bank + sentinels + conv
    template; the paragraph suffix appears only WITHOUT seg/depth inputs
    (eval/cost_loader.py no-seg fallback)."""
    from vcoder_tpu.constants import (
        DEFAULT_DEPTH_TOKEN,
        DEFAULT_IMAGE_TOKEN,
        DEFAULT_SEG_TOKEN,
    )
    from vcoder_tpu.conversation import conv_templates
    from vcoder_tpu.questions import (
        DEPTH_PARAGRAPH_SUFFIX,
        QUESTIONS,
        SEG_PARAGRAPH_SUFFIX,
    )

    qs = QUESTIONS[task][rng.integers(len(QUESTIONS[task]))]
    if task == "depth":
        head = (
            f"{DEFAULT_IMAGE_TOKEN}\n{DEFAULT_DEPTH_TOKEN}\n"
            f"{DEFAULT_SEG_TOKEN}\n"
            if with_inputs
            else f"{DEFAULT_IMAGE_TOKEN}\n"
        )
        qs = head + qs + ("" if with_inputs else DEPTH_PARAGRAPH_SUFFIX)
    else:
        head = (
            f"{DEFAULT_IMAGE_TOKEN}\n{DEFAULT_SEG_TOKEN}\n"
            if with_inputs
            else f"{DEFAULT_IMAGE_TOKEN}\n"
        )
        qs = head + qs + ("" if with_inputs else SEG_PARAGRAPH_SUFFIX)
    conv = conv_templates["vicuna_v1"].copy()
    conv.append_message(conv.roles[0], qs)
    conv.append_message(conv.roles[1], None)
    return conv.get_prompt()


def _accepts(prompt_ids, answer_ids, lookahead):
    """Teacher-forced dispatch count: mirrors the serving engines'
    accept loop (`speculative.accept_window` — one guaranteed emission
    per dispatch plus the matching draft prefix)."""
    from vcoder_tpu.speculative import ngram_draft_np

    hist = np.asarray(
        list(prompt_ids) + list(answer_ids), np.int32
    )[None, :]
    N = len(answer_ids)
    pos = 1  # first answer token comes from prefill's sampling
    dispatches = 0
    while pos < N:
        L = len(prompt_ids) + pos
        draft = ngram_draft_np(
            hist, np.asarray([L], np.int32), lookahead - 1
        )[0]
        m = 0
        while m < lookahead - 1 and pos + m < N and (
            draft[m] == answer_ids[pos + m]
        ):
            m += 1
        pos += 1 + m
        dispatches += 1
    return max(N - 1, 0), dispatches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=200)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from vcoder_tpu.simple_tokenizer import SimpleTokenizer

    classes = _coco_classes()
    rng = np.random.default_rng(0)
    tok = SimpleTokenizer()

    # Projection: a k<=16 verify dispatch streams the same weights as a
    # plain decode step (both HBM-bound at B=1), so accept/dispatch IS
    # the speedup bound: projected tok/s = plain tok/s x accept. (The
    # surgical bracket's raw dispatch rates imply sub-streaming-floor
    # dispatch times — probe-correction artifacts — so they are NOT used
    # as a multiplier here.)
    PLAIN_TOK_S = 54.0

    results = {}
    for task, gen, with_inputs in (
        ("panoptic", _seg_answer, True),
        ("panoptic_nosg", _seg_answer, False),
        ("depth", _depth_answer, True),
        ("depth_noinp", _depth_answer, False),
    ):
        bank_task = "depth" if task.startswith("depth") else "panoptic"
        cases = []
        for _ in range(args.samples):
            p = _prompt(rng, bank_task, with_inputs=with_inputs)
            a = gen(rng, classes)
            # Sentinel splice irrelevant to drafting (negative ids never
            # match); tokenize prompt and answer independently.
            cases.append(
                (tok(p).input_ids, tok(a).input_ids[1:])  # drop BOS
            )
        for k in (4, 8, 16):
            tot = disp = 0
            for pi, ai in cases:
                t, d = _accepts(pi, ai, k)
                tot += t
                disp += d
            acc = tot / max(disp, 1)
            proj = PLAIN_TOK_S * acc
            results[f"{task}_k{k}"] = {
                "accept_per_dispatch": round(acc, 2),
                "projected_tok_s": round(proj, 1),
                "speedup_vs_plain": round(proj / PLAIN_TOK_S, 2),
            }
            if not args.json:
                print(
                    f"{task:14s} k={k:2d}: accept/dispatch "
                    f"{acc:5.2f}  -> projected "
                    f"{proj:7.1f} tok/s ({proj / PLAIN_TOK_S:4.1f}x plain)",
                    flush=True,
                )
    if args.json:
        print(json.dumps(results))


if __name__ == "__main__":
    main()
