"""GQA accuracy scorer.

The reference vendors the official GQA eval script (reference:
playground/data/eval/gqa/data/eval/eval.py, 468 LoC). This scorer
implements the metrics computable from the questions file alone:
overall accuracy, binary/open accuracy, and per-structural/semantic-type
accuracy. Consistency/validity/plausibility require GQA's entailment and
choice metadata and are reported when those fields are present.

Usage:
    python -m vcoder_tpu.eval.gqa_eval --questions questions.json \
        --predictions testdev_balanced_predictions.json
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict


def evaluate(questions: dict, predictions: dict) -> dict:
    scores = []
    binary, open_ = [], []
    by_structural = defaultdict(list)
    by_semantic = defaultdict(list)
    valid_scores = []
    plausible_scores = []
    consistency_scores = []

    for qid, q in questions.items():
        if qid not in predictions:
            continue
        pred = str(predictions[qid]).strip().lower()
        gold = str(q["answer"]).strip().lower()
        correct = float(pred == gold)
        scores.append(correct)

        types = q.get("types", {})
        structural = types.get("structural", "")
        semantic = types.get("semantic", "")
        if structural:
            by_structural[structural].append(correct)
        if semantic:
            by_semantic[semantic].append(correct)
        if structural in ("verify", "logical") or gold in ("yes", "no"):
            binary.append(correct)
        else:
            open_.append(correct)

        if "validAnswers" in q:
            valid_scores.append(
                float(pred in [a.lower() for a in q["validAnswers"]])
            )
        if "plausibleAnswers" in q:
            plausible_scores.append(
                float(pred in [a.lower() for a in q["plausibleAnswers"]])
            )
        # Consistency: fraction of entailed questions also answered
        # correctly, counted only when the source is correct.
        if correct and q.get("entailed"):
            ent = [
                e for e in q["entailed"] if e in questions and e in predictions
            ]
            if ent:
                consistency_scores.append(
                    sum(
                        float(
                            str(predictions[e]).strip().lower()
                            == str(questions[e]["answer"]).strip().lower()
                        )
                        for e in ent
                    )
                    / len(ent)
                )

    def avg(xs):
        return round(100.0 * sum(xs) / len(xs), 2) if xs else None

    out = {
        "accuracy": avg(scores),
        "binary": avg(binary),
        "open": avg(open_),
        "validity": avg(valid_scores),
        "plausibility": avg(plausible_scores),
        "consistency": avg(consistency_scores),
        "by_structural": {k: avg(v) for k, v in by_structural.items()},
        "by_semantic": {k: avg(v) for k, v in by_semantic.items()},
        "n": len(scores),
    }
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--questions", type=str, required=True)
    parser.add_argument(
        "--predictions", type=str, required=True,
        help="json list of {questionId, prediction} (converters gqa output)",
    )
    args = parser.parse_args()

    questions = json.load(open(args.questions))
    preds_raw = json.load(open(args.predictions))
    predictions = {
        str(p["questionId"]): p["prediction"] for p in preds_raw
    }
    out = evaluate(questions, predictions)
    for k, v in out.items():
        if isinstance(v, dict):
            for kk, vv in v.items():
                print(f"{k}/{kk}: {vv}")
        elif v is not None:
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()
