#!/bin/bash
# Blind COST-parity runbook: checkpoint dir in -> CS/HS (+DS) out, diffed
# against the reference's published numbers (reference: README.md:105-113).
#
# Designed to run UNATTENDED on a networked host that has downloaded a real
# VCoder checkpoint and the COST val split:
#
#   1. huggingface-cli download shi-labs/vcoder_ds_llava-v1.5-7b --local-dir ckpt
#   2. huggingface-cli download --repo-type dataset shi-labs/COST --local-dir cost
#   3. scripts/validate_parity.sh ckpt cost/coco/val2017 cost/coco_segm_text/val [N]
#
# Steps: import smoke + greedy golden-token fingerprint -> N-image COST
# subset generation (semantic/instance/panoptic [+depth for -ds models])
# -> CS/HS scoring -> side-by-side print with the reference targets.
#
# Everything before the final diff also runs offline against a synthetic
# checkpoint + COST tree (tests/test_validate_parity.py exercises it).
set -euo pipefail

CKPT=${1:?usage: validate_parity.sh CKPT_DIR IMAGE_DIR GT_DIR [N]}
IMAGES=${2:?need COST val image dir (e.g. cost/coco/val2017)}
GT=${3:?need COST gt dir (e.g. cost/coco_segm_text/val)}
N=${4:-50}
OUT=${OUT:-parity_out}
mkdir -p "$OUT"

echo "== [1/4] import smoke + golden-token fingerprint =="
python - "$CKPT" "$OUT" <<'PY'
import json
import sys

import numpy as np

ckpt, out = sys.argv[1], sys.argv[2]
from vcoder_tpu.builder import load_pretrained_model
from vcoder_tpu.constants import DEFAULT_IMAGE_TOKEN, DEFAULT_SEG_TOKEN
from vcoder_tpu.conversation import conv_templates
from vcoder_tpu.mm_tokens import tokenizer_seg_token

tokenizer, model, image_processor, seg_processor, _, ctx = (
    load_pretrained_model(ckpt)
)
cfg = model.config
print(f"model_type={cfg.model_type} context_len={ctx}")

# Deterministic synthetic pixels: the SAME bytes on any host, so greedy
# token ids are a cross-host checkpoint fingerprint.
rng = np.random.default_rng(1234)
s = cfg.vision.image_size
img = rng.standard_normal((1, s, s, 3)).astype(np.float32)
conv = conv_templates["llava_v1"].copy()
q = "What objects can be seen in the image?"
if cfg.model_type.startswith("vcoder"):
    conv.append_message(
        conv.roles[0], DEFAULT_SEG_TOKEN + "\n" + DEFAULT_IMAGE_TOKEN + "\n" + q
    )
else:
    conv.append_message(conv.roles[0], DEFAULT_IMAGE_TOKEN + "\n" + q)
conv.append_message(conv.roles[1], None)
ids = tokenizer_seg_token(conv.get_prompt(), tokenizer)
res = model.generate(
    [list(ids)],
    images=img,
    segs=img if cfg.model_type.startswith("vcoder") else None,
    max_new_tokens=10,
    temperature=0.0,
    tokenizer=tokenizer,
)
fp = res.sequences[0, : res.num_generated[0]].tolist()
print("golden_tokens:", fp)
json.dump({"model_type": cfg.model_type, "golden_tokens": fp},
          open(f"{out}/fingerprint.json", "w"))
PY

MODEL_NAME=$(basename "$CKPT")
FLAGS=()
case "$MODEL_NAME" in
  *vcoder*) FLAGS+=(--use-seg --seg-image-folder "$GT/\$TASK_inference") ;;
esac

echo "== [2/4] COST subset generation (N=$N per task) =="
python -m vcoder_tpu.eval.cost_loader \
    --model-path "$CKPT" \
    --image-folder "$IMAGES" \
    "${FLAGS[@]}" \
    --output-file "$OUT/output" \
    --max-samples "$N" \
    --temperature 0 --conv-mode vicuna_v1 \
    --tasks "${TASKS:-semantic,instance,panoptic}"

# Single-chunk run: rename the reference-contract chunk files
# (output_{task}_1_0.txt) to the names the scorer globs.
for TASK in ${TASKS//,/ } semantic instance panoptic; do
  [ -f "$OUT/output_${TASK}_1_0.txt" ] &&     mv "$OUT/output_${TASK}_1_0.txt" "$OUT/output_${TASK}.txt"
done

echo "== [3/4] CS/HS scoring =="
python -m vcoder_tpu.eval.seg_accuracy \
    --gt_path "$GT" --pred_path "$OUT" \
    --tasks "${TASKS:-semantic,instance,panoptic}" | tee "$OUT/scores.txt"

case "$MODEL_NAME" in
  *ds*)
    echo "== [3b/4] depth-order subset + DS scoring =="
    # COST layout: depth GT lives beside the seg GT dir
    # (coco_segm_text/depth/<split>/ — docs/COST.md).
    DEPTH_DIR="$(dirname "$GT")/depth/$(basename "$GT")"
    python -m vcoder_tpu.eval.cost_loader \
        --model-path "$CKPT" \
        --image-folder "$IMAGES" \
        --use-seg --seg-image-folder "$GT/panoptic_inference" \
        --use-depth --depth-image-folder "$DEPTH_DIR/depth" \
        --output-file "$OUT/output" \
        --max-samples "$N" \
        --temperature 0 --conv-mode vicuna_v1 --tasks depth
    mv "$OUT/output_depth_1_0.txt" "$OUT/output_depth.txt"
    python -m vcoder_tpu.eval.depth_accuracy \
        --gt_path "$DEPTH_DIR/panoptic_order.txt" \
        --pred_path "$OUT/output_depth.txt" | tee -a "$OUT/scores.txt"
    ;;
esac

echo "== [4/4] reference targets (README.md:110-113, full 5k val) =="
cat <<'TXT'
model                     semantic   instance   panoptic   depth(DS)
vcoder_llava-v1.5-7b      88.6/10.4  71.1/26.9  86.0/12.8  -
vcoder_llava-v1.5-13b     89.0/10.0  73.3/25.0  87.2/11.6  -
vcoder_ds_llava-v1.5-7b   87.8/11.5  69.9/28.5  86.8/12.4  65.9
vcoder_ds_llava-v1.5-13b  88.5/10.9  71.7/26.3  88.5/10.8  63.3
TXT
echo "NOTE: an N-image subset is a noisy estimate; expect +-2-3 points of"
echo "the full-split numbers at N=50. Run with N=5000 for the exact diff."
echo "Artifacts in $OUT/ (fingerprint.json, answers_*.txt, scores.txt)."
