#!/bin/bash
# MME (reference: scripts/v1_5/eval/mme.sh). Scoring uses MME's own
# eval_tool/calculation.py over the converted answers.
CKPT=${CKPT:-checkpoints/llava-v1.5-7b}
D=${D:-playground/data/eval/MME}
NAME=$(basename $CKPT)
python -m vcoder_tpu.eval.vqa_loader \
    --model-path $CKPT \
    --question-file $D/llava_mme.jsonl \
    --image-folder $D/MME_Benchmark_release_version \
    --answers-file $D/answers/$NAME.jsonl \
    --single-pred-prompt --temperature 0
python -m vcoder_tpu.eval.converters mme \
    --question-file $D/llava_mme.jsonl \
    --result-file $D/answers/$NAME.jsonl \
    --output-dir $D/eval_tool/answers/$NAME
echo "score with: cd $D/eval_tool && python calculation.py --results_dir answers/$NAME"
