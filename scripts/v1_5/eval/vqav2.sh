#!/bin/bash
# VQAv2 (reference: scripts/v1_5/eval/vqav2.sh).
CKPT=${CKPT:-checkpoints/llava-v1.5-7b}
SPLIT=${SPLIT:-llava_vqav2_mscoco_test-dev2015}
D=${D:-playground/data/eval/vqav2}
NAME=$(basename $CKPT)
python -m vcoder_tpu.eval.vqa_loader \
    --model-path $CKPT \
    --question-file $D/$SPLIT.jsonl \
    --image-folder $D/test2015 \
    --answers-file $D/answers/$SPLIT/$NAME/merge.jsonl \
    --temperature 0 --conv-mode vicuna_v1
python -m vcoder_tpu.eval.converters vqav2 --dir $D --ckpt $NAME --split $SPLIT
