#!/bin/bash
# Stage-2 LLaVA full finetune (reference: scripts/v1_5/finetune.sh, lr 2e-5).
# Memory-tight meshes: add --offload-opt-state (the zero3_offload.json
# analog — f32 Adam moments pinned in host memory, streamed per step).
python -m vcoder_tpu.train.train --stage full \
    --model-path ${MODEL_PATH:-checkpoints/llava-v1.5-7b-pretrain} \
    --output-dir ${OUTPUT_DIR:-checkpoints/llava-v1.5-7b} \
    --data-path ${DATA_PATH:-playground/data/llava_v1_5_mix665k.json} \
    --image-folder ${IMAGE_FOLDER:-playground/data} \
    --learning-rate 2e-5 \
    --num-train-epochs 1 \
    --per-device-train-batch-size ${BATCH_SIZE:-16} \
    "$@"
