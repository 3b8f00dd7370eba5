#!/bin/bash
# End-to-end KD finetune of a packed LNQ model against its fp teacher
# (reference full_main.py recipe: KD loss, AdamW, straight-through codes).
# Usage: run_full_nuq.sh BASE_MODEL PACKED_DIR BITS [STEPS]
set -e
BASE=${1:?base model}
PACKED=${2:?packed model dir}
BITS=${3:-2}
STEPS=${4:-1000}
python full_nuq.py \
    --base_model "$BASE" --quantized_model "$PACKED" --bits "$BITS" \
    --steps "$STEPS" --lr 1e-4 \
    --dataset redpajama --seq_len 4096 --num_examples 1024
