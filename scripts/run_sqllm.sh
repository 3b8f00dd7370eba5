#!/bin/bash
# Canonical SqueezeLLM/any-precision recipe (reference scripts/run_sqllm.sh).
MODEL=${1:-meta-llama/Llama-3.1-8B-Instruct}
SEED=${2:-2}
PARENT=${3:-8}
python quantize.py "$MODEL" \
    --seed_precision "$SEED" --parent_precision "$PARENT" \
    --dataset redpajama --seq_len 4096 --num_examples 1024
