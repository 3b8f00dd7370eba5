#!/bin/bash
# Canonical LNQ + GuidedQuant recipe (reference scripts/run_lnq.sh:
# RedPajama, 1024 examples x 4096 tokens, $NUM_GROUPS saliency groups).
MODEL=${1:-meta-llama/Llama-3.1-8B-Instruct}
BITS=${2:-2}
NUM_GROUPS=${NUM_GROUPS:-4}
python layerwise_nuq.py "$MODEL" \
    --seed_precision "$BITS" \
    --dataset redpajama --seq_len 4096 --num_examples 1024 \
    --num_groups "$NUM_GROUPS" \
    --num_iterations 3 --cd_cycles 4
