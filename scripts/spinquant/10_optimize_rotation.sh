#!/bin/bash
# Learn R1/R2 via Cayley SGD on the W+A fake-quant model
# (reference spin_quant/scripts/10_optimize_rotation.sh: lr 1.5, 100 steps,
# cosine — our optimizer implements the same Cayley update).
# Usage: 10_optimize_rotation.sh MODEL W_BITS A_BITS KV_BITS
set -e
MODEL=${1:?model}
W=${2:-4}; A=${3:-4}; KV=${4:-4}
python spinquant_ptq.py "$MODEL" \
    --w_bits "$W" --a_bits "$A" \
    --optimize_rotation_steps 100 --rotation_lr 1.5 \
    --dataset wikitext2 --seq_len 2048 --num_examples 128
