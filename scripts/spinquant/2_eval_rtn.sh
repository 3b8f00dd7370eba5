#!/bin/bash
# Rotated RTN baseline (reference spin_quant eval_utils RTN path).
# Usage: 2_eval_rtn.sh MODEL W_BITS A_BITS KV_BITS
set -e
MODEL=${1:?model}
W=${2:-4}; A=${3:-4}; KV=${4:-4}
python spinquant_ptq.py "$MODEL" \
    --w_bits "$W" --a_bits "$A" --use_rtn \
    --dataset wikitext2 --seq_len 2048 --num_examples 128 --eval_ctx 2048
