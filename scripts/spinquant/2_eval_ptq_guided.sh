#!/bin/bash
# Guided SpinQuant PTQ (GuidedQuant Hessians, num_groups=1) + ppl
# (reference spin_quant/scripts/2_eval_ptq_guided_save_wikitext2_*_g1.sh:
# wikitext2 s128 blk2048 tokens, g1 saliency).
# Usage: 2_eval_ptq_guided.sh MODEL W_BITS A_BITS KV_BITS
set -e
MODEL=${1:?model}
W=${2:-4}; A=${3:-4}; KV=${4:-4}
python spinquant_ptq.py "$MODEL" \
    --w_bits "$W" --a_bits "$A" \
    --guided --num_groups 1 \
    --dataset wikitext2 --seq_len 2048 --num_examples 128 --eval_ctx 2048
