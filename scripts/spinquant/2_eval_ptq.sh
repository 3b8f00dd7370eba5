#!/bin/bash
# SpinQuant PTQ (stock GPTQ, rotated) + WikiText-2 ppl
# (reference spin_quant/scripts/2_eval_ptq_save_*.sh / 2_eval_ptq_load_*.sh;
# model size is a parameter here instead of per-size script copies).
# Usage: 2_eval_ptq.sh MODEL W_BITS A_BITS KV_BITS
set -e
MODEL=${1:?model}
W=${2:-4}; A=${3:-4}; KV=${4:-4}
python spinquant_ptq.py "$MODEL" \
    --w_bits "$W" --a_bits "$A" \
    --dataset wikitext2 --seq_len 2048 --num_examples 128 --eval_ctx 2048
