#!/bin/bash
# QTIP with per-linear finetune + whole-model SU/SV/tlut E2E KD finetune
# (reference qtip/quantize_llama/finetune.py:461-548 finetune_susv_e2e).
set -e
METHOD=${1:-hyb}
MODEL=${2:-meta-llama/Llama-3.1-8B-Instruct}
BIT=${3:-2}

case "$METHOD" in
  1mad)  DECODE=1mad;         V=1; TLUT=0 ;;
  3inst) DECODE=3inst;        V=1; TLUT=0 ;;
  hyb)   DECODE=quantlut_sym; V=2; TLUT=9 ;;
  *) echo "METHOD must be 1mad, 3inst or hyb"; exit 1 ;;
esac

python qtip_quantize.py "$MODEL" \
    --K "$BIT" --V "$V" --tlut_bits "$TLUT" --decode_mode "$DECODE" \
    --dataset redpajama --seq_len 4096 --num_examples 1024 \
    --ft_steps 50 --e2e_steps 200 --e2e_lr 1e-4
