#!/bin/bash
# Canonical QTIP quantization recipe (reference qtip/exps/lufree_noft_ours.sh).
# Usage: run_qtip.sh [METHOD] [MODEL] [BIT]
#   METHOD: one of 1mad, 3inst, hyb   (hyb = quantlut_sym V=2 tlut=9)
#   MODEL : HF model name/path
#   BIT   : bits per weight (1-4)
set -e
METHOD=${1:-hyb}
MODEL=${2:-meta-llama/Llama-3.1-8B-Instruct}
BIT=${3:-2}
NUM_GROUPS=${NUM_GROUPS:-4}

case "$METHOD" in
  1mad)  DECODE=1mad;         V=1; TLUT=0 ;;
  3inst) DECODE=3inst;        V=1; TLUT=0 ;;
  hyb)   DECODE=quantlut_sym; V=2; TLUT=9 ;;
  *) echo "METHOD must be 1mad, 3inst or hyb"; exit 1 ;;
esac

python qtip_quantize.py "$MODEL" \
    --K "$BIT" --V "$V" --tlut_bits "$TLUT" --decode_mode "$DECODE" \
    --td_x 16 --td_y 16 --L 16 \
    --dataset redpajama --seq_len 4096 --num_examples 1024 \
    --num_groups "$NUM_GROUPS"
