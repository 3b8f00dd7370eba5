#!/bin/bash
# Wait for training to finish, then run the guided-vs-unguided fair trial.
cd /root/repo
for i in $(seq 1 90); do
  [ -f cache/realmodel/ckpt_word.npz ] && pgrep -f "train_lm.py --model pyword" >/dev/null || true
  if [ -f cache/realmodel/ckpt_word.npz ] && ! ls cache/realmodel/ckpt_word.npz.part >/dev/null 2>&1; then
    break
  fi
  sleep 60
done
if [ ! -f cache/realmodel/ckpt_word.npz ]; then
  echo "$(date) training never finished" >> cache/realmodel/word_trial.log
  exit 1
fi
echo "$(date) starting word trial" >> cache/realmodel/word_trial.log
timeout 10800 python tools/realmodel/quantize_eval.py --model pyword-190m \
  --configs 2-free nosal 2-free-g4 \
  >> cache/realmodel/word_trial.log 2>&1
echo "$(date) word trial done rc=$?" >> cache/realmodel/word_trial.log
