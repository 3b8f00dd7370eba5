#!/bin/bash
# Poll the TPU worker; when healthy, resume the word-model training.
cd /root/repo
for i in $(seq 1 40); do
  if timeout 90 python -c "
import jax, numpy as np
x = jax.jit(lambda a: a@a)(jax.numpy.ones((128,128)))
np.asarray(x)" 2>/dev/null; then
    echo "$(date) worker healthy after $i probes" >> cache/realmodel/recover.log
    setsid python tools/realmodel/train_lm.py --model pyword-190m \
      --corpus cache/realmodel/corpus_word.npz \
      --out cache/realmodel/ckpt_word.npz --steps 12000 --remat --bf16 \
      --save_every 1000 --resume >> cache/realmodel/train_word.log 2>&1 &
    echo "pid $!" > cache/realmodel/train_word.pid
    exit 0
  fi
  echo "$(date) probe $i: worker down" >> cache/realmodel/recover.log
  sleep 90
done
echo "$(date) gave up" >> cache/realmodel/recover.log
