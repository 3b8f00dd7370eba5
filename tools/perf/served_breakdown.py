"""Phase decomposition of served throughput (VERDICT r4 next 4).

Runs the 8B 2-bit affine served workload (32 slots, 2x oversubscribed,
96 new tokens) once with host-side timers around each batcher phase:

  admit    host time in _admit (prompt bucketing + prefill dispatch)
  chunk    host time dispatching decode_chunk_slots
  fetch    host time blocked in the per-chunk device fetch (~= device time
           of the chunk + any prefill still in flight, over the tunnel)
  retire   host time in token bookkeeping / retirement

and reports end-to-end tok/s. Because dispatch is async, `fetch` absorbs
device time; the split still shows whether the gap to the raw B=32
ceiling is host scheduling (admit/retire/chunk) or device work (fetch).

Usage: served_breakdown.py [slots] [chunk]
Env: SLOT_WRITE=point|dus (KV write A/B), SERVED_ACT, NEW_TOK.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from guidedquant_tpu.models import get_config  # noqa: E402
from guidedquant_tpu.serve import engine  # noqa: E402
from guidedquant_tpu.serve import batching  # noqa: E402
from guidedquant_tpu.serve.batching import ContinuousBatcher  # noqa: E402

SLOTS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 32
NEW_TOK = int(os.environ.get("NEW_TOK", "96"))

import importlib  # noqa: E402
bench = importlib.import_module("bench")
cfg = get_config("llama-3.1-8b").replace(max_seq_len=1024)
params, cfg = bench._build_quantized_device(cfg, bits=2)
params = engine.unroll_layers(params)


class TimedBatcher(ContinuousBatcher):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.t = {"admit": 0.0, "chunk": 0.0, "fetch": 0.0, "retire": 0.0}

    def _admit(self):
        t0 = time.perf_counter()
        super()._admit()
        self.t["admit"] += time.perf_counter() - t0

    def step_chunk(self) -> bool:
        self._admit()
        active = np.array([r is not None for r in self.slot_req])
        if not active.any():
            return bool(self.queue)
        t0 = time.perf_counter()
        toks, valid, self.state, _ = batching.decode_chunk_slots(
            self.params, self.cfg, jnp.asarray(self.cur_tok), self.state,
            jnp.asarray(active), self.chunk, self.eos_id, None, None, None)
        t1 = time.perf_counter()
        toks, valid, pos_host = jax.device_get(
            (toks, valid, self.state.pos))
        t2 = time.perf_counter()
        for b in range(self.slots):
            req = self.slot_req[b]
            if req is None:
                continue
            hit_eos = False
            for i in range(self.chunk):
                if not valid[b, i] or len(req.out) >= req.max_new_tokens:
                    break
                tok = int(toks[b, i])
                req.out.append(tok)
                self.cur_tok[b] = tok
                if self.eos_id is not None and tok == self.eos_id:
                    hit_eos = True
                    break
            if (hit_eos or len(req.out) >= req.max_new_tokens
                    or int(pos_host[b]) >= self.max_seq - 1):
                self._retire(b)
        self._flush_retired()
        t3 = time.perf_counter()
        self.t["chunk"] += t1 - t0
        self.t["fetch"] += t2 - t1
        self.t["retire"] += t3 - t2
        return any(r is not None for r in self.slot_req) or bool(self.queue)


rng = np.random.default_rng(0)
n_req = SLOTS * 2
prompts = [rng.integers(1, cfg.vocab_size, size=rng.integers(4, 17))
           .astype(np.int32) for _ in range(n_req)]

# warm-up (compile)
b = TimedBatcher(params, cfg, slots=SLOTS, max_seq=256, chunk=CHUNK)
for p in prompts[:SLOTS]:
    b.submit(p, 8)
b.run()

best = None
for _ in range(3):
    b = TimedBatcher(params, cfg, slots=SLOTS, max_seq=256, chunk=CHUNK)
    for p in prompts:
        b.submit(p, NEW_TOK)
    t0 = time.perf_counter()
    done = b.run()
    dt = time.perf_counter() - t0
    tot = sum(len(r.out) for r in done.values())
    if best is None or dt < best[0]:
        best = (dt, tot, dict(b.t))

dt, tot, t = best
other = dt - sum(t.values())
print(f"slots={SLOTS} chunk={CHUNK} write={batching._SLOT_WRITE} "
      f"act8={SLOTS <= 32 and os.environ.get('SERVED_ACT') != '16'}: "
      f"{tot} tokens in {dt:.2f}s -> {tot/dt:.0f} tok/s/chip", flush=True)
for k, v in t.items():
    print(f"  {k:6s} {v:6.2f}s ({100*v/dt:4.1f}%)")
print(f"  other  {other:6.2f}s ({100*other/dt:4.1f}%)")
