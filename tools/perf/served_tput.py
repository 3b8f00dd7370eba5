"""Served throughput through the continuous batcher on the real chip.

Measures end-to-end tok/s (admission + chunked batched decode + retirement,
host scheduling included) for the 2-bit affine 1B-geometry model, at slot
counts S in {8, 16, 32} with more requests than slots (forces slot reuse).
Usage: served_tput.py [slots,...] [chunk]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')
import jax.numpy as jnp  # noqa: E402

from guidedquant_tpu.models import get_config  # noqa: E402
from guidedquant_tpu.serve import engine  # noqa: E402
from guidedquant_tpu.serve.batching import ContinuousBatcher  # noqa: E402
from guidedquant_tpu.serve.fuse import fuse_projections  # noqa: E402
from guidedquant_tpu.nn.linear import quantize_int8  # noqa: E402
from __graft_entry__ import _build_quantized_llama  # noqa: E402

SLOTS = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1
                          else "8,16,32").split(",")]
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 32
NEW_TOK = int(os.environ.get("NEW_TOK", "96"))
KV_BITS = int(os.environ.get("SERVED_KV_BITS", "16"))

GEOM = os.environ.get("SERVED_GEOM", "1b")
if GEOM == "8b":
    # north-star model, built device-side (see bench._build_quantized_device)
    import importlib
    bench = importlib.import_module("bench")
    cfg = get_config("llama-3.1-8b").replace(max_seq_len=1024)
    params, cfg = bench._build_quantized_device(cfg, bits=2)
else:
    cfg = get_config("llama-3.2-1b").replace(max_seq_len=1024)
    params = fuse_projections(_build_quantized_llama(cfg, 0, bits=2,
                                                     family="affine"))
    params = dict(params)
    params["lm_head"] = quantize_int8(params["embed"])
    cfg = cfg.replace(tie_word_embeddings=False)

if os.environ.get("SERVED_ACT", "16") == "8":
    # int-domain W2A8 kernels in the served path (decode AND GEMM prefill);
    # applied on the stacked tree, before per-layer unrolling
    from guidedquant_tpu.nn.linear import AnyPrecLinear, with_act8
    params = dict(params, layers={
        k: (with_act8(v) if isinstance(v, AnyPrecLinear) else v)
        for k, v in params["layers"].items()})
params = engine.unroll_layers(params)

rng = np.random.default_rng(0)
for slots in SLOTS:
    n_req = slots * 2  # oversubscribe -> queueing + slot reuse
    prompts = [rng.integers(1, cfg.vocab_size, size=rng.integers(4, 17))
               .astype(np.int32) for _ in range(n_req)]

    # warm-up (compile prefill + chunk step at this slot count)
    b = ContinuousBatcher(params, cfg, slots=slots, max_seq=256,
                          chunk=CHUNK, kv_bits=KV_BITS)
    for p in prompts[:slots]:
        b.submit(p, 8)
    b.run()

    # best of 3 (tunnel jitter; min-time methodology as elsewhere)
    dt, tot = 1e9, 0
    for _ in range(3):
        b = ContinuousBatcher(params, cfg, slots=slots, max_seq=256,
                              chunk=CHUNK, kv_bits=KV_BITS)
        for p in prompts:
            b.submit(p, NEW_TOK)
        t0 = time.perf_counter()
        done = b.run()
        d = time.perf_counter() - t0
        tot = sum(len(r.out) for r in done.values())
        dt = min(dt, d)
    print(f"slots={slots} chunk={CHUNK} kv{KV_BITS}: {tot} tokens, best {dt:.2f}s "
          f"-> {tot/dt:.0f} served tok/s/chip", flush=True)
