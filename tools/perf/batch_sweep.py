"""Batched decode sweep on the real chip: B in {1, 8, 16, 32} at 1B and 8B
geometry, 2-bit (affine kernel, unrolled) vs bf16. Proves the VPU-decode
amortization claim (weight decode is shared across the batch inside each
kernel call). Usage: batch_sweep.py [1b|8b] [bf16|q]"""
import os, sys, time
import numpy as np
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from guidedquant_tpu.models import llama, get_config
from guidedquant_tpu.serve import engine
from guidedquant_tpu.serve.fuse import fuse_projections
import importlib
bench = importlib.import_module("bench")

GEOM = sys.argv[1] if len(sys.argv) > 1 else "1b"
WHAT = sys.argv[2] if len(sys.argv) > 2 else "q"
BATCHES = [int(b) for b in os.environ.get("BATCHES", "1,8,16,32").split(",")]

name = {"1b": "llama-3.2-1b", "8b": "llama-3.1-8b"}[GEOM]
cfg = get_config(name).replace(max_seq_len=1024)

if WHAT == "bf16":
    if GEOM == "8b":
        cfg = cfg.replace(num_layers=12)  # bf16-8B does not fit; slope model
    params = fuse_projections(
        llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16))
    cq = cfg
else:
    if GEOM == "8b":
        params, cq = bench._build_quantized_device(cfg, bits=2)
        params = engine.unroll_layers(params)
    else:
        from __graft_entry__ import _build_quantized_llama
        from guidedquant_tpu.nn.linear import quantize_int8
        params = fuse_projections(
            _build_quantized_llama(cfg, 0, bits=2, family="affine"))
        params = dict(params)
        params["lm_head"] = quantize_int8(params["embed"])
        cq = cfg.replace(tie_word_embeddings=False)
        params = engine.unroll_layers(params)

null = jax.jit(lambda a: a + 1)
np.asarray(null(jnp.zeros((8, 128))))
ov = 1e9
for _ in range(5):
    t0 = time.perf_counter(); np.asarray(null(jnp.zeros((8, 128))))
    ov = min(ov, time.perf_counter() - t0)

n = 48
for B in BATCHES:
    state = engine.init_state(cq, cq.num_layers, B, 640)
    tok = jnp.zeros((B,), jnp.int32)
    _, t2, _ = engine.decode_n_tokens(params, cq, tok, state, n)
    np.asarray(t2)
    best = 1e9
    for _ in range(3):
        st = engine.init_state(cq, cq.num_layers, B, 640)
        t0 = time.perf_counter()
        _, t2, st = engine.decode_n_tokens(params, cq, tok, st, n)
        np.asarray(t2)
        best = min(best, time.perf_counter() - t0)
    step = (best - ov) / n
    print(f"{GEOM} {WHAT} B={B}: {step*1e3:.3f} ms/step "
          f"({B/step:.0f} tok/s/chip)", flush=True)
