"""Measure the full quantized 8B decode step (unrolled) — the repeatable
metric for kernel-variant comparisons (per-kernel microbenches are too
noisy over the axon tunnel). Env knobs: AFFINE_BLOCK_K (0=auto),
Q8B_LAYERS, Q8B_BATCH, Q8B_BITS (2), Q8B_FAMILY (affine|free)."""
import os, sys, time
import numpy as np
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from guidedquant_tpu.models import get_config
from guidedquant_tpu.serve import engine
import importlib
bench = importlib.import_module("bench")

L = int(os.environ.get("Q8B_LAYERS", "32"))
B = int(os.environ.get("Q8B_BATCH", "1"))
BITS = int(os.environ.get("Q8B_BITS", "2"))
FAMILY = os.environ.get("Q8B_FAMILY", "affine")
cfg = get_config("llama-3.1-8b").replace(max_seq_len=1024, num_layers=L)
qp, cq = bench._build_quantized_device(cfg, bits=BITS, family=FAMILY)
if os.environ.get("Q8B_PATH", "kernel") == "dequant":
    # strip the fused-kernel operands so every linear takes the
    # dequantize-then-matmul fallback (the baseline the kernel must beat)
    from guidedquant_tpu.nn.linear import AnyPrecLinear
    lay = dict(qp["layers"])
    for k, v in lay.items():
        if isinstance(v, AnyPrecLinear):
            lay[k] = v.replace(pcoef=None, srow=None, mrow=None, gpoly=None)
    qp = dict(qp, layers=lay)
if os.environ.get("Q8B_ACT", "16") == "8":
    # int-domain W{b}A8 kernels: i32-word decode + int8 MXU code-dot
    from guidedquant_tpu.nn.linear import AnyPrecLinear, with_act8
    lay = dict(qp["layers"])
    for k, v in lay.items():
        if isinstance(v, AnyPrecLinear):
            lay[k] = with_act8(v)
    qp = dict(qp, layers=lay)
    if isinstance(qp.get("lm_head"), AnyPrecLinear):
        # BENCH_HEAD=affine{b} heads ride the W{b}A8 kernel too (matches
        # bench._run_8b's head gate)
        qp = dict(qp, lm_head=with_act8(qp["lm_head"]))
qp = engine.unroll_layers(qp)

null = jax.jit(lambda a: a + 1)
z = jnp.zeros((8, 128))
np.asarray(null(z))
ov = 1e9
for _ in range(5):
    t0 = time.perf_counter(); np.asarray(null(z))
    ov = min(ov, time.perf_counter() - t0)

n = 48
state = engine.init_state(cq, L, B, 640)
tok = jnp.zeros((B,), jnp.int32)
t0 = time.perf_counter()
_, t2, _ = engine.decode_n_tokens(qp, cq, tok, state, n)
np.asarray(t2)
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(4):
    st = engine.init_state(cq, L, B, 640)
    t0 = time.perf_counter()
    _, t2, st = engine.decode_n_tokens(qp, cq, tok, st, n)
    np.asarray(t2)
    best = min(best, time.perf_counter() - t0)
step = (best - ov) / n
print(f"L={L} B={B} bits={BITS} family={FAMILY} "
      f"block_k={os.environ.get('AFFINE_BLOCK_K','0')}: "
      f"{step*1e3:.3f} ms/step ({B/step:.1f} tok/s/chip)", flush=True)
