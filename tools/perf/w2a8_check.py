"""HW validation of the int-domain W{b}A8 affine kernel (short process).

Correctness vs the on-device dequant oracle at 8B decode shapes, then a
coarse in-jit-loop timing vs the bf16 affine kernel (full-step deltas in
q8b_step.py Q8B_ACT=8 are the trustworthy metric — this is a smoke + sign
check). One risky Mosaic construct family per process (CLAUDE.md rule 2).

Usage: timeout 240 python tools/perf/w2a8_check.py [bits] [shape]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from guidedquant_tpu.ops import lut_kernels as lk  # noqa: E402

BITS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
SHAPE = sys.argv[2] if len(sys.argv) > 2 else "4096x4096"
N, K = (int(v) for v in SHAPE.split("x"))
B = int(os.environ.get("W2A8_B", "1"))

rng = np.random.default_rng(3)
TK = lk.tile_k_for(BITS)
K_pad = ((K + TK - 1) // TK) * TK
codes = rng.integers(0, 2 ** BITS, size=(N, K_pad), dtype=np.uint8)
s = (rng.normal(size=N) * 0.02).astype(np.float32)
m = (rng.normal(size=N) * 0.002).astype(np.float32)
x = rng.normal(size=(B, K_pad)).astype(np.float32)

# the w2a8 kernel consumes the SAME int32 lane-tiled operand as the bf16
# affine kernel (the u8 packing utilities are for newer Mosaic stacks only)
i32 = lk.pack_lane_tiled(codes, BITS)
i32 = tuple(jnp.asarray(w) for w in i32) if isinstance(i32, tuple) \
    else jnp.asarray(i32)
xd = jnp.asarray(x)
sd, md = jnp.asarray(s), jnp.asarray(m)

y = np.asarray(lk.lut_matmul_affine_w2a8(xd, i32, sd, md, BITS))
# oracle with identical A8 quantization semantics
sx = np.maximum(np.abs(x).max(1, keepdims=True), 1e-30) / 127.0
xq = np.clip(np.round(x / sx), -127, 127)
ref = (sx * xq) @ (s[:, None] * codes.astype(np.float32)).T \
    + x.sum(1, keepdims=True) * m[None, :]
err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-9)
print(f"w2a8 bits={BITS} {N}x{K_pad} B={B}: max rel err {err:.2e}",
      flush=True)
assert err < 1e-4, err


def timed(fn, *args, iters=200):
    """In-jit loop threading a data dependency (CLAUDE.md rule 1)."""
    @jax.jit
    def loop(x0, *a):
        def body(_, carry):
            y = fn(carry, *a)
            # thread a scalar back into x0's first lane to keep the loop live
            return carry.at[0, 0].set(carry[0, 0] + y[0, 0] * 1e-20)
        return lax.fori_loop(0, iters, body, x0)
    np.asarray(loop(args[0], *args[1:]))  # compile
    t0 = time.perf_counter()
    np.asarray(loop(args[0], *args[1:]))
    return (time.perf_counter() - t0) / iters


t_int = timed(lambda xx, *a: lk.lut_matmul_affine_w2a8(xx, i32, sd, md, BITS),
              xd)
t_bf = timed(lambda xx, *a: lk.lut_matmul_affine(xx, i32, sd, md, BITS),
             xd)
print(f"w2a8 {t_int*1e6:.1f} us vs bf16-affine {t_bf*1e6:.1f} us "
      f"({t_bf/t_int:.2f}x) [per-op, VMEM-residency caveat]", flush=True)
print("PASS", flush=True)
