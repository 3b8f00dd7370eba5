"""HW validation of the wide-bit (5-8) exact per-row-LUT fused kernel.

The generic tensor-product nested-Horner resolve (ops/lut_kernels.py
RESOLVE_SPLIT) serves *arbitrary* per-row LUTs at every width 1-8 — the
reference's full ap_gemv envelope (``inference/ap_gemv/anyprec.cu:373-620``).
Correctness vs the host LUT oracle at a 4096^2 decode shape, then a coarse
in-jit-loop timing vs (a) the per-step dequant fallback and (b) a dense
bf16 GEMV — the two alternatives a >=5-bit free-codebook model actually
has (full-step numbers in q8b_step.py are the trustworthy metric).

One risky Mosaic construct family per process (CLAUDE.md rule 2): run one
bit-width per invocation, lowest first.

Usage: timeout 600 python tools/perf/widebit_check.py [bits] [shape]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from guidedquant_tpu.ops import lut_kernels as lk  # noqa: E402

BITS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
SHAPE = sys.argv[2] if len(sys.argv) > 2 else "4096x4096"
N, K = (int(v) for v in SHAPE.split("x"))
B = int(os.environ.get("WB_B", "1"))

rng = np.random.default_rng(7)
TK = lk.tile_k_for(BITS)
K_pad = ((K + TK - 1) // TK) * TK
C = 2 ** BITS
codes = rng.integers(0, C, size=(N, K_pad), dtype=np.uint8)
lut = np.sort(rng.normal(size=(N, C)).astype(np.float32), axis=1) * 0.02
x = rng.normal(size=(B, K_pad)).astype(np.float32)

packed = lk.pack_lane_tiled(codes, BITS)
words = (tuple(jnp.asarray(w) for w in packed)
         if isinstance(packed, tuple) else jnp.asarray(packed))
coef = jnp.asarray(lk.lut_to_poly(lut, BITS))
xd = jnp.asarray(x)

y = np.asarray(lk.lut_matmul_tiled(xd, words, coef, BITS, tile_n=256))
ref = x @ np.take_along_axis(lut, codes.astype(np.int64), 1).T
err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-9)
print(f"widebit bits={BITS} {N}x{K_pad} B={B}: max rel err {err:.2e}",
      flush=True)
assert err < 3e-2, err  # bf16 decode + f32 accumulate class


def timed(fn, x0, iters=50):
    @jax.jit
    def loop(x0):
        def body(_, carry):
            y = fn(carry)
            return carry.at[0, 0].set(carry[0, 0] + y[0, 0] * 1e-20)
        return lax.fori_loop(0, iters, body, x0)
    np.asarray(loop(x0))
    t0 = time.perf_counter()
    np.asarray(loop(x0))
    return (time.perf_counter() - t0) / iters


t_fused = timed(lambda xx: lk.lut_matmul_tiled(xx, words, coef, BITS,
                                               tile_n=256), xd)

# per-step dequant fallback (what the >=5-bit path did before): traceable
# lane-tiled decode + select-sum LUT resolve + MXU matmul, per call
def dequant_matmul(xx):
    cds = lk.unpack_lane_tiled(words, BITS, K_pad)
    out = jnp.zeros(cds.shape, jnp.bfloat16)
    lj = jnp.asarray(lut, jnp.bfloat16)
    for c in range(C):
        out = out + jnp.where(cds == c, lj[:, c:c + 1],
                              jnp.zeros((), jnp.bfloat16))
    return xx.astype(jnp.bfloat16) @ out.T

t_deq = timed(dequant_matmul, xd)

Wd = jnp.asarray(rng.normal(size=(N, K_pad)).astype(np.float32) * 0.02,
                 jnp.bfloat16)
t_bf16 = timed(lambda xx: xx.astype(jnp.bfloat16) @ Wd.T, xd)

print(f"widebit bits={BITS}: fused {t_fused*1e6:.1f} us, per-step dequant "
      f"{t_deq*1e6:.1f} us ({t_deq/t_fused:.2f}x), bf16 dense "
      f"{t_bf16*1e6:.1f} us [per-op, VMEM-residency caveat]", flush=True)
print("PASS", flush=True)
