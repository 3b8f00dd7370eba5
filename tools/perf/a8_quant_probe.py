"""HW validation of the fused Pallas A8-quantize pass (int8 store).

Short single-purpose process (Mosaic-compile risk isolation per
CLAUDE.md rule 2): run a8_quantize on the chip at decode and batch
shapes, compare against the XLA path, and time a W2A8 matmul through
both dispatches.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from guidedquant_tpu.ops import lut_kernels as lk  # noqa: E402

rng = np.random.default_rng(0)
for B, K in [(1, 4096), (32, 4096), (64, 14336)]:
    x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32) * 3)
    xq, sx, sumx = jax.device_get(lk.a8_quantize(x))
    xf = np.asarray(x, np.float32)
    amax = np.abs(xf).max(axis=1, keepdims=True)
    sx_ref = np.maximum(amax, 1e-30) / 127.0
    xq_ref = np.clip(np.round(xf / sx_ref), -127, 127).astype(np.int8)
    ne = int((np.asarray(xq) != xq_ref).sum())
    print(f"B={B} K={K}: code mismatches {ne}/{xq_ref.size}, "
          f"sx relerr {float(np.abs(sx - sx_ref).max() / sx_ref.max()):.2e}, "
          f"sumx relerr "
          f"{float(np.abs(sumx - xf.sum(1, keepdims=True)).max() / max(1e-9, np.abs(xf.sum(1))).max()):.2e}",
          flush=True)
    assert ne == 0, "int8 store mismatch on HW"
print("A8 QUANT HW OK")
