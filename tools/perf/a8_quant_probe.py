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
    # acceptance oracle: the ON-DEVICE XLA path the kernel replaces
    # (host numpy can flip .5-boundary roundings vs the TPU f32 divide —
    # measured as info only)
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    sx_d = jnp.maximum(amax, 1e-30) / 127.0
    xq_d = jax.device_get(
        jnp.clip(jnp.round(xf / sx_d), -127, 127).astype(jnp.int8))
    ne = int((np.asarray(xq) != xq_d).sum())
    xfh = np.asarray(x, np.float32)
    sxh = np.maximum(np.abs(xfh).max(1, keepdims=True), 1e-30) / 127.0
    nh = int((np.asarray(xq) != np.clip(np.round(xfh / sxh), -127, 127
                                        ).astype(np.int8)).sum())
    print(f"B={B} K={K}: vs device-XLA {ne}/{xq_d.size} mismatches "
          f"(vs host-numpy {nh}: rounding-boundary info only)", flush=True)
    assert ne == 0, "int8 store mismatch vs the device XLA path"
print("A8 QUANT HW OK")
