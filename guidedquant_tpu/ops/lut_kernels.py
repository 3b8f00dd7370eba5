"""Pallas TPU kernels for fused LUT decode + matmul (stub gate for now).

The kernel proper lands with the serving engine; until then everything
routes to the XLA oracle in ``lut_gemv.py``.
"""

from __future__ import annotations

import jax.numpy as jnp


def supported(x, qweight, bits) -> bool:
    return False


def lut_matmul(x: jnp.ndarray, qweight: jnp.ndarray, lut: jnp.ndarray,
               bits: int) -> jnp.ndarray:
    raise NotImplementedError
