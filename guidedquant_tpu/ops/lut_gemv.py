"""Fused any-precision LUT decode + matmul.

TPU-native replacement for the reference's ``ap_gemv`` CUDA extension
(``inference/ap_gemv/anyprec.cu:373-620`` fused LUT-GEMV and ``:295-359``
dequant-to-dense). The XLA reference path below decodes bit-planes with
vector shifts and resolves the per-row LUT; it is the correctness oracle.
A Pallas kernel specializing the decode for the interleaved word layout
replaces it on the hot path (see ``lut_kernels.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pack import unpack_bitplanes


def anyprec_dequant(qweight: jnp.ndarray, lut: jnp.ndarray, bits: int,
                    dtype=jnp.bfloat16) -> jnp.ndarray:
    """Decode packed codes to a dense [N, K] weight (prefill path)."""
    codes = unpack_bitplanes(qweight, bits)  # [N, K]
    return jnp.take_along_axis(lut.astype(dtype), codes, axis=1)


def anyprec_matmul_reference(x: jnp.ndarray, qweight: jnp.ndarray,
                             lut: jnp.ndarray, bits: int) -> jnp.ndarray:
    """y = x @ decode(qweight, lut)^T — XLA fallback / oracle."""
    dense = anyprec_dequant(qweight, lut, bits, dtype=x.dtype)
    return jnp.einsum("...k,nk->...n", x, dense)


def anyprec_matmul(x: jnp.ndarray, qweight: jnp.ndarray, lut: jnp.ndarray,
                   bits: int) -> jnp.ndarray:
    """Decode-path matmul. Dispatches to the Pallas kernel on TPU when the
    shapes/bits are supported; otherwise the XLA fallback."""
    from . import lut_kernels
    if lut_kernels.supported(x, qweight, bits):
        return lut_kernels.lut_matmul(x, qweight, lut, bits)
    return anyprec_matmul_reference(x, qweight, lut, bits)
