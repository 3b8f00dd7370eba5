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
    """Decode packed codes to a dense [N, K] weight (prefill path).

    Gather-free (select-sum / one-hot dot) — per-row gathers serialize on
    TPU; see nn.linear.dequantize_anyprec."""
    import jax

    codes = unpack_bitplanes(qweight, bits)  # [N, K]
    lut = lut.astype(dtype)
    C = lut.shape[1]
    if C <= 16:
        out = jnp.zeros(codes.shape, dtype)
        for c in range(C):
            out = out + jnp.where(codes == c, lut[:, c:c + 1],
                                  jnp.zeros((), dtype))
        return out
    onehot = jax.nn.one_hot(codes, C, dtype=dtype)
    return jnp.einsum("nkc,nc->nk", onehot, lut)


def anyprec_matmul_reference(x: jnp.ndarray, qweight: jnp.ndarray,
                             lut: jnp.ndarray, bits: int) -> jnp.ndarray:
    """y = x @ decode(qweight, lut)^T — XLA fallback / oracle."""
    dense = anyprec_dequant(qweight, lut, bits, dtype=x.dtype)
    return jnp.einsum("...k,nk->...n", x, dense)


def anyprec_matmul(x: jnp.ndarray, qweight: jnp.ndarray, lut: jnp.ndarray,
                   bits: int) -> jnp.ndarray:
    """Decode-path matmul on the canonical bit-plane operand (oracle path;
    the fused Pallas kernel dispatch lives in nn.linear on the lane-tiled
    operand)."""
    return anyprec_matmul_reference(x, qweight, lut, bits)
