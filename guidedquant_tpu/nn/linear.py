"""Quantized-linear pytrees and the generic linear dispatcher.

TPU-native analog of the reference's runtime linear modules
(``any_precision/modules/AnyPrecisionLinear.py:17-89``,
``inference/APLinear.py``): a linear "weight" in this framework is either

- a dense ``jnp.ndarray`` of shape (out_features, in_features), or
- an :class:`AnyPrecLinear` pytree holding bit-plane packed codes plus
  per-row look-up tables for every supported bit-width.

``apply_linear`` dispatches on the type, so model code is agnostic.

Decode-path policy (mirrors the reference's seq-len dispatch at
``AnyPrecisionLinear.py:69-74``): few tokens -> fused Pallas LUT-GEMV
kernel; many tokens (prefill) -> dequantize to dense and use a plain MXU
matmul. Both paths share the exact same decode semantics, so the dequant
path doubles as the correctness oracle for the kernel (the reference's own
test strategy, SURVEY.md §4).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.pack import unpack_bitplanes


@struct.dataclass
class AnyPrecLinear:
    """Bit-plane packed any-precision linear weight.

    qweight: int32 [max_bits, N, K/32] MSB-first bit planes (plane 0 is the
      MSB of the parent code). Truncating to the first ``b`` planes yields the
      b-bit code of every weight — the any-precision property.
    luts: {bits: [N, 2**bits] float} per-row codebooks.
    bias: optional [N] (absent for Llama-family projections).
    precision: active bit-width (static; switchable via ``set_precision``).
    """

    qweight: jnp.ndarray
    luts: Dict[int, jnp.ndarray]
    bias: Optional[jnp.ndarray] = None
    precision: int = struct.field(pytree_node=False, default=0)
    out_features: int = struct.field(pytree_node=False, default=0)
    in_features: int = struct.field(pytree_node=False, default=0)

    @property
    def supported_bits(self):
        return sorted(self.luts.keys())

    def set_precision(self, bits: int) -> "AnyPrecLinear":
        if bits not in self.luts:
            raise ValueError(f"{bits}-bit not available; have {self.supported_bits}")
        return self.replace(precision=bits)


def dequantize_anyprec(w: AnyPrecLinear, bits: Optional[int] = None,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Decode packed codes -> dense [N, K] weight at the given precision."""
    bits = bits or w.precision
    codes = unpack_bitplanes(w.qweight, bits)  # [N, K] int32 in [0, 2^bits)
    lut = w.luts[bits].astype(dtype)  # [N, 2^bits]
    return jnp.take_along_axis(lut, codes, axis=1)


def apply_linear(w: Any, x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ W^T for dense or quantized W (W stored as (N, K))."""
    if isinstance(w, AnyPrecLinear):
        return _apply_anyprec(w, x)
    return jnp.einsum("...k,nk->...n", x, w.astype(x.dtype))


def _apply_anyprec(w: AnyPrecLinear, x: jnp.ndarray) -> jnp.ndarray:
    ntok = 1
    for s in x.shape[:-1]:
        ntok *= s
    if ntok <= 8:
        # Decode path: fused Pallas LUT-GEMV when available on this backend.
        from ..ops import lut_gemv
        y = lut_gemv.anyprec_matmul(x, w.qweight, w.luts[w.precision], w.precision)
    else:
        dense = dequantize_anyprec(w, dtype=x.dtype)
        y = jnp.einsum("...k,nk->...n", x, dense)
    if w.bias is not None:
        y = y + w.bias.astype(y.dtype)
    return y
