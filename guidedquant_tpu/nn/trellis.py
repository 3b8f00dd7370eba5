"""QTIP trellis-quantized linear runtime module.

Analog of the reference's ``QuantizedLinear`` + ``BitshiftLinear``
(``qtip/lib/linear/quantized_linear.py:12-154``,
``qtip/lib/codebook/bitshift.py:357-484``): holds the packed trellis,
random sign vectors SU/SV and the global scale; forward is

    y = SV * Wscale * hadU( hadUt(x * SU) @ hatW^T )

with hatW the decoded trellis weights.

Decode paths:
- ``cached``: dense bf16 hatW decoded once at load time (the reference's
  ``cache_hatW``/train-fixW mode, bitshift.py:391-410) — correctness + prefill
  path; no memory savings at runtime.
- the fused Pallas trellis-decode kernel (compute codebooks) replaces the
  cached path on the decode hot loop as it lands.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..ops.hadamard import matmul_hadU, matmul_hadUt


@struct.dataclass
class TrellisLinear:
    """Pytree for one (or a stacked [L, ...] set of) trellis-quantized
    linear(s)."""

    trellis: jnp.ndarray          # packed uint16 [(L,) B_tiles, T*K/16]
    SU: jnp.ndarray               # [(L,) n] ±1
    SV: jnp.ndarray               # [(L,) m] ±1
    Wscale: jnp.ndarray           # [(L,)] or scalar
    hatW: Optional[jnp.ndarray] = None  # cached decoded [(L,) m, n] (bf16)
    # NOTE: the tlut lives in the BitshiftCodebook (host side); it is shared
    # across layers and must not be a stacked pytree leaf.
    # static config
    L_bits: int = struct.field(pytree_node=False, default=16)
    K: int = struct.field(pytree_node=False, default=2)
    V: int = struct.field(pytree_node=False, default=2)
    tlut_bits: int = struct.field(pytree_node=False, default=9)
    decode_mode: str = struct.field(pytree_node=False, default="quantlut_sym")
    td_x: int = struct.field(pytree_node=False, default=16)
    td_y: int = struct.field(pytree_node=False, default=16)
    out_features: int = struct.field(pytree_node=False, default=0)
    in_features: int = struct.field(pytree_node=False, default=0)


def tiles_to_dense(hat_tiles: np.ndarray, m: int, n: int, td_x: int,
                   td_y: int) -> np.ndarray:
    """[(m/td_x)*(n/td_y), td_x*td_y] row-major tile sequences -> [m, n]."""
    t = hat_tiles.reshape(m // td_x, n // td_y, td_x, td_y)
    return t.transpose(0, 2, 1, 3).reshape(m, n)


def dense_to_tiles(W: np.ndarray, td_x: int, td_y: int) -> np.ndarray:
    m, n = W.shape
    t = W.reshape(m // td_x, td_x, n // td_y, td_y)
    return t.transpose(0, 2, 1, 3).reshape(-1, td_x * td_y)


def decode_trellis_dense(cb, packed: np.ndarray, m: int, n: int,
                         td_x: int, td_y: int) -> np.ndarray:
    """Packed uint16 -> dense [m, n] f32 via host decode (load-time)."""
    T = td_x * td_y
    states = cb.unpack_trellis(packed, T)  # [B_tiles, T/V]
    vals = cb.recons(states.T)             # [V, T/V, B]
    seqs = np.moveaxis(vals, 0, 1).reshape(T, -1).T  # [B, T]
    return tiles_to_dense(seqs, m, n, td_x, td_y)


def apply_trellis(w: TrellisLinear, x: jnp.ndarray) -> jnp.ndarray:
    """Forward; currently uses the cached dense hatW path."""
    assert w.hatW is not None, "trellis kernel path not yet wired; load with cache"
    t = matmul_hadUt(x * w.SU.astype(x.dtype))
    y = jnp.einsum("...k,nk->...n", t, w.hatW.astype(x.dtype))
    y = matmul_hadU(y)
    return y * (w.SV * w.Wscale).astype(x.dtype)


def effective_dense_weight(w: TrellisLinear) -> np.ndarray:
    """Materialize W_eff with  y = x @ W_eff^T  ==  apply_trellis(x)
    (for tests / fake-packing)."""
    m, n = w.out_features, w.in_features
    hatW = np.asarray(w.hatW, np.float32)
    # W_eff = diag(SV*s) . Mm hatW Mn^T . diag(SU)
    A = np.asarray(matmul_hadU(jnp.asarray(hatW), axis=0))   # Mm hatW
    B = np.asarray(matmul_hadU(jnp.asarray(A), axis=1))      # ... Mn^T
    SU = np.asarray(w.SU, np.float32)
    SV = np.asarray(w.SV, np.float32) * float(np.asarray(w.Wscale))
    return SV[:, None] * B * SU[None, :]
