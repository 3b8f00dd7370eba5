"""BCQ (LUT-GEMM) runtime linear.

Analog of the reference's ``LUTGEMMLinear`` (``inference/LUTGEMMLinear.py``):
per-row scales + packed sign planes + row bias.
"""

from __future__ import annotations


import jax.numpy as jnp
from flax import struct

from ..ops.bcq import bcq_dequant


@struct.dataclass
class BcqLinear:
    alpha: jnp.ndarray    # [(L,) N, B]
    packed: jnp.ndarray   # [(L,) B, N, K/32] int32 sign planes
    qbias: jnp.ndarray    # [(L,) N]
    out_features: int = struct.field(pytree_node=False, default=0)
    in_features: int = struct.field(pytree_node=False, default=0)


def apply_bcq(w: BcqLinear, x: jnp.ndarray) -> jnp.ndarray:
    dense = bcq_dequant(w.alpha, w.packed, w.qbias, w.in_features,
                        dtype=x.dtype)
    return jnp.einsum("...k,nk->...n", x, dense)
