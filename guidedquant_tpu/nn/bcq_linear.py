"""BCQ (LUT-GEMM) runtime linear.

Analog of the reference's ``LUTGEMMLinear`` (``inference/LUTGEMMLinear.py``):
per-row scales + packed sign planes + row bias. Decode dispatch mirrors the
any-precision linear: few tokens -> fused Pallas sign-plane kernel
(``ops.lut_kernels.bcq_matmul``, the ``nqmv_bias`` analog); many tokens /
no kernel operand -> dequant + MXU matmul.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.bcq import bcq_dequant


@struct.dataclass
class BcqLinear:
    alpha: jnp.ndarray    # [(L,) N, B]
    packed: jnp.ndarray   # [(L,) B, N, K/32] int32 sign planes
    qbias: jnp.ndarray    # [(L,) N]
    # lane-tiled kernel operand ([(L,) B, N, K_pad/32]; see
    # ops.bcq.bcq_kernel_operands). None -> dequant path.
    qwords: Optional[jnp.ndarray] = None
    out_features: int = struct.field(pytree_node=False, default=0)
    in_features: int = struct.field(pytree_node=False, default=0)


def with_bcq_kernel_layout(w: BcqLinear) -> BcqLinear:
    """Precompute the lane-tiled sign-plane operand (host-side numpy)."""
    from ..ops.bcq import bcq_kernel_operands
    words, _ = bcq_kernel_operands(w.packed, w.in_features)
    return w.replace(qwords=jnp.asarray(words))


def apply_bcq(w: BcqLinear, x: jnp.ndarray) -> jnp.ndarray:
    from ..ops import lut_kernels
    if w.qwords is not None:
        ntok = 1
        for s in x.shape[:-1]:
            ntok *= s
        if (ntok <= lut_kernels.MAX_BATCH
                and jax.default_backend() in ("tpu", "axon")):
            return lut_kernels.bcq_matmul_flex(
                x, w.qwords, w.alpha, w.qbias, w.out_features)
    dense = bcq_dequant(w.alpha, w.packed, w.qbias, w.in_features,
                        dtype=x.dtype)
    return jnp.einsum("...k,nk->...n", x, dense)
