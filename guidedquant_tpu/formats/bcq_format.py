"""BCQ (LUT-GEMM backend) model conversion.

Analog of the reference's lutgemm checkpoint route
(``inference/generate.py:206`` backend="lutgemm" +
``inference/LUTGEMMLinear.py``): converts a dense model's projection
weights to :class:`~guidedquant_tpu.nn.bcq_linear.BcqLinear` leaves (sum of
per-row-scaled sign planes) with the fused-kernel operand precomputed.

Divergence note: the reference's LUTGEMMLinear supports per-K-group alpha
(``group_size``); this implementation is per-row (group_size ==
in_features, the reference's ``group_size=-1``) — the configuration its
fused TPU kernel (``ops.lut_kernels.bcq_matmul``) serves.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from ..models.config import ModelConfig
from ..nn.bcq_linear import BcqLinear, with_bcq_kernel_layout
from ..ops.bcq import bcq_fit, bcq_pack_signs


def bcqize_matrix(W: np.ndarray, bits: int, iters: int = 4) -> BcqLinear:
    """Dense [N, K] -> BcqLinear with the fused-kernel operand."""
    alpha, signs, bias = bcq_fit(np.asarray(W, np.float32), bits, iters=iters)
    lin = BcqLinear(alpha=jnp.asarray(alpha),
                    packed=jnp.asarray(bcq_pack_signs(signs)),
                    qbias=jnp.asarray(bias),
                    out_features=W.shape[0], in_features=W.shape[1])
    return with_bcq_kernel_layout(lin)


def bcqize_params(params: Dict, cfg: ModelConfig, bits: int,
                  iters: int = 4) -> Dict:
    """Replace every stacked projection leaf with a BcqLinear leaf.

    params: stacked dense pytree (llama layout, [L, N, K] projections).
    """
    layers = dict(params["layers"])
    for m in cfg.module_names:
        W = np.asarray(layers[m], np.float32)  # [L, N, K]
        per_layer = [bcqize_matrix(W[l], bits, iters)
                     for l in range(W.shape[0])]
        first = per_layer[0]
        layers[m] = BcqLinear(
            alpha=jnp.stack([x.alpha for x in per_layer]),
            packed=jnp.stack([x.packed for x in per_layer]),
            qbias=jnp.stack([x.qbias for x in per_layer]),
            qwords=jnp.stack([x.qwords for x in per_layer]),
            out_features=first.out_features,
            in_features=first.in_features)
    out = dict(params)
    out["layers"] = layers
    return out
