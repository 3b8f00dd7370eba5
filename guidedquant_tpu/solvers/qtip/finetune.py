"""QTIP per-linear finetuning of the sign vectors and scale.

Analog of the reference's per-layer Adam finetune
(``qtip/lib/algo/finetune.py:30-98`` ``finetune_decoder_layer`` with the
saliency-weighted MSE of ``qtip/lib/utils/finetune.py:15-35``): after LDLQ
fixes the trellis codes, the continuous parameters around them — SU [n],
SV [m] (initialized as random signs but tuned as reals) and Wscale — are
optimized against the original weights under the grouped proxy Hessian
metric:

    loss = sum_g tr( (W_eff - W)_g H_g (W_eff - W)_g^T )

with  W_eff = diag(SV * s) . Mm hatWr Mn^T . diag(SU).  This is the
per-linear counterpart of the reference's layer-output MSE (the Hessian is
the Gram matrix of the layer inputs, so the objectives coincide in
expectation).
"""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ...ops.hadamard import matmul_hadU

logger = logging.getLogger(__name__)


def _effective_weight(hatWr, SU, SV, s):
    A = matmul_hadU(hatWr, axis=0)    # Mm hatWr
    B = matmul_hadU(A, axis=1)        # ... Mn^T
    return (SV * s)[:, None] * B * SU[None, :]


def _loss(params, hatWr, W, H):
    SU, SV, s = params["SU"], params["SV"], params["s"]
    W_eff = _effective_weight(hatWr, SU, SV, s)
    m = W.shape[0]
    g = H.shape[0]
    rows = m // g
    d = (W_eff - W).reshape(g, rows, W.shape[1])
    t = jnp.einsum("gij,gjk->gik", d, H, preferred_element_type=jnp.float32)
    return jnp.einsum("gik,gik->", t, d)


def finetune_susv(artifacts: Dict, W: np.ndarray, H: np.ndarray,
                  steps: int = 50, lr: float = 1e-3) -> Dict:
    """Tune (SU, SV, Wscale) of a quantize_linear_qtip artifact dict.

    W [m, n] original weights; H [g, n, n] grouped Hessians (unrotated
    domain). Returns the updated artifact dict (trellis unchanged).
    """
    hatWr = jnp.asarray(artifacts["hatWr"], jnp.float32)
    Wj = jnp.asarray(W, jnp.float32)
    Hj = jnp.asarray(H, jnp.float32)
    params = {
        "SU": jnp.asarray(artifacts["SU"], jnp.float32),
        "SV": jnp.asarray(artifacts["SV"], jnp.float32),
        "s": jnp.asarray(artifacts["Wscale"], jnp.float32),
    }
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state):
        loss, grads = jax.value_and_grad(_loss)(params, hatWr, Wj, Hj)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss0 = float(_loss(params, hatWr, Wj, Hj))
    for i in range(steps):
        params, opt_state, loss = train_step(params, opt_state)
    loss1 = float(_loss(params, hatWr, Wj, Hj))
    logger.info("qtip finetune: proxy loss %.6g -> %.6g", loss0, loss1)

    out = dict(artifacts)
    out["SU"] = np.asarray(params["SU"])
    out["SV"] = np.asarray(params["SV"])
    # fold the learned scale into SV (runtime multiplies SV * Wscale)
    out["Wscale"] = np.float32(1.0)
    out["SV"] = out["SV"] * float(np.asarray(params["s"]))
    out["finetune_loss"] = (loss0, loss1)
    return out
