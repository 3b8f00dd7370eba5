"""Rotation learning: Cayley-SGD training of R1/R2 against the fake-quant
model's causal-LM loss.

Analog of the reference's ``optimize_rotation.py`` +
``train_utils/modeling_llama_quant.py`` (rotations threaded through every
linear as the only trainables, label-CE loss, SGDG stiefel optimizer).
Here the rotated-and-quantized forward is a pure function of (R1, R2), so
``jax.grad`` w.r.t. the rotations replaces the HF Trainer machinery; the
model weights never change.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...models import llama
from ...models.config import ModelConfig
from .cayley import init as cayley_init, update as cayley_update, \
    orthogonality_error
from .quant import sym_quant_dequant

logger = logging.getLogger(__name__)


def _wquant(W, bits: int):
    """Per-out-channel symmetric fake quant with STE; scale detached
    (reference find_params under no_grad)."""
    if bits >= 16:
        return W
    maxq = 2 ** (bits - 1) - 1
    amax = jnp.max(jnp.abs(W), axis=-1, keepdims=True).clip(1e-5)
    scale = jax.lax.stop_gradient(amax / maxq)
    return sym_quant_dequant(W, scale, maxq)


def rotated_quantized_forward(params, cfg: ModelConfig, R1, R2,
                              tokens, w_bits: int = 4, a_bits: int = 16):
    """Forward with R1/R2 applied on the fly and weights fake-quantized.

    params must be norm-fused. R1 [d, d]; R2 [L, dh, dh].
    Mirrors rotate_model's folding algebra, but traced (differentiable in
    R1/R2).
    """
    lp = params["layers"]
    d, dh = cfg.hidden_size, cfg.head_dim
    KV, H = cfg.num_kv_heads, cfg.num_heads
    L = cfg.num_layers

    def rot_in(W):  # [L, out, d] @ R1
        return jnp.einsum("lod,de->loe", W, R1)

    def rot_out(W):  # R1^T @ [L, d, in]
        return jnp.einsum("ed,ldi->lei", R1.T, W)

    def leaf(W):
        """Fake-quantized weight, wrapped so the forward also applies
        per-token asym activation fake-quant at this linear's input when
        a_bits < 16 (the reference trains rotations against the W+A
        fake-quant model, train_utils/modeling_llama_quant.py; act quant
        has straight-through gradients so R1/R2 still receive signal)."""
        Wq = _wquant(W, w_bits)
        if a_bits >= 16:
            return Wq
        from ...nn.act_quant import ActQuantLinear
        return ActQuantLinear(weight=Wq, bias=None,
                              in_bits=a_bits, in_sym=False)

    Wv = rot_in(lp["v_proj"]).reshape(L, KV, dh, d)
    Wv = jnp.einsum("lhe,lkhd->lked", R2, Wv).reshape(L, KV * dh, d)
    Wo = rot_out(lp["o_proj"]).reshape(L, d, H, dh)
    Wo = jnp.einsum("ldhi,lij->ldhj", Wo, R2).reshape(L, d, H * dh)

    new_layers = dict(lp)
    new_layers["q_proj"] = leaf(rot_in(lp["q_proj"]))
    new_layers["k_proj"] = leaf(rot_in(lp["k_proj"]))
    new_layers["v_proj"] = leaf(Wv)
    new_layers["o_proj"] = leaf(Wo)
    new_layers["gate_proj"] = leaf(rot_in(lp["gate_proj"]))
    new_layers["up_proj"] = leaf(rot_in(lp["up_proj"]))
    new_layers["down_proj"] = leaf(rot_out(lp["down_proj"]))

    p = dict(params)
    p["layers"] = new_layers
    p["embed"] = params["embed"] @ R1
    p["lm_head"] = _wquant(params["lm_head"] @ R1, w_bits)

    logits = llama.forward(p, cfg, tokens)
    return llama.cross_entropy_loss(logits, tokens)


def optimize_rotations(params, cfg: ModelConfig, tokens: np.ndarray,
                       steps: int = 100, batch_size: int = 1,
                       lr: float = 1.5, lr_r2: Optional[float] = None,
                       momentum: float = 0.9,
                       w_bits: int = 4, a_bits: int = 16,
                       R1: Optional[np.ndarray] = None,
                       R2: Optional[np.ndarray] = None,
                       seed: int = 0,
                       ) -> Tuple[np.ndarray, np.ndarray, list]:
    """Learn (R1, R2) on calibration tokens. params must be norm-fused.

    Returns (R1, R2, loss_history). lr follows the reference's scale
    (scripts use 1.5 with SGDG).
    """
    from .rotation import random_orthogonal
    d, dh, L = cfg.hidden_size, cfg.head_dim, cfg.num_layers
    if R1 is None:
        R1 = random_orthogonal(d, seed=seed)
    if R2 is None:
        R2 = np.stack([np.eye(dh)] * L)
    rot = {"R1": jnp.asarray(R1, jnp.float32),
           "R2": jnp.asarray(R2, jnp.float32)}
    state = cayley_init(rot)

    @partial(jax.jit, static_argnames=("wb", "ab"))
    def loss_and_grad(rot, batch, wb, ab):
        def f(r):
            return rotated_quantized_forward(params, cfg, r["R1"], r["R2"],
                                             batch, wb, ab)
        return jax.value_and_grad(f)(rot)

    N = tokens.shape[0]
    history = []
    for step in range(steps):
        idx = (step * batch_size) % max(N - batch_size + 1, 1)
        batch = jnp.asarray(tokens[idx:idx + batch_size])
        loss, g = loss_and_grad(rot, batch, w_bits, a_bits)
        rot, state = cayley_update(g, state, rot, lr=lr, momentum=momentum,
                                   qr_every=32)
        history.append(float(loss))
        if step % 10 == 0:
            logger.info("rotation opt step %d: loss %.4f (ortho %.2e)",
                        step, float(loss),
                        float(orthogonality_error(rot)))
    return (np.asarray(rot["R1"], np.float64),
            np.asarray(rot["R2"], np.float64), history)
