"""Scalar fake-quantization library (SpinQuant track).

Functional JAX re-design of the reference's quantizer classes
(``spin_quant/utils/quant_utils.py``):

- sym/asym quant-dequant with straight-through gradients,
- per-token (+groupwise) activation quantization with dynamic range,
- GPTQ-style weight quantizer with optional MSE clip-ratio search.

State (scale/zero) is returned, not stored — quantizers are pure functions
over (x, config).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def minq_maxq(bits: int, sym: bool) -> Tuple[int, int]:
    if sym:
        maxq = 2 ** (bits - 1) - 1
        return -(maxq + 1), maxq
    return 0, 2 ** bits - 1


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def sym_quant_dequant(x, scale, maxq: int):
    """scale * clamp(round(x/scale), -(maxq+1), maxq); straight-through
    gradient w.r.t. x (reference STEQuantize, quant_utils.py:61-71)."""
    q = jnp.clip(jnp.round(x / scale), -(maxq + 1), maxq)
    return scale * q


def _sym_fwd(x, scale, maxq):
    return sym_quant_dequant(x, scale, maxq), None


def _sym_bwd(maxq, _, g):
    return (g, None)


sym_quant_dequant.defvjp(_sym_fwd, _sym_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def asym_quant_dequant(x, scale, zero, maxq: int):
    q = jnp.clip(jnp.round(x / scale) + zero, 0, maxq)
    return scale * (q - zero)


def _asym_fwd(x, scale, zero, maxq):
    return asym_quant_dequant(x, scale, zero, maxq), None


def _asym_bwd(maxq, _, g):
    return (g, None, None)


asym_quant_dequant.defvjp(_asym_fwd, _asym_bwd)


@dataclass(frozen=True)
class ActQuantConfig:
    """Per-token activation quantization (reference ActQuantizer)."""

    bits: int = 16
    groupsize: int = -1
    sym: bool = False
    clip_ratio: float = 1.0


def act_find_params(x: jnp.ndarray, cfg: ActQuantConfig):
    """Dynamic per-token (optionally groupwise) range -> (scale, zero),
    broadcastable to x (reference find_params, quant_utils.py:155-198)."""
    _, maxq = minq_maxq(cfg.bits, cfg.sym)
    if cfg.groupsize > 0:
        gs = cfg.groupsize
        xr = x.reshape(*x.shape[:-1], x.shape[-1] // gs, gs)
        xmax = xr.max(axis=-1, keepdims=True) * cfg.clip_ratio
        xmin = xr.min(axis=-1, keepdims=True) * cfg.clip_ratio
    else:
        xr = x
        xmax = jnp.maximum(x.max(axis=-1, keepdims=True), 0.0) * cfg.clip_ratio
        xmin = jnp.minimum(x.min(axis=-1, keepdims=True), 0.0) * cfg.clip_ratio
    if cfg.sym:
        m = jnp.maximum(jnp.abs(xmin), xmax)
        scale = jnp.where(m == 0, 1.0, m / maxq)
        zero = jnp.zeros_like(scale)
    else:
        degenerate = (xmin == 0) & (xmax == 0)
        xmin = jnp.where(degenerate, -1.0, xmin)
        xmax = jnp.where(degenerate, 1.0, xmax)
        scale = (xmax - xmin) / maxq
        zero = jnp.round(-xmin / scale)
    if cfg.groupsize > 0:
        bshape = (*x.shape[:-1], x.shape[-1] // cfg.groupsize, 1)
        scale = jnp.broadcast_to(scale, bshape[:-1] + (cfg.groupsize,)).reshape(x.shape)
        zero = jnp.broadcast_to(zero, bshape[:-1] + (cfg.groupsize,)).reshape(x.shape)
    return scale, zero


def act_fake_quant(x: jnp.ndarray, cfg: ActQuantConfig) -> jnp.ndarray:
    """Dynamic fake quantization of activations; identity at 16 bits."""
    if cfg.bits >= 16:
        return x
    scale, zero = act_find_params(x, cfg)
    _, maxq = minq_maxq(cfg.bits, cfg.sym)
    if cfg.sym:
        return sym_quant_dequant(x, scale, maxq).astype(x.dtype)
    return asym_quant_dequant(x, scale, zero, maxq).astype(x.dtype)


@dataclass(frozen=True)
class WeightQuantConfig:
    """GPTQ-style weight quantizer (reference WeightQuantizer)."""

    bits: int = 4
    perchannel: bool = True
    sym: bool = True
    mse: bool = False
    norm: float = 2.4
    grid: int = 100
    maxshrink: float = 0.8
    groupsize: int = -1


def weight_find_params(W: np.ndarray, cfg: WeightQuantConfig
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """-> (scale [rows, 1] or grouped, zero) in numpy (host-side solver
    code; reference find_params, quant_utils.py:391-459)."""
    W = np.asarray(W, np.float32)
    _, maxq = minq_maxq(cfg.bits, cfg.sym)
    assert cfg.groupsize <= 0, "use per-column grouping at the GPTQ level"
    if cfg.perchannel:
        x = W.reshape(W.shape[0], -1)
    else:
        x = W.reshape(1, -1)
    xmin = np.minimum(x.min(axis=1), 0.0)
    xmax = np.maximum(x.max(axis=1), 0.0)
    if cfg.sym:
        m = np.maximum(np.abs(xmin), xmax).clip(min=1e-5)
        scale = m / maxq
        zero = np.zeros_like(scale)
    else:
        deg = (xmin == 0) & (xmax == 0)
        xmin = np.where(deg, -1.0, xmin)
        xmax = np.where(deg, 1.0, xmax)
        scale = (xmax - xmin).clip(min=1e-5) / maxq
        zero = np.round(-xmin / scale)

    if cfg.mse:
        best = np.full(x.shape[0], np.inf)
        cur_scale, cur_zero = scale.copy(), zero.copy()
        for i in range(int(cfg.maxshrink * cfg.grid)):
            p = 1 - i / cfg.grid
            xmin1, xmax1 = p * xmin, p * xmax
            if cfg.sym:
                scale1 = np.maximum(np.abs(xmin1), xmax1).clip(min=1e-10) / maxq
                zero1 = np.zeros_like(scale1)
                q = np.clip(np.round(x / scale1[:, None]), -(maxq + 1), maxq)
                deq = scale1[:, None] * q
            else:
                scale1 = (xmax1 - xmin1).clip(min=1e-10) / maxq
                zero1 = np.round(-xmin1 / scale1)
                q = np.clip(np.round(x / scale1[:, None]) + zero1[:, None],
                            0, maxq)
                deq = scale1[:, None] * (q - zero1[:, None])
            err = (np.abs(deq - x) ** cfg.norm).sum(axis=1)
            better = err < best
            best[better] = err[better]
            cur_scale[better] = scale1[better]
            cur_zero[better] = zero1[better]
        scale, zero = cur_scale, cur_zero

    if not cfg.perchannel:
        scale = np.repeat(scale, W.shape[0])
        zero = np.repeat(zero, W.shape[0])
    return scale[:, None], zero[:, None]


def weight_fake_quant(W: np.ndarray, scale: np.ndarray, zero: np.ndarray,
                      cfg: WeightQuantConfig) -> np.ndarray:
    _, maxq = minq_maxq(cfg.bits, cfg.sym)
    W = np.asarray(W, np.float32)
    if cfg.sym:
        q = np.clip(np.round(W / scale), -(maxq + 1), maxq)
        return scale * q
    q = np.clip(np.round(W / scale) + zero, 0, maxq)
    return scale * (q - zero)


def rtn_quantize(W: np.ndarray, cfg: WeightQuantConfig) -> np.ndarray:
    """Round-to-nearest baseline (reference rtn_fwrd)."""
    scale, zero = weight_find_params(W, cfg)
    return weight_fake_quant(W, scale, zero, cfg)
