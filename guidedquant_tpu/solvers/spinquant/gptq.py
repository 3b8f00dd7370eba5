"""GPTQ and guided GPTQ weight quantization.

Re-design of the reference's ``GPTQ.fasterquant`` / ``GPTQGuided.fasterquant``
(``spin_quant/eval_utils/gptq_utils.py``, ``gptq_guided_utils.py:84-241``):
column-blocked error-feedback rounding against the (per-row-group) inverse
Cholesky Hessian. The guided variant partitions output rows into G groups,
each with its own input Hessian H[g] (saliency-weighted, from the shared
calibration stage). Per-channel scales come from the full weight (sliced
per row group); with groupsize > 0, group scales are refit from the
permuted, error-compensated working weight as each group starts, exactly
like the reference.

Host numpy implementation (offline solver; column recursion is sequential).
"""

from __future__ import annotations

import logging
from typing import Tuple

import numpy as np

from .quant import WeightQuantConfig, minq_maxq, weight_find_params

logger = logging.getLogger(__name__)


def _cholesky_inv_upper(H: np.ndarray) -> np.ndarray:
    """Upper U with H^{-1} = U^T U (reference's cholesky ->
    cholesky_inverse -> cholesky(upper=True), gptq_guided_utils.py:154-157)."""
    L = np.linalg.cholesky(H)
    Hinv = np.linalg.inv(L).T @ np.linalg.inv(L)
    return np.linalg.cholesky(Hinv).T


def gptq_quantize(W: np.ndarray, H: np.ndarray, cfg: WeightQuantConfig,
                  blocksize: int = 128, percdamp: float = 0.01,
                  groupsize: int = -1, actorder: bool = False,
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """W [m, n], H [n, n] or [G, n, n] -> (Q fake-quantized [m, n],
    W_int [m, n], Scale [m, n]).

    G > 1 is the guided variant (rows partitioned over groups).
    """
    W = np.asarray(W, np.float32)
    m, n = W.shape
    if H.ndim == 2:
        H = H[None]
    G = H.shape[0]
    assert m % G == 0
    rows_per = m // G
    _, maxq = minq_maxq(cfg.bits, cfg.sym)

    # scales over the full weight (per column group when groupsize > 0)
    base_scale, base_zero = (None, None)
    if groupsize == -1:
        base_scale, base_zero = weight_find_params(W, cfg)  # [m, 1]

    Q_final = np.zeros_like(W)
    Wint_final = np.zeros_like(W)
    Scale_final = np.zeros_like(W)

    for g in range(G):
        rs, re = g * rows_per, (g + 1) * rows_per
        Wsub = W[rs:re].copy()
        Hsub = np.asarray(H[g], np.float64).copy()

        dead = np.diag(Hsub) == 0
        Hsub[dead, dead] = 1.0
        Wsub[:, dead] = 0.0

        if actorder:
            perm = np.argsort(-np.diag(Hsub))
            Wsub = Wsub[:, perm]
            Hsub = Hsub[np.ix_(perm, perm)]
            invperm = np.argsort(perm)

        damp = percdamp * float(np.mean(np.diag(Hsub)))
        Hsub[np.diag_indices(n)] += damp
        # escalating damping: f32-accumulated calibration Hessians can
        # carry small negative eigenvalues (same ladder as the LNQ/QTIP
        # solvers); each retry adds 10x the previous total
        for _ in range(6):
            try:
                Hinv = _cholesky_inv_upper(Hsub).astype(np.float32)
                break
            except np.linalg.LinAlgError:
                Hsub[np.diag_indices(n)] += 9.0 * damp
                damp *= 10.0
        else:
            raise np.linalg.LinAlgError(
                "Hessian not PD after escalating damping")

        Q = np.zeros_like(Wsub)
        Wint = np.zeros_like(Wsub)
        Scales = np.zeros_like(Wsub)
        scale = None if base_scale is None else base_scale[rs:re]
        zero = None if base_zero is None else base_zero[rs:re]

        for i1 in range(0, n, blocksize):
            i2 = min(i1 + blocksize, n)
            W1 = Wsub[:, i1:i2].copy()
            Err1 = np.zeros_like(W1)
            Hinv1 = Hinv[i1:i2, i1:i2]
            for i in range(i2 - i1):
                w = W1[:, i]
                d = Hinv1[i, i]
                if groupsize != -1 and (i1 + i) % groupsize == 0:
                    # group scales from the CURRENT working weight (post
                    # actorder permutation + error feedback), matching the
                    # reference which calls find_params on the permuted
                    # working W (gptq_utils.py fasterquant)
                    col = i1 + i
                    end = min(col + groupsize, n)
                    if end <= i2:
                        Wgrp = W1[:, i:i + (end - col)]
                    else:
                        Wgrp = np.concatenate(
                            [W1[:, i:], Wsub[:, i2:end]], axis=1)
                    gs_scale, gs_zero = weight_find_params(Wgrp, cfg)
                    scale, zero = gs_scale, gs_zero
                if cfg.sym:
                    q_int = np.clip(np.round(w[:, None] / scale),
                                    -(maxq + 1), maxq)
                else:
                    # asym grid: q in [0, maxq] around the zero point;
                    # store Wint = q - zero so Q == Scale * Wint holds
                    q_int = np.clip(np.round(w[:, None] / scale) + zero,
                                    0, maxq) - zero
                q = (scale * q_int)[:, 0]
                Q[:, i1 + i] = q
                Wint[:, i1 + i] = q_int[:, 0]
                Scales[:, i1 + i] = scale[:, 0]
                err = (w - q) / d
                W1[:, i:] -= np.outer(err, Hinv1[i, i:])
                Err1[:, i] = err
            Wsub[:, i2:] -= Err1 @ Hinv[i1:i2, i2:]

        if actorder:
            Q = Q[:, invperm]
            Wint = Wint[:, invperm]
            Scales = Scales[:, invperm]
        Q_final[rs:re] = Q
        Wint_final[rs:re] = Wint
        Scale_final[rs:re] = Scales

    if np.isnan(Q_final).any():
        raise ValueError("NaN in GPTQ output")
    return Q_final, Wint_final, Scale_final


def gptq_error(W, Q, H) -> float:
    """Hessian-weighted relative error over row groups."""
    if H.ndim == 2:
        H = H[None]
    G = H.shape[0]
    m = W.shape[0]
    rows = m // G
    num = den = 0.0
    for g in range(G):
        sl = slice(g * rows, (g + 1) * rows)
        d = (Q[sl] - W[sl]).astype(np.float64)
        w = W[sl].astype(np.float64)
        num += float(np.einsum("ij,jk,ik->", d, H[g], d))
        den += float(np.einsum("ij,jk,ik->", w, H[g], w))
    return num / max(den, 1e-30)
