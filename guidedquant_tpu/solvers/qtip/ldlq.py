"""Block-LDL decomposition + LDLQ trellis rounding.

Re-design of the reference's ``block_LDL`` (``qtip/lib/utils/math_utils.py:
14-41``) and ``LDLQ`` (``qtip/lib/algo/ldlq.py:17-92``): block
error-feedback quantization — columns are processed in td_y-sized blocks in
reverse order; each block's target is the original weights plus the
L-weighted quantization error of all later blocks; each td_x x td_y weight
tile becomes one trellis sequence for the codebook's Viterbi encoder.

The reference's ``_PERMUTE`` reorders tile elements to match its CUDA
mma-fragment layout; the TPU decode kernel consumes plain row-major tiles,
so no permutation is applied here.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def regularize_H(H: np.ndarray, sigma_reg: float = 0.01) -> np.ndarray:
    """Scaled diagonal regularization (reference math_utils.py:44-49)."""
    H = np.array(H, dtype=np.float64, copy=True)
    diagmean = float(np.diag(H).mean())
    H /= diagmean
    H[np.diag_indices(len(H))] += sigma_reg
    return H * diagmean


def block_LDL(H: np.ndarray, b: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """H [n, n] PD -> (L, D): H = L D L^T with L unit-block-lower-triangular
    (identity b x b diagonal blocks) and D [n/b, b, b] PD blocks."""
    n = H.shape[0]
    assert n % b == 0
    m = n // b
    try:
        C = np.linalg.cholesky(np.asarray(H, np.float64))
    except np.linalg.LinAlgError:
        return None
    # diagonal blocks of the Cholesky factor
    Cb = C.reshape(m, b, m, b)
    DL = np.stack([Cb[i, :, i, :] for i in range(m)])  # [m, b, b] lower tri
    D = DL @ DL.transpose(0, 2, 1)
    DLi = np.linalg.inv(DL)
    L = np.einsum("nmb,mbc->nmc", C.reshape(n, m, b), DLi).reshape(n, n)
    if np.isnan(L).any():
        return None
    # force exact identity diagonal blocks
    Lb = L.reshape(m, b, m, b)
    for i in range(m):
        Lb[i, :, i, :] = np.eye(b)
    return L.reshape(n, n), D


def ldlq(Wr: np.ndarray, L: np.ndarray, cb, td_x: int = 16, td_y: int = 16,
         buf_cols: int = 128, seq_mode: str = "tile256", cycle: int = 256,
         ) -> Tuple[np.ndarray, np.ndarray]:
    """Wr [m, n], L [n, n] from block_LDL(H, td_y) -> (hatWr [m, n],
    Qidxs [m, n/V] trellis states).

    Column blocks processed high->low with error feedback
    (reference ldlq.py:41-86); each block is reshaped into trellis
    sequences and quantized by cb.quantize.

    seq_mode:
      - "tile256": td_x x td_y tiles in row-major order (the reference's
        stream layout).
      - "col": each ``cycle``-row COLUMN segment is its own tail-biting
        sequence — the layout of the fused TPU decode kernel
        (ops/trellis_kernel.py). Requires V == 1 and m % cycle == 0.
    """
    m, n = Wr.shape
    assert n % td_y == 0 and m % td_x == 0
    buf_cols = min(max(buf_cols, td_y), n)
    assert buf_cols % td_y == 0 and n % buf_cols == 0
    buf_size = buf_cols // td_y
    trellissz = td_x * td_y
    V = cb.V

    Wr_T = np.ascontiguousarray(np.asarray(Wr, np.float32).T)  # [n, m]
    L = np.asarray(L, np.float32)
    hatWr_T = np.zeros((n, m), np.float32)
    Qidxs_T = np.zeros((n // V, m), np.int32)
    prod_cache = np.zeros((n, m), np.float32)

    for cur_col in range(n // td_y, 0, -buf_size):
        lo = td_y * (cur_col - buf_size)
        hi = td_y * cur_col
        b_Wr = Wr_T[lo:hi]
        b_hat = hatWr_T[lo:hi]
        b_L = L[lo:hi]
        b_prod = prod_cache[lo:hi]
        b_Q = Qidxs_T[lo // V: hi // V]
        for i in reversed(range(buf_size)):
            s, e = td_y * i, td_y * (i + 1)
            target = (b_Wr[s:e]
                      + b_L[e:, lo + s:lo + e].T @ (b_Wr[e:] - b_hat[e:])
                      + b_prod[s:e])  # [td_y, m]
            if seq_mode == "col":
                assert V == 1 and m % cycle == 0, (V, m, cycle)
                # sequences = cycle-row column segments: [(m/cycle)*td_y, C]
                tt = target.T.reshape(m // cycle, cycle, td_y)
                seqs = tt.transpose(0, 2, 1).reshape(-1, cycle)
                hat, idxs = cb.quantize(seqs)
                h4 = hat.reshape(m // cycle, td_y, cycle).transpose(0, 2, 1)
                b_hat[s:e] = h4.reshape(m, td_y).T
                i4 = idxs.reshape(m // cycle, td_y, cycle).transpose(0, 2, 1)
                b_Q[td_y * i: td_y * (i + 1)] = i4.reshape(m, td_y).T
            else:
                # tiles: [td_y, m] -> per (row-tile) sequences of td_x*td_y
                seqs = target.T.reshape(-1, trellissz)  # row-major tiles
                hat, idxs = cb.quantize(seqs)
                b_hat[s:e] = hat.reshape(m, td_y).T
                b_Q[td_y // V * i: td_y // V * (i + 1)] = \
                    idxs.reshape(m, td_y // V).T
        prod_cache += b_L.T @ (b_Wr - b_hat)
        hatWr_T[lo:hi] = b_hat
    return np.ascontiguousarray(hatWr_T.T), np.ascontiguousarray(Qidxs_T.T)


def proxy_error(W: np.ndarray, hatW: np.ndarray, H: np.ndarray) -> float:
    """tr(dW H dW^T) / tr(W H W^T) (reference finetune.py:320-335)."""
    dW = (hatW - W).astype(np.float64)
    W = np.asarray(W, np.float64)
    num = float(np.einsum("ij,jk,ik->", dW, H, dW))
    den = float(np.einsum("ij,jk,ik->", W, H, W))
    return num / max(den, 1e-30)
