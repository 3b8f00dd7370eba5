"""Binary-coding quantization (BCQ) — the LUT-GEMM backend.

Analog of the reference's second kernel family
(``inference/ap_gemv/lutgemm.cu:24-150`` ``nqmv_bias`` and
``LUTGEMMLinear``): weights as a sum of sign planes with per-row scales,

    w[n, k] ~= sum_b  alpha[n, b] * s_b[n, k]  +  bias[n],   s in {-1, +1}

Fitting is greedy initialization + alternating refinement (per-row exact
least-squares for alpha given signs; re-signing given alpha). Signs pack
32-per-int32 in the same little-endian word layout as the bit-plane packer.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp


def bcq_fit(W: np.ndarray, num_bits: int, iters: int = 10,
            use_bias: bool = True) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """W [N, K] -> (alpha [N, B], signs {-1,1} [B, N, K], bias [N])."""
    W = np.asarray(W, np.float64)
    N, K = W.shape
    bias = W.mean(axis=1) if use_bias else np.zeros(N)
    R = W - bias[:, None]
    signs = np.zeros((num_bits, N, K))
    alpha = np.zeros((N, num_bits))
    # greedy init
    for b in range(num_bits):
        s = np.where(R >= 0, 1.0, -1.0)
        a = np.abs(R).mean(axis=1)
        signs[b] = s
        alpha[:, b] = a
        R = R - a[:, None] * s
    # alternating refinement
    for _ in range(iters):
        for b in range(num_bits):
            # residual excluding plane b
            R = W - bias[:, None] - np.einsum(
                "nb,bnk->nk", alpha, signs) + alpha[:, b][:, None] * signs[b]
            signs[b] = np.where(R >= 0, 1.0, -1.0)
        # exact alpha (and bias) per row via least squares on [S | 1]
        for n in range(0, N, 256):
            sl = slice(n, min(n + 256, N))
            S = signs[:, sl, :].transpose(1, 2, 0)  # [rows, K, B]
            if use_bias:
                A = np.concatenate([S, np.ones_like(S[..., :1])], axis=-1)
            else:
                A = S
            # batched normal equations: (A^T A) x = A^T w
            AtA = np.einsum("rkb,rkc->rbc", A, A)
            Atw = np.einsum("rkb,rk->rb", A, W[sl])
            x = np.linalg.solve(AtA + 1e-9 * np.eye(A.shape[-1]),
                                Atw[..., None])[..., 0]
            alpha[sl] = x[:, :num_bits]
            if use_bias:
                bias[sl] = x[:, num_bits]
    return (alpha.astype(np.float32), signs.astype(np.float32),
            bias.astype(np.float32))


def bcq_pack_signs(signs: np.ndarray) -> np.ndarray:
    """signs {-1,1} [B, N, K] -> int32 [B, N, K/32] (bit=1 <-> +1)."""
    B, N, K = signs.shape
    assert K % 32 == 0
    bits = (signs > 0).astype(np.uint32).reshape(B, N, K // 32, 32)
    weights = (np.uint32(1) << np.arange(32, dtype=np.uint32))
    return (bits * weights).sum(axis=-1, dtype=np.uint32).view(np.int32)


def bcq_unpack_signs(packed: np.ndarray, K: int) -> np.ndarray:
    p = np.asarray(packed).view(np.uint32)
    B, N, Wn = p.shape
    shifts = np.arange(32, dtype=np.uint32)
    bits = ((p[..., None] >> shifts) & np.uint32(1)).reshape(B, N, Wn * 32)
    return (bits[:, :, :K].astype(np.float32) * 2.0 - 1.0)


def bcq_dequant(alpha: jnp.ndarray, packed: jnp.ndarray, bias: jnp.ndarray,
                K: int, dtype=jnp.float32) -> jnp.ndarray:
    """Traceable dequant: -> dense [N, K]."""
    p = packed.astype(jnp.uint32)
    B, N, Wn = p.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = ((p[..., None] >> shifts) & jnp.uint32(1)).reshape(B, N, Wn * 32)
    s = bits[:, :, :K].astype(dtype) * 2.0 - 1.0  # [B, N, K]
    return jnp.einsum("nb,bnk->nk", alpha.astype(dtype), s) + \
        bias.astype(dtype)[:, None]


def bcq_kernel_operands(packed: np.ndarray, K: int) -> Tuple[np.ndarray, int]:
    """Checkpoint sign planes -> lane-tiled kernel operand.

    packed [(L,) B, N, K/32] little-endian word planes ->
    words [(L,) B, N, K_pad/32] in the 1-bit lane-tiled layout consumed by
    ``lut_kernels.bcq_matmul`` (TK = 4096). Returns (words, K_pad).
    """
    from . import lut_kernels

    p = np.asarray(packed)
    stacked = p.ndim == 4
    ps = p if stacked else p[None]
    out = []
    for pl_ in ps:
        signs = bcq_unpack_signs(pl_, K)  # [B, N, K] in {-1, +1}
        codes = (signs > 0).astype(np.uint8)
        planes = []
        for b in range(codes.shape[0]):
            c, K_pad = lut_kernels.pad_to_tiles(codes[b], 1)
            planes.append(lut_kernels.pack_lane_tiled(c, 1))
        out.append(np.stack(planes))
    words = np.stack(out) if stacked else out[0]
    return words, K_pad


def bcq_error(W: np.ndarray, alpha, signs, bias) -> float:
    approx = np.einsum("nb,bnk->nk", alpha, signs) + bias[:, None]
    return float(np.linalg.norm(approx - W) / max(np.linalg.norm(W), 1e-12))
