"""QTIP guided per-linear quantization driver.

Analog of the reference's ``quantize_finetune_decoder_layer`` core
(``qtip/lib/algo/finetune.py:202-345``): per linear —

1. draw random sign vectors SU [n], SV [m] (seeded per layer),
2. incoherence-process:  Wr = Mm^T diag(SV) W diag(SU) Mn / Wscale,
   HRr_g = Mn^T diag(SU) H_g diag(SU) Mn  (``preprocess_group``,
   finetune.py:124-148), with Wscale matching the codebook RMS,
3. per saliency group g (rows m/g): block-LDL of HRr_g + LDLQ trellis
   rounding of that row slice,
4. pack the trellis bitstream and report the proxy error
   tr(dW HRr dW^T)/tr(W HRr W^T).
"""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np
import jax.numpy as jnp

from ...nn.trellis import TrellisLinear
from ...ops.hadamard import matmul_hadUt
from .codebook import BitshiftCodebook
from .ldlq import block_LDL, ldlq, regularize_H

logger = logging.getLogger(__name__)


def _sandwich_Ut(A: np.ndarray) -> np.ndarray:
    """Mm^T A Mn (transform both sides with hadUt semantics)."""
    x = matmul_hadUt(jnp.asarray(A, jnp.float32), axis=0)
    x = matmul_hadUt(x, axis=1)
    return np.asarray(x, np.float32)


def quantize_linear_qtip(W: np.ndarray, H: np.ndarray, cb: BitshiftCodebook,
                         td_x: int = 16, td_y: int = 16,
                         scale_override: float = 0.9,
                         sigma_reg: float = 0.01,
                         seed: int = 0,
                         stream_format: str = "tile256",
                         cycle: int = 256) -> Dict:
    """W [m, n], H [g, n, n] grouped proxy Hessians -> quantized artifacts.

    Returns dict with packed trellis, SU, SV, Wscale, hatWr (transformed
    domain), proxy_err.

    stream_format "column" encodes ``cycle``-value per-column cyclic
    trellis sequences and emits ``kwords`` for the fused TPU decode kernel
    (ops/trellis_kernel.py) instead of the reference's 256-value tile
    streams; requires a compute decode_mode with V == 1. Sequence length
    (and thus coding gain) matches tile256 at cycle=256.
    """
    m, n = W.shape
    g = H.shape[0]
    assert m % g == 0
    rng = np.random.default_rng(seed)
    SU = rng.choice([-1.0, 1.0], size=n).astype(np.float32)
    SV = rng.choice([-1.0, 1.0], size=m).astype(np.float32)

    C = SV[:, None] * np.asarray(W, np.float32) * SU[None, :]
    Wr = _sandwich_Ut(C)
    lut_rms = float(np.sqrt(np.mean(np.asarray(cb.lut, np.float64) ** 2)))
    Wscale = float(np.sqrt(np.mean(Wr.astype(np.float64) ** 2))) / (
        lut_rms * scale_override)
    Wr = Wr / Wscale

    HRr = np.zeros_like(H, dtype=np.float32)
    for i in range(g):
        Hi = regularize_H(H[i], sigma_reg)
        HRr[i] = _sandwich_Ut(SU[:, None] * Hi * SU[None, :])

    assert stream_format in ("tile256", "column"), stream_format
    seq_mode = "col" if stream_format == "column" else "tile256"
    rows_per_g = m // g
    # one uniform cycle length across all saliency row-groups
    cycle = min(cycle, rows_per_g)
    assert rows_per_g % cycle == 0, (rows_per_g, cycle)
    hatWr = np.zeros((m, n), np.float32)
    Qidxs = np.zeros((m, n // cb.V), np.int32)
    for i in range(g):
        out = block_LDL(HRr[i], td_y)
        # escalating damping ladder (the LNQ solver's PD-fallback pattern):
        # f32-accumulated Hessians can carry small negative eigenvalues
        # (observed ~ -0.05 * mean(diag) on real calibration runs)
        sigma = 0.1
        while out is None and sigma <= 1e3:
            out = block_LDL(regularize_H(HRr[i], sigma), td_y)
            sigma *= 10.0
        assert out is not None, "HRr not PD even after damping"
        L, _ = out
        L[np.diag_indices(n)] = 0.0
        sl = slice(i * rows_per_g, (i + 1) * rows_per_g)
        hatWr[sl], Qidxs[sl] = ldlq(Wr[sl], L, cb, td_x=td_x, td_y=td_y,
                                    seq_mode=seq_mode, cycle=cycle)

    err = _grouped_proxy_error(Wr, hatWr, HRr, g)
    logger.info("qtip: proxy err %.6f (m=%d n=%d g=%d fmt=%s)", err, m, n, g,
                stream_format)

    art = {
        "SU": SU, "SV": SV,
        "Wscale": np.float32(Wscale), "hatWr": hatWr, "proxy_err": err,
    }
    if stream_format == "column":
        from ...ops.trellis_kernel import states_to_kwords
        art["kwords"] = states_to_kwords(cb, Qidxs, cycle=cycle)
        art["cycle"] = cycle
        # tiny placeholder keeps the TrellisLinear field shape-stable
        art["trellis"] = np.zeros((1, 1), np.uint16)
    else:
        # pack per td_x x td_y tile (row-major within tile)
        T = td_x * td_y
        state_tiles = Qidxs.reshape(m // td_x, td_x, n // td_y, td_y // cb.V)
        state_tiles = state_tiles.transpose(0, 2, 1, 3).reshape(-1, T // cb.V)
        art["trellis"] = cb.pack_trellis(state_tiles)
    return art


def _grouped_proxy_error(Wr, hatWr, HRr, g):
    m = Wr.shape[0]
    rows = m // g
    num = den = 0.0
    for i in range(g):
        sl = slice(i * rows, (i + 1) * rows)
        d = (hatWr[sl] - Wr[sl]).astype(np.float64)
        w = Wr[sl].astype(np.float64)
        num += float(np.einsum("ij,jk,ik->", d, HRr[i], d))
        den += float(np.einsum("ij,jk,ik->", w, HRr[i], w))
    return num / max(den, 1e-30)


def build_trellis_linear(artifacts: Dict, cb: BitshiftCodebook, m: int, n: int,
                         td_x: int = 16, td_y: int = 16,
                         cache_dense: bool = True) -> TrellisLinear:
    """Artifacts -> runtime TrellisLinear.

    cyclic16 artifacts carry ``kwords`` for the fused decode kernel and
    need no dense cache; tile256 artifacts optionally cache the dense
    decode at load time (the reference's cache_hatW mode)."""
    from ..qtip.codebook import BitshiftCodebook  # noqa
    from ...nn.trellis import decode_trellis_dense

    kwords = artifacts.get("kwords")
    hatW = None
    if kwords is None and cache_dense:
        hatW = jnp.asarray(decode_trellis_dense(
            cb, artifacts["trellis"], m, n, td_x, td_y), jnp.float32)
    return TrellisLinear(
        trellis=jnp.asarray(artifacts["trellis"].view(np.int16)),
        SU=jnp.asarray(artifacts["SU"]), SV=jnp.asarray(artifacts["SV"]),
        Wscale=jnp.asarray(artifacts["Wscale"]),
        hatW=hatW,
        kwords=None if kwords is None else jnp.asarray(kwords),
        cycle=int(artifacts.get("cycle", 256)),
        L_bits=cb.L, K=cb.K, V=cb.V, tlut_bits=cb.tlut_bits,
        decode_mode=cb.decode_mode, td_x=td_x, td_y=td_y,
        out_features=m, in_features=n)
