"""block_LDL + LDLQ tests."""

import numpy as np
import pytest

from guidedquant_tpu.solvers.qtip.ldlq import (
    block_LDL, ldlq, regularize_H, proxy_error)
from guidedquant_tpu.solvers.qtip.codebook import BitshiftCodebook


def _pd_matrix(rng, n, T=None):
    X = rng.normal(size=(T or 4 * n, n))
    return X.T @ X / (T or 4 * n) + 0.05 * np.eye(n)


def test_block_ldl_reconstructs(rng):
    n, b = 32, 8
    H = _pd_matrix(rng, n)
    L, D = block_LDL(H, b)
    m = n // b
    # unit diagonal blocks
    Lb = L.reshape(m, b, m, b)
    for i in range(m):
        np.testing.assert_allclose(Lb[i, :, i, :], np.eye(b), atol=1e-10)
        for j in range(i + 1, m):
            np.testing.assert_allclose(Lb[i, :, j, :], 0, atol=1e-10)
    # H = L Dblk L^T with Dblk block-diagonal of D
    Dfull = np.zeros((n, n))
    for i in range(m):
        Dfull[i * b:(i + 1) * b, i * b:(i + 1) * b] = D[i]
    np.testing.assert_allclose(L @ Dfull @ L.T, H, atol=1e-8)


def test_block_ldl_returns_none_for_indefinite():
    H = -np.eye(8)
    assert block_LDL(H, 4) is None


def test_regularize_H(rng):
    H = _pd_matrix(rng, 16)
    Hr = regularize_H(H, 0.01)
    assert (np.diag(Hr) > np.diag(H)).all()
    np.testing.assert_allclose(Hr - np.diag(np.diag(Hr)),
                               H - np.diag(np.diag(H)), atol=1e-9)


@pytest.fixture(scope="module")
def small_trellis_cb():
    rng = np.random.default_rng(0)
    tlut = rng.normal(size=(1 << 8, 1)).astype(np.float32)
    return BitshiftCodebook(L=8, K=2, V=1, tlut_bits=8, decode_mode="lut",
                            tlut=tlut)


def test_ldlq_beats_direct_quantization(small_trellis_cb, rng):
    """Error feedback must reduce the Hessian-weighted proxy error vs
    quantizing each block independently."""
    cb = small_trellis_cb
    m, n = 16, 32
    td_x = td_y = 4  # tiny tiles -> trellis length 16
    W = rng.normal(size=(m, n)).astype(np.float32)
    H = _pd_matrix(rng, n)
    out = block_LDL(H, td_y)
    assert out is not None
    L, D = out
    hatW, Qidxs = ldlq(W, L, cb, td_x=td_x, td_y=td_y, buf_cols=8)
    assert hatW.shape == W.shape
    assert Qidxs.shape == (m, n // cb.V)

    # direct (no feedback) quantization of the same tiles
    direct = np.zeros_like(W)
    for s in range(0, n, td_y):
        seqs = W[:, s:s + td_y].reshape(-1, td_x * td_y)
        hat, _ = cb.quantize(seqs)
        direct[:, s:s + td_y] = hat.reshape(m, td_y)

    e_ldlq = proxy_error(W, hatW, H)
    e_direct = proxy_error(W, direct, H)
    assert e_ldlq <= e_direct * 1.02, (e_ldlq, e_direct)
    assert e_ldlq < 1.0


def test_ldlq_states_decode_consistently(small_trellis_cb, rng):
    cb = small_trellis_cb
    m, n, td = 8, 16, 4
    W = rng.normal(size=(m, n)).astype(np.float32)
    H = _pd_matrix(rng, n)
    L, D = block_LDL(H, td)
    hatW, Qidxs = ldlq(W, L, cb, td_x=td, td_y=td, buf_cols=4)
    # decode states block-by-block and compare to hatW
    recon = np.zeros_like(W)
    for bi, s in enumerate(range(0, n, td)):
        idxs = Qidxs[:, s:s + td]  # [m, td] (V=1)
        seq = idxs.reshape(-1, td * td // cb.V)
        vals = cb.recons(seq.T)  # [V, T, B]
        recon[:, s:s + td] = np.moveaxis(vals, 0, 1).reshape(
            td * td, -1).T.reshape(m, td)
    np.testing.assert_allclose(recon, hatW, atol=1e-5)
