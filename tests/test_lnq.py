"""LNQ solver tests: CD update vs naive numpy oracle, codebook LS optimality,
alternating loop improvement."""

import numpy as np
import pytest

import jax.numpy as jnp

from guidedquant_tpu.solvers import lnq
from guidedquant_tpu.solvers.lnq import (
    dampen_hessians, objective, update_P, update_C, train_least_squares)


def _rand_instance(rng, N=8, D=16, G=2, ncl=4, T=64):
    W = rng.normal(size=(N, D)).astype(np.float32)
    X = rng.normal(size=(G, T, D)).astype(np.float32)
    H = np.einsum("gti,gtj->gij", X, X) + 0.1 * np.eye(D)
    C = np.sort(rng.normal(size=(N, ncl)).astype(np.float32), axis=1)
    labels = np.argmin(np.abs(W[:, :, None] - C[:, None, :]), axis=2)
    return W, H.astype(np.float32), labels.astype(np.int32), C


def _naive_update_P(W, H, labels, C, cd_cycles, block=128):
    """Direct per-column Gauss-Seidel oracle (same math, plain numpy)."""
    N, D = W.shape
    G = H.shape[0]
    gs = N // G
    ncl = C.shape[1]
    Wg = W.reshape(G, gs, D).astype(np.float64)
    Cg = C.reshape(G, gs, ncl).astype(np.float64)
    lab = labels.reshape(G, gs, D).copy()
    Hn = H.astype(np.float64) / np.diagonal(H, axis1=1, axis2=2)[:, None, :]
    What = np.take_along_axis(Cg, lab, axis=2)
    BS = min(block, D)
    for _ in range(cd_cycles):
        B = np.einsum("gid,gdk->gik", What - Wg, np.tril(Hn, -1))
        for s in range(0, D, BS):
            e = min(s + BS, D)
            for u in range(s, e):
                sol = Wg[:, :, u] - B[:, :, u]
                new = np.argmin(np.abs(sol[:, :, None] - Cg), axis=2)
                lab[:, :, u] = new
                What[:, :, u] = np.take_along_axis(Cg, new[:, :, None], 2)[:, :, 0]
                d = What[:, :, u] - Wg[:, :, u]
                if u + 1 < e:
                    B[:, :, u + 1:e] += d[:, :, None] * Hn[:, u, u + 1:e][:, None, :]
            B[:, :, e:] += np.einsum("gib,gbk->gik",
                                     What[:, :, s:e] - Wg[:, :, s:e],
                                     Hn[:, s:e, e:])
    return lab.reshape(N, D)


def test_update_p_matches_naive_oracle(rng):
    W, H, labels, C = _rand_instance(rng)
    H = dampen_hessians(H)
    ref = _naive_update_P(W, H, labels, C, cd_cycles=2, block=16)
    got = np.asarray(update_P(jnp.asarray(W), jnp.asarray(H),
                              jnp.asarray(labels), jnp.asarray(C), 2))
    assert (ref == got).mean() > 0.995, (ref != got).sum()


def test_update_p_improves_objective(rng):
    W, H, labels, C = _rand_instance(rng, N=16, D=32, G=2)
    H = dampen_hessians(H)
    before = float(objective(jnp.asarray(W), jnp.asarray(H),
                             jnp.asarray(labels), jnp.asarray(C)))
    new = update_P(jnp.asarray(W), jnp.asarray(H), jnp.asarray(labels),
                   jnp.asarray(C), 4)
    after = float(objective(jnp.asarray(W), jnp.asarray(H), new,
                            jnp.asarray(C)))
    assert after <= before * 1.0001, (before, after)


def test_update_c_matches_reference_lstsq(rng):
    """Normal-equation solve == reference's augmented L^T-reduced lstsq."""
    W, H, labels, C = _rand_instance(rng, N=8, D=16, G=2)
    H = dampen_hessians(H).astype(np.float64)
    ncl = C.shape[1]
    got = update_C(W, H.astype(np.float32), labels, ncl)

    N, D = W.shape
    G = H.shape[0]
    gs = N // G
    for i in range(N):
        g = i // gs
        L = np.linalg.cholesky(H[g])
        P = np.eye(ncl)[labels[i]]  # [D, ncl]
        A = L.T @ P
        b = L.T @ W[i].astype(np.float64)
        A_aug = np.vstack([A, np.sqrt(lnq.LAMBDA_REG) * np.eye(ncl)])
        b_aug = np.concatenate([b, np.zeros(ncl)])
        ref, *_ = np.linalg.lstsq(A_aug, b_aug, rcond=None)
        np.testing.assert_allclose(got[i], ref, rtol=2e-3, atol=2e-4)


def test_update_c_lowers_objective(rng):
    W, H, labels, C = _rand_instance(rng, N=16, D=32)
    H = dampen_hessians(H)
    before = float(objective(jnp.asarray(W), jnp.asarray(H),
                             jnp.asarray(labels), jnp.asarray(C)))
    C2 = update_C(W, H, labels, C.shape[1])
    after = float(objective(jnp.asarray(W), jnp.asarray(H),
                            jnp.asarray(labels), jnp.asarray(C2)))
    assert after <= before + 1e-6


def test_train_least_squares_end_to_end(rng):
    W, H, labels, C = _rand_instance(rng, N=16, D=32, G=2, ncl=4)
    lab2, C2, log = train_least_squares(W, labels, C, H,
                                        num_iterations=3, cd_cycles=2)
    objs = log["objective"]
    assert objs[-1] <= objs[0]
    assert lab2.dtype == np.uint8 and lab2.shape == W.shape
    assert C2.shape == C.shape
    # best tracking: reported final objective is the min seen
    assert min(objs) == pytest.approx(
        float(objective(jnp.asarray(W), jnp.asarray(dampen_hessians(H)),
                        jnp.asarray(lab2.astype(np.int32)),
                        jnp.asarray(C2))), rel=1e-4)


def test_dampen_hessians_makes_pd():
    D = 8
    H = np.zeros((1, D, D), np.float32)  # singular
    H[0] = np.outer(np.ones(D), np.ones(D))
    Hd = dampen_hessians(H)
    np.linalg.cholesky(Hd[0])  # must not raise
