"""QTIP trellis codebook tests: Viterbi optimality vs exhaustive DP oracle,
tail-biting invariants, bitstream pack/unpack round-trip, decode statistics."""

import numpy as np
import pytest

from guidedquant_tpu.solvers.qtip.codebook import (
    BitshiftCodebook, decode_1mad, decode_2mad, decode_3inst)


def small_cb(L=6, K=1, V=1, seed=0):
    rng = np.random.default_rng(seed)
    tlut = rng.normal(size=(1 << L, V)).astype(np.float32)
    return BitshiftCodebook(L=L, K=K, V=V, tlut_bits=L, decode_mode="lut",
                            tlut=tlut)


def test_decode_fns_are_near_standard_normal():
    x = np.arange(1 << 16, dtype=np.uint64)
    for fn in (decode_1mad, decode_2mad):
        y = fn(x)
        assert abs(float(y.mean())) < 0.05
        assert 0.9 < float(y.std()) < 1.1
    y3 = decode_3inst(x)
    assert np.isfinite(y3).all()
    assert 0.5 < float(y3.std()) < 2.0


def _brute_force_viterbi(cb, X):
    """Exhaustive DP over all state sequences (transition: s' =
    ((s << KV) & mask) | newbits). Returns optimal total cost."""
    L, KV, V = cb.L, cb.KV, cb.V
    nstates = 1 << L
    T = X.shape[0]
    n_steps = T // V
    # cost[s] at step 0
    def err(i, s):
        return sum((cb.lut[v, s] - X[i * V + v]) ** 2 for v in range(V))
    cost = np.array([err(0, s) for s in range(nstates)])
    mask = (1 << L) - 1
    for i in range(1, n_steps):
        new = np.full(nstates, np.inf)
        for s in range(nstates):
            base = (s << KV) & mask
            for nb in range(1 << KV):
                sp = base | nb
                c = cost[s] + err(i, sp)
                if c < new[sp]:
                    new[sp] = c
        cost = new
    return cost.min()


def _path_cost(cb, X, states):
    V = cb.V
    total = 0.0
    for i, s in enumerate(states):
        for v in range(V):
            total += (cb.lut[v, s] - X[i * V + v]) ** 2
    return total


def test_viterbi_matches_bruteforce_optimum(rng):
    cb = small_cb(L=6, K=1, V=1)
    T = 8
    for trial in range(3):
        X = rng.normal(size=(T, 2)).astype(np.float32)
        states = cb.viterbi(X)
        for b in range(X.shape[1]):
            got = _path_cost(cb, X[:, b], states[:, b])
            opt = _brute_force_viterbi(cb, X[:, b])
            assert got <= opt + 1e-4, (trial, b, got, opt)


def test_viterbi_v2(rng):
    cb = small_cb(L=6, K=1, V=2, seed=1)
    T = 8
    X = rng.normal(size=(T, 3)).astype(np.float32)
    states = cb.viterbi(X)
    for b in range(3):
        got = _path_cost(cb, X[:, b], states[:, b])
        opt = _brute_force_viterbi(cb, X[:, b])
        assert got <= opt + 1e-4


def test_viterbi_transition_validity(rng):
    cb = small_cb(L=6, K=2, V=1)
    X = rng.normal(size=(12, 4)).astype(np.float32)
    states = cb.viterbi(X)
    mask = (1 << (cb.L - cb.KV)) - 1
    for i in range(1, states.shape[0]):
        assert ((states[i - 1] & mask) == (states[i] >> cb.KV)).all()


def test_quantize_tailbiting_and_pack_roundtrip(rng):
    cb = small_cb(L=6, K=2, V=1)
    B, T = 5, 16
    X = rng.normal(size=(B, T)).astype(np.float32)
    hatX, states = cb.quantize(X)
    assert hatX.shape == X.shape and states.shape == (B, T // cb.V)
    # reconstruction consistent with states
    recons = cb.recons(states.T)  # [V, T/V, B]
    np.testing.assert_allclose(
        hatX, np.moveaxis(recons, 0, 1).reshape(T, B).T, atol=1e-6)
    # tail-biting: first state's high bits continue the last state
    mask = (1 << (cb.L - cb.KV)) - 1
    assert ((states[:, -1] & mask) == (states[:, 0] >> cb.KV)).all()
    # bitstream round-trip
    packed = cb.pack_trellis(states)
    back = cb.unpack_trellis(packed, T)
    np.testing.assert_array_equal(back, states)


def test_quantize_reduces_error_vs_random_states(rng):
    cb = small_cb(L=6, K=2, V=1, seed=2)
    X = rng.normal(size=(4, 16)).astype(np.float32)
    hatX, _ = cb.quantize(X)
    err = ((hatX - X) ** 2).mean()
    rand_states = rng.integers(0, 1 << cb.L, size=16)
    rand_recon = cb.lut[0, rand_states]
    rand_err = ((rand_recon[None] - X) ** 2).mean()
    assert err < rand_err


def test_quantlut_sym_codebook():
    cb = BitshiftCodebook(L=10, K=2, V=2, tlut_bits=5,
                          decode_mode="quantlut_sym", seed=0)
    assert cb.lut.shape == (2, 1 << 10)
    assert np.isfinite(cb.lut).all()
    # sign flip applies to dim 0 only: values of dim 0 roughly symmetric
    assert abs(cb.lut[0].mean()) < 0.1


def test_compute_mode_codebooks_build():
    for mode in ("1mad", "2mad", "3inst"):
        cb = BitshiftCodebook(L=10, K=2, V=1, decode_mode=mode)
        assert cb.lut.shape == (1, 1 << 10)
