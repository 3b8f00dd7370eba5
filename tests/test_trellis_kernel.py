"""Fused trellis decode kernel (ops/trellis_kernel.py): column-cyclic
format round-trip, bit-exact interpret-mode kernel vs the codebook-lut
oracle, and quantization-quality parity of the column stream vs the
reference's 256-value tile stream.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedquant_tpu.ops import trellis_kernel as tk
from guidedquant_tpu.solvers.qtip.codebook import BitshiftCodebook
from guidedquant_tpu.solvers.qtip.ldlq import block_LDL, ldlq, regularize_H


@pytest.fixture(scope="module", params=["2mad", "tpu2u"])
def cb(request):
    return BitshiftCodebook(L=16, K=2, V=1, decode_mode=request.param)


def _random_cyclic_states(n_seq, cycle, rng, K=2):
    """Valid cyclic state sequences from random K*cycle-bit streams."""
    nbits = K * cycle
    bits = rng.integers(0, 2, size=(n_seq, nbits), dtype=np.uint8)
    ext = np.concatenate([bits, bits[:, :16]], axis=1)
    states = np.zeros((n_seq, cycle), np.int32)
    w16 = (1 << np.arange(15, -1, -1))
    for r in range(cycle):
        states[:, r] = (ext[:, K * r:K * r + 16] * w16).sum(1)
    return states


def test_pack_column_cyclic_roundtrip(cb, rng):
    cycle = 64
    states = _random_cyclic_states(24, cycle, rng)
    words = tk.pack_column_cyclic(cb, states)  # [24, cycle/16]
    assert words.shape == (24, cycle // 16)
    # reshape into the kwords layout for one column
    kw = words.reshape(24 * cycle // 16, 1)
    back = tk.unpack_kwords_np(kw, 24 * cycle, 1, cycle=cycle)
    np.testing.assert_array_equal(back.reshape(24, cycle), states)


def test_tpu2u_numpy_matches_traceable(rng):
    states = rng.integers(0, 1 << 16, size=(32, 48), dtype=np.int64)
    a = tk.decode_tpu2u(states)
    b = np.asarray(tk._decode_tpu2u_i32(jnp.asarray(states, jnp.int32)))
    np.testing.assert_array_equal(a.astype(np.float32), b)


def test_2mad_decoder_matches_reference(rng):
    from guidedquant_tpu.solvers.qtip.codebook import decode_2mad
    states = rng.integers(0, 1 << 16, size=(16, 128), dtype=np.int64)
    ref = decode_2mad(states)
    got = np.asarray(tk._decode_2mad_i32(jnp.asarray(states, jnp.int32)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_trellis_matmul_interpret_vs_oracle(cb, rng):
    m_, n_, cycle = 64, 256, 64
    states = _random_cyclic_states((m_ // cycle) * n_, cycle, rng)
    Qidxs = (states.reshape(m_ // cycle, n_, cycle)
             .transpose(0, 2, 1).reshape(m_, n_))
    words = tk.states_to_kwords(cb, Qidxs, cycle=cycle)

    dense = tk.decode_kwords_dense_np(cb, words, m_, n_, cycle=cycle)
    # traceable decode agrees with the lut oracle
    tr = np.asarray(tk.decode_kwords_traceable(
        jnp.asarray(words), m_, n_, cb.decode_mode, cycle=cycle))
    np.testing.assert_allclose(tr, dense, atol=1e-6)

    x = rng.normal(size=(4, n_)).astype(np.float32)
    y_ref = x @ dense.T
    y = np.asarray(tk.trellis_matmul(
        jnp.asarray(x), jnp.asarray(words), cb.decode_mode,
        cycle=cycle, tile_k=128, interpret=True))
    np.testing.assert_allclose(y, y_ref, rtol=2e-2,
                               atol=2e-2 * np.abs(y_ref).max())

    d = np.asarray(tk.trellis_dequant(
        jnp.asarray(words), cb.decode_mode, cycle=cycle, tile_k=128,
        dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(d, dense, atol=1e-6)


def test_trellis_matmul_batch_tiled_gemm(cb, rng):
    """Prefill GEMM path (B > MAX_BATCH): batch grid axis streams weight
    tiles per batch block; flex wrapper pads/slices the batch (the trellis
    analog of the affine GEMM prefill, VERDICT r3 next 8)."""
    m_, n_, cycle = 64, 256, 64
    states = _random_cyclic_states((m_ // cycle) * n_, cycle, rng)
    Qidxs = (states.reshape(m_ // cycle, n_, cycle)
             .transpose(0, 2, 1).reshape(m_, n_))
    words = tk.states_to_kwords(cb, Qidxs, cycle=cycle)
    dense = tk.decode_kwords_dense_np(cb, words, m_, n_, cycle=cycle)

    B = tk.MAX_BATCH + 9  # forces the tiled path + batch padding
    x = rng.normal(size=(B, n_)).astype(np.float32)
    y_ref = x @ dense.T
    # explicit multi-block grid
    xp = np.pad(x, ((0, 80 - B), (0, 0)))
    y = np.asarray(tk.trellis_matmul(
        jnp.asarray(xp), jnp.asarray(words), cb.decode_mode,
        cycle=cycle, tile_k=128, tile_b=40, interpret=True))
    np.testing.assert_allclose(y[:B], y_ref, rtol=2e-2,
                               atol=2e-2 * np.abs(y_ref).max())
    assert np.abs(y[B:]).max() < 1e-6
    # flex wrapper (auto pad/tile/slice) incl. leading dims
    yf = np.asarray(tk.trellis_matmul_flex(
        jnp.asarray(x.reshape(1, B, n_)), jnp.asarray(words),
        cb.decode_mode, cycle=cycle, interpret=True))
    np.testing.assert_allclose(yf.reshape(B, m_), y_ref, rtol=2e-2,
                               atol=2e-2 * np.abs(y_ref).max())


def test_ldlq_col_and_kernel_e2e(cb, rng):
    """LDLQ with column-cyclic sequences -> kwords -> kernel decode
    reproduces the solver's own hatWr exactly, at tile256-level quality."""
    m_, n_, cycle = 32, 64, 32
    W = rng.normal(size=(m_, n_)).astype(np.float32)
    A = rng.normal(size=(n_, 2 * n_)).astype(np.float32)
    H = A @ A.T / (2 * n_) + 0.1 * np.eye(n_, dtype=np.float32)
    H = regularize_H(H, 0.01)
    L, _ = block_LDL(H, 16)
    L[np.diag_indices(n_)] = 0.0

    hatWr, Qidxs = ldlq(W, L, cb, seq_mode="col", cycle=cycle)
    words = tk.states_to_kwords(cb, Qidxs, cycle=cycle)
    dense = tk.decode_kwords_dense_np(cb, words, m_, n_, cycle=cycle)
    np.testing.assert_allclose(dense, hatWr, atol=1e-6)

    from guidedquant_tpu.solvers.qtip.ldlq import proxy_error
    err_col = proxy_error(W, hatWr, H)
    hat256, _ = ldlq(W, L, cb, seq_mode="tile256")
    err256 = proxy_error(W, hat256, H)
    assert err_col < 1.0
    # same sequence length (32 here) as a 2x16 tile -> comparable quality
    assert err_col < err256 * 1.35 + 0.02, (err_col, err256)


@pytest.mark.parametrize("K,mode", [(3, "2mad"), (3, "tpu2u"), (4, "2mad"),
                                    (4, "tpu2u")])
def test_trellis_matmul_k34_interpret_vs_oracle(K, mode, rng):
    """K=3 (phase-plane layout) and K=4 (uniform 8/word) kernels vs the
    codebook-lut oracle — the reference kernel envelope K in {2,3,4}
    (qtip/lib/utils/kernel_check.py:1-14)."""
    cbk = BitshiftCodebook(L=16, K=K, V=1, decode_mode=mode)
    m_, n_, cycle = 128, 256, 64 if K != 3 else 64
    states = _random_cyclic_states((m_ // cycle) * n_, cycle, rng, K=K)
    Qidxs = (states.reshape(m_ // cycle, n_, cycle)
             .transpose(0, 2, 1).reshape(m_, n_))
    words = tk.states_to_kwords(cbk, Qidxs, cycle=cycle)
    if K == 3:
        assert words.shape == (3, m_ // 32, n_)
    else:
        assert words.shape == (m_ * K // 32, n_)

    back = tk.unpack_kwords_np(words, m_, n_, cycle=cycle, K=K)
    np.testing.assert_array_equal(back, Qidxs)

    dense = tk.decode_kwords_dense_np(cbk, words, m_, n_, cycle=cycle)
    tr = np.asarray(tk.decode_kwords_traceable(
        jnp.asarray(words), m_, n_, mode, cycle=cycle, K=K))
    np.testing.assert_allclose(tr, dense, atol=1e-6)

    x = rng.normal(size=(4, n_)).astype(np.float32)
    y_ref = x @ dense.T
    y = np.asarray(tk.trellis_matmul(
        jnp.asarray(x), jnp.asarray(words), mode,
        cycle=cycle, tile_k=128, K=K, interpret=True))
    np.testing.assert_allclose(y, y_ref, rtol=2e-2,
                               atol=2e-2 * np.abs(y_ref).max())

    d = np.asarray(tk.trellis_dequant(
        jnp.asarray(words), mode, cycle=cycle, tile_k=128, K=K,
        dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(d, dense, atol=1e-6)


@pytest.mark.parametrize("K", [3, 4])
def test_ldlq_col_kernel_e2e_k34(K, rng):
    """LDLQ (col sequences) -> kwords -> traceable decode reproduces the
    solver's hatWr exactly at K=3/4, and apply_trellis dispatch agrees."""
    from guidedquant_tpu.nn.trellis import TrellisLinear, apply_trellis

    cbk = BitshiftCodebook(L=16, K=K, V=1, decode_mode="2mad")
    m_, n_, cycle = 64, 64, 32 if K != 3 else 32
    W = rng.normal(size=(m_, n_)).astype(np.float32)
    A = rng.normal(size=(n_, 2 * n_)).astype(np.float32)
    H = A @ A.T / (2 * n_) + 0.1 * np.eye(n_, dtype=np.float32)
    H = regularize_H(H, 0.01)
    L, _ = block_LDL(H, 16)
    L[np.diag_indices(n_)] = 0.0

    hatWr, Qidxs = ldlq(W, L, cbk, seq_mode="col", cycle=cycle)
    words = tk.states_to_kwords(cbk, Qidxs, cycle=cycle)
    dense = tk.decode_kwords_dense_np(cbk, words, m_, n_, cycle=cycle)
    np.testing.assert_allclose(dense, hatWr, atol=1e-6)

    w_k = TrellisLinear(
        trellis=jnp.zeros((1, 1), jnp.int16),
        SU=jnp.asarray(rng.choice([-1.0, 1.0], size=n_).astype(np.float32)),
        SV=jnp.asarray(rng.choice([-1.0, 1.0], size=m_).astype(np.float32)),
        Wscale=jnp.asarray(np.float32(1.3)),
        kwords=jnp.asarray(words), L_bits=16, K=K, V=1,
        decode_mode="2mad", cycle=cycle, out_features=m_, in_features=n_)
    w_d = w_k.replace(kwords=None, hatW=jnp.asarray(dense))
    x = jnp.asarray(rng.normal(size=(3, n_)), jnp.float32)
    np.testing.assert_allclose(np.asarray(apply_trellis(w_k, x)),
                               np.asarray(apply_trellis(w_d, x)),
                               rtol=1e-5, atol=1e-5)


def test_apply_trellis_kwords_dispatch(cb, rng):
    """TrellisLinear with kwords: CPU path (traceable decode) must equal the
    dense-cached forward."""
    from guidedquant_tpu.nn.trellis import TrellisLinear, apply_trellis

    m_, n_, cycle = 32, 64, 32
    states = _random_cyclic_states((m_ // cycle) * n_, cycle, rng)
    Qidxs = (states.reshape(m_ // cycle, n_, cycle)
             .transpose(0, 2, 1).reshape(m_, n_))
    words = tk.states_to_kwords(cb, Qidxs, cycle=cycle)
    dense = tk.decode_kwords_dense_np(cb, words, m_, n_, cycle=cycle)

    SU = rng.choice([-1.0, 1.0], size=n_).astype(np.float32)
    SV = rng.choice([-1.0, 1.0], size=m_).astype(np.float32)
    common = dict(
        trellis=jnp.zeros((1, 1), jnp.int16), SU=jnp.asarray(SU),
        SV=jnp.asarray(SV), Wscale=jnp.asarray(np.float32(1.7)),
        L_bits=16, K=2, V=1, decode_mode=cb.decode_mode, cycle=cycle,
        out_features=m_, in_features=n_)
    w_k = TrellisLinear(kwords=jnp.asarray(words), **common)
    w_d = TrellisLinear(hatW=jnp.asarray(dense), **common)

    x = jnp.asarray(rng.normal(size=(3, n_)), jnp.float32)
    y_k = np.asarray(apply_trellis(w_k, x))
    y_d = np.asarray(apply_trellis(w_d, x))
    np.testing.assert_allclose(y_k, y_d, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["2mad", "tpu2u"])
def test_trellis_k3_v1_v2_parity(mode, rng):
    """The v2 K=3 kernel (precomputed per-sublane mask operand, FMA blend)
    must be bit-identical to v1 (in-kernel iota masks) and the oracle."""
    cbk = BitshiftCodebook(L=16, K=3, V=1, decode_mode=mode)
    m_, n_, cycle = 128, 256, 64
    states = _random_cyclic_states((m_ // cycle) * n_, cycle, rng, K=3)
    Qidxs = (states.reshape(m_ // cycle, n_, cycle)
             .transpose(0, 2, 1).reshape(m_, n_))
    words = tk.states_to_kwords(cbk, Qidxs, cycle=cycle)
    dense = tk.decode_kwords_dense_np(cbk, words, m_, n_, cycle=cycle)

    for v2 in (False, True):
        d = np.asarray(tk.trellis_dequant(
            jnp.asarray(words), mode, cycle=cycle, tile_k=128, K=3,
            dtype=jnp.float32, interpret=True, k3v2=v2))
        np.testing.assert_allclose(d, dense, atol=1e-6, err_msg=f"v2={v2}")

    x = rng.normal(size=(4, n_)).astype(np.float32)
    y1 = np.asarray(tk.trellis_matmul(
        jnp.asarray(x), jnp.asarray(words), mode, cycle=cycle,
        tile_k=128, K=3, interpret=True, k3v2=False))
    y2 = np.asarray(tk.trellis_matmul(
        jnp.asarray(x), jnp.asarray(words), mode, cycle=cycle,
        tile_k=128, K=3, interpret=True, k3v2=True))
    np.testing.assert_array_equal(y1, y2)
