"""Hadamard/FWHT tests: generated Paley bases must be exact Hadamard
matrices; transforms must be orthonormal and match dense matmul."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedquant_tpu.ops.hadamard import (
    hadamard_base, get_hadK, fwht, matmul_hadU, hadamard_matrix,
    random_hadamard_matrix, _PALEY_BASES)


@pytest.mark.parametrize("K", sorted(_PALEY_BASES) + [40])
def test_paley_bases_are_hadamard(K):
    H = hadamard_base(K) * np.sqrt(K)
    assert H.shape == (K, K)
    assert set(np.unique(H.round())) <= {-1.0, 1.0}
    np.testing.assert_allclose(H @ H.T, K * np.eye(K), atol=1e-9)


@pytest.mark.parametrize("K", [156, 172])
def test_fallback_bases_are_orthogonal(K):
    H = hadamard_base(K)
    np.testing.assert_allclose(H @ H.T, np.eye(K), atol=1e-9)


def test_fwht_matches_scipy():
    from scipy.linalg import hadamard as scipy_hadamard
    n = 64
    x = np.eye(n)
    got = np.asarray(fwht(jnp.asarray(x)))
    np.testing.assert_allclose(got, scipy_hadamard(n), atol=1e-5)


@pytest.mark.parametrize("n", [64, 12 * 8, 28 * 4, 40 * 2, 172 * 2])
def test_matmul_hadU_orthonormal(n, rng):
    x = rng.normal(size=(3, n)).astype(np.float32)
    y = np.asarray(matmul_hadU(jnp.asarray(x)))
    # norm preservation
    np.testing.assert_allclose(np.linalg.norm(y, axis=1),
                               np.linalg.norm(x, axis=1), rtol=1e-5)
    # matches dense orthonormal matrix application
    H = hadamard_matrix(n)
    np.testing.assert_allclose(H @ H.T, np.eye(n), atol=1e-6)
    np.testing.assert_allclose(y, x @ H, atol=1e-4)


def test_matmul_hadU_involution_pow2(rng):
    """Pow2 Hadamard is symmetric: applying twice = identity."""
    x = rng.normal(size=(2, 128)).astype(np.float32)
    y = np.asarray(matmul_hadU(matmul_hadU(jnp.asarray(x))))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_get_hadK_llama_dims():
    for n, expK in [(4096, 1), (11008, 172), (14336, 28), (28672, 28),
                    (8192, 1), (5120, 40), (13824, 108)]:
        base, K = get_hadK(n)
        assert K == expK, (n, K, expK)


def test_random_hadamard_orthonormal():
    H = random_hadamard_matrix(64, jax.random.PRNGKey(0))
    np.testing.assert_allclose(H @ H.T, np.eye(64), atol=1e-6)
