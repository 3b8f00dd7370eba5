"""Hadamard / fast Walsh-Hadamard transforms.

Replaces the reference's ``fast-hadamard-transform`` CUDA dependency and its
~99k-line hardcoded matrix tables (``spin_quant/utils/hadamard_utils.py``,
``qtip/lib/utils/matmul_had.py``): power-of-two transforms run as an XLA
butterfly; non-power-of-two sizes factor as ``n = K * 2^m`` with a small base
matrix H_K that we *generate* via Paley constructions (GF(p^k) quadratic
characters) instead of shipping tables.

Sizes with no convenient Paley construction (172 = 4*43 for Llama-2
intermediate, 156) use a seeded random orthogonal base instead — exactly
orthogonal, same incoherence role, same runtime structure (small base matmul
x pow2 butterfly); documented divergence from the reference's exact
Hadamards.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


# ---------------------------------------------------------------------------
# GF(p^k) quadratic characters + Paley constructions
# ---------------------------------------------------------------------------

def _gf_elements(p: int, k: int):
    """Field elements of GF(p^k) as tuples of coefficients, plus multiply."""
    if k == 1:
        elems = list(range(p))

        def mul(a, b):
            return (a * b) % p
        return elems, mul, 0
    if k == 2:
        # irreducible x^2 - r with r a non-residue mod p
        residues = {(i * i) % p for i in range(1, p)}
        r = next(i for i in range(2, p) if i not in residues)
        elems = [(a, b) for a in range(p) for b in range(p)]

        def mul(x, y):
            a, b = x
            c, d = y
            # (a + b w)(c + d w) with w^2 = r
            return ((a * c + b * d * r) % p, (a * d + b * c) % p)
        return elems, mul, (0, 0)
    if k == 3:
        # irreducible cubic over GF(p): search for one
        def polmulmod(u, v, m, p):
            out = [0] * (len(u) + len(v) - 1)
            for i, a in enumerate(u):
                for j, b in enumerate(v):
                    out[i + j] = (out[i + j] + a * b) % p
            # reduce by monic cubic m (degree 3)
            while len(out) > 3:
                d = len(out) - 1
                c = out[d]
                if c:
                    for i in range(3):
                        out[d - 3 + i] = (out[d - 3 + i] - c * m[i]) % p
                out.pop()
            while len(out) < 3:
                out.append(0)
            return tuple(out)

        def is_irreducible(m, p):
            # cubic with no roots in GF(p)
            for x in range(p):
                v = (x ** 3 + m[2] * x * x + m[1] * x + m[0]) % p
                if v == 0:
                    return False
            return True

        m = None
        for c0 in range(1, p):
            for c1 in range(p):
                for c2 in range(p):
                    if is_irreducible((c0, c1, c2), p):
                        m = (c0, c1, c2)
                        break
                if m:
                    break
            if m:
                break
        elems = [(a, b, c) for a in range(p) for b in range(p)
                 for c in range(p)]

        def mul(x, y):
            return polmulmod(list(x), list(y), m, p)
        return elems, mul, (0, 0, 0)
    raise NotImplementedError(f"GF(p^{k})")


def _quadratic_character(p: int, k: int):
    """chi over GF(q): dict elem -> +1/-1/0."""
    elems, mul, zero = _gf_elements(p, k)
    squares = set()
    for e in elems:
        if e == zero:
            continue
        squares.add(mul(e, e))
    chi = {}
    for e in elems:
        if e == zero:
            chi[e] = 0
        else:
            chi[e] = 1 if e in squares else -1
    return elems, chi, zero


def _jacobsthal(p: int, k: int) -> np.ndarray:
    """Q[i, j] = chi(a_i - a_j) over GF(q)."""
    elems, chi, zero = _quadratic_character(p, k)
    q = len(elems)
    # subtraction: componentwise mod p
    def sub(a, b):
        if isinstance(a, int):
            return (a - b) % p
        return tuple((x - y) % p for x, y in zip(a, b))
    idx = {e: i for i, e in enumerate(elems)}
    Q = np.zeros((q, q), dtype=np.int64)
    for i, a in enumerate(elems):
        for j, b in enumerate(elems):
            Q[i, j] = chi[sub(a, b)]
    return Q


def paley_I(q_factors: Tuple[int, int]) -> np.ndarray:
    """H of order q+1 for q = p^k ≡ 3 (mod 4)."""
    p, k = q_factors
    q = p ** k
    assert q % 4 == 3
    Q = _jacobsthal(p, k)
    n = q + 1
    H = np.ones((n, n), dtype=np.int64)
    H[1:, 1:] = Q + np.eye(q, dtype=np.int64)
    H[1:, 0] = -1
    return H


def paley_II(q_factors: Tuple[int, int]) -> np.ndarray:
    """H of order 2(q+1) for q = p^k ≡ 1 (mod 4)."""
    p, k = q_factors
    q = p ** k
    assert q % 4 == 1
    Q = _jacobsthal(p, k)
    m = q + 1
    S = np.zeros((m, m), dtype=np.int64)
    S[0, 1:] = 1
    S[1:, 0] = 1
    S[1:, 1:] = Q
    # classical form: H = S (x) [[1,1],[1,-1]] + I (x) [[1,-1],[-1,-1]]
    # (S symmetric with zero diagonal, S S^T = qI, S J = J S = J)
    H = np.kron(S, np.array([[1, 1], [1, -1]])) + \
        np.kron(np.eye(m, dtype=np.int64), np.array([[1, -1], [-1, -1]]))
    return H


# Base sizes -> construction (mirrors reference get_hadK's supported set,
# hadamard_utils.py:16-64).
_PALEY_BASES = {
    12: ("I", (11, 1)),
    20: ("I", (19, 1)),
    24: ("I", (23, 1)),
    28: ("II", (13, 1)),
    36: ("II", (17, 1)),
    44: ("I", (43, 1)),
    52: ("II", (5, 2)),
    60: ("I", (59, 1)),
    108: ("I", (107, 1)),
    140: ("I", (139, 1)),
}
_ORTHO_BASES = (172, 156)  # no Paley construction; random orthogonal base
_BASE_ORDER = (172, 156, 140, 108, 60, 52, 40, 36, 28, 24, 20, 12)


@functools.lru_cache(maxsize=None)
def hadamard_base(K: int) -> np.ndarray:
    """Normalized orthonormal base matrix of size K (f64)."""
    if K == 1:
        return np.ones((1, 1))
    if is_pow2(K):
        H = np.array([[1.0]])
        while H.shape[0] < K:
            H = np.block([[H, H], [H, -H]])
        return H / np.sqrt(K)
    if K == 40:  # H20 (x) H2
        h20 = paley_I((19, 1))
        H = np.kron(h20, np.array([[1, 1], [1, -1]]))
        return H / np.sqrt(40)
    if K in _PALEY_BASES:
        kind, q = _PALEY_BASES[K]
        H = paley_I(q) if kind == "I" else paley_II(q)
        assert H.shape == (K, K)
        # verify
        assert np.abs(H @ H.T - K * np.eye(K)).max() == 0, f"bad H_{K}"
        return H / np.sqrt(K)
    if K in _ORTHO_BASES:
        rng = np.random.default_rng(K)
        M = rng.normal(size=(K, K))
        Qm, R = np.linalg.qr(M)
        return Qm * np.sign(np.diag(R))
    raise ValueError(f"no Hadamard base of size {K}")


def get_hadK(n: int) -> Tuple[Optional[np.ndarray], int]:
    """Factor n = K * 2^m; returns (base or None-if-pure-pow2, K)."""
    if is_pow2(n):
        return None, 1
    for K in _BASE_ORDER:
        if n % K == 0 and is_pow2(n // K):
            return hadamard_base(K), K
    raise ValueError(f"cannot factor {n} as K * 2^m with known base K")


# ---------------------------------------------------------------------------
# Transforms (JAX)
# ---------------------------------------------------------------------------

_SYLVESTER_CACHE: dict = {}


def _sylvester(n: int) -> np.ndarray:
    """Dense unnormalized Sylvester Hadamard H_n (entries +-1), cached."""
    H = _SYLVESTER_CACHE.get(n)
    if H is None:
        H = np.array([[1.0]], np.float32)
        while H.shape[0] < n:
            H = np.block([[H, H], [H, -H]])
        _SYLVESTER_CACHE[n] = H
    return H


def fwht(x: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized FWHT along the last axis (power-of-two length).

    Kronecker form: Sylvester ordering satisfies H_{ab} = H_a (x) H_b, so
    the transform is TWO dense +-1 matmuls on a [..., a, b] view (MXU work,
    f32 accumulation) instead of a log2(n)-pass butterfly — on TPU decode
    ([1, n] activations) the butterfly was ~11 sequential VPU passes per
    online Hadamard, which dominated the QTIP serving step.
    """
    n = x.shape[-1]
    assert is_pow2(n), n
    shape = x.shape
    pref = jnp.float32 if x.dtype in (jnp.bfloat16, jnp.float16) else None
    a = 1 << ((n.bit_length() - 1) // 2)  # a <= sqrt(n) <= b, both pow2
    b = n // a
    if a == 1:
        H = jnp.asarray(_sylvester(n), x.dtype)
        return jnp.matmul(x, H, preferred_element_type=pref).astype(x.dtype)
    Ha = jnp.asarray(_sylvester(a), x.dtype)
    Hb = jnp.asarray(_sylvester(b), x.dtype)
    xr = x.reshape(-1, a, b)
    y = jnp.einsum("zij,jq->ziq", xr, Hb, preferred_element_type=pref)
    y = jnp.einsum("pi,ziq->zpq", Ha.astype(y.dtype), y,
                   preferred_element_type=pref)
    return y.astype(x.dtype).reshape(shape)


def matmul_hadU(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """x @ H_n / sqrt(n) along ``axis`` (orthonormal), n = K * 2^m.

    Matches the reference's matmul_hadU/matmul_hadU_cuda semantics
    (hadamard_utils.py:66-106): base matrix on the *trailing* K-chunk
    structure, butterfly on the 2^m part.
    """
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    base, K = get_hadK(n)
    shape = x.shape
    if K == 1:
        out = fwht(x) / jnp.sqrt(n).astype(x.dtype)
    else:
        m = n // K
        # view [..., K, m]: butterfly over m, base matmul over K
        xr = x.reshape(-1, K, m)
        xr = fwht(xr)
        out = jnp.einsum("kj,bjm->bkm", jnp.asarray(base, x.dtype), xr)
        out = (out / jnp.sqrt(m).astype(x.dtype)).reshape(shape)
    return jnp.moveaxis(out, -1, axis)


def matmul_hadUt(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """x @ H_n^T / sqrt-normalized (inverse of matmul_hadU; H orthonormal).

    Pow2 part is symmetric (butterfly unchanged); the base factor applies
    transposed.
    """
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    base, K = get_hadK(n)
    shape = x.shape
    if K == 1:
        out = fwht(x) / jnp.sqrt(n).astype(x.dtype)
    else:
        m = n // K
        xr = x.reshape(-1, K, m)
        xr = fwht(xr)
        out = jnp.einsum("jk,bjm->bkm", jnp.asarray(base, x.dtype), xr)
        out = (out / jnp.sqrt(m).astype(x.dtype)).reshape(shape)
    return jnp.moveaxis(out, -1, axis)


def random_hadamard_matrix(n: int, key) -> np.ndarray:
    """Randomized orthonormal Hadamard: H' = H diag(s), s ~ ±1
    (reference hadamard_utils.random_hadamard_matrix)."""
    s = np.asarray(jax.random.rademacher(key, (n,), dtype=jnp.float32))
    eye = np.eye(n) * s
    H = np.asarray(matmul_hadU(jnp.asarray(eye)), np.float64)
    return H


def hadamard_matrix(n: int) -> np.ndarray:
    """Dense orthonormal H_n (for tests / weight folding)."""
    return np.asarray(matmul_hadU(jnp.asarray(np.eye(n))), np.float64)
