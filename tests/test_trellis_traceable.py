"""Traceable trellis decode (compute codebooks) vs host decode oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from guidedquant_tpu.solvers.qtip.codebook import BitshiftCodebook, decode_2mad
from guidedquant_tpu.solvers.qtip.quantize_layer import (
    quantize_linear_qtip, build_trellis_linear)
from guidedquant_tpu.nn.trellis import (
    decode_2mad_jnp, unpack_trellis_states_jnp, apply_trellis,
    decode_trellis_dense)


def test_decode_2mad_jnp_matches_numpy():
    x = np.arange(1 << 14, dtype=np.uint64)
    ref = decode_2mad(x)
    got = np.asarray(decode_2mad_jnp(jnp.asarray(x.astype(np.int64),
                                                 jnp.int32)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_unpack_states_matches_host(rng):
    cb = BitshiftCodebook(L=16, K=2, V=1, decode_mode="2mad")
    B, Tv = 4, 128  # T = 128, K=2 -> 256-bit stream = 16 words
    # random VALID trellis sequences (consecutive overlap)
    t = np.zeros((B, Tv), np.int64)
    t[:, 0] = rng.integers(0, 1 << 16, B)
    for i in range(1, Tv):
        nb = rng.integers(0, 4, B)
        t[:, i] = ((t[:, i - 1] << 2) & 0xFFFF) | nb
    # tail-biting closure: regenerate first states from the wrap
    # (pack only stores the stream; unpack wraps) -> enforce consistency
    # by rebuilding state 0..7 from the last bits? Simplest: use quantize()
    packed = None
    try:
        packed = cb.pack_trellis(t.astype(np.int32))
    except AssertionError:
        pytest.skip("random trellis invalid")
    host = cb.unpack_trellis(packed, Tv * cb.V)
    got = np.asarray(unpack_trellis_states_jnp(
        jnp.asarray(packed.view(np.int16)), Tv * cb.V, 16, 2, 1))
    # non-wrapping states must agree; wrapped tail states only match when
    # the sequence is tail-biting, which random sequences are not
    n_safe = (Tv * 2 - 16) // 2
    np.testing.assert_array_equal(got[:, :n_safe], host[:, :n_safe])


def test_traceable_forward_matches_cached(rng):
    cb = BitshiftCodebook(L=16, K=2, V=1, decode_mode="2mad")
    m = n = 32
    W = rng.normal(size=(m, n)).astype(np.float32)
    X = rng.normal(size=(1, 4 * n, n)).astype(np.float32)
    H = (np.einsum("gti,gtj->gij", X, X) / (4 * n) + 0.05 * np.eye(n)
         ).astype(np.float32)
    art = quantize_linear_qtip(W, H, cb, td_x=16, td_y=16, seed=3)
    lin_cached = build_trellis_linear(art, cb, m, n, cache_dense=True)
    lin_lazy = lin_cached.replace(hatW=None)
    x = jnp.asarray(rng.normal(size=(2, n)), jnp.float32)
    y_cached = np.asarray(apply_trellis(lin_cached, x))
    y_lazy = np.asarray(apply_trellis(lin_lazy, x))
    np.testing.assert_allclose(y_lazy, y_cached, atol=1e-4)
