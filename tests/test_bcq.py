"""BCQ (LUT-GEMM backend) tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from guidedquant_tpu.ops.bcq import (
    bcq_fit, bcq_pack_signs, bcq_unpack_signs, bcq_dequant, bcq_error)
from guidedquant_tpu.nn.bcq_linear import BcqLinear, apply_bcq


def test_fit_error_decreases_with_bits(rng):
    W = rng.normal(size=(16, 64)).astype(np.float32)
    errs = []
    for B in (1, 2, 3, 4):
        alpha, signs, bias = bcq_fit(W, B, iters=5)
        errs.append(bcq_error(W, alpha, signs, bias))
    assert all(errs[i + 1] < errs[i] for i in range(len(errs) - 1)), errs
    assert errs[-1] < 0.35


def test_pack_unpack_roundtrip(rng):
    signs = np.where(rng.random((3, 8, 64)) > 0.5, 1.0, -1.0)
    packed = bcq_pack_signs(signs)
    assert packed.shape == (3, 8, 2)
    np.testing.assert_array_equal(bcq_unpack_signs(packed, 64), signs)


def test_dequant_and_linear_forward(rng):
    W = rng.normal(size=(16, 64)).astype(np.float32)
    alpha, signs, bias = bcq_fit(W, 3, iters=5)
    packed = bcq_pack_signs(signs)
    deq = np.asarray(bcq_dequant(jnp.asarray(alpha), jnp.asarray(packed),
                                 jnp.asarray(bias), 64))
    manual = np.einsum("nb,bnk->nk", alpha, signs) + bias[:, None]
    np.testing.assert_allclose(deq, manual, atol=1e-5)

    lin = BcqLinear(alpha=jnp.asarray(alpha), packed=jnp.asarray(packed),
                    qbias=jnp.asarray(bias), out_features=16, in_features=64)
    x = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
    y = np.asarray(apply_bcq(lin, x))
    np.testing.assert_allclose(y, np.asarray(x) @ deq.T, atol=1e-4)

    # dispatch through apply_linear
    from guidedquant_tpu.nn.linear import apply_linear
    y2 = np.asarray(apply_linear(lin, x))
    np.testing.assert_allclose(y2, y)
