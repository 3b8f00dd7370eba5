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


def test_bcqize_params_forward(rng):
    """Dense tiny model -> BCQ model; forward stays close (generous bits)."""
    import jax
    from guidedquant_tpu.models import llama, get_config
    from guidedquant_tpu.formats.bcq_format import bcqize_params
    cfg = get_config("tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = bcqize_params(params, cfg, bits=6, iters=2)
    toks = np.arange(16, dtype=np.int32)[None]
    ref = np.asarray(llama.forward(params, cfg, toks))
    got = np.asarray(llama.forward(qparams, cfg, toks))
    # 6-bit BCQ on random weights sits at ~8% weight relerr (greedy binary
    # decomposition plateau); compounded through 2 layers the logits still
    # track the dense model
    assert np.corrcoef(ref.ravel(), got.ravel())[0, 1] > 0.9


def test_kernel_operands_roundtrip(rng):
    """Lane-tiled plane words decode back to the checkpoint signs."""
    from guidedquant_tpu.ops.bcq import bcq_kernel_operands
    from guidedquant_tpu.ops.lut_kernels import unpack_lane_tiled_np
    K = 96
    signs = np.where(rng.random((2, 8, K)) > 0.5, 1.0, -1.0)
    packed = bcq_pack_signs(signs)
    words, K_pad = bcq_kernel_operands(packed, K)
    assert words.shape[:2] == (2, 8)
    for b in range(2):
        codes = unpack_lane_tiled_np(words[b], 1, K_pad)
        np.testing.assert_array_equal(codes[:, :K] * 2.0 - 1.0, signs[b])
        assert (codes[:, K:] == 0).all()


def test_bcq_kernel_vs_dequant_oracle(rng):
    """Fused sign-plane kernel (interpret mode) == dequant + matmul."""
    from jax.experimental.pallas import tpu as pltpu
    from guidedquant_tpu.ops.bcq import bcq_kernel_operands
    from guidedquant_tpu.ops.lut_kernels import bcq_matmul, tile_k_for
    TK = tile_k_for(1)
    N, K, Bp = 256, TK, 3
    W = rng.normal(size=(N, K)).astype(np.float32)
    alpha, signs, bias = bcq_fit(W, Bp, iters=2)
    packed = bcq_pack_signs(signs)
    words, K_pad = bcq_kernel_operands(packed, K)
    x = rng.normal(size=(2, K_pad)).astype(np.float32)

    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(bcq_matmul(
            jnp.asarray(x), jnp.asarray(words), jnp.asarray(alpha),
            jnp.asarray(bias)))
    dense = np.asarray(bcq_dequant(jnp.asarray(alpha), jnp.asarray(packed),
                                   jnp.asarray(bias), K))
    ref = x[:, :K] @ dense.T
    # bf16 decode/activation + f32 accumulate tolerance (scale-normalized,
    # same pattern as test_lut_kernels)
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(y / scale, ref / scale, atol=2e-2)


def test_bcq_kernel_dispatch_stacked(rng):
    """with_bcq_kernel_layout + apply_bcq kernel path on a stacked leaf."""
    from jax.experimental.pallas import tpu as pltpu
    from guidedquant_tpu.nn.bcq_linear import with_bcq_kernel_layout
    from guidedquant_tpu.ops.lut_kernels import tile_k_for
    import guidedquant_tpu.ops.lut_kernels as lk
    K = tile_k_for(1)
    N, Bp, L = 128, 2, 2
    alphas, packs = [], []
    for _l in range(L):
        W = rng.normal(size=(N, K)).astype(np.float32)
        a, s, b = bcq_fit(W, Bp, iters=1, use_bias=False)
        alphas.append(a)
        packs.append(bcq_pack_signs(s))
    lin = BcqLinear(alpha=jnp.asarray(np.stack(alphas)),
                    packed=jnp.asarray(np.stack(packs)),
                    qbias=jnp.zeros((L, N)),
                    out_features=N, in_features=K)
    lin = with_bcq_kernel_layout(lin)
    assert lin.qwords is not None and lin.qwords.shape[0] == L

    from guidedquant_tpu.models.llama import layer_slice
    l0 = layer_slice(lin, 0)
    x = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32))
    dense = np.asarray(bcq_dequant(lin.alpha[0], lin.packed[0],
                                   lin.qbias[0], K))
    import jax as _jax
    orig = _jax.default_backend
    try:
        _jax.default_backend = lambda: "tpu"  # force the kernel branch
        with pltpu.force_tpu_interpret_mode():
            y = np.asarray(apply_bcq(l0, x))
    finally:
        _jax.default_backend = orig
    ref = np.asarray(x) @ dense.T
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(y / scale, ref / scale, atol=2e-2)
