"""Fused LUT-GEMV kernel tests.

Layout round-trips run in numpy; kernel execution runs in Pallas interpret
mode on CPU (real-TPU execution is exercised by bench.py / verify). The
oracle is the gather-free dequant path — the reference's own test pattern
(kernel vs dequant+matmul, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedquant_tpu.ops import lut_kernels
from guidedquant_tpu.ops.lut_kernels import (
    pack_lane_tiled, unpack_lane_tiled_np, pad_to_tiles, tile_k_for,
    lut_matmul_tiled, lut_to_poly, poly_eval_np)


@pytest.mark.parametrize("bits", [1, 2, 4, 8])
def test_lane_tiled_roundtrip(bits, rng):
    TK = tile_k_for(bits)
    N, K = 8, 2 * TK
    codes = rng.integers(0, 2 ** bits, size=(N, K), dtype=np.uint8)
    words = pack_lane_tiled(codes, bits)
    assert words.shape == (N, K * bits // 32)
    np.testing.assert_array_equal(unpack_lane_tiled_np(words, bits, K), codes)


@pytest.mark.parametrize("bits", [3, 5, 6, 7])
def test_lane_tiled_roundtrip_composite(bits, rng):
    """Composite widths pack as MSB-first per-field word arrays."""
    from guidedquant_tpu.ops.lut_kernels import fields_for
    TK = tile_k_for(bits)
    N, K = 8, 2 * TK
    codes = rng.integers(0, 2 ** bits, size=(N, K), dtype=np.uint8)
    words = pack_lane_tiled(codes, bits)
    assert isinstance(words, tuple) and len(words) == len(fields_for(bits))
    for w_f, f in zip(words, fields_for(bits)):
        assert w_f.shape == (N, K * f // 32)
    np.testing.assert_array_equal(unpack_lane_tiled_np(words, bits, K), codes)


def test_composite_fields_preserve_anyprec_prefix(rng):
    """The 2-bit field of the 3-bit pack must equal the 2-bit MSB-prefix
    code (the any-precision property carried into the kernel layout)."""
    from guidedquant_tpu.ops.lut_kernels import split_fields
    codes = rng.integers(0, 8, size=(4, 64), dtype=np.uint8)
    f2, f1 = split_fields(codes, 3)
    np.testing.assert_array_equal(f2, codes >> 1)
    np.testing.assert_array_equal(f1, codes & 1)


def test_pad_to_tiles(rng):
    codes = rng.integers(0, 4, size=(4, 100), dtype=np.uint8)
    padded, K_pad = pad_to_tiles(codes, 2)
    assert K_pad == tile_k_for(2)
    assert padded.shape == (4, K_pad)
    np.testing.assert_array_equal(padded[:, :100], codes)
    assert (padded[:, 100:] == 0).all()


@pytest.mark.parametrize("bits,B", [(1, 1), (2, 1), (2, 4), (3, 1), (3, 4),
                                    (4, 1), (5, 1), (6, 2), (7, 1), (8, 1)])
def test_kernel_matches_dequant_oracle(bits, B, rng):
    from jax.experimental.pallas import tpu as pltpu
    TK = tile_k_for(bits)
    N, K = 256, TK  # one k-tile keeps interpret mode fast
    C = 2 ** bits
    codes = rng.integers(0, C, size=(N, K), dtype=np.uint8)
    lut = np.sort(rng.normal(size=(N, C)).astype(np.float32), axis=1)
    x = rng.normal(size=(B, K)).astype(np.float32)

    packed = pack_lane_tiled(codes, bits)
    words = (tuple(jnp.asarray(w) for w in packed)
             if isinstance(packed, tuple) else jnp.asarray(packed))
    coef = lut_to_poly(lut, bits)
    ref = x @ np.take_along_axis(lut, codes.astype(np.int64), 1).T

    with pltpu.force_tpu_interpret_mode():
        y = lut_matmul_tiled(jnp.asarray(x), words, jnp.asarray(coef), bits,
                             tile_n=128)
    got = np.asarray(y, np.float32)
    assert got.shape == (B, N)
    # bf16 decode + f32 accumulate tolerance
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-2)


def test_kernel_multi_ktile(rng):
    from jax.experimental.pallas import tpu as pltpu
    bits, B = 2, 2
    TK = tile_k_for(bits)
    N, K = 128, 2 * TK
    codes = rng.integers(0, 4, size=(N, K), dtype=np.uint8)
    lut = rng.normal(size=(N, 4)).astype(np.float32)
    x = rng.normal(size=(B, K)).astype(np.float32)
    words = jnp.asarray(pack_lane_tiled(codes, bits))
    coef = lut_to_poly(lut, bits)
    ref = x @ np.take_along_axis(lut, codes.astype(np.int64), 1).T
    with pltpu.force_tpu_interpret_mode():
        y = lut_matmul_tiled(jnp.asarray(x), words, jnp.asarray(coef), bits,
                             tile_n=128)
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(np.asarray(y) / scale, ref / scale, atol=2e-2)


def test_with_kernel_layout_roundtrip(rng):
    """with_kernel_layout must produce words that decode to the plane codes."""
    from guidedquant_tpu.nn.linear import AnyPrecLinear, with_kernel_layout
    from guidedquant_tpu.ops.pack import pack_bitplanes
    bits, N, K = 2, 16, 64
    codes = rng.integers(0, 4, size=(N, K), dtype=np.uint8)
    q = pack_bitplanes(codes, bits)
    w = AnyPrecLinear(qweight=jnp.asarray(q),
                      luts={2: jnp.zeros((N, 4))}, precision=2,
                      out_features=N, in_features=K)
    w2 = with_kernel_layout(w)
    K_pad = tile_k_for(bits)
    assert w2.qwords.shape == (N, K_pad * bits // 32)
    back = unpack_lane_tiled_np(np.asarray(w2.qwords), bits, K)
    np.testing.assert_array_equal(back, codes)


def test_with_kernel_layout_3bit_free_lut(rng):
    """A free (non-uniform) 3-bit codebook must get the exact-poly kernel
    operands (pcoef + per-field word tuple), not the dequant fallback
    (VERDICT r2 missing 2: the paper's 3-bit LNQ config)."""
    from guidedquant_tpu.nn.linear import (AnyPrecLinear, with_kernel_layout,
                                           dequantize_anyprec)
    from guidedquant_tpu.ops.lut_kernels import poly_eval_np
    bits, N, K = 3, 16, 64
    codes = rng.integers(0, 8, size=(N, K), dtype=np.uint8)
    from guidedquant_tpu.ops.pack import pack_bitplanes
    # strongly non-uniform LUT (geometric spacing) -> not affine-fittable
    lut = np.sort(rng.normal(size=(N, 8)).astype(np.float32) ** 3, axis=1)
    q = pack_bitplanes(codes, bits)
    w = AnyPrecLinear(qweight=jnp.asarray(q), luts={3: jnp.asarray(lut)},
                      precision=3, out_features=N, in_features=K)
    w2 = with_kernel_layout(w)
    assert w2.pcoef is not None and isinstance(w2.qwords, tuple)
    assert w2.pcoef.shape == (N, 8)
    # kernel-layout words decode to the plane codes
    back = unpack_lane_tiled_np(
        tuple(np.asarray(f) for f in w2.qwords), bits, K)
    np.testing.assert_array_equal(back, codes)
    # poly(codes) == dequant oracle
    dense = np.asarray(dequantize_anyprec(w, dtype=jnp.float32))
    got = poly_eval_np(np.asarray(w2.pcoef, np.float64), codes, bits)
    np.testing.assert_allclose(got, dense, atol=1e-4 * np.abs(dense).max())


@pytest.mark.parametrize("bits", [5, 6, 8])
def test_with_kernel_layout_widebit_free_lut(bits, rng, monkeypatch):
    """Free codebooks at 5-8 bits now engage the exact-poly kernel
    operands too (VERDICT r3 missing 1: the reference serves arbitrary
    LUTs at every width 2-8); the KERNEL forward (backend forced so the
    dispatch gate passes, interpret-mode Pallas) matches the dequant
    oracle."""
    import jax as _jax
    from jax.experimental.pallas import tpu as pltpu
    from guidedquant_tpu.nn.linear import (
        AnyPrecLinear, with_kernel_layout, apply_linear, dequantize_anyprec)
    from guidedquant_tpu.ops.pack import pack_bitplanes
    C = 2 ** bits
    N, K = 128, 64
    codes = rng.integers(0, C, size=(N, K), dtype=np.uint8)
    lut = np.sort(rng.normal(size=(N, C)).astype(np.float32) ** 3, axis=1)
    q = pack_bitplanes(codes, bits)
    w = AnyPrecLinear(qweight=jnp.asarray(q), luts={bits: jnp.asarray(lut)},
                      precision=bits, out_features=N, in_features=K)
    w2 = with_kernel_layout(w)
    assert w2.pcoef is not None and w2.pcoef.shape == (N, C)
    x = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32))
    ref = np.asarray(x @ dequantize_anyprec(w, dtype=jnp.float32).T)
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    with pltpu.force_tpu_interpret_mode():
        y = apply_linear(w2, x)
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(np.asarray(y) / scale, ref / scale,
                               atol=4e-2)


@pytest.mark.parametrize("bits", [1, 2, 3, 4, 5, 6, 7, 8])
def test_poly_is_exact_interpolation(bits):
    """lut_to_poly coefficients must reproduce every LUT entry exactly
    (up to f32 coefficient rounding, which is well below bf16 decode
    noise)."""
    local = np.random.default_rng(42)
    N, C = 32, 2 ** bits
    lut = local.normal(size=(N, C)).astype(np.float32)
    coef = lut_to_poly(lut, bits)
    codes = np.tile(np.arange(C, dtype=np.uint8)[None], (N, 1))
    got = poly_eval_np(coef.astype(np.float64), codes, bits)
    np.testing.assert_allclose(got, lut, atol=5e-4 * max(1.0, np.abs(lut).max()))


def test_a8_quantize_kernel_matches_xla(rng):
    """The fused Pallas A8-quantize pass (one kernel instead of XLA's
    reduce fusion + elementwise fusion + layout copies per linear; see
    PERF_NOTES r5 B=64 trace) must reproduce the XLA path: codes exactly,
    scales to f32 rounding, row sums to reduce-order tolerance."""
    import jax.numpy as jnp
    from guidedquant_tpu.ops import lut_kernels as lk

    for B, K in [(1, 4096), (64, 14336), (8, 512)]:
        x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32) * 3)
        xq, sx, sumx = lk.a8_quantize(x, interpret=True)
        xf = np.asarray(x, np.float32)
        amax = np.abs(xf).max(axis=1, keepdims=True)
        sx_ref = np.maximum(amax, 1e-30) / 127.0
        xq_ref = np.clip(np.round(xf / sx_ref), -127, 127).astype(np.int8)
        np.testing.assert_array_equal(np.asarray(xq), xq_ref)
        np.testing.assert_allclose(np.asarray(sx), sx_ref, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sumx),
                                   xf.sum(1, keepdims=True), rtol=1e-4)
