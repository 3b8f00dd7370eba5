"""Int-domain W{b}A8 affine kernel (u8-word decode + int8 MXU code-dot).

Interpret-mode kernel vs the dequant oracle; the u8 layout round-trips
against the canonical int32 lane-tiled words. HW validation:
tools/perf/w2a8_check.py (short isolated process, CLAUDE.md rule 2).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from guidedquant_tpu.ops import lut_kernels
from guidedquant_tpu.ops.lut_kernels import (
    pack_lane_tiled, pack_lane_tiled_u8, u8_words_from_packed,
    lut_matmul_affine_w2a8, pad_to_tiles, tile_k_for)
from guidedquant_tpu.nn import linear as nnlin


@pytest.mark.parametrize("bits", [1, 2, 3, 4])
def test_u8_words_match_host_pack(bits, rng):
    """Device repack from int32 words == host u8 pack of the same codes."""
    TK = tile_k_for(bits)
    N, K = 8, 2 * TK
    codes = rng.integers(0, 2 ** bits, size=(N, K), dtype=np.uint8)
    host = pack_lane_tiled_u8(codes, bits)
    dev = u8_words_from_packed(pack_lane_tiled(codes, bits), bits)
    if isinstance(host, tuple):
        for h, d in zip(host, dev):
            np.testing.assert_array_equal(np.asarray(d), h)
    else:
        np.testing.assert_array_equal(np.asarray(dev), host)


def test_u8_words_stacked_layers(rng):
    """Leading layer dim flattens through the rowwise repack."""
    bits, TK = 2, tile_k_for(2)
    codes = rng.integers(0, 4, size=(3, 16, TK), dtype=np.uint8)
    words = jnp.stack([jnp.asarray(pack_lane_tiled(c, bits)) for c in codes])
    u8 = np.asarray(u8_words_from_packed(words, bits))
    for l in range(3):
        np.testing.assert_array_equal(u8[l], pack_lane_tiled_u8(codes[l], bits))


@pytest.mark.parametrize("bits,B", [(2, 1), (2, 8), (3, 1), (4, 4)])
def test_w2a8_kernel_vs_oracle(bits, B, rng):
    TK = tile_k_for(bits)
    N, K = 256, 2 * TK
    codes = rng.integers(0, 2 ** bits, size=(N, K), dtype=np.uint8)
    s = rng.normal(size=N).astype(np.float32) * 0.1
    m = rng.normal(size=N).astype(np.float32) * 0.05
    x = rng.normal(size=(B, K)).astype(np.float32)
    u8 = pack_lane_tiled_u8(codes, bits)
    u8 = tuple(jnp.asarray(u) for u in u8) if isinstance(u8, tuple) \
        else jnp.asarray(u8)
    y = np.asarray(lut_matmul_affine_w2a8(
        jnp.asarray(x), u8, jnp.asarray(s), jnp.asarray(m), bits,
        interpret=True))
    # oracle with the same A8 activation quantization (codes are exact)
    sx = np.maximum(np.abs(x).max(1, keepdims=True), 1e-30) / 127.0
    xq = np.clip(np.round(x / sx), -127, 127)
    dense = m[:, None] + s[:, None] * codes.astype(np.float32)
    ref = (sx * xq) @ (s[:, None] * codes.astype(np.float32)).T \
        + x.sum(1, keepdims=True) * m[None, :]
    np.testing.assert_allclose(y, ref, rtol=5e-4, atol=5e-4)
    # and the A8 error vs the exact product stays in the expected band
    exact = x @ dense.T
    rel = np.abs(y - exact).max() / np.abs(exact).max()
    assert rel < 5e-2, rel


def test_w2a8_exact_on_integer_activations(rng):
    """Integer-valued x within [-127, 127] quantizes losslessly -> the
    int-domain kernel is bit-exact vs the dense product."""
    bits, TK = 2, tile_k_for(2)
    N, K = 256, TK
    codes = rng.integers(0, 4, size=(N, K), dtype=np.uint8)
    s = np.ones(N, np.float32)
    m = np.zeros(N, np.float32)
    x = rng.integers(-127, 128, size=(1, K)).astype(np.float32)
    y = np.asarray(lut_matmul_affine_w2a8(
        jnp.asarray(x), jnp.asarray(pack_lane_tiled_u8(codes, bits)),
        jnp.asarray(s), jnp.asarray(m), bits, interpret=True))
    ref = x @ codes.astype(np.float32).T
    np.testing.assert_allclose(y, ref, rtol=1e-6)


def test_w2a8_gemm_batch_tiled(rng):
    """Batch-tiled GEMM path (tile_b) agrees with the single-block path."""
    bits, TK = 2, tile_k_for(2)
    N, K, B = 256, TK, 64
    codes = rng.integers(0, 4, size=(N, K), dtype=np.uint8)
    s = rng.normal(size=N).astype(np.float32) * 0.1
    m = rng.normal(size=N).astype(np.float32) * 0.05
    x = rng.normal(size=(B, K)).astype(np.float32)
    u8 = jnp.asarray(pack_lane_tiled_u8(codes, bits))
    y1 = np.asarray(lut_matmul_affine_w2a8(
        jnp.asarray(x), u8, jnp.asarray(s), jnp.asarray(m), bits,
        interpret=True))
    y2 = np.asarray(lut_matmul_affine_w2a8(
        jnp.asarray(x), u8, jnp.asarray(s), jnp.asarray(m), bits,
        tile_b=16, interpret=True))
    np.testing.assert_allclose(y1, y2, rtol=1e-6, atol=1e-6)


def test_with_act8_leaf_roundtrip(rng):
    """with_act8 derives u8 words on an affine kernel-layout leaf; the
    decoded dense weight is unchanged."""
    from guidedquant_tpu.ops.pack import pack_bitplanes
    bits, N, K = 2, 256, tile_k_for(2)
    codes = rng.integers(0, 4, size=(N, K), dtype=np.uint8)
    s = (rng.normal(size=N) * 0.1).astype(np.float32)
    m = (rng.normal(size=N) * 0.05).astype(np.float32)
    lut = m[:, None] + s[:, None] * np.arange(4, dtype=np.float32)
    w = nnlin.AnyPrecLinear(
        qweight=jnp.asarray(pack_bitplanes(codes, bits)),
        luts={bits: jnp.asarray(lut)}, precision=bits,
        out_features=N, in_features=K)
    w = nnlin.with_kernel_layout(w)
    assert w.srow is not None
    w8 = nnlin.with_act8(w)
    assert w8.act_bits == 8 and w8.qwords_u8 is not None
    np.testing.assert_array_equal(
        np.asarray(w8.qwords_u8), pack_lane_tiled_u8(codes, bits))
