"""Pack/unpack round-trip property tests (reference's pack_single_weight /
unpack_single_weight pair, any_precision/quantization/pack.py:304-347, is the
model for this suite)."""

import numpy as np
import pytest

from guidedquant_tpu.ops.pack import (
    pack_bitplanes, unpack_bitplanes, unpack_bitplanes_np,
    pack_interleaved, unpack_interleaved_np, planes_to_interleaved,
)


@pytest.mark.parametrize("bits", [1, 2, 3, 4, 6, 8])
def test_bitplane_roundtrip(bits, rng):
    N, K = 16, 128
    codes = rng.integers(0, 2 ** bits, size=(N, K), dtype=np.uint8)
    q = pack_bitplanes(codes, bits)
    assert q.shape == (bits, N, K // 32)
    assert q.dtype == np.int32
    np.testing.assert_array_equal(unpack_bitplanes_np(q, bits), codes)
    np.testing.assert_array_equal(np.asarray(unpack_bitplanes(q, bits)), codes)


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_msb_prefix_property(bits, rng):
    """First b planes of a (bits)-bit pack give the b-bit MSB prefix code."""
    N, K = 4, 64
    codes = rng.integers(0, 2 ** bits, size=(N, K), dtype=np.uint8)
    q = pack_bitplanes(codes, bits)
    for b in range(1, bits + 1):
        expect = codes >> (bits - b)
        np.testing.assert_array_equal(unpack_bitplanes_np(q[:b], b), expect)


@pytest.mark.parametrize("bits", [1, 2, 4, 8])
def test_interleaved_roundtrip(bits, rng):
    N, K = 8, 256
    codes = rng.integers(0, 2 ** bits, size=(N, K), dtype=np.uint8)
    w = pack_interleaved(codes, bits)
    assert w.shape == (N, K * bits // 32)
    np.testing.assert_array_equal(unpack_interleaved_np(w, bits), codes)


@pytest.mark.parametrize("bits", [2, 4])
def test_planes_to_interleaved(bits, rng):
    N, K = 8, 128
    codes = rng.integers(0, 2 ** bits, size=(N, K), dtype=np.uint8)
    q = pack_bitplanes(codes, bits)
    w = planes_to_interleaved(q, bits)
    np.testing.assert_array_equal(unpack_interleaved_np(w, bits), codes)
