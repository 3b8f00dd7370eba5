"""Bit-plane packing for any-precision codes.

Analog of the reference packer (``any_precision/quantization/pack.py``):
codes are split MSB-first into bit planes and packed 32-per-int32 word, so
``qweight`` has shape [bits, N, K/32] and *truncating to the first b planes
yields the b-bit code* (the any-precision property — upscaled codebooks are
built by binary splits, so the b-bit code is the b-bit MSB prefix of the
parent code).

The reference additionally applies a CUDA-warp byte permutation
(``pack.py:12-83``, 4 bytes/thread x 32 threads endianness swap); that layout
is meaningless on TPU, so our canonical layout is plain little-endian bit
order within each word: bit t of word j is weight k = 32*j + t. Packing is
vectorized numpy (the reference needs numba for its permutation; we don't).

``unpack_bitplanes`` is traceable jnp and is the correctness oracle for the
fused Pallas decode kernels.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pack_bitplanes(codes: np.ndarray, bits: int) -> np.ndarray:
    """codes [N, K] unsigned ints in [0, 2^bits) -> int32 [bits, N, K/32].

    Plane 0 holds the MSB of each code, plane bits-1 the LSB.
    """
    codes = np.asarray(codes)
    N, K = codes.shape
    assert K % 32 == 0, f"in_features {K} must be a multiple of 32"
    assert codes.min() >= 0 and codes.max() < (1 << bits), "codes out of range"
    codes = codes.astype(np.uint32)
    weights32 = (np.uint32(1) << np.arange(32, dtype=np.uint32))  # little-endian in-word
    planes = np.empty((bits, N, K // 32), dtype=np.uint32)
    for i in range(bits):
        plane_bits = (codes >> np.uint32(bits - 1 - i)) & np.uint32(1)  # MSB first
        planes[i] = (plane_bits.reshape(N, K // 32, 32) * weights32).sum(
            axis=-1, dtype=np.uint32)
    return planes.view(np.int32)


def unpack_bitplanes_np(qweight: np.ndarray, bits: int) -> np.ndarray:
    """Inverse of pack_bitplanes (numpy): -> [N, K] uint8 codes."""
    planes = np.asarray(qweight)[:bits].view(np.uint32)
    b, N, W = planes.shape
    shifts = np.arange(32, dtype=np.uint32)
    out = np.zeros((N, W * 32), dtype=np.uint8)
    for i in range(bits):
        pb = ((planes[i][..., None] >> shifts) & np.uint32(1)).astype(np.uint8)
        out |= pb.reshape(N, W * 32) << (bits - 1 - i)
    return out


def unpack_bitplanes(qweight: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Traceable unpack: int32 [>=bits, N, K/32] -> int32 [N, K] codes."""
    planes = qweight[:bits].astype(jnp.uint32)
    b, N, W = planes.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)
    pb = (planes[..., None] >> shifts) & jnp.uint32(1)  # [b, N, W, 32]
    pb = pb.reshape(b, N, W * 32).astype(jnp.int32)
    weights = (1 << (bits - 1 - jnp.arange(bits, dtype=jnp.int32)))
    return jnp.tensordot(weights, pb, axes=([0], [0]))


# ---------------------------------------------------------------------------
# Interleaved single-array layout for the fused TPU decode kernel.
#
# One int32 word holds 32/bits consecutive codes of one row, code t at bit
# offset bits*t. This lets the Pallas kernel obtain whole codes with a single
# broadcast+shift+mask (3 VPU ops) instead of reassembling planes — the
# TPU-lane-friendly replacement for the reference's warp permutation.
# ---------------------------------------------------------------------------

def pack_interleaved(codes: np.ndarray, bits: int) -> np.ndarray:
    """codes [N, K] -> int32 [N, K // (32//bits)] interleaved words."""
    assert bits in (1, 2, 4, 8, 16), "interleaved layout needs bits | 32"
    per_word = 32 // bits
    N, K = codes.shape
    assert K % per_word == 0
    codes = codes.astype(np.uint32)
    shifts = (np.arange(per_word, dtype=np.uint32) * np.uint32(bits))
    grouped = codes.reshape(N, K // per_word, per_word)
    words = (grouped << shifts).sum(axis=-1, dtype=np.uint32)
    return words.view(np.int32)


def unpack_interleaved_np(words: np.ndarray, bits: int) -> np.ndarray:
    per_word = 32 // bits
    w = np.asarray(words).view(np.uint32)
    N, W = w.shape
    shifts = (np.arange(per_word, dtype=np.uint32) * np.uint32(bits))
    codes = (w[..., None] >> shifts) & np.uint32((1 << bits) - 1)
    return codes.reshape(N, W * per_word).astype(np.uint8)


def planes_to_interleaved(qweight: np.ndarray, bits: int) -> np.ndarray:
    """Convert canonical bit-plane qweight to the kernel layout at load time."""
    return pack_interleaved(unpack_bitplanes_np(qweight, bits), bits)
