"""Pallas TPU kernels: fused any-precision LUT decode + matmul.

TPU-native replacement for the reference's ``matmul_kbit_32`` CUDA kernel
(``inference/ap_gemv/anyprec.cu:373-620``). The CUDA kernel's warp-shuffle
bit-transpose + shared-memory byte LUT have no TPU analog; instead:

- **Lane-tiled word layout** (replaces the reference's warp byte permutation,
  ``pack.py:12-83``): within each row and each TILE_K-lane tile, the code for
  lane position p lives in word ``p % W`` at bit offset ``bits * (p // W)``,
  with ``W = TILE_K * bits / 32`` chosen so W == 128 (one full lane register
  of words). Decoding a whole tile is then
      jnp.tile(words, 32/bits) >> (bits * (lane // W))  &  mask
  — one concat-broadcast, one shift-by-vector and one mask on the VPU. No
  byte shuffles, no gathers.
- **Polynomial LUT resolve**: the per-row 2^b-entry codebook is applied as an
  exact interpolating polynomial in the code value (Horner, per-row
  coefficients precomputed in f64 at load time; 4-bit uses a 2-D
  tensor-product basis in the two 2-bit crumbs so evaluation stays
  numerically tame). This avoids per-lane gathers *and* i1 select layouts
  (which this Mosaic version cannot relayout); it costs 2^b-1 FMAs/lane.
- The dequantized bf16 tile feeds an MXU ``dot_general`` against the
  activations; f32 accumulation over k-tiles.

The packed operand is produced by ``pack_lane_tiled`` at load time from the
canonical bit-plane checkpoint format.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_WORDS = 128  # W: words per lane-tile (one full lane register)
KERNEL_BITS = (1, 2, 3, 4, 5, 6, 7, 8)  # widths with a fused exact-poly
# kernel (generic tensor-product resolve below). NOTE the pass count is
# ~2^bits broadcast FMAs — at 7-8 bits the kernel exists for completeness
# (serving arbitrary LUTs at every width, reference anyprec.cu:373-620)
# but the affine family / dequant paths may win; see PERF_NOTES.

# Exact-poly RESOLVE basis: the b-bit code is split MSB-first into <=2-bit
# variables and the per-row LUT becomes a tensor-product interpolating
# polynomial sum_I A[I] * prod_d v_d^{i_d} (each variable has nodes
# {0..3}, so the Vandermonde solves stay well-conditioned in f32 — a
# single degree-(2^b - 1) monomial fit would be unusable past ~4 bits).
# Independent of FIELD_SPLIT (the *packing* layout).
RESOLVE_SPLIT = {1: (1,), 2: (2,), 3: (2, 1), 4: (2, 2), 5: (2, 2, 1),
                 6: (2, 2, 2), 7: (2, 2, 2, 1), 8: (2, 2, 2, 2)}


def _resolve_node_map(f: int):
    """(mul, add) affine map sending variable values {0..2^f-1} to centered
    nodes in [-1, 1] (e.g. f=2: {-1,-1/3,1/3,1}). Monomial coefficients
    over raw nodes {0..3} compound ~10x growth per tensor axis — f32
    rounding reaches 0.26 abs err at 8 bits; centered nodes keep the
    full 4-axis product at ~1e-5 (measured)."""
    D = 1 << f
    s = max((D - 1) / 2.0, 1.0)
    return 1.0 / s, -(D - 1) / (2.0 * s)

# Bit-widths without a native 32/bits word packing are composed of
# power-of-two *fields*, MSB-first (any-precision property preserved:
# the 2-bit field of a 3-bit code is its 2-bit parent code). Each field
# is lane-tiled independently at a common TILE_K; the kernel decodes each
# field and combines c = sum_i c_i << shift_i. The CUDA reference instead
# templates a bespoke bit-transposer per width (anyprec.cu:17-292); on
# TPU field composition reuses one decode form at +1 VPU pass per extra
# field.
FIELD_SPLIT = {1: (1,), 2: (2,), 3: (2, 1), 4: (4,), 5: (4, 1),
               6: (4, 2), 7: (4, 2, 1), 8: (8,)}
AFFINE_BITS = tuple(FIELD_SPLIT)  # widths served by the affine kernel


def fields_for(bits: int):
    return FIELD_SPLIT[bits]


def tile_k_for(bits: int) -> int:
    """Common TILE_K: every field's words-per-tile W_f = TILE_K*f/32 is a
    multiple of LANE_WORDS (clean lane dims for Mosaic)."""
    return LANE_WORDS * 32 // min(FIELD_SPLIT[bits])


# ---------------------------------------------------------------------------
# Layout: pack / unpack (numpy; done once at model load)
# ---------------------------------------------------------------------------

def _pack_field(codes: np.ndarray, f: int, TK: int) -> np.ndarray:
    """codes [N, K] of an f-bit field -> int32 [N, K*f/32] lane-tiled at
    tile size TK (W_f = TK*f/32 words per row per k-tile)."""
    per_word = 32 // f
    W = TK * f // 32
    N, K = codes.shape
    assert K % TK == 0, f"K={K} must be padded to a multiple of {TK}"
    n_tiles = K // TK
    # [N, T, TK] -> split lane index p = b*W + j  (b: bit-slot, j: word)
    c = codes.reshape(N, n_tiles, per_word, W).astype(np.uint32)
    shifts = (np.arange(per_word, dtype=np.uint32) * f)[None, None, :, None]
    words = (c << shifts).sum(axis=2, dtype=np.uint32)  # [N, T, W]
    return words.reshape(N, n_tiles * W).view(np.int32)


def split_fields(codes: np.ndarray, bits: int):
    """MSB-first field split, e.g. 3-bit c -> (c>>1 [2-bit], c&1 [1-bit])."""
    out, rem = [], bits
    for f in FIELD_SPLIT[bits]:
        rem -= f
        out.append(((codes >> rem) & ((1 << f) - 1)).astype(np.uint8))
    return out


def pack_lane_tiled(codes: np.ndarray, bits: int):
    """codes [N, K] -> lane-tiled kernel operand.

    Single-field widths (1/2/4/8/16) return one int32 [N, K*bits/32] array;
    composite widths (3/5/6/7) return a tuple of per-field arrays.
    K must be a multiple of tile_k_for(bits) (pad first).
    """
    if bits == 16:
        return _pack_field(codes, 16, LANE_WORDS * 2)
    fs = FIELD_SPLIT[bits]
    TK = tile_k_for(bits)
    if len(fs) == 1:
        return _pack_field(codes, bits, TK)
    return tuple(_pack_field(c, f, TK)
                 for c, f in zip(split_fields(codes, bits), fs))


def _unpack_field_np(words: np.ndarray, f: int, TK: int, K: int) -> np.ndarray:
    per_word = 32 // f
    W = TK * f // 32
    N = words.shape[0]
    w = words.view(np.uint32).reshape(N, -1, W)
    shifts = (np.arange(per_word, dtype=np.uint32) * f)[None, None, :, None]
    c = (w[:, :, None, :] >> shifts) & np.uint32((1 << f) - 1)
    return c.reshape(N, -1)[:, :K].astype(np.uint8)


def unpack_lane_tiled_np(words, bits: int, K: int) -> np.ndarray:
    fs = FIELD_SPLIT[bits]
    TK = tile_k_for(bits)
    if len(fs) == 1:
        return _unpack_field_np(words, bits, TK, K)
    out, rem = None, bits
    for w_f, f in zip(words, fs):
        rem -= f
        c = _unpack_field_np(w_f, f, TK, K).astype(np.uint8)
        out = (c << rem) if out is None else out | (c << rem)
    return out


def unpack_lane_tiled(words, bits: int, K: int) -> jnp.ndarray:
    """Traceable (XLA) lane-tiled decode: words -> codes [N, K] int32.

    The jnp mirror of ``unpack_lane_tiled_np`` — lets the prefill/dequant
    path run straight off the kernel operand (no bit-plane checkpoint
    needed on device).
    """
    fs = FIELD_SPLIT[bits]
    TK = tile_k_for(bits)
    words_t = words if isinstance(words, (tuple, list)) else (words,)

    def one(w_f, f):
        per_word = 32 // f
        W = TK * f // 32
        N = w_f.shape[0]
        w = w_f.reshape(N, -1, 1, W)
        sh = (jnp.arange(per_word, dtype=jnp.int32) * f)[None, None, :, None]
        c = lax.shift_right_logical(w, jnp.broadcast_to(sh, w.shape[:2]
                                                        + (per_word, W)))
        return (c & ((1 << f) - 1)).reshape(N, -1)[:, :K]

    out, rem = None, bits
    for w_f, f in zip(words_t, fs):
        rem -= f
        c = one(w_f, f)
        if rem:
            c = c << rem
        out = c if out is None else out | c
    return out


def pad_to_tiles(codes: np.ndarray, bits: int):
    """Zero-pad K to a TILE_K multiple; returns (padded codes, K_pad)."""
    TK = tile_k_for(bits)
    N, K = codes.shape
    K_pad = ((K + TK - 1) // TK) * TK
    if K_pad != K:
        codes = np.concatenate(
            [codes, np.zeros((N, K_pad - K), codes.dtype)], axis=1)
    return codes, K_pad


# ---------------------------------------------------------------------------
# LUT -> interpolating-polynomial coefficients (numpy f64, per row)
# ---------------------------------------------------------------------------

def _resolve_vars_np(codes: np.ndarray, bits: int):
    """MSB-first RESOLVE_SPLIT variables of the combined codes, mapped to
    the centered nodes (f64)."""
    out, rem = [], bits
    for f in RESOLVE_SPLIT[bits]:
        rem -= f
        mul, add = _resolve_node_map(f)
        v = ((codes >> rem) & ((1 << f) - 1)).astype(np.float64)
        out.append(v * mul + add)
    return out


def lut_to_poly(lut: np.ndarray, bits: int) -> np.ndarray:
    """[N, 2^bits] LUT values -> [N, 2^bits] polynomial coefficients.

    Tensor-product interpolating polynomial over the RESOLVE_SPLIT
    variables (MSB-first):  w(c) = sum_I A[I] * prod_d v_d^{i_d},
    A = L x_d V_d^{-1} with V_d the (<=4-point) Vandermonde of variable d.
    Exact at every code value; computed in f64. Flat coefficient layout is
    row-major over (i_1, ..., i_D) — e.g. bits=3: A[2i+j] hi^i lo^j.
    """
    lut64 = np.asarray(lut, np.float64)
    N, C = lut64.shape
    fs = RESOLVE_SPLIT[bits]
    dims = tuple(1 << f for f in fs)
    A = lut64.reshape((N,) + dims)
    for ax, (f, D) in enumerate(zip(fs, dims)):
        mul, add = _resolve_node_map(f)
        nodes = np.arange(D, dtype=np.float64) * mul + add
        V = np.vander(nodes, D, increasing=True)
        Vi = np.linalg.inv(V)
        # contract axis ax+1 with Vi: A'[.., i, ..] = sum_h Vi[i, h] A[.., h, ..]
        A = np.moveaxis(np.tensordot(A, Vi, axes=([ax + 1], [1])), -1, ax + 1)
    return np.ascontiguousarray(A.reshape(N, C), dtype=np.float32)


def poly_eval_np(coef: np.ndarray, codes: np.ndarray, bits: int) -> np.ndarray:
    """Oracle for the in-kernel evaluation (nested Horner, f64)."""
    fs = RESOLVE_SPLIT[bits]
    dims = tuple(1 << f for f in fs)
    N = coef.shape[0]
    A = coef.reshape((N,) + dims).astype(np.float64)
    vs = _resolve_vars_np(codes, bits)

    def ev(Asub, d):
        if d == len(fs):
            return Asub[:, None]  # [N, 1] broadcast over K
        out = None
        for i in range(dims[d] - 1, -1, -1):
            gi = ev(Asub[:, i], d + 1)
            out = gi if out is None else out * vs[d] + gi
        return out

    return ev(A, 0)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _decode_codes(w_ref, bits: int, tile_k: int):
    per_word = 32 // bits
    words = w_ref[:]  # [TN, W] int32, W = tile_k*bits/32
    W = words.shape[1]
    tiled = jnp.tile(words, (1, per_word))  # [TN, TK]; lane p -> word p % W
    shift = (lax.broadcasted_iota(jnp.int32, (1, tile_k), 1) // W) * bits
    codes = lax.shift_right_logical(tiled, jnp.broadcast_to(shift, tiled.shape))
    return codes & ((1 << bits) - 1)


def _decode_fields(w_refs, bits: int, tile_k: int):
    """Decode + combine the MSB-first field words -> int codes [TN, TK]."""
    fs = FIELD_SPLIT[bits]
    out, rem = None, bits
    for w_ref, f in zip(w_refs, fs):
        rem -= f
        c = _decode_codes(w_ref, f, tile_k)
        if rem:
            c = c << rem
        out = c if out is None else out | c
    return out


def _poly_resolve(codes, coef_ref, bits: int):
    """codes [TN, TK] int32 -> dequantized f32 tile via per-row nested
    Horner over the RESOLVE_SPLIT variables (~2^bits broadcast FMA passes;
    statically unrolled). e.g. bits=3: w = Horner_hi(A[2i] + A[2i+1]*lo),
    ~7 passes; bits=5 ((2,2,1)): ~31; bits=8 ((2,2,2,2)): ~255 — see
    KERNEL_BITS note for the 7-8-bit economics."""
    fs = RESOLVE_SPLIT[bits]
    dims = tuple(1 << f for f in fs)
    # variables MSB-first from the combined codes, mapped to the centered
    # nodes (one FMA per variable; keeps f32 coefficients well-conditioned)
    vs, rem = [], bits
    for f in fs:
        rem -= f
        v = lax.shift_right_logical(codes, rem) & ((1 << f) - 1) if rem \
            else codes & ((1 << f) - 1)
        mul, add = _resolve_node_map(f)
        vs.append(v.astype(jnp.float32) * jnp.float32(mul)
                  + jnp.float32(add))

    def ev(flat, d):
        if d == len(fs):
            return coef_ref[:, flat][:, None]
        out = None
        for i in range(dims[d] - 1, -1, -1):
            gi = ev(flat * dims[d] + i, d + 1)
            out = gi if out is None else out * vs[d] + gi
        return out

    return ev(0, 0)


def _lut_matmul_kernel(x_ref, coef_ref, *rest, bits: int,
                       tile_n: int, tile_k: int):
    """Grid (N/tile_n, K_pad/tile_k); accumulates over the k axis.

    x_ref    [B, tile_k]      bf16 (zero-padded past K)
    rest[:-1]                 per-field int32 lane-tiled words
                              [tile_n, W_f] (one array for 1/2/4-bit,
                              (2-bit, 1-bit) pair for the 3-bit kernel)
    coef_ref [tile_n, 2^bits] f32 polynomial coefficients
    o_ref    [B, tile_n]      f32 accumulator
    """
    o_ref = rest[-1]
    w_refs = rest[:-1]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    codes = _decode_fields(w_refs, bits, tile_k)
    w = _poly_resolve(codes, coef_ref, bits).astype(jnp.bfloat16)
    o_ref[:] += lax.dot_general(
        x_ref[:], w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _widebit_tile_n(N: int, tile_n: int, bits: int, TK: int) -> int:
    """VMEM guard for the wide-bit resolve: it holds
    len(RESOLVE_SPLIT)+2 [tile_n, TK] f32 temporaries on the Mosaic
    stack; tile_n=256 at TK=4096 blows the 16 MB scoped-vmem limit
    (measured OOM at bits=7). Clamp to the largest divisor of N <= 128
    (prefer sublane-aligned multiples of 8) for ANY N > 128, including
    row counts not divisible by 128 (ADVICE r4)."""
    if bits < 5 or TK < 4096 or tile_n <= 128:
        return tile_n
    t = next((d for d in range(128, 7, -8) if N % d == 0), None)
    return t or next(d for d in range(128, 0, -1) if N % d == 0)


@functools.partial(jax.jit, static_argnames=("bits", "tile_n"))
def lut_matmul_tiled(x: jnp.ndarray, words, coef: jnp.ndarray,
                     bits: int, tile_n: int = 256) -> jnp.ndarray:
    """y[B, N] = x[B, K_pad] @ decode(words)^T with per-row poly coefficients.

    words: [N, K_pad*bits/32] lane-tiled (or the per-field tuple from
    pack_lane_tiled for the composite 3-bit width);
    coef: [N, 2^bits] from lut_to_poly.
    """
    words_t = words if isinstance(words, (tuple, list)) else (words,)
    fs = FIELD_SPLIT[bits]
    B, K_pad = x.shape
    N = words_t[0].shape[0]
    TK = tile_k_for(bits)
    tile_n = _widebit_tile_n(N, tile_n, bits, TK)
    Ws = [TK * f // 32 for f in fs]
    n_ktiles = words_t[0].shape[1] // Ws[0]
    assert K_pad == n_ktiles * TK, (K_pad, n_ktiles, TK)
    assert N % tile_n == 0, (N, tile_n)
    C = 2 ** bits

    def _wspec(W_f):
        return pl.BlockSpec((tile_n, W_f), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)

    grid = (N // tile_n, n_ktiles)
    out = pl.pallas_call(
        functools.partial(_lut_matmul_kernel, bits=bits, tile_n=tile_n,
                          tile_k=TK),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, TK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, C), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [_wspec(W_f) for W_f in Ws],
        out_specs=pl.BlockSpec((B, tile_n), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K_pad + (C + 2) * N * K_pad,
            bytes_accessed=N * K_pad * bits // 8 + N * C * 4 + B * K_pad * 2,
            transcendentals=0),
    )(x.astype(jnp.bfloat16), coef.astype(jnp.float32), *words_t)
    return out


# ---------------------------------------------------------------------------
# Shared-shape kernel: per-row-tile scalar polynomial (no per-row broadcast)
#
# Decode cost on the VPU is pass-count bound (~4.3us per elementwise pass
# over a 4096^2 tile on v5e); the exact per-row Horner pays 3 broadcast-FMA
# passes. If the codebooks of a row tile share one *shape* (each row's LUT
# is an affine transform m_n + s_n * g_tile(c) of a tile-shared 4-vector),
# the Horner coefficients become SMEM scalars, and the per-row affine lands
# in a cheap [1, N] epilogue: measured 29us vs 35us (exact) vs 46us (bf16)
# for a 4096^2 2-bit GEMV. The LNQ solver can restrict its codebook update
# to this family (solvers.lnq.restrict_shared_shape), making the fast
# kernel exact.
# ---------------------------------------------------------------------------

def fit_shared_shape(lut: np.ndarray, rows_per_tile: int):
    """Fit lut [N, C] ~= m[:, None] + s[:, None] * g[tile] via alternating
    least squares per row tile (vectorized over tiles).
    Returns (g [T, C], s [N], m [N], relerr)."""
    lut = np.asarray(lut, np.float64)
    N, C = lut.shape
    assert N % rows_per_tile == 0
    T = N // rows_per_tile
    rows = lut.reshape(T, rows_per_tile, C)
    m = rows.mean(axis=2)  # [T, R]
    ctr = rows - m[..., None]  # [T, R, C]
    g = ctr.mean(axis=1)  # [T, C]
    fallback = np.arange(C, dtype=np.float64) - (C - 1) / 2
    weak = np.abs(g).max(axis=1) < 1e-12
    g[weak] = fallback
    for _ in range(8):
        gn = g / np.maximum(np.sqrt((g ** 2).mean(axis=1, keepdims=True)),
                            1e-12)
        den_g = np.maximum((gn ** 2).sum(axis=1, keepdims=True), 1e-12)
        s = np.einsum("trc,tc->tr", ctr, gn) / den_g  # [T, R]
        num = np.einsum("tr,trc->tc", s, ctr)
        den = np.maximum((s ** 2).sum(axis=1, keepdims=True), 1e-12)
        g = num / den
    gn = g / np.maximum(np.sqrt((g ** 2).mean(axis=1, keepdims=True)), 1e-12)
    den_g = np.maximum((gn ** 2).sum(axis=1, keepdims=True), 1e-12)
    s = np.einsum("trc,tc->tr", ctr, gn) / den_g
    approx = m[..., None] + s[..., None] * gn[:, None, :]
    relerr = float(np.linalg.norm(approx - rows) /
                   max(np.linalg.norm(lut), 1e-12))
    return (gn.astype(np.float32), s.reshape(N).astype(np.float32),
            m.reshape(N).astype(np.float32), relerr)


def shape_to_poly(g: np.ndarray, bits: int) -> np.ndarray:
    """Shared shapes [T, C] -> monomial coefficients [T, C] (f64 solve)."""
    C = g.shape[1]
    assert C == 2 ** bits and bits <= 2
    V = np.vander(np.arange(C, dtype=np.float64), C, increasing=True)
    return np.linalg.solve(V, np.asarray(g, np.float64).T).T.astype(np.float32)


def _shared_kernel(x_ref, w_ref, g_ref, o_ref, *, bits: int, tile_n: int,
                   tile_k: int):
    """g_ref: [T, C] SMEM scalar shape-poly coefficients (whole array)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    codes = _decode_codes(w_ref, bits, tile_k)
    cf = codes.astype(jnp.float32)
    C = 2 ** bits
    w = jnp.full(cf.shape, g_ref[i, C - 1], jnp.float32)
    for c in range(C - 2, -1, -1):
        w = w * cf + g_ref[i, c]
    o_ref[:] += lax.dot_general(
        x_ref[:], w.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("bits", "tile_n"))
def lut_matmul_shared(x: jnp.ndarray, words: jnp.ndarray, gpoly: jnp.ndarray,
                      srow: jnp.ndarray, mrow: jnp.ndarray, bits: int,
                      tile_n: int = 512) -> jnp.ndarray:
    """y[B, N] with row-tile-shared codebook shapes.

    words [N, K_pad*bits/32]; gpoly [N/tile_n, 2^bits] (shape_to_poly of the
    tile shapes); srow/mrow [N].  y_n = m_n * sum(x) + s_n * (G x)_n.
    """
    B, K_pad = x.shape
    N = words.shape[0]
    TK = tile_k_for(bits)
    n_ktiles = words.shape[1] // LANE_WORDS
    assert K_pad == n_ktiles * TK
    assert N % tile_n == 0 and gpoly.shape[0] == N // tile_n
    C = 2 ** bits

    # SMEM blocks need the sublane dim to be a multiple of 8 (or the full
    # array); pad the tile axis — the kernel only reads rows < N//tile_n.
    T = gpoly.shape[0]
    T_pad = ((T + 7) // 8) * 8
    if T_pad != T:
        gpoly = jnp.pad(gpoly, ((0, T_pad - T), (0, 0)))

    gx = pl.pallas_call(
        functools.partial(_shared_kernel, bits=bits, tile_n=tile_n,
                          tile_k=TK),
        grid=(N // tile_n, n_ktiles),
        in_specs=[
            pl.BlockSpec((B, TK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, LANE_WORDS), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_pad, C), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((B, tile_n), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
    )(x.astype(jnp.bfloat16), words, gpoly)
    sx = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)  # [B, 1]
    return gx * srow[None, :] + sx * mrow[None, :]


# ---------------------------------------------------------------------------
# Affine kernel: per-row uniform grid  L_n[c] = m_n + s_n * c
#
# The decode needs NO in-kernel LUT resolve at all: the MXU consumes the raw
# code values (cast to bf16) and the per-row affine lands in an O(N)
# epilogue:  y_n = s_n * (C x)_n + m_n * sum(x).  That is the measured VPU
# floor (tile + shift + mask + cast + dot ~= 15 us vs 44 us dense bf16 at
# 4096^2 — 2.9x, where the exact per-row-LUT kernel is pass-bound at ~1.8x).
# Uniform per-row grids are exactly what RTN / GPTQ / SpinQuant W2-W4
# produce, and LNQ can solve within the family (solvers.lnq
# codebook_family="affine").
# ---------------------------------------------------------------------------

def fit_affine(lut: np.ndarray):
    """Fit lut [N, C] ~= m[:, None] + s[:, None] * arange(C) per row (LS).

    Returns (s [N], m [N], relerr)."""
    lut64 = np.asarray(lut, np.float64)
    N, C = lut64.shape
    j = np.arange(C, dtype=np.float64)
    jc = j - j.mean()
    s = (lut64 * jc).sum(1) / (jc ** 2).sum()
    m = lut64.mean(1) - s * j.mean()
    approx = m[:, None] + s[:, None] * j
    relerr = float(np.linalg.norm(approx - lut64) /
                   max(np.linalg.norm(lut64), 1e-12))
    return s.astype(np.float32), m.astype(np.float32), relerr


def _affine_kernel(x_ref, sumx_ref, s_ref, m_ref, *rest, bits: int,
                   tile_k: int, n_jsteps: int, block_k: int):
    """Code-dot with the per-row affine epilogue fused in-kernel.

    o_ref (f32) accumulates the raw code-dot over k-tiles; at the last
    k-tile the epilogue y = acc*s + sumx*m is applied in place — no
    separate XLA epilogue ops per linear. Each grid step covers ``block_k``
    lane tiles (statically unrolled) — fewer grid-boundary pipeline bubbles
    than one tile per step.

    Grid is (B/tile_b, N/tile_n, n_jsteps); the decode path runs with a
    single batch block, the prefill GEMM path tiles the batch.
    """
    o_ref = rest[-1]
    w_refs = rest[:-1]
    j = pl.program_id(2)
    fs = FIELD_SPLIT[bits]

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = None
    for t in range(block_k):
        w_sub = [w_ref[:, t * (tile_k * f // 32):(t + 1) * (tile_k * f // 32)]
                 for w_ref, f in zip(w_refs, fs)]
        codes = _decode_fields(w_sub, bits, tile_k).astype(jnp.bfloat16)
        d = lax.dot_general(x_ref[:, t * tile_k:(t + 1) * tile_k], codes,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    o_ref[:] += acc

    @pl.when(j == n_jsteps - 1)
    def _():
        o_ref[:] = o_ref[:] * s_ref[:] + sumx_ref[:] * m_ref[:]


@functools.partial(jax.jit, static_argnames=("bits", "tile_n", "block_k",
                                             "tile_b"))
def lut_matmul_affine(x: jnp.ndarray, words, srow: jnp.ndarray,
                      mrow: jnp.ndarray, bits: int,
                      tile_n: int = 256, block_k: int = 0,
                      tile_b: int = 0) -> jnp.ndarray:
    """y[B, N] = x @ (m + s*codes)^T: code-dot kernel, affine epilogue fused.

    ``words``: one array for single-field widths, or the per-field tuple
    from pack_lane_tiled for composite widths (3/5/6/7 bit).
    ``block_k``: lane tiles per grid step (0 = auto: as many as fit a
    ~2 MB decoded tile, evenly dividing the tile count).
    ``tile_b``: batch rows per grid block (0 = all of B in one block —
    the decode path). The prefill GEMM path passes tile_b to stream
    weight tiles across batch blocks; B must then divide by tile_b."""
    words_t = words if isinstance(words, (tuple, list)) else (words,)
    fs = FIELD_SPLIT[bits]
    B, K_pad = x.shape
    N = words_t[0].shape[0]
    TK = tile_k_for(bits)
    Ws = [TK * f // 32 for f in fs]
    n_ktiles = words_t[0].shape[1] // Ws[0]
    assert K_pad == n_ktiles * TK
    assert N % tile_n == 0, (N, tile_n)
    tile_b = tile_b or B
    assert B % tile_b == 0, (B, tile_b)
    if block_k == 0:
        # Measured policy (8B shapes, v5e): when all of K fits one grid
        # step (<= 4096 values decoded per step), a single j-step wins (no
        # pipeline bubbles, e.g. gate_up 87.6 -> 75.0 us at tile_n=512);
        # for long K, 1-tile steps pipeline best (down 14336: 51.9 -> 43.6
        # us). See tools/perf/affine_tune.py.
        block_k = n_ktiles if n_ktiles * TK <= 4096 else 1
    assert n_ktiles % block_k == 0, (n_ktiles, block_k)
    n_jsteps = n_ktiles // block_k

    def _wspec(W_f):
        return pl.BlockSpec((tile_n, block_k * W_f), lambda b, i, j: (i, j),
                            memory_space=pltpu.VMEM)

    sumx = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)  # [B, 1]
    y = pl.pallas_call(
        functools.partial(_affine_kernel, bits=bits, tile_k=TK,
                          n_jsteps=n_jsteps, block_k=block_k),
        grid=(B // tile_b, N // tile_n, n_jsteps),
        in_specs=[pl.BlockSpec((tile_b, block_k * TK),
                               lambda b, i, j: (b, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile_b, 1), lambda b, i, j: (b, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tile_n), lambda b, i, j: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tile_n), lambda b, i, j: (0, i),
                               memory_space=pltpu.VMEM)]
                 + [_wspec(W_f) for W_f in Ws],
        out_specs=pl.BlockSpec((tile_b, tile_n), lambda b, i, j: (b, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K_pad + 5 * N * K_pad * (B // tile_b),
            bytes_accessed=(N * K_pad * bits // 8) * (B // tile_b)
            + B * K_pad * 2 + B * N * 4,
            transcendentals=0),
    )(x.astype(jnp.bfloat16), sumx,
      srow.astype(jnp.float32)[None, :], mrow.astype(jnp.float32)[None, :],
      *words_t)
    return y


GEMM_TILE_B = 256     # batch rows per block on the prefill GEMM path
# Fused-GEMM prefill cap: each batch block re-streams + re-DECODES the
# packed weights, so the fused path trades nb x decode-ALU against
# dequant's 1 x decode + ~4 bytes/weight dense HBM round trip. r4
# measured nb=4 losing at 1B (2085 vs 3291 served tok/s, old serving
# stack); r5 — with the point-write/argmax serving stack — measured
# nb=2 WINNING at 8B/32 (2786 vs 2628 same-day) and tying at 1B
# (7167 vs 7100), so the default cap is TWO batch blocks. Overridable
# for A/B via AFFINE_GEMM_MAX_TOKENS (PERF_NOTES round 5).
GEMM_MAX_TOKENS = int(os.environ.get("AFFINE_GEMM_MAX_TOKENS",
                                     str(2 * GEMM_TILE_B)))


def lut_matmul_affine_flex(x: jnp.ndarray, words,
                           srow: jnp.ndarray, mrow: jnp.ndarray, bits: int,
                           out_features: Optional[int] = None) -> jnp.ndarray:
    """Affine kernel wrapper: x [..., K].

    Decode (B <= MAX_BATCH): one batch block. Prefill (B up to
    GEMM_MAX_TOKENS): batch-tiled GEMM — the same kernel with a batch grid
    axis, streaming packed weight tiles per batch block, so admission-wave
    prefill never materializes a dense weight (VERDICT r2 weak 5)."""
    import os
    words_t = words if isinstance(words, (tuple, list)) else (words,)
    *lead, K = x.shape
    B = int(np.prod(lead)) if lead else 1
    TK = tile_k_for(bits)
    W0 = TK * FIELD_SPLIT[bits][0] // 32
    K_pad = words_t[0].shape[1] // W0 * TK
    x2 = x.reshape(B, K)
    B_pad, tile_b = B, 0
    if B > MAX_BATCH:
        tile_b = min(GEMM_TILE_B, ((B + 7) // 8) * 8)
        B_pad = ((B + tile_b - 1) // tile_b) * tile_b
    if K_pad != K or B_pad != B:
        x2 = jnp.pad(x2, ((0, B_pad - B), (0, K_pad - K)))
    N = words_t[0].shape[0]
    # tile_n=512 measured faster than 256 at every 8B decode shape
    # (qkv 21.5->14.6 us, o 18->15.7, gate_up 87.6->75.0, down 54.3->43.6;
    # tools/perf/affine_tune.py), incl. batched B=8.
    tile_n = (512 if N % 512 == 0 else 256 if N % 256 == 0
              else 128 if N % 128 == 0 else N)
    block_k = int(os.environ.get("AFFINE_BLOCK_K", "0"))  # 0 = auto
    y = lut_matmul_affine(x2, words, srow, mrow, bits, tile_n=tile_n,
                          block_k=block_k, tile_b=tile_b)
    if B_pad != B:
        y = y[:B]
    if out_features is not None and out_features != N:
        y = y[:, :out_features]
    return y.reshape(*lead, -1).astype(x.dtype)


# ---------------------------------------------------------------------------
# W{b}A8 affine kernel: i32-word decode + int8 MXU code-dot
#
# The decoded codes feed the MXU *as int8* against int8-quantized
# activations (2x the bf16 MXU rate — the win scales with batch, i.e. the
# GEMM prefill path); the per-row affine epilogue and the per-token
# activation scale fold into one O(N) epilogue:
#   y_n = (sx * acc_n) * s_n + sum(x) * m_n,   acc = xq . codes  (int32).
# The decode chain itself stays in i32 (tile/shift/mask — the proven
# form): narrow-int ALU would cut the VPU pass cost 4x, but `arith.shrui`
# on u8/i16 FAILS TO LEGALIZE on the current Mosaic stack
# (tools/perf/mosaic_probes.py a/b/f vs the passing c/g) — the u8 packing
# utilities below are retained + tested for newer stacks.
# Numerics: codes are exact; the only approximation is the A8 activation
# quantization (per-token absmax/127) — the same error class as the
# native int8 W4A8 path (nn/act_quant.py), measured near-lossless on the
# real checkpoint (w4a8-spinquant ledger row).
# ---------------------------------------------------------------------------

def _pack_field_u8(codes: np.ndarray, f: int, TK: int) -> np.ndarray:
    """codes [N, K] of an f-bit field -> uint8 [N, K*f/8] byte-lane-tiled:
    within each TK-lane tile the code for lane p lives in byte ``p % W8``
    at bit offset ``f * (p // W8)``, W8 = TK*f/8."""
    per_byte = 8 // f
    W8 = TK * f // 8
    N, K = codes.shape
    assert K % TK == 0, (K, TK)
    n_tiles = K // TK
    c = codes.reshape(N, n_tiles, per_byte, W8).astype(np.uint16)
    shifts = (np.arange(per_byte, dtype=np.uint16) * f)[None, None, :, None]
    words = (c << shifts).sum(axis=2, dtype=np.uint16)
    return words.reshape(N, n_tiles * W8).astype(np.uint8)


def pack_lane_tiled_u8(codes: np.ndarray, bits: int):
    """codes [N, K] -> u8 kernel operand (field tuple for composite bits)."""
    fs = FIELD_SPLIT[bits]
    TK = tile_k_for(bits)
    if len(fs) == 1:
        return _pack_field_u8(codes, bits, TK)
    return tuple(_pack_field_u8(c, f, TK)
                 for c, f in zip(split_fields(codes, bits), fs))


def u8_words_from_packed(words, bits: int):
    """Traceable repack: int32 lane-tiled words -> u8 operand.

    NOT wired into any production path: the shipping w2a8 kernel decodes
    the canonical int32 words (u8 shift/mask fails to legalize on this
    Mosaic stack — tools/perf/mosaic_probes.py a/b/f). Retained + tested
    so a newer stack can bind the u8 operand at weight-bind time without
    changing the stored checkpoint format."""
    words_t = words if isinstance(words, (tuple, list)) else (words,)
    fs = FIELD_SPLIT[bits]
    TK = tile_k_for(bits)
    lead = words_t[0].shape[:-1]  # rowwise transform: leading dims flatten
    W0 = TK * fs[0] // 32
    K_pad = words_t[0].shape[-1] // W0 * TK
    flat = [w_f.reshape(-1, w_f.shape[-1]) for w_f in words_t]
    codes = unpack_lane_tiled(flat[0] if len(flat) == 1 else tuple(flat),
                              bits, K_pad)  # [N, K_pad] combined int32 codes
    N = codes.shape[0]
    out, rem = [], bits
    for f in fs:
        rem -= f
        c = (codes >> rem) & ((1 << f) - 1)
        per_byte = 8 // f
        W8 = TK * f // 8
        cr = c.reshape(N, -1, per_byte, W8)
        sh = (jnp.arange(per_byte, dtype=jnp.int32) * f)[None, None, :, None]
        u8 = jnp.sum(cr << sh, axis=2).astype(jnp.uint8)
        out.append(u8.reshape(*lead, -1))
    return out[0] if len(out) == 1 else tuple(out)


def _affine_w2a8_kernel(x_ref, sx_ref, sumx_ref, s_ref, m_ref, *rest,
                        bits: int, tile_k: int, n_jsteps: int, block_k: int):
    """Int-domain affine code-dot; epilogue folds activation scale + affine.

    x_ref  [tile_b, block_k*tile_k] int8 (per-token absmax-quantized)
    sx_ref/sumx_ref [tile_b, 1] f32; s_ref/m_ref [1, tile_n] f32
    rest[:-1] per-field int32 lane-tiled words [tile_n, block_k*W_f]
    """
    o_ref = rest[-1]
    w_refs = rest[:-1]
    j = pl.program_id(2)
    fs = FIELD_SPLIT[bits]

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = None
    for t in range(block_k):
        w_sub = [w_ref[:, t * (tile_k * f // 32):(t + 1) * (tile_k * f // 32)]
                 for w_ref, f in zip(w_refs, fs)]
        codes = _decode_fields(w_sub, bits, tile_k)
        ci = codes.astype(jnp.int8)  # codes < 2^bits <= 127 for bits <= 7
        d = lax.dot_general(x_ref[:, t * tile_k:(t + 1) * tile_k], ci,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    o_ref[:] += acc.astype(jnp.float32)

    @pl.when(j == n_jsteps - 1)
    def _():
        o_ref[:] = (o_ref[:] * (sx_ref[:] * s_ref[:])
                    + sumx_ref[:] * m_ref[:])


def _a8_quant_kernel(x_ref, xq_ref, sx_ref, sumx_ref):
    xf = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    sx = jnp.maximum(amax, 1e-30) * jnp.float32(1.0 / 127.0)
    xq_ref[:] = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    sx_ref[:] = sx
    sumx_ref[:] = jnp.sum(xf, axis=1, keepdims=True)


# The XLA form of the per-token A8 quantize emits a reduce fusion + an
# elementwise fusion + layout copies per linear (~14 us each over the
# tunnel-profiled trace; 470 us/step at L=8 B=32 — see PERF_NOTES r5
# B=64 trace). The one-pass Pallas form replaces them where it measured
# a win: batched decode 2 <= B <= 32 (same-day 8B steps: B=32 9.994 vs
# 10.314 ms; B=1 a wash 5.154 vs 5.128; B=64 LOSES 17.11 vs 16.45 —
# the single-block [64, 14336] kernel serializes where XLA parallelizes).
# HW-validated exact vs the device XLA path at B in {1, 32, 64}
# (a8_quant_probe.py). A8_QUANT=pallas|xla forces one form everywhere.
_A8_QUANT_DEFAULT = os.environ.get("A8_QUANT", "auto")
_A8_PALLAS_MAX_B = 32


@functools.partial(jax.jit, static_argnames=("interpret",))
def a8_quantize(x: jnp.ndarray, interpret: bool = False):
    """[B, K] -> (xq int8 [B, K], sx f32 [B, 1], sumx f32 [B, 1]) in one
    fused Pallas pass (row absmax -> scale -> int8 codes + row sum)."""
    B, K = x.shape
    return pl.pallas_call(
        _a8_quant_kernel,
        out_shape=(jax.ShapeDtypeStruct((B, K), jnp.int8),
                   jax.ShapeDtypeStruct((B, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1), jnp.float32)),
        interpret=interpret,
    )(x)


def _a8_quant(x: jnp.ndarray):
    """Dispatch: fused Pallas pass on TPU in its measured-win regime
    (auto: 2 <= B <= 32), XLA ops otherwise. Numerics identical on
    device (same round/clip expression; probe-verified)."""
    use_pallas = (_A8_QUANT_DEFAULT == "pallas"
                  or (_A8_QUANT_DEFAULT == "auto"
                      and 2 <= x.shape[0] <= _A8_PALLAS_MAX_B))
    if use_pallas and jax.default_backend() in ("tpu", "axon"):
        return a8_quantize(x)
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    sx = jnp.maximum(amax, 1e-30) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx, jnp.sum(xf, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("bits", "tile_n", "block_k",
                                             "tile_b", "interpret"))
def lut_matmul_affine_w2a8(x: jnp.ndarray, words, srow: jnp.ndarray,
                           mrow: jnp.ndarray, bits: int,
                           tile_n: int = 256, block_k: int = 0,
                           tile_b: int = 0,
                           interpret: bool = False) -> jnp.ndarray:
    """y[B, N] ~= x @ (m + s*codes)^T with int8-quantized activations.

    ``words``: the SAME int32 lane-tiled operand as lut_matmul_affine
    (field tuple for composite widths). bits <= 7 (codes must fit int8)."""
    assert bits <= 7, bits
    words_t = words if isinstance(words, (tuple, list)) else (words,)
    fs = FIELD_SPLIT[bits]
    B, K_pad = x.shape
    N = words_t[0].shape[0]
    TK = tile_k_for(bits)
    Ws = [TK * f // 32 for f in fs]
    n_ktiles = words_t[0].shape[1] // Ws[0]
    assert K_pad == n_ktiles * TK, (K_pad, n_ktiles, TK)
    assert N % tile_n == 0, (N, tile_n)
    tile_b = tile_b or B
    assert B % tile_b == 0, (B, tile_b)
    if block_k == 0:
        block_k = n_ktiles if n_ktiles * TK <= 4096 else 1
    assert n_ktiles % block_k == 0, (n_ktiles, block_k)
    n_jsteps = n_ktiles // block_k

    xq, sx, sumx = _a8_quant(x)

    def _wspec(W_f):
        return pl.BlockSpec((tile_n, block_k * W_f), lambda b, i, j: (i, j),
                            memory_space=pltpu.VMEM)

    y = pl.pallas_call(
        functools.partial(_affine_w2a8_kernel, bits=bits, tile_k=TK,
                          n_jsteps=n_jsteps, block_k=block_k),
        grid=(B // tile_b, N // tile_n, n_jsteps),
        in_specs=[pl.BlockSpec((tile_b, block_k * TK),
                               lambda b, i, j: (b, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile_b, 1), lambda b, i, j: (b, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile_b, 1), lambda b, i, j: (b, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tile_n), lambda b, i, j: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tile_n), lambda b, i, j: (0, i),
                               memory_space=pltpu.VMEM)]
                 + [_wspec(W_f) for W_f in Ws],
        out_specs=pl.BlockSpec((tile_b, tile_n), lambda b, i, j: (b, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K_pad + 2 * N * K_pad * (B // tile_b),
            bytes_accessed=(N * K_pad * bits // 8) * (B // tile_b)
            + B * K_pad + B * N * 4,
            transcendentals=0),
        interpret=interpret,
    )(xq, sx, sumx,
      srow.astype(jnp.float32)[None, :], mrow.astype(jnp.float32)[None, :],
      *words_t)
    return y


def lut_matmul_affine_w2a8_flex(x: jnp.ndarray, words,
                                srow: jnp.ndarray, mrow: jnp.ndarray,
                                bits: int,
                                out_features: Optional[int] = None
                                ) -> jnp.ndarray:
    """W{b}A8 affine wrapper: x [..., K]; mirrors lut_matmul_affine_flex."""
    import os
    words_t = words if isinstance(words, (tuple, list)) else (words,)
    *lead, K = x.shape
    B = int(np.prod(lead)) if lead else 1
    TK = tile_k_for(bits)
    W0 = TK * FIELD_SPLIT[bits][0] // 32
    K_pad = words_t[0].shape[1] // W0 * TK
    x2 = x.reshape(B, K)
    B_pad, tile_b = B, 0
    if B > MAX_BATCH:
        tile_b = min(GEMM_TILE_B, ((B + 7) // 8) * 8)
        B_pad = ((B + tile_b - 1) // tile_b) * tile_b
    if K_pad != K or B_pad != B:
        x2 = jnp.pad(x2, ((0, B_pad - B), (0, K_pad - K)))
    N = words_t[0].shape[0]
    tile_n = (512 if N % 512 == 0 else 256 if N % 256 == 0
              else 128 if N % 128 == 0 else N)
    block_k = int(os.environ.get("AFFINE_BLOCK_K", "0"))
    y = lut_matmul_affine_w2a8(x2, words, srow, mrow, bits,
                               tile_n=tile_n, block_k=block_k, tile_b=tile_b)
    if B_pad != B:
        y = y[:B]
    if out_features is not None and out_features != N:
        y = y[:, :out_features]
    return y.reshape(*lead, -1).astype(x.dtype)


# ---------------------------------------------------------------------------
# BCQ (LUT-GEMM) kernel: sum of per-row-scaled sign planes
#
# TPU-native analog of the reference's ``nqmv_bias``
# (``inference/ap_gemv/lutgemm.cu:24-150``). Each plane b holds signs
# s = 2c - 1 with c in {0,1}; y_n = sum_b alpha_nb (s_b x)_n + bias_n sum(x).
# The kernel computes acc = sum_b alpha_b * (C_b x) with the planes decoded
# by the same lane-tiled 1-bit form as the any-precision kernel; the sign
# correction and row bias fold into an O(N) epilogue:
#   y = 2*acc + (bias - sum_b alpha_b) * sum(x).
# ---------------------------------------------------------------------------

def _bcq_kernel(x_ref, w_ref, alpha_ref, o_ref, *, n_planes: int,
                tile_k: int):
    """w_ref [Bp, tile_n, 128] lane-tiled 1-bit plane words;
    alpha_ref [8-padded Bp, tile_n] f32."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for b in range(n_planes):
        c = _decode_codes(w_ref[b], 1, tile_k).astype(jnp.bfloat16)
        d = lax.dot_general(x_ref[:], c, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        o_ref[:] += d * alpha_ref[b][None, :]


@functools.partial(jax.jit, static_argnames=("tile_n",))
def bcq_matmul(x: jnp.ndarray, words: jnp.ndarray, alpha: jnp.ndarray,
               qbias: jnp.ndarray, tile_n: int = 256) -> jnp.ndarray:
    """y[B, N] = x @ (sum_b alpha_b*(2c_b-1) + qbias)^T.

    words [Bp, N, K_pad/32] lane-tiled 1-bit planes (TK = 4096);
    alpha [N, Bp]; qbias [N].
    """
    B, K_pad = x.shape
    Bp, N, Wtot = words.shape
    TK = tile_k_for(1)
    n_ktiles = Wtot // LANE_WORDS
    assert K_pad == n_ktiles * TK, (K_pad, n_ktiles, TK)
    assert N % tile_n == 0, (N, tile_n)

    # alpha as [Bp, N] f32 with the plane axis padded to a sublane multiple
    at = jnp.transpose(alpha.astype(jnp.float32))  # [Bp, N]
    Bp_pad = ((Bp + 7) // 8) * 8
    if Bp_pad != Bp:
        at = jnp.pad(at, ((0, Bp_pad - Bp), (0, 0)))

    acc = pl.pallas_call(
        functools.partial(_bcq_kernel, n_planes=Bp, tile_k=TK),
        grid=(N // tile_n, n_ktiles),
        in_specs=[
            pl.BlockSpec((B, TK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, tile_n, LANE_WORDS), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp_pad, tile_n), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tile_n), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=(2 * B * N * K_pad + 4 * N * K_pad) * Bp,
            bytes_accessed=N * K_pad * Bp // 8 + B * K_pad * 2 + B * N * 4,
            transcendentals=0),
    )(x.astype(jnp.bfloat16), words, at)
    sumx = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)  # [B, 1]
    row = qbias.astype(jnp.float32) - alpha.astype(jnp.float32).sum(axis=-1)
    return 2.0 * acc + sumx * row[None, :]


def bcq_matmul_flex(x: jnp.ndarray, words: jnp.ndarray, alpha: jnp.ndarray,
                    qbias: jnp.ndarray,
                    out_features: Optional[int] = None) -> jnp.ndarray:
    """BCQ kernel wrapper: x [..., K]."""
    *lead, K = x.shape
    B = int(np.prod(lead)) if lead else 1
    TK = tile_k_for(1)
    K_pad = words.shape[2] // LANE_WORDS * TK
    x2 = x.reshape(B, K)
    if K_pad != K:
        x2 = jnp.pad(x2, ((0, 0), (0, K_pad - K)))
    N = words.shape[1]
    tile_n = 256 if N % 256 == 0 else 128 if N % 128 == 0 else N
    y = bcq_matmul(x2, words, alpha, qbias, tile_n=tile_n)
    if out_features is not None and out_features != N:
        y = y[:, :out_features]
    return y.reshape(*lead, -1).astype(x.dtype)


# ---------------------------------------------------------------------------
# Dispatch API used by nn.linear
# ---------------------------------------------------------------------------

# Decode-path batch bound. The reference's CUDA gemv is hard-capped at
# M<=8 (gemv.cu seq==1 contract, anyprec.cu maxm template); the Pallas
# kernels tile the batch as block rows, so larger serving batches (16/32
# continuous-batching slots) stay on the fused path — past this the MXU
# prefill economics win anyway and dequant+matmul takes over.
MAX_BATCH = 64


def _ntok(x) -> int:
    n = 1
    for s in x.shape[:-1]:
        n *= s
    return n


def supported(x, qwords, bits) -> bool:
    if qwords is None or bits not in AFFINE_BITS:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return _ntok(x) <= MAX_BATCH


def supported_affine(x, qwords, bits) -> bool:
    """The affine kernel additionally serves prefill-sized batches via the
    batch-tiled GEMM path (see lut_matmul_affine_flex)."""
    if qwords is None or bits not in AFFINE_BITS:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return _ntok(x) <= GEMM_MAX_TOKENS


def supported_affine_w2a8(x, qwords, bits) -> bool:
    """W{b}A8 path: i32-word decode + int8 MXU dot (bits <= 7)."""
    if qwords is None or bits not in AFFINE_BITS or bits > 7:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return _ntok(x) <= GEMM_MAX_TOKENS


def lut_matmul_flex(x: jnp.ndarray, words: jnp.ndarray, gpoly: jnp.ndarray,
                    srow: jnp.ndarray, mrow: jnp.ndarray, bits: int,
                    out_features: Optional[int] = None) -> jnp.ndarray:
    """Shared-shape kernel wrapper: x [..., K]; gpoly [N/tile, 2^bits]."""
    *lead, K = x.shape
    B = int(np.prod(lead)) if lead else 1
    TK = tile_k_for(bits)
    K_pad = words.shape[1] // LANE_WORDS * TK
    x2 = x.reshape(B, K)
    if K_pad != K:
        x2 = jnp.pad(x2, ((0, 0), (0, K_pad - K)))
    N = words.shape[0]
    tile_n = N // gpoly.shape[0]
    y = lut_matmul_shared(x2, words, gpoly, srow, mrow, bits, tile_n=tile_n)
    if out_features is not None and out_features != N:
        y = y[:, :out_features]
    return y.reshape(*lead, -1).astype(x.dtype)


def lut_matmul(x: jnp.ndarray, words, coef: jnp.ndarray,
               bits: int, out_features: Optional[int] = None) -> jnp.ndarray:
    """Shape-flexible wrapper: x [..., K], words [N, K_pad*bits/32] (or the
    per-field tuple for the composite 3-bit width)."""
    words_t = words if isinstance(words, (tuple, list)) else (words,)
    *lead, K = x.shape
    B = int(np.prod(lead)) if lead else 1
    TK = tile_k_for(bits)
    W0 = TK * FIELD_SPLIT[bits][0] // 32
    K_pad = words_t[0].shape[1] // W0 * TK
    x2 = x.reshape(B, K)
    if K_pad != K:
        x2 = jnp.pad(x2, ((0, 0), (0, K_pad - K)))
    N = words_t[0].shape[0]
    tile_n = 256 if N % 256 == 0 else 128 if N % 128 == 0 else N
    y = lut_matmul_tiled(x2, words, coef, bits, tile_n=tile_n)
    if out_features is not None and out_features != N:
        y = y[:, :out_features]
    return y.reshape(*lead, -1).astype(x.dtype)
