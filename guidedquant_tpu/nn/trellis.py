"""QTIP trellis-quantized linear runtime module.

Analog of the reference's ``QuantizedLinear`` + ``BitshiftLinear``
(``qtip/lib/linear/quantized_linear.py:12-154``,
``qtip/lib/codebook/bitshift.py:357-484``): holds the packed trellis,
random sign vectors SU/SV and the global scale; forward is

    y = SV * Wscale * hadU( hadUt(x * SU) @ hatW^T )

with hatW the decoded trellis weights.

Decode paths:
- ``cached``: dense bf16 hatW decoded once at load time (the reference's
  ``cache_hatW``/train-fixW mode, bitshift.py:391-410) — correctness + prefill
  path; no memory savings at runtime.
- ``kwords``: column-cyclic kernel format served by the fused Pallas
  trellis decode+matvec kernel (ops/trellis_kernel.py) on the decode hot
  loop, with a Pallas dequant-to-dense variant for prefill.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
from flax import struct

from ..ops.hadamard import matmul_hadU, matmul_hadUt


@struct.dataclass
class TrellisLinear:
    """Pytree for one (or a stacked [L, ...] set of) trellis-quantized
    linear(s)."""

    trellis: jnp.ndarray          # packed uint16 [(L,) B_tiles, T*K/16]
    SU: jnp.ndarray               # [(L,) n] ±1
    SV: jnp.ndarray               # [(L,) m] ±1
    Wscale: jnp.ndarray           # [(L,)] or scalar
    hatW: Optional[jnp.ndarray] = None  # cached decoded [(L,) m, n] (bf16)
    # column-cyclic kernel-format words [(L,) m/16, n] int32 for the fused
    # Pallas decode+matmul (ops/trellis_kernel.py); requires a compute
    # decode_mode ("2mad"/"tpu2u")
    kwords: Optional[jnp.ndarray] = None
    # trainable per-module k-means table [(L,) 2^tlut_bits, V] for
    # quantlut_sym (the E2E SU/SV/tlut finetune path, reference
    # qtip/quantize_llama/finetune.py:461-548): when set, hatW is decoded
    # traceably from (trellis, tlut) so gradients reach the table.
    tlut: Optional[jnp.ndarray] = None
    cycle: int = struct.field(pytree_node=False, default=256)
    # NOTE: the tlut lives in the BitshiftCodebook (host side); it is shared
    # across layers and must not be a stacked pytree leaf.
    # static config
    L_bits: int = struct.field(pytree_node=False, default=16)
    K: int = struct.field(pytree_node=False, default=2)
    V: int = struct.field(pytree_node=False, default=2)
    tlut_bits: int = struct.field(pytree_node=False, default=9)
    decode_mode: str = struct.field(pytree_node=False, default="quantlut_sym")
    td_x: int = struct.field(pytree_node=False, default=16)
    td_y: int = struct.field(pytree_node=False, default=16)
    out_features: int = struct.field(pytree_node=False, default=0)
    in_features: int = struct.field(pytree_node=False, default=0)


def tiles_to_dense(hat_tiles: np.ndarray, m: int, n: int, td_x: int,
                   td_y: int) -> np.ndarray:
    """[(m/td_x)*(n/td_y), td_x*td_y] row-major tile sequences -> [m, n]."""
    t = hat_tiles.reshape(m // td_x, n // td_y, td_x, td_y)
    return t.transpose(0, 2, 1, 3).reshape(m, n)


def dense_to_tiles(W: np.ndarray, td_x: int, td_y: int) -> np.ndarray:
    m, n = W.shape
    t = W.reshape(m // td_x, td_x, n // td_y, td_y)
    return t.transpose(0, 2, 1, 3).reshape(-1, td_x * td_y)


def decode_trellis_dense(cb, packed: np.ndarray, m: int, n: int,
                         td_x: int, td_y: int) -> np.ndarray:
    """Packed uint16 -> dense [m, n] f32 via host decode (load-time)."""
    T = td_x * td_y
    states = cb.unpack_trellis(packed, T)  # [B_tiles, T/V]
    vals = cb.recons(states.T)             # [V, T/V, B]
    seqs = np.moveaxis(vals, 0, 1).reshape(T, -1).T  # [B, T]
    return tiles_to_dense(seqs, m, n, td_x, td_y)


def decode_2mad_jnp(states: jnp.ndarray) -> jnp.ndarray:
    """Traceable 2mad compute-codebook decode (uint32 LCG hash ->
    pseudo-gaussian; reference bitshift.py:29-40). states int32 >= 0."""
    x = states.astype(jnp.uint32)
    x = x * jnp.uint32(264435761) + jnp.uint32(1013904223)
    # ((x * 1664525) >> 32) + x  in 64-bit; emulate the high half via
    # 16-bit split multiplies (TPU has no 64-bit ints)
    # high 32 bits of x * 1664525 via 16-bit limbs (no 64-bit ints on TPU)
    al = jnp.uint32(1664525 & 0xFFFF)
    ah = jnp.uint32(1664525 >> 16)
    xl = x & jnp.uint32(0xFFFF)
    xh = x >> jnp.uint32(16)
    p0 = xl * al
    mid = xl * ah + xh * al + (p0 >> jnp.uint32(16))
    hi = xh * ah + (mid >> jnp.uint32(16))
    x = hi + x
    y = ((x & jnp.uint32(255)) + ((x >> jnp.uint32(8)) & jnp.uint32(255))
         + ((x >> jnp.uint32(16)) & jnp.uint32(255))
         + ((x >> jnp.uint32(24)) & jnp.uint32(255)))
    return (y.astype(jnp.float32) - 510.0) / 147.800537109375


def unpack_trellis_states_jnp(packed: jnp.ndarray, T: int, L: int, K: int,
                              V: int) -> jnp.ndarray:
    """Traceable state extraction via the sliding-window property: state i is
    bits [i*KV, i*KV+L) of the (wrapped) bitstream (what the reference's
    decode_compressed kernel emulation does, kernel_decompress.py)."""
    KV = K * V
    assert (T * K * V // V) % 16 == 0, "bitstream must fill whole words"
    w = packed.astype(jnp.uint32) & jnp.uint32(0xFFFF)  # uint16 words
    Tv = T // V
    starts = jnp.arange(Tv, dtype=jnp.uint32) * jnp.uint32(KV)
    word_idx = (starts // 16).astype(jnp.int32)
    bit_off = starts % 16
    # two consecutive words cover any window (bit_off + L <= 30 for L<=16,
    # KV>=2); tail windows wrap to the stream start (tail-biting)
    wpad = jnp.concatenate([w, w[:, :2]], axis=1)
    w0 = jnp.take(wpad, word_idx, axis=1)       # [B, Tv]
    w1 = jnp.take(wpad, word_idx + 1, axis=1)
    stream32 = (w0 << jnp.uint32(16)) | w1
    shifted = (stream32 << bit_off[None, :]) & jnp.uint32(0xFFFFFFFF)
    states = shifted >> jnp.uint32(32 - L)
    return states.astype(jnp.int32)  # [B, Tv]


from functools import lru_cache


@lru_cache(maxsize=8)
def _quantlut_tables(L: int, tlut_bits: int):
    """Static (idx, sign) tables of the quantlut_sym hash (codebook
    _hash_lut_index); cached per (L, tlut_bits) at module scope (an
    inner lru_cache would be recreated — and thus miss — on every call)."""
    from ..solvers.qtip.codebook import _hash_lut_index
    idx, sflip = _hash_lut_index(L, tlut_bits, sym=True)
    return (np.asarray(idx, np.int32), np.asarray(sflip, np.float32))


def decode_tlut_dense_jnp(w: TrellisLinear) -> jnp.ndarray:
    """Traceable dense decode as a function of the trainable tlut leaf
    (quantlut_sym): states -> hashed index -> tlut gather -> sign flip.
    Gradients flow to w.tlut."""
    assert w.decode_mode == "quantlut_sym", w.decode_mode
    T = w.td_x * w.td_y
    states = unpack_trellis_states_jnp(w.trellis, T, w.L_bits, w.K, w.V)
    idx_t, sflip_t = _quantlut_tables(w.L_bits, w.tlut_bits)
    idx = jnp.take(jnp.asarray(idx_t), states)          # [B_tiles, Tv]
    sflip = jnp.take(jnp.asarray(sflip_t), states)
    vals = jnp.take(w.tlut, idx, axis=0)                # [B_tiles, Tv, V]
    vals = vals.at[..., 0].multiply(sflip)
    tiles = vals.reshape(-1, T)                         # (tv, v) row-major
    m, n = w.out_features, w.in_features
    t4 = tiles.reshape(m // w.td_x, n // w.td_y, w.td_x, w.td_y)
    return t4.transpose(0, 2, 1, 3).reshape(m, n)


def apply_trellis(w: TrellisLinear, x: jnp.ndarray) -> jnp.ndarray:
    """Forward. Decode-path priority (mirrors the reference's kernel
    dispatch, qtip/lib/linear/quantized_linear.py:445-455):

    0. trainable tlut leaf -> traceable tlut decode (E2E finetune path);
    1. column-cyclic kernel words, tokens <= trellis_kernel.MAX_BATCH ->
       fused Pallas decode+matvec in ONE batch block (the decode hot loop);
    2. kernel words, tokens <= GEMM_MAX_TOKENS (one GEMM_TILE_B batch
       block) -> the same fused kernel on the batch-tiled GEMM path (no
       dense-weight materialization; larger waves would re-decode the
       trellis once per batch block, which loses to dequant — see
       GEMM_MAX_TOKENS);
    3. kernel words, larger token counts -> Pallas dequant to dense + MXU
       matmul (on CPU: traceable XLA decode);
    4. cached dense hatW;
    5. traceable 256-stream 2mad decode (reference-format fallback).
    """
    t = matmul_hadUt(x * w.SU.astype(x.dtype))
    m, n = w.out_features, w.in_features
    if w.tlut is not None:
        hatW = decode_tlut_dense_jnp(w).astype(x.dtype)
        y = jnp.einsum("...k,nk->...n", t, hatW)
    elif w.kwords is not None:
        from ..ops import trellis_kernel as tk
        assert w.decode_mode in tk.KERNEL_MODES, w.decode_mode
        if tk.supported_prefill(t, w.kwords, w.decode_mode):
            # fused decode+matmul: one batch block on the decode hot loop,
            # batch-tiled GEMM for prefill admission waves (no dense-weight
            # materialization — mirrors the affine GEMM prefill path)
            y = tk.trellis_matmul_flex(t, w.kwords, w.decode_mode,
                                       cycle=w.cycle, L=w.L_bits,
                                       K=w.K).astype(x.dtype)
        else:
            import jax as _jax
            if _jax.default_backend() in ("tpu", "axon"):
                hatW = tk.trellis_dequant(w.kwords, w.decode_mode,
                                          cycle=w.cycle, L=w.L_bits, K=w.K,
                                          dtype=x.dtype)
            else:
                hatW = tk.decode_kwords_traceable(
                    w.kwords, m, n, w.decode_mode,
                    cycle=w.cycle, L=w.L_bits, K=w.K).astype(x.dtype)
            y = jnp.einsum("...k,nk->...n", t, hatW)
    else:
        if w.hatW is not None:
            hatW = w.hatW.astype(x.dtype)
        else:
            assert w.decode_mode == "2mad" and w.V == 1, \
                "traceable decode supports 2mad/V=1; load with cache_dense else"
            T = w.td_x * w.td_y
            states = unpack_trellis_states_jnp(w.trellis, T, w.L_bits, w.K,
                                               w.V)
            vals = decode_2mad_jnp(states)  # [B_tiles, T]
            tiles = vals.reshape(-1, T)
            t4 = tiles.reshape(m // w.td_x, n // w.td_y, w.td_x, w.td_y)
            hatW = t4.transpose(0, 2, 1, 3).reshape(m, n).astype(x.dtype)
        y = jnp.einsum("...k,nk->...n", t, hatW)
    y = matmul_hadU(y)
    return y * (w.SV * w.Wscale).astype(x.dtype)


def effective_dense_weight(w: TrellisLinear) -> np.ndarray:
    """Materialize W_eff with  y = x @ W_eff^T  ==  apply_trellis(x)
    (for tests / fake-packing)."""
    m, n = w.out_features, w.in_features
    if w.tlut is not None:
        hatW = np.asarray(decode_tlut_dense_jnp(w), np.float32)
    elif w.hatW is not None:
        hatW = np.asarray(w.hatW, np.float32)
    else:
        from ..ops.trellis_kernel import decode_kwords_traceable
        hatW = np.asarray(decode_kwords_traceable(
            jnp.asarray(w.kwords), m, n, w.decode_mode, cycle=w.cycle,
            L=w.L_bits, K=w.K), np.float32)
    # W_eff = diag(SV*s) . Mm hatW Mn^T . diag(SU)
    A = np.asarray(matmul_hadU(jnp.asarray(hatW), axis=0))   # Mm hatW
    B = np.asarray(matmul_hadU(jnp.asarray(A), axis=1))      # ... Mn^T
    SU = np.asarray(w.SU, np.float32)
    SV = np.asarray(w.SV, np.float32) * float(np.asarray(w.Wscale))
    return SV[:, None] * B * SU[None, :]
