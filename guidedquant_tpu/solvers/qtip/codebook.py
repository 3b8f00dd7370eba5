"""QTIP bitshift trellis codebook.

JAX re-design of the reference's ``bitshift_codebook``
(``qtip/lib/codebook/bitshift.py:17-354``): a tail-biting bitshift trellis
with 2^L states shifting K*V bits per step, whose per-state reconstructions
come from either

- compute-based codebooks ``1mad``/``2mad``/``3inst`` (LCG hash ->
  pseudo-Gaussian; pure integer arithmetic, ideal for TPU decode), or
- ``quantlut_sym`` (hashed index into a small k-means table + sign bit).

The Viterbi dynamic program exploits the bitshift structure so it contains
**no gathers**: the predecessors of state s' = (r << KV) | bits are exactly
p = t*2^(L-KV) + r, so the min over predecessors is a reshape + min over the
leading-bit axis, and the new cost is a broadcast add. (The reference's
torch.compile'd ``update`` does the same thing with explicit gathers,
bitshift.py:204-217.) Traceback runs on host.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Compute codebooks (reference bitshift.py:17-80). uint32 arithmetic.
# ---------------------------------------------------------------------------

def decode_1mad(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.uint64) & 0xFFFFFFFF
    x = (x * 34038481 + 76625530) & 0xFFFFFFFF
    y = ((x & 255) + ((x >> 8) & 255) + ((x >> 16) & 255) + ((x >> 24) & 255))
    y = y.astype(np.float32) - 510.0
    return y / 147.800537109375


def decode_2mad(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.uint64) & 0xFFFFFFFF
    x = (x * 264435761 + 1013904223) & 0xFFFFFFFF
    x = (((x * 1664525) >> 32) + x) & 0xFFFFFFFF
    y = ((x & 255) + ((x >> 8) & 255) + ((x >> 16) & 255) + ((x >> 24) & 255))
    y = y.astype(np.float32) - 510.0
    return y / 147.800537109375


def decode_3inst(x: np.ndarray) -> np.ndarray:
    a, b, fpmask = 89226354, 64248484, 996162400
    x = np.asarray(x, np.uint64) & 0xFFFFFFFF
    x = (x * a + b) & 0xFFFFFFFF
    mask = ((1 << 15) + ((1 << 12) - 1))
    mask = (mask << 16) + mask
    res = (mask & x) ^ fpmask
    top = (res >> 16).astype(np.uint16).view(np.float16)
    bottom = (res & 0xFFFF).astype(np.uint16).view(np.float16)
    return (top.astype(np.float32) + bottom.astype(np.float32))


def _hash_lut_index(L: int, nbits: int, sym: bool):
    """idx = ((s+1)*s) hashed; sym also extracts a sign bit
    (reference quantlut/quantlut_sym, bitshift.py:63-80)."""
    s = np.arange(1 << L, dtype=np.uint64)
    h = (s + 1) * s
    if sym:
        sflip = 1 - ((h >> 15) & 1).astype(np.int64) * 2
        idx = (h >> (16 - nbits - 1)) & ((1 << nbits) - 1)
        return idx.astype(np.int64), sflip
    idx = (h >> (16 - nbits)) & ((1 << nbits) - 1)
    return idx.astype(np.int64), None


def make_kmeans_tlut(tlut_bits: int, V: int = 2, seed: int = 0,
                     n_samples: int = 1 << 17, iters: int = 40) -> np.ndarray:
    """k-means codebook of a V-dim standard normal, std-normalized to
    0.9682458365518543 (reference bitshift.py:146-160; we run our own Lloyd
    instead of loading a cached scipy result)."""
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(n_samples, V)).astype(np.float32)
    C = rng.normal(size=(1 << tlut_bits, V)).astype(np.float32)
    ncl = len(C)
    for _ in range(iters):
        # argmin ||a - c||^2 == argmin(|c|^2 - 2 a.c): one matmul instead
        # of the [n, 2^tb, V] broadcast (which took ~10 min at tb=9)
        lab = np.argmin((C ** 2).sum(-1)[None, :] - 2.0 * data @ C.T, axis=1)
        counts = np.bincount(lab, minlength=ncl)
        sums = np.stack([np.bincount(lab, weights=data[:, v],
                                     minlength=ncl) for v in range(V)], -1)
        nz = counts > 0
        C[nz] = sums[nz] / counts[nz, None]
    C = C / C.std() * 0.9682458365518543
    return C.astype(np.float32)


class BitshiftCodebook:
    """Trellis codebook. lut: [V, 2^L] per-state reconstructions."""

    def __init__(self, L: int = 16, K: int = 2, V: int = 2,
                 tlut_bits: int = 16, decode_mode: str = "quantlut_sym",
                 tlut: Optional[np.ndarray] = None, seed: int = 0):
        self.L, self.K, self.V = L, K, V
        self.KV = K * V
        self.tlut_bits = tlut_bits
        self.decode_mode = decode_mode
        states = np.arange(1 << L, dtype=np.uint64)

        if decode_mode == "1mad":
            assert V == 1
            lut = decode_1mad(states)[None]
            self.tlut = None
        elif decode_mode == "tpu2u":
            # TPU-native compute codebook (ops/trellis_kernel.py): 2 f32
            # mantissa uniforms summed — ~9 VPU ops in-kernel vs ~22 for
            # 2mad's emulated high-multiply. Triangular marginal.
            from ...ops.trellis_kernel import decode_tpu2u
            assert V == 1
            lut = decode_tpu2u(states)[None]
            self.tlut = None
        elif decode_mode == "2mad":
            assert V == 1
            lut = decode_2mad(states)[None]
            self.tlut = None
        elif decode_mode == "3inst":
            assert V == 1
            lut = decode_3inst(states)[None]
            self.tlut = None
        elif decode_mode == "quantlut_sym":
            if tlut is None:
                tlut = make_kmeans_tlut(tlut_bits, V, seed=seed)
            self.tlut = np.asarray(tlut, np.float32)
            idx, sflip = _hash_lut_index(L, tlut_bits, sym=True)
            lut = self.tlut[idx].copy()  # [2^L, V]
            lut[:, 0] *= sflip
            lut = lut.T
        elif decode_mode == "lut":
            assert tlut is not None and tlut.shape[0] == (1 << L)
            self.tlut = np.asarray(tlut, np.float32)
            lut = self.tlut.T
        else:
            raise ValueError(decode_mode)

        self.lut = np.ascontiguousarray(lut, np.float32)  # [V, 2^L]
        self.lut_j = jnp.asarray(self.lut)

    # -- reconstruction ----------------------------------------------------

    def recons(self, states: np.ndarray) -> np.ndarray:
        """states [...] -> values [V, ...]."""
        return self.lut[:, np.asarray(states, np.int64)]

    # -- Viterbi -----------------------------------------------------------

    @partial(jax.jit, static_argnums=(0,))
    def _viterbi_device(self, X: jnp.ndarray, init_cost: jnp.ndarray):
        """X [T, B] (T % V == 0) -> (tstar [T/V - 1, B, 2^(L-KV)] uint8,
        final cost [B, 2^L]).

        tstar[i] records, for each 'reduced' state r (the L-KV bits shared
        between step i-1 and i), which leading-bit block t of the predecessor
        was optimal.
        """
        L, KV, V = self.L, self.KV, self.V
        nred = 1 << (L - KV)
        nt = 1 << KV
        T, B = X.shape
        lut = self.lut_j  # [V, 2^L]

        def step_err(xv):
            # xv [V, B] -> [B, 2^L]
            return ((lut[:, None, :] - xv[:, :, None]) ** 2).sum(0)

        def body(cost, xv):
            # cost [B, 2^L] over predecessor states p = t * nred + r
            cmin = cost.reshape(B, nt, nred)
            tstar = jnp.argmin(cmin, axis=1).astype(jnp.uint8)  # [B, nred]
            m = jnp.min(cmin, axis=1)  # [B, nred]
            err = step_err(xv)  # [B, 2^L]; s' = r * nt + bits
            new_cost = err + jnp.repeat(m, nt, axis=1)
            return new_cost, tstar

        xs = X.reshape(T // V, V, B)
        cost0 = step_err(xs[0]) + init_cost
        final_cost, tstars = jax.lax.scan(body, cost0, xs[1:])
        return tstars, final_cost

    @partial(jax.jit, static_argnums=(0, 3))
    def _viterbi_full(self, X: jnp.ndarray, init_cost: jnp.ndarray,
                      use_overlap: bool, overlap_low: jnp.ndarray):
        """Forward DP + on-device backtrace -> states [T/V, B] int32.

        The backpointer tensor (T/V x B x 2^(L-KV) uint8, ~67 MB per call
        at L=16) never leaves the device — only the traced-back state
        sequence (T/V x B int32) is fetched. On tunnel transports the
        host-side backtrace was ~50x the DP cost in transfer time.
        """
        L, KV = self.L, self.KV
        nred = 1 << (L - KV)
        tstars, final_cost = self._viterbi_device(X, init_cost)
        if use_overlap:
            low = jnp.arange(1 << L, dtype=jnp.int32) & (nred - 1)
            final_cost = jnp.where(low[None, :] == overlap_low[:, None],
                                   final_cost, jnp.inf)
        s_last = jnp.argmin(final_cost, axis=1).astype(jnp.int32)  # [B]

        def back(s, tstar_j):
            r = s >> KV
            t = jnp.take_along_axis(tstar_j, r[:, None], axis=1
                                    )[:, 0].astype(jnp.int32)
            return (t << (L - KV)) | r, s

        s0, ys = jax.lax.scan(back, s_last, tstars, reverse=True)
        return jnp.concatenate([s0[None], ys], axis=0)

    def viterbi(self, X: np.ndarray,
                overlap: Optional[np.ndarray] = None) -> np.ndarray:
        """X [T, B] -> state sequence [T/V, B] int32 (reference
        bitshift.py:219-260)."""
        L, KV, V = self.L, self.KV, self.V
        T, B = X.shape
        nred = 1 << (L - KV)
        states = np.arange(1 << L)

        if overlap is not None:
            # initial states restricted to top L-KV bits == overlap
            top = states >> KV
            init = np.where(top[None, :] == overlap[:, None], 0.0, np.inf)
            ov_low = jnp.asarray(overlap, jnp.int32)
        else:
            init = np.zeros((B, 1 << L), np.float32)
            ov_low = jnp.zeros((B,), jnp.int32)
        out = self._viterbi_full(
            jnp.asarray(X, jnp.float32), jnp.asarray(init, jnp.float32),
            overlap is not None, ov_low)
        return np.asarray(out)

    def quantize_seq(self, X: np.ndarray,
                     overlap: Optional[np.ndarray] = None) -> np.ndarray:
        """X [T, N0] -> states [T/V, N0]; batches columns
        (reference bitshift.py:262-282)."""
        T, NO = X.shape
        bs = min(1 << max(0, 24 - self.L), NO)
        pad = math.ceil(NO / bs) * bs - NO
        Xp = np.pad(X, ((0, 0), (0, pad)))
        if overlap is not None:
            overlap = np.pad(overlap, (0, pad))
        out = np.zeros((T // self.V, NO + pad), np.int32)
        for s in range(0, NO + pad, bs):
            ov = None if overlap is None else overlap[s:s + bs]
            out[:, s:s + bs] = self.viterbi(Xp[:, s:s + bs], ov)
        return out[:, :NO]

    def quantize(self, X: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """X [B, T] (rows are trellis sequences) ->
        (hatX [B, T], states [B, T/V]). Tail-biting via the two-pass roll
        (reference bitshift.py:284-293)."""
        Xt = np.ascontiguousarray(np.asarray(X, np.float32).T)  # [T, B]
        T = Xt.shape[0]
        roll = np.roll(Xt, T // (2 * self.V) * self.V, axis=0)
        state = self.quantize_seq(roll, overlap=None)
        overlap = state[T // (2 * self.V)] >> self.KV
        state = self.quantize_seq(Xt, overlap=overlap)
        hatX = self.recons(state)  # [V, T/V, B]
        hatX = np.moveaxis(hatX, 0, 1).reshape(T, -1)
        return np.ascontiguousarray(hatX.T), np.ascontiguousarray(state.T)

    # -- bitstream packing (reference bitshift.py:295-354) -----------------

    def pack_trellis(self, trellis: np.ndarray) -> np.ndarray:
        """trellis [B, T/V] int -> packed uint16 [B, ceil(T*K/16)].

        Stream = first state's L bits (MSB first), then KV new bits per
        subsequent state; consecutive states must satisfy the shift overlap.
        """
        B, Tv = trellis.shape
        L, KV = self.L, self.KV
        t = trellis.astype(np.int64)
        assert ((t[:, :-1] & ((1 << (L - KV)) - 1)) == (t[:, 1:] >> KV)).all(), \
            "trellis overlap violated"
        nbits = L + (Tv - 1) * KV
        bits = np.zeros((B, nbits), np.uint8)
        for i in range(L):
            bits[:, i] = (t[:, 0] >> (L - 1 - i)) & 1
        for s in range(1, Tv):
            for i in range(KV):
                bits[:, L + (s - 1) * KV + i] = (t[:, s] >> (KV - 1 - i)) & 1
        # drop the final L-KV bits (recoverable from wraparound) then pad
        bits = bits[:, :nbits - (L - KV)]
        total = bits.shape[1]
        pad = (-total) % 16
        bits = np.pad(bits, ((0, 0), (0, pad)))
        w = bits.reshape(B, -1, 16)
        weights = (1 << np.arange(15, -1, -1)).astype(np.uint32)
        return (w * weights).sum(-1).astype(np.uint16)

    def unpack_trellis(self, packed: np.ndarray, T: int) -> np.ndarray:
        """Inverse of pack_trellis; T is the sequence length (reference
        passes td_x*td_y)."""
        L, KV = self.L, self.KV
        B = packed.shape[0]
        w = packed.astype(np.uint32)
        bits = ((w[:, :, None] >> np.arange(15, -1, -1)) & 1).astype(np.uint8)
        bits = bits.reshape(B, -1)
        n_stream = T * self.K  # == L + (Tv-1)*KV - (L-KV)
        bits = bits[:, :n_stream]
        bits = np.concatenate([bits, bits[:, :L - KV]], axis=1)
        Tv = T // self.V
        t = np.zeros((B, Tv), np.int64)
        weights_L = 1 << np.arange(L - 1, -1, -1)
        t[:, 0] = (bits[:, :L] * weights_L).sum(1)
        weights_K = 1 << np.arange(KV - 1, -1, -1)
        for s in range(1, Tv):
            newbits = (bits[:, L + (s - 1) * KV: L + s * KV] * weights_K).sum(1)
            t[:, s] = ((t[:, s - 1] << KV) & ((1 << L) - 1)) + newbits
        return t.astype(np.int32)
