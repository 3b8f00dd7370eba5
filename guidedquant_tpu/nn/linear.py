"""Quantized-linear pytrees and the generic linear dispatcher.

TPU-native analog of the reference's runtime linear modules
(``any_precision/modules/AnyPrecisionLinear.py:17-89``,
``inference/APLinear.py``): a linear "weight" in this framework is either

- a dense ``jnp.ndarray`` of shape (out_features, in_features), or
- an :class:`AnyPrecLinear` pytree holding bit-plane packed codes plus
  per-row look-up tables for every supported bit-width.

``apply_linear`` dispatches on the type, so model code is agnostic.

Decode-path policy (mirrors the reference's seq-len dispatch at
``AnyPrecisionLinear.py:69-74``): few tokens -> fused Pallas LUT-GEMV
kernel; many tokens (prefill) -> dequantize to dense and use a plain MXU
matmul. Both paths share the exact same decode semantics, so the dequant
path doubles as the correctness oracle for the kernel (the reference's own
test strategy, SURVEY.md §4).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.pack import unpack_bitplanes


@struct.dataclass
class AnyPrecLinear:
    """Bit-plane packed any-precision linear weight.

    qweight: int32 [max_bits, N, K/32] MSB-first bit planes (plane 0 is the
      MSB of the parent code). Truncating to the first ``b`` planes yields the
      b-bit code of every weight — the any-precision property.
    luts: {bits: [N, 2**bits] float} per-row codebooks.
    bias: optional [N] (absent for Llama-family projections).
    precision: active bit-width (static; switchable via ``set_precision``).
    """

    qweight: jnp.ndarray
    luts: Dict[int, jnp.ndarray]
    bias: Optional[jnp.ndarray] = None
    # Lane-tiled words + per-row polynomial LUT coefficients for the fused
    # Pallas decode kernel at the active precision (see ops.lut_kernels);
    # None -> dequant path.
    qwords: Optional[jnp.ndarray] = None
    pcoef: Optional[jnp.ndarray] = None
    # Shared-shape fast-kernel operands (set when the LUTs lie in the
    # row-tile-shared-shape family; see ops.lut_kernels.lut_matmul_shared)
    gpoly: Optional[jnp.ndarray] = None
    srow: Optional[jnp.ndarray] = None
    mrow: Optional[jnp.ndarray] = None
    precision: int = struct.field(pytree_node=False, default=0)
    out_features: int = struct.field(pytree_node=False, default=0)
    in_features: int = struct.field(pytree_node=False, default=0)
    # act_bits == 8 routes the affine path through the int-domain W{b}A8
    # kernel (same qwords operand; int8 MXU code-dot + A8 activation
    # quantization; ops.lut_kernels.lut_matmul_affine_w2a8).
    act_bits: int = struct.field(pytree_node=False, default=16)

    @property
    def supported_bits(self):
        return sorted(self.luts.keys())

    def set_precision(self, bits: int) -> "AnyPrecLinear":
        if bits not in self.luts:
            raise ValueError(f"{bits}-bit not available; have {self.supported_bits}")
        return self.replace(precision=bits, qwords=None, pcoef=None,
                            gpoly=None, srow=None, mrow=None)


def with_kernel_layout(w: AnyPrecLinear) -> AnyPrecLinear:
    """Precompute the lane-tiled kernel operand for the active precision.

    Host-side (numpy); handles both single [bits, N, K/32] and stacked
    [L, bits, N, K/32] qweights.
    """
    import numpy as np
    from ..ops.pack import unpack_bitplanes_np
    from ..ops import lut_kernels

    bits = w.precision
    if bits not in lut_kernels.AFFINE_BITS:
        return w
    qw = np.asarray(w.qweight)
    stacked = qw.ndim == 4
    layers = qw if stacked else qw[None]
    luts = np.asarray(w.luts[bits], np.float32)
    luts = luts if stacked else luts[None]

    def _pack_words():
        out = []
        for lq in layers:
            codes = unpack_bitplanes_np(lq, bits)
            codes, _ = lut_kernels.pad_to_tiles(codes, bits)
            out.append(lut_kernels.pack_lane_tiled(codes, bits))
        if isinstance(out[0], tuple):  # composite widths: per-field arrays
            if stacked:
                return tuple(jnp.asarray(np.stack([o[i] for o in out]))
                             for i in range(len(out[0])))
            return tuple(jnp.asarray(o) for o in out[0])
        return jnp.asarray(np.stack(out) if stacked else out[0])

    # Affine fast path (the cheapest kernel: no in-kernel LUT resolve —
    # the MXU consumes raw codes, per-row affine is an O(N) epilogue):
    # engage only when every row's codebook IS a uniform grid (RTN / GPTQ /
    # SpinQuant weights, or LNQ solved with codebook_family="affine"),
    # so it stays exact. Works for every width 1-8 via field composition.
    affine_ok = True
    a_s, a_m = [], []
    for lut in luts:
        sr, mr, relerr = lut_kernels.fit_affine(lut)
        # exact grids reach ~1e-7 in f32 but only ~3e-4 (f16) / ~2e-3
        # (bf16) after checkpoint storage rounding; genuinely non-uniform
        # codebooks sit >1e-2. The refit (s, m) then match the *stored*
        # LUT at storage-rounding accuracy — same error class as the bf16
        # decode itself. The matrix-global relerr alone can mask a small
        # minority of genuinely non-uniform rows, so gate the per-row max
        # as well.
        approx = (mr[:, None] + sr[:, None]
                  * np.arange(lut.shape[1], dtype=np.float32))
        rown = np.linalg.norm(lut - approx, axis=1)
        rowd = np.maximum(np.linalg.norm(lut, axis=1), 1e-12)
        if relerr > 3e-3 or float((rown / rowd).max()) > 1.5e-2:
            affine_ok = False
            break
        a_s.append(sr)
        a_m.append(mr)
    if affine_ok:
        sr = np.stack(a_s) if stacked else a_s[0]
        mr = np.stack(a_m) if stacked else a_m[0]
        return w.replace(qwords=_pack_words(), pcoef=None, gpoly=None,
                         srow=jnp.asarray(sr), mrow=jnp.asarray(mr))

    if bits not in lut_kernels.KERNEL_BITS:
        return w  # non-uniform LUTs at composite widths: dequant path

    coefs = [lut_kernels.lut_to_poly(lut, bits) for lut in luts]
    coef = np.stack(coefs) if stacked else coefs[0]
    w = w.replace(qwords=_pack_words(), pcoef=jnp.asarray(coef))

    # Shared-shape fast path: only when the codebooks genuinely lie in the
    # family (e.g. LNQ solved with shared_shape_tile), so it stays exact.
    if bits <= 2:
        tile = 512 if luts.shape[1] % 512 == 0 else (
            128 if luts.shape[1] % 128 == 0 else None)
        if tile is not None:
            gs, ss, ms = [], [], []
            ok = True
            for lut in luts:
                g, sr, mr, relerr = lut_kernels.fit_shared_shape(lut, tile)
                # in-family luts reach ~1e-6 in f32 but only ~3e-3 after
                # bf16/f16 storage rounding; genuinely free luts sit >5e-2.
                # Per-row max guards against a masked non-uniform minority.
                approx = (mr[:, None] + sr[:, None]
                          * np.repeat(g, tile, axis=0))
                rown = np.linalg.norm(lut - approx, axis=1)
                rowd = np.maximum(np.linalg.norm(lut, axis=1), 1e-12)
                if relerr > 2e-2 or float((rown / rowd).max()) > 6e-2:
                    ok = False
                    break
                gs.append(lut_kernels.shape_to_poly(g, bits))
                ss.append(sr)
                ms.append(mr)
            if ok:
                gp = np.stack(gs) if stacked else gs[0]
                sr = np.stack(ss) if stacked else ss[0]
                mr = np.stack(ms) if stacked else ms[0]
                w = w.replace(gpoly=jnp.asarray(gp), srow=jnp.asarray(sr),
                              mrow=jnp.asarray(mr))
    return w


def with_act8(w: AnyPrecLinear) -> AnyPrecLinear:
    """Engage the int-domain W{b}A8 affine kernel for this leaf.

    Same qwords operand, int8 MXU code-dot; no-op unless the leaf is on
    the affine fast path with precision <= 7."""
    if (w.qwords is None or w.srow is None or w.gpoly is not None
            or w.precision > 7):
        return w
    return w.replace(act_bits=8)


# Measured serving policy (PERF_NOTES round 4): the int-domain W{b}A8
# kernels win through decode batch ~32 (+7% served at 32 slots, 192.6 vs
# 160.3 tok/s at B=1 on 8B) and lose slightly at 64 (-6%) — the per-token
# A8 quantization pass and the int8-dot epilogue scale with batch.
ACT8_MAX_SLOTS = 32


def apply_act8_policy(params, slots: int = 1,
                      enable: Optional[bool] = None):
    """Apply the measured W{b}A8 activation policy to a model's layer
    leaves: engage ``act_bits=8`` on every affine-fast-path AnyPrecLinear
    when the decode batch (``slots``) is <= :data:`ACT8_MAX_SLOTS`.

    ``enable``: force on/off (None = the measured policy). No-op for
    non-affine leaves and for the dict entries that are not AnyPrecLinear.
    Handles stacked (dict) and unrolled (tuple of dicts) layer layouts.
    """
    if enable is None:
        enable = slots <= ACT8_MAX_SLOTS
    if not enable:
        return params

    def _lay(lay):
        return {k: (with_act8(v) if isinstance(v, AnyPrecLinear) else v)
                for k, v in lay.items()}

    out = dict(params)
    if isinstance(params["layers"], (tuple, list)):
        out["layers"] = tuple(_lay(l) for l in params["layers"])
    else:
        out["layers"] = _lay(params["layers"])
    return out


def dequantize_anyprec(w: AnyPrecLinear, bits: Optional[int] = None,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Decode packed codes -> dense [N, K] weight at the given precision.

    Gather-free: per-row LUT indexing lowers to serialized scalar gathers on
    TPU, so low bit-widths use a select sum over the 2^b LUT columns (VPU)
    and wide LUTs a one-hot batched dot (MXU).
    """
    bits = bits or w.precision
    if w.qwords is not None and bits == w.precision and w.in_features:
        # decode straight off the lane-tiled kernel operand — no bit-plane
        # checkpoint needed on device (mirrors the affine prefill branch)
        from ..ops import lut_kernels
        codes = lut_kernels.unpack_lane_tiled(w.qwords, bits, w.in_features)
    else:
        codes = unpack_bitplanes(w.qweight, bits)  # [N, K] in [0, 2^bits)
    lut = w.luts[bits].astype(dtype)  # [N, C]
    C = lut.shape[1]
    if C <= 32:
        # select-sum over LUT columns: C fusable elementwise passes, no
        # [N, K, C] materialization
        out = jnp.zeros(codes.shape, dtype)
        for c in range(C):
            out = out + jnp.where(codes == c, lut[:, c:c + 1],
                                  jnp.zeros((), dtype))
        return out
    if C <= 256:
        # two-level resolve (ADVICE r4): a flat select-sum at C=256 emits
        # 256 elementwise HLO passes, and a flat one-hot einsum needs a
        # [N, K, 256] temporary. Split the code into hi/lo fields
        # (lo = 16): partial[n,k,h] = sum_l 1[lo==l]*lut[n,16h+l] is one
        # MXU einsum over a [N,K,16] one-hot, and the hi one-hot
        # ([N,K,C/16]) selects among the partials — peak temporaries are
        # (16 + C/16)x the weight elements instead of Cx, and the pass
        # count is O(1) in C.
        lo_sz = 16
        hi_sz = C // lo_sz
        oh_lo = jax.nn.one_hot(codes % lo_sz, lo_sz, dtype=dtype)
        oh_hi = jax.nn.one_hot(codes // lo_sz, hi_sz, dtype=dtype)
        partial = jnp.einsum("nkl,nhl->nkh", oh_lo,
                             lut.reshape(-1, hi_sz, lo_sz))
        return jnp.einsum("nkh,nkh->nk", oh_hi, partial)
    onehot = jax.nn.one_hot(codes, C, dtype=dtype)  # [N, K, C]
    return jnp.einsum("nkc,nc->nk", onehot, lut)


@struct.dataclass
class Int8Linear:
    """Per-row-scaled int8 dense weight (fast path for the LM head /
    residual dense layers; no decode needed — MXU consumes int8 after a
    single convert pass, ~1.8x bf16 at batch 1 on v5e)."""

    q: jnp.ndarray       # [(L,) N, K] int8
    scale: jnp.ndarray   # [(L,) N] f32
    out_features: int = struct.field(pytree_node=False, default=0)
    in_features: int = struct.field(pytree_node=False, default=0)


def quantize_affine(W: jnp.ndarray, bits: int = 5,
                    mse_points: int = 13) -> AnyPrecLinear:
    """Dense [N, K] -> per-row affine b-bit AnyPrecLinear on the fast
    code-dot kernel path (qwords + srow/mrow set).

    Per-row MSE shrink search on the (min, max) box (13-point 0.70..1.00)
    — at 5 bits this data-free grid measured within 3e-4 ppl of the
    guided GPTQ solve on the real 16k-vocab checkpoint (head5-msegrid
    4.5111 vs head5-gptq 4.5114, PERF_NOTES round 5), so it is the
    load-time head quantizer (`QuantizedCausalLM.from_quantized
    (head_bits=...)`).
    """
    import numpy as np
    from ..ops import pack as packmod
    from ..ops import lut_kernels

    Wf = np.asarray(W, np.float32)
    N, K = Wf.shape
    C = 2 ** bits
    lo0 = Wf.min(axis=1, keepdims=True)
    hi0 = Wf.max(axis=1, keepdims=True)
    best_err = np.full((N, 1), np.inf)
    best_lo = lo0.copy()
    best_s = np.maximum(hi0 - lo0, 1e-12) / (C - 1)
    for f in np.linspace(0.70, 1.0, mse_points):
        lo, hi = lo0 * f, hi0 * f
        s = np.maximum(hi - lo, 1e-12) / (C - 1)
        q = np.clip(np.round((Wf - lo) / s), 0, C - 1) * s + lo
        err = ((q - Wf) ** 2).sum(axis=1, keepdims=True)
        take = err < best_err
        best_lo = np.where(take, lo, best_lo)
        best_s = np.where(take, s, best_s)
        best_err = np.minimum(err, best_err)
    codes = np.clip(np.round((Wf - best_lo) / best_s), 0, C - 1
                    ).astype(np.int64)
    lut = best_lo + best_s * np.arange(C, dtype=np.float32)[None, :]
    qweight = packmod.pack_bitplanes(codes, bits)
    w = AnyPrecLinear(
        qweight=jnp.asarray(qweight), luts={bits: jnp.asarray(lut)},
        precision=bits, out_features=N, in_features=K)
    return with_kernel_layout(w)


def quantize_int8(W: jnp.ndarray) -> Int8Linear:
    """Dense [N, K] (or stacked [L, N, K]) -> per-row symmetric int8."""
    Wf = jnp.asarray(W, jnp.float32)
    amax = jnp.max(jnp.abs(Wf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(Wf / scale), -128, 127).astype(jnp.int8)
    return Int8Linear(q=q, scale=scale[..., 0],
                      out_features=W.shape[-2], in_features=W.shape[-1])


def apply_linear(w: Any, x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ W^T for dense or quantized W (W stored as (N, K))."""
    if isinstance(w, AnyPrecLinear):
        return _apply_anyprec(w, x)
    if isinstance(w, Int8Linear):
        y = jnp.einsum("...k,nk->...n", x, w.q.astype(x.dtype))
        return y * w.scale.astype(x.dtype)
    from .trellis import TrellisLinear, apply_trellis
    if isinstance(w, TrellisLinear):
        return apply_trellis(w, x)
    from .act_quant import ActQuantLinear, apply_act_quant_linear
    if isinstance(w, ActQuantLinear):
        return apply_act_quant_linear(w, x)
    from .bcq_linear import BcqLinear, apply_bcq
    if isinstance(w, BcqLinear):
        return apply_bcq(w, x)
    return jnp.einsum("...k,nk->...n", x, w.astype(x.dtype))


def _apply_anyprec(w: AnyPrecLinear, x: jnp.ndarray) -> jnp.ndarray:
    from ..ops import lut_kernels
    if (w.act_bits == 8 and w.qwords is not None and w.srow is not None
            and w.gpoly is None
            and lut_kernels.supported_affine_w2a8(x, w.qwords, w.precision)):
        # Int-domain W{b}A8 affine kernel: same decode, int8 MXU code-dot
        # (2x MXU rate on GEMM batches); activation A8 absmax quantization
        # is the only approximation (same class as nn/act_quant W4A8).
        y = lut_kernels.lut_matmul_affine_w2a8_flex(
            x, w.qwords, w.srow, w.mrow, w.precision, w.out_features)
    elif (w.qwords is not None and w.gpoly is None and w.srow is not None
            and lut_kernels.supported_affine(x, w.qwords, w.precision)):
        # Affine (uniform-grid) kernel: code-dot + per-row epilogue.
        # Serves decode batches in one block AND prefill-sized batches via
        # the batch-tiled GEMM path (no dense-weight materialization).
        y = lut_kernels.lut_matmul_affine_flex(
            x, w.qwords, w.srow, w.mrow, w.precision, w.out_features)
    elif (w.qwords is not None and w.gpoly is not None
            and lut_kernels.supported(x, w.qwords, w.precision)):
        # Fast shared-shape kernel (scalar-coefficient decode)
        y = lut_kernels.lut_matmul_flex(x, w.qwords, w.gpoly, w.srow, w.mrow,
                                        w.precision, w.out_features)
    elif (w.qwords is not None and w.pcoef is not None
            and lut_kernels.supported(x, w.qwords, w.precision)):
        # Fused Pallas LUT-GEMV (decode path; reference seq==1 kernel branch,
        # AnyPrecisionLinear.py:69-74).
        y = lut_kernels.lut_matmul(x, w.qwords, w.pcoef,
                                   w.precision, w.out_features)
    elif (w.qwords is not None and w.srow is not None and w.gpoly is None
            and w.pcoef is None):
        # Affine prefill: dequantize straight from the lane-tiled kernel
        # operand (w = m + s*codes) — one traceable shift/mask decode, no
        # bit-plane checkpoint needed on device, numerically identical to
        # the fused decode kernel's epilogue.
        codes = lut_kernels.unpack_lane_tiled(w.qwords, w.precision,
                                              w.in_features)
        dense = (w.mrow[:, None] + w.srow[:, None]
                 * codes.astype(jnp.float32)).astype(x.dtype)
        y = jnp.einsum("...k,nk->...n", x, dense[:w.out_features])
    else:
        # Prefill / fallback: gather-free dequant + MXU matmul.
        dense = dequantize_anyprec(w, dtype=x.dtype)
        y = jnp.einsum("...k,nk->...n", x, dense)
    if w.bias is not None:
        y = y + w.bias.astype(y.dtype)
    return y
