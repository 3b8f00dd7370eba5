"""Activation-quantizing linear wrapper (SpinQuant W4A4 runtime).

Analog of the reference's ``ActQuantWrapper``
(``spin_quant/utils/quant_utils.py:201-296``): optional online Hadamard on
the input (the R4 transform whose inverse is folded into the weight),
dynamic per-token input fake-quant, the (already weight-quantized, dense)
matmul, and optional output fake-quant.

TPU extension the reference does not have: a **native integer execution
path** (``wq``/``wscale`` set). The reference only ever simulates W4A4
(fake-quant in fp16); here the weight is stored as int8 codes (4-bit
range), activations are dynamically quantized to int8 codes, and the
matmul runs on the MXU's int8 path with int32 accumulation:

    y[t, n] = sx[t] * ws[n] * (qx[t] . qw[n])            (sym)
    y[t, n] = sx[t] * ws[n] * ((qx[t] - zx[t]) . qw[n])  (asym, expanded
              via the precomputed per-row code sum)

— mathematically identical to fake-quant, without ever materializing the
dequantized activations/weights, and 2x MXU throughput at batch.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax
from flax import struct

from ..ops.hadamard import matmul_hadU
from ..solvers.spinquant.quant import (ActQuantConfig, act_fake_quant,
                                       act_find_params, minq_maxq)


@struct.dataclass
class ActQuantLinear:
    weight: jnp.ndarray  # [(L,) out, in] fake-quantized dense
    bias: Optional[jnp.ndarray] = None
    # native-path operands (None -> fake-quant dense path)
    wq: Optional[jnp.ndarray] = None       # [(L,) out, in] int8 codes
    wscale: Optional[jnp.ndarray] = None   # [(L,) out] f32 per-channel
    wq_rowsum: Optional[jnp.ndarray] = None  # [(L,) out] f32 sum_k wq
    in_bits: int = struct.field(pytree_node=False, default=16)
    in_sym: bool = struct.field(pytree_node=False, default=False)
    in_groupsize: int = struct.field(pytree_node=False, default=-1)
    in_clip: float = struct.field(pytree_node=False, default=1.0)
    out_bits: int = struct.field(pytree_node=False, default=16)
    out_sym: bool = struct.field(pytree_node=False, default=False)
    online_had: bool = struct.field(pytree_node=False, default=False)

    @property
    def in_cfg(self) -> ActQuantConfig:
        return ActQuantConfig(bits=self.in_bits, groupsize=self.in_groupsize,
                              sym=self.in_sym, clip_ratio=self.in_clip)

    @property
    def out_cfg(self) -> ActQuantConfig:
        return ActQuantConfig(bits=self.out_bits, sym=self.out_sym)


def native_weight_codes(weight, bits: int = 4):
    """Per-channel symmetric integer codes for an (already lattice-valued)
    quantized dense weight -> (wq int8 [out,in], wscale f32 [out],
    rowsum f32 [out]).

    For weights produced by GPTQ/RTN with per-channel sym scales the
    re-derived scale reproduces the lattice to fp rounding; exactness vs
    the dense form is asserted by the caller's tests, not here.
    """
    w = jnp.asarray(weight, jnp.float32)
    maxq = 2 ** (bits - 1) - 1
    amax = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / maxq
    q = jnp.clip(jnp.round(w / scale), -maxq - 1, maxq).astype(jnp.int8)
    return q, scale[..., 0], jnp.sum(q.astype(jnp.float32), axis=-1)


def with_native_path(w: ActQuantLinear, bits: int = 4) -> ActQuantLinear:
    """Attach integer-execution operands derived from the dense weight."""
    wq, ws, rs = native_weight_codes(w.weight, bits)
    return w.replace(wq=wq, wscale=ws, wq_rowsum=rs)


def _native_matmul(w: ActQuantLinear, x: jnp.ndarray) -> jnp.ndarray:
    """Integer W4A4 matmul: int8 x int8 -> int32 on the MXU."""
    cfg = w.in_cfg
    scale, zero = act_find_params(x, cfg)
    _, maxq = minq_maxq(cfg.bits, cfg.sym)
    if cfg.sym:
        qx = jnp.clip(jnp.round(x / scale), -maxq - 1, maxq)
        zero_eff = None
    else:
        # asym codes live in [0, 2^b - 1]; center by 2^(b-1) so the int8
        # cast cannot wrap at b == 8, and fold the offset into the zero
        # point:  x_hat = s*(q - z) = s*((q - c) - (z - c))
        c = 2 ** (cfg.bits - 1)
        qx = jnp.clip(jnp.round(x / scale) + zero, 0, maxq) - c
        zero_eff = zero - c
    qx = qx.astype(jnp.int8)
    acc = lax.dot_general(qx, w.wq, (((qx.ndim - 1,), (1,)), ((), ())),
                          preferred_element_type=jnp.int32
                          ).astype(jnp.float32)
    if zero_eff is not None:
        # x_hat = s*(q' - z'): subtract z' * sum_k qw[n, k] per row
        acc = acc - zero_eff * w.wq_rowsum
    y = acc * scale.astype(jnp.float32) * w.wscale
    return y.astype(x.dtype)


def apply_act_quant_linear(w: ActQuantLinear, x: jnp.ndarray) -> jnp.ndarray:
    if w.online_had:
        x = matmul_hadU(x.astype(jnp.float32)).astype(x.dtype)
    if (w.wq is not None and 2 <= w.in_bits <= 8 and w.in_groupsize <= 0):
        y = _native_matmul(w, x)
    else:
        if w.in_bits < 16:
            x = act_fake_quant(x, w.in_cfg)
        y = jnp.einsum("...k,nk->...n", x, w.weight.astype(x.dtype))
    if w.bias is not None:
        y = y + w.bias.astype(y.dtype)
    if w.out_bits < 16:
        y = act_fake_quant(y, w.out_cfg)
    return y
