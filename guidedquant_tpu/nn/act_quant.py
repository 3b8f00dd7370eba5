"""Activation-quantizing linear wrapper (SpinQuant W4A4 runtime).

Analog of the reference's ``ActQuantWrapper``
(``spin_quant/utils/quant_utils.py:201-296``): optional online Hadamard on
the input (the R4 transform whose inverse is folded into the weight),
dynamic per-token input fake-quant, the (already weight-quantized, dense)
matmul, and optional output fake-quant.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from ..ops.hadamard import matmul_hadU
from ..solvers.spinquant.quant import ActQuantConfig, act_fake_quant


@struct.dataclass
class ActQuantLinear:
    weight: jnp.ndarray  # [(L,) out, in] fake-quantized dense
    bias: Optional[jnp.ndarray] = None
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


def apply_act_quant_linear(w: ActQuantLinear, x: jnp.ndarray) -> jnp.ndarray:
    if w.online_had:
        x = matmul_hadU(x.astype(jnp.float32)).astype(x.dtype)
    if w.in_bits < 16:
        x = act_fake_quant(x, w.in_cfg)
    y = jnp.einsum("...k,nk->...n", x, w.weight.astype(x.dtype))
    if w.bias is not None:
        y = y + w.bias.astype(y.dtype)
    if w.out_bits < 16:
        y = act_fake_quant(y, w.out_cfg)
    return y
