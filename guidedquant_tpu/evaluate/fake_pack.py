"""Fake-pack: reconstruct a dense model from packed artifacts.

Analog of the reference's ``fake_pack`` (``any_precision/evaluate/eval.py:
14-127``): dequantize LUT+codes back into dense weights so quantization
quality can be studied with the plain dense forward (and so checkpoints can
be exported to frameworks that don't know the packed format).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from ..models.config import ModelConfig
from ..nn.linear import AnyPrecLinear, dequantize_anyprec


def fake_pack(params: Dict, cfg: ModelConfig, precision: int = None,
              dtype=jnp.float32) -> Dict:
    """Packed params (AnyPrecLinear leaves) -> dense params."""
    layers = dict(params["layers"])
    for m in cfg.module_names:
        w = layers[m]
        if not isinstance(w, AnyPrecLinear):
            continue
        bits = precision or w.precision
        qw = np.asarray(w.qweight)
        if qw.ndim == 4:  # stacked
            import jax
            dense = jnp.stack([
                dequantize_anyprec(
                    jax.tree_util.tree_map(lambda x: x[l], w), bits, dtype)
                for l in range(qw.shape[0])])
        else:
            dense = dequantize_anyprec(w, bits, dtype)
        layers[m] = dense
    out = dict(params)
    out["layers"] = layers
    return out
