"""On-device / external export.

Analog of the reference's ``convert_to_executorch``
(``spin_quant/utils/convert_to_executorch.py:298``): repack a W4A4
(SpinQuant) model into the int-weight + per-channel-scale layout on-device
runtimes consume, with sanitized keys. We export a framework-neutral npz
(int8-held int4 weights, f32 scales, dense residuals) plus a manifest.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from ..models.config import ModelConfig
from ..nn.act_quant import ActQuantLinear
from ..utils import cache as cache_util


def export_int_weights(params: Dict, cfg: ModelConfig, output_dir: str,
                       bits: int = 4) -> str:
    """ActQuantLinear (fake-quant dense) params -> int-weight export.

    Recovers the integer grid from the fake-quantized weights: per row,
    scale = max|w| / maxq, q = round(w / scale). Exact when the weights came
    from an unclipped symmetric quantizer at the same bit-width (for
    MSE-clipped runs, the per-element recon_err reports the residual; pass
    the Wint/Scale captured by gptq_quantize for exactness).
    """
    os.makedirs(output_dir, exist_ok=True)
    maxq = 2 ** (bits - 1) - 1
    arrays: Dict[str, np.ndarray] = {}
    for m in cfg.module_names:
        w = params["layers"][m]
        W = np.asarray(w.weight if isinstance(w, ActQuantLinear) else w,
                       np.float32)
        amax = np.abs(W).max(axis=-1, keepdims=True)
        scale = np.maximum(amax, 1e-12) / maxq
        q = np.clip(np.round(W / scale), -maxq - 1, maxq)
        resid = np.abs(q * scale - W).max()
        arrays[f"layers.{m}.int_weight"] = q.astype(np.int8)
        arrays[f"layers.{m}.scale"] = scale[..., 0].astype(np.float32)
        arrays[f"layers.{m}.recon_err"] = np.float32(resid)
    for k, v in params["layers"].items():
        if k not in cfg.module_names and not hasattr(v, "weight"):
            arrays[f"layers.{k}"] = np.asarray(v, np.float32)
    arrays["embed"] = np.asarray(params["embed"], np.float32)
    arrays["final_norm"] = np.asarray(params["final_norm"], np.float32)
    if "lm_head" in params:
        head = params["lm_head"]
        arrays["lm_head"] = np.asarray(
            getattr(head, "weight", head), np.float32)
    cache_util.save_npz_dict(os.path.join(output_dir, "int_model.npz"),
                             arrays)
    cache_util.save_json(os.path.join(output_dir, "manifest.json"), {
        "model_config": cfg.to_json(),
        "weight_bits": bits,
        "layout": "int8-held int{bits} symmetric per-out-channel".format(
            bits=bits),
    })
    return output_dir
