"""Packed any-precision checkpoint format.

Analog of the reference's packed HF directory (``pack.py:189-203``:
``pytorch_model.bin`` with ``.qweight`` int32 [bits, N, K/32] + ``.lut{b}``
fp16 [N, 2^b] and an ``anyprec`` config dict). Here:

- ``model.npz``: stacked per-module arrays —
    ``layers.{module}.qweight``  int32 [L, bits, N, K/32]
    ``layers.{module}.lut{b}``   f16   [L, N, 2^b]
    plus dense residuals (embed, norms, lm_head) as f32.
- ``config.json``: model config + anyprec metadata
    {seed_precision, parent_precision, group_count}.

Stacking along L keeps the serving forward a single lax.scan.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from ..models.config import ModelConfig
from ..nn.linear import AnyPrecLinear
from ..ops.pack import pack_bitplanes
from ..utils import cache as cache_util


def pack_layer_codes(labels: Dict[str, np.ndarray],
                     parent_precision: int) -> Dict[str, np.ndarray]:
    """{module: [N, G, gs] uint8 labels} -> {module: [bits, N, K/32] int32}."""
    out = {}
    for m, lab in labels.items():
        N, G, gs = lab.shape
        out[m] = pack_bitplanes(lab.reshape(N, G * gs), parent_precision)
    return out


def save_packed(output_dir: str, cfg: ModelConfig, dense_params,
                qweights: List[Dict[str, np.ndarray]],
                luts: List[Dict[int, Dict[str, np.ndarray]]],
                seed_precision: int, parent_precision: int,
                group_count: int = 1) -> None:
    """qweights: per-layer {module: [bits, N, K/32]};
    luts: per-layer {bit: {module: [N, 2^b]}} (group dim already folded)."""
    os.makedirs(output_dir, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    L = cfg.num_layers
    for m in cfg.module_names:
        arrays[f"layers.{m}.qweight"] = np.stack(
            [qweights[l][m] for l in range(L)])
        for b in range(seed_precision, parent_precision + 1):
            arrays[f"layers.{m}.lut{b}"] = np.stack(
                [luts[l][b][m] for l in range(L)]).astype(np.float16)
    # dense residuals
    arrays["embed"] = np.asarray(dense_params["embed"], np.float32)
    arrays["final_norm"] = np.asarray(dense_params["final_norm"], np.float32)
    for k, v in dense_params["layers"].items():
        if k not in cfg.module_names and not hasattr(v, "luts"):
            arrays[f"layers.{k}"] = np.asarray(v, np.float32)
    if not cfg.tie_word_embeddings:
        arrays["lm_head"] = np.asarray(dense_params["lm_head"], np.float32)

    cache_util.save_npz_dict(os.path.join(output_dir, "model.npz"), arrays)
    cache_util.save_json(os.path.join(output_dir, "config.json"), {
        "model_config": cfg.to_json(),
        "anyprec": {
            "seed_precision": seed_precision,
            "parent_precision": parent_precision,
            "group_count": group_count,
        },
    })


def load_packed(model_dir: str, precision: Optional[int] = None,
                dtype=jnp.bfloat16, kernel_layout: bool = True):
    """-> (cfg, params) with AnyPrecLinear leaves (stacked [L, ...]).

    Analog of ``AnyPrecisionForCausalLM.from_quantized``
    (reference AnyPrecisionForCausalLM.py:101-145). ``kernel_layout`` also
    precomputes the lane-tiled operand for the fused decode kernel.
    """
    meta = cache_util.load_json(os.path.join(model_dir, "config.json"))
    cfg = ModelConfig.from_json(meta["model_config"])
    ap = meta["anyprec"]
    seed_b, parent_b = ap["seed_precision"], ap["parent_precision"]
    precision = precision or parent_b
    assert seed_b <= precision <= parent_b, \
        f"precision {precision} outside [{seed_b}, {parent_b}]"

    z = cache_util.load_npz_dict(os.path.join(model_dir, "model.npz"))
    layers: Dict[str, object] = {
        k[len("layers."):]: jnp.asarray(v, dtype)
        for k, v in z.items()
        if k.startswith("layers.") and "." not in k[len("layers."):]
        and not any(k == f"layers.{m}.{s_}" for m in cfg.module_names
                    for s_ in ("qweight",))}
    layers = {k: v for k, v in layers.items() if k not in cfg.module_names}
    from ..nn.linear import with_kernel_layout
    for m in cfg.module_names:
        qw = z[f"layers.{m}.qweight"]
        L, bits, N, Kw = qw.shape
        luts = {b: jnp.asarray(z[f"layers.{m}.lut{b}"], dtype)
                for b in range(seed_b, parent_b + 1)
                if f"layers.{m}.lut{b}" in z}
        w = AnyPrecLinear(
            qweight=jnp.asarray(qw), luts=luts, bias=None,
            precision=precision, out_features=N, in_features=Kw * 32)
        layers[m] = with_kernel_layout(w) if kernel_layout else w
    params = {
        "embed": jnp.asarray(z["embed"], dtype),
        "layers": layers,
        "final_norm": jnp.asarray(z["final_norm"], dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(z["lm_head"], dtype)
    return cfg, params


def mixed_pack(output_dir: str, cfg: ModelConfig, dense_params,
               module_configs: Dict[str, Dict],
               group_count: int = 1) -> None:
    """Mixed-precision pack (reference ``mixed_pack``, pack.py:248-301):
    each module takes its codes/LUTs from a (possibly different) quantized
    cache at its own precision.

    module_configs: {module: {"lut_path": quantized_dir, "precision": b}}.
    Precision is per-module (uniform over layers) so the packed arrays stay
    stacked/scan-ready.
    """
    os.makedirs(output_dir, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    L = cfg.num_layers
    meta_cfg = {}
    for m in cfg.module_names:
        spec = module_configs[m]
        b = spec["precision"]
        # stored labels are at the cache's parent precision; the b-bit code
        # is the MSB prefix (any-precision property)
        parent = max(int(d.split("_")[1])
                     for d in os.listdir(spec["lut_path"])
                     if d.startswith("lut_"))
        qws, luts = [], []
        for l in range(L):
            labels = cache_util.load_npz_dict(cache_util.layer_path(
                os.path.join(spec["lut_path"], "weights"), l))[m]
            lut = cache_util.load_npz_dict(cache_util.layer_path(
                os.path.join(spec["lut_path"], f"lut_{b}"), l))[m]
            N, G, gs = labels.shape
            codes = labels.reshape(N, G * gs) >> (parent - b)
            qws.append(pack_bitplanes(codes, b))
            luts.append(lut.reshape(N, -1))
        arrays[f"layers.{m}.qweight"] = np.stack(qws)
        arrays[f"layers.{m}.lut{b}"] = np.stack(luts).astype(np.float16)
        meta_cfg[m] = {"precision": b}
    arrays["embed"] = np.asarray(dense_params["embed"], np.float32)
    arrays["final_norm"] = np.asarray(dense_params["final_norm"], np.float32)
    for k, v in dense_params["layers"].items():
        if k not in cfg.module_names and not hasattr(v, "luts"):
            arrays[f"layers.{k}"] = np.asarray(v, np.float32)
    if not cfg.tie_word_embeddings:
        arrays["lm_head"] = np.asarray(dense_params["lm_head"], np.float32)
    cache_util.save_npz_dict(os.path.join(output_dir, "model.npz"), arrays)
    cache_util.save_json(os.path.join(output_dir, "config.json"), {
        "model_config": cfg.to_json(),
        "anyprec": {"mixed": True, "module_configs": meta_cfg,
                    "group_count": group_count},
    })


def load_mixed_packed(model_dir: str, dtype=jnp.bfloat16,
                      kernel_layout: bool = True):
    """Load a mixed-precision packed dir -> (cfg, params)."""
    from ..nn.linear import with_kernel_layout
    meta = cache_util.load_json(os.path.join(model_dir, "config.json"))
    cfg = ModelConfig.from_json(meta["model_config"])
    mc = meta["anyprec"]["module_configs"]
    z = cache_util.load_npz_dict(os.path.join(model_dir, "model.npz"))
    layers: Dict[str, object] = {
        k[len("layers."):]: jnp.asarray(v, dtype)
        for k, v in z.items()
        if k.startswith("layers.") and "." not in k[len("layers."):]
        and not any(k == f"layers.{m}.{s_}" for m in cfg.module_names
                    for s_ in ("qweight",))}
    layers = {k: v for k, v in layers.items() if k not in cfg.module_names}
    for m in cfg.module_names:
        b = mc[m]["precision"]
        qw = z[f"layers.{m}.qweight"]
        L, bits, N, Kw = qw.shape
        w = AnyPrecLinear(
            qweight=jnp.asarray(qw),
            luts={b: jnp.asarray(z[f"layers.{m}.lut{b}"], dtype)},
            bias=None, precision=b, out_features=N, in_features=Kw * 32)
        layers[m] = with_kernel_layout(w) if kernel_layout else w
    params = {
        "embed": jnp.asarray(z["embed"], dtype),
        "layers": layers,
        "final_norm": jnp.asarray(z["final_norm"], dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(z["lm_head"], dtype)
    return cfg, params


def set_model_precision(params, precision: int, kernel_layout: bool = True):
    """Switch the active bit-width of every AnyPrecLinear (runtime 2<->8
    switch, reference AnyPrecisionForCausalLM.set_precision)."""
    from ..nn.linear import with_kernel_layout

    def fix(x):
        if isinstance(x, AnyPrecLinear):
            x = x.set_precision(precision)
            if kernel_layout:
                x = with_kernel_layout(x)
        return x
    return {**params, "layers": {
        k: fix(v) for k, v in params["layers"].items()}}
