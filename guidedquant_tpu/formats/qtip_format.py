"""Packed QTIP trellis checkpoint format.

Analog of the reference's hfized QTIP checkpoint (per-layer ``.pt`` shards
with {trellis, SU, SV, Wscale, tlut} assembled by
``qtip/quantize_llama/hfize_llama.py:21-129`` into an HF model with
``quip_params`` config): one ``model.npz`` with stacked per-module arrays
plus dense residuals, and a ``config.json`` carrying the trellis config.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from ..models.config import ModelConfig
from ..nn.trellis import TrellisLinear, decode_trellis_dense
from ..solvers.qtip.codebook import BitshiftCodebook
from ..utils import cache as cache_util


def save_packed(output_dir: str, cfg: ModelConfig, dense_params,
                quantized_path: str, cb: BitshiftCodebook,
                td_x: int, td_y: int) -> None:
    os.makedirs(output_dir, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    L = cfg.num_layers
    per_layer = [cache_util.load_npz_dict(
        cache_util.layer_path(quantized_path, l)) for l in range(L)]
    has_kwords = f"{cfg.module_names[0]}.kwords" in per_layer[0]
    for m in cfg.module_names:
        arrays[f"layers.{m}.trellis"] = np.stack(
            [per_layer[l][f"{m}.trellis"] for l in range(L)])
        if has_kwords:
            arrays[f"layers.{m}.kwords"] = np.stack(
                [per_layer[l][f"{m}.kwords"] for l in range(L)])
            arrays[f"layers.{m}.cycle"] = np.asarray(
                per_layer[0][f"{m}.cycle"])
        arrays[f"layers.{m}.SU"] = np.stack(
            [per_layer[l][f"{m}.SU"] for l in range(L)])
        arrays[f"layers.{m}.SV"] = np.stack(
            [per_layer[l][f"{m}.SV"] for l in range(L)])
        arrays[f"layers.{m}.Wscale"] = np.stack(
            [per_layer[l][f"{m}.Wscale"] for l in range(L)])
    if cb.tlut is not None:
        arrays["tlut"] = cb.tlut
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
        "quip_params": {
            "L": cb.L, "K": cb.K, "V": cb.V, "tlut_bits": cb.tlut_bits,
            "decode_mode": cb.decode_mode, "td_x": td_x, "td_y": td_y,
            "stream_format": "column" if has_kwords else "tile256",
        },
    })


def load_packed(model_dir: str, dtype=jnp.bfloat16, cache_dense: bool = True,
                cb: Optional[BitshiftCodebook] = None):
    """-> (cfg, params) with stacked TrellisLinear leaves."""
    meta = cache_util.load_json(os.path.join(model_dir, "config.json"))
    cfg = ModelConfig.from_json(meta["model_config"])
    qp = meta["quip_params"]
    z = cache_util.load_npz_dict(os.path.join(model_dir, "model.npz"))
    if cb is None:
        cb = BitshiftCodebook(L=qp["L"], K=qp["K"], V=qp["V"],
                              tlut_bits=qp["tlut_bits"],
                              decode_mode=qp["decode_mode"],
                              tlut=z.get("tlut"))
    td_x, td_y = qp["td_x"], qp["td_y"]

    # module geometry
    d, f = cfg.hidden_size, cfg.intermediate_size
    dims = {"q_proj": (cfg.q_dim, d), "k_proj": (cfg.kv_dim, d),
            "v_proj": (cfg.kv_dim, d), "o_proj": (d, cfg.q_dim),
            "gate_proj": (f, d), "up_proj": (f, d), "down_proj": (d, f)}

    layers: Dict[str, object] = {
        k[len("layers."):]: jnp.asarray(v, dtype)
        for k, v in z.items()
        if k.startswith("layers.") and "." not in k[len("layers."):]
        and not any(k == f"layers.{m}.{s_}" for m in cfg.module_names
                    for s_ in ("qweight",))}
    layers = {k: v for k, v in layers.items() if k not in cfg.module_names}
    for mname in cfg.module_names:
        m, n = dims[mname]
        tr = z[f"layers.{mname}.trellis"]
        kwords = z.get(f"layers.{mname}.kwords")
        cycle = int(z.get(f"layers.{mname}.cycle", 256))
        hatW = None
        if kwords is None and cache_dense:
            hatW = jnp.asarray(np.stack([
                decode_trellis_dense(cb, tr[l].view(np.uint16), m, n,
                                     td_x, td_y)
                for l in range(cfg.num_layers)]), dtype)
        layers[mname] = TrellisLinear(
            trellis=jnp.asarray(tr.view(np.int16)),
            SU=jnp.asarray(z[f"layers.{mname}.SU"]),
            SV=jnp.asarray(z[f"layers.{mname}.SV"]),
            Wscale=jnp.asarray(z[f"layers.{mname}.Wscale"]),
            hatW=hatW,
            kwords=None if kwords is None else jnp.asarray(kwords),
            cycle=cycle,
            L_bits=cb.L, K=cb.K, V=cb.V, tlut_bits=cb.tlut_bits,
            decode_mode=cb.decode_mode, td_x=td_x, td_y=td_y,
            out_features=m, in_features=n)
    params = {
        "embed": jnp.asarray(z["embed"], dtype),
        "layers": layers,
        "final_norm": jnp.asarray(z["final_norm"], dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(z["lm_head"], dtype)
    return cfg, params
