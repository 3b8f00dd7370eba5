"""QTIP + GuidedQuant quantization pipeline.

Analog of the reference's ``quantize_finetune_llama`` driver
(``qtip/quantize_llama/quantize_finetune_llama.py:109-230``) + ``hfize``:
tokens -> gradients+saliency -> grouped Hessians (shared with the LNQ
pipeline) -> per-layer trellis quantization -> packed trellis checkpoint.
Cache-keyed and layer-resumable like the reference's ``check_exist`` skips.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Sequence

import numpy as np

from ..calib import data as data_util
from ..formats import qtip_format
from ..models.config import ModelConfig
from ..solvers.qtip.codebook import BitshiftCodebook
from ..solvers.qtip.quantize_layer import quantize_linear_qtip
from ..utils import cache as cache_util
from .quantize_scalar import run_gradients_stage, _layer_weights_np
from .quantize_lnq import run_hessians_stage

logger = logging.getLogger(__name__)


def run_qtip_stage(params, cfg: ModelConfig, hessians_path: str,
                   quantized_path: str, cb: BitshiftCodebook,
                   td_x: int, td_y: int, scale_override: float,
                   sigma_reg: float, ft_steps: int = 0, ft_lr: float = 1e-3,
                   stream_format: str = "tile256", cycle: int = 256):
    todo, done = cache_util.done_layers(quantized_path, cfg.num_layers)
    if done:
        logger.info("qtip: skipping completed layers %s", done)
    for l in todo:
        weights = _layer_weights_np(params, cfg, l)
        hess = cache_util.load_npz_dict(cache_util.layer_path(hessians_path, l))
        out: Dict[str, np.ndarray] = {}
        for m in cfg.module_names:
            art = quantize_linear_qtip(
                weights[m], hess[m], cb, td_x=td_x, td_y=td_y,
                scale_override=scale_override, sigma_reg=sigma_reg,
                seed=l, stream_format=stream_format, cycle=cycle)
            if ft_steps:
                from ..solvers.qtip.finetune import finetune_susv
                art = finetune_susv(art, weights[m], hess[m],
                                    steps=ft_steps, lr=ft_lr)
            out[f"{m}.trellis"] = art["trellis"]
            if "kwords" in art:
                out[f"{m}.kwords"] = art["kwords"]
                out[f"{m}.cycle"] = np.asarray(art["cycle"])
            out[f"{m}.SU"] = art["SU"]
            out[f"{m}.SV"] = art["SV"]
            out[f"{m}.Wscale"] = np.asarray(art["Wscale"])
            out[f"{m}.proxy_err"] = np.asarray(art["proxy_err"])
        cache_util.save_npz_dict(cache_util.layer_path(quantized_path, l), out)
        logger.info("qtip: layer %d quantized", l)


def quantize_qtip(
        model, cfg: Optional[ModelConfig] = None, params=None,
        K: int = 2, L: int = 16, V: int = 2, tlut_bits: int = 9,
        decode_mode: str = "quantlut_sym",
        td_x: int = 16, td_y: int = 16,
        scale_override: float = 0.9, sigma_reg: float = 0.01,
        ft_steps: int = 0, ft_lr: float = 1e-3,
        stream_format: str = "tile256", cycle: int = 256,
        mode: str = "pack",
        cache_dir: str = "cache",
        dataset: str = "c4", seq_len: int = 512, num_examples: int = 100,
        num_groups: int = 1, is_nosal: bool = False,
        tokenizer=None, texts: Optional[Sequence[str]] = None,
        tokens: Optional[np.ndarray] = None,
        hessian_batch_size: int = 4,
        cb: Optional[BitshiftCodebook] = None,
) -> Optional[str]:
    """Full QTIP pipeline; K is bits-per-weight. Returns packed dir."""
    assert mode in ("tokens", "hessians", "quantize", "pack")
    if cfg is None or params is None:
        from ..models.hf_import import load_hf_model
        cfg, params = load_hf_model(model)
    model_name = str(model).split("/")[-1]
    key = cache_util.dataset_key(model_name, dataset, num_examples, seq_len)

    tokens_path = f"{cache_dir}/tokens/{key}.npy"
    gradients_path = f"{cache_dir}/gradients/{key}.npz"
    saliency_path = f"{cache_dir}/saliency/{key}_g{num_groups}"
    nosal = "_nosal" if is_nosal else ""
    hessians_path = f"{cache_dir}/hessians/{key}_g{num_groups}{nosal}"
    ftag = "" if stream_format == "tile256" else f"_{stream_format}"
    tag = f"{decode_mode}_L{L}K{K}V{V}t{tlut_bits}{ftag}"
    quantized_path = (f"{cache_dir}/qtip_quantized/"
                      f"{model_name}-{tag}-{dataset}_s{num_examples}"
                      f"_blk{seq_len}_g{num_groups}{nosal}")
    packed_path = (f"{cache_dir}/qtip_packed/"
                   f"qtip-{model_name}-{tag}-{dataset}_s{num_examples}"
                   f"_blk{seq_len}_g{num_groups}{nosal}")

    if tokens is None:
        tokens = data_util.get_tokens(dataset, "train", tokenizer, seq_len,
                                      num_examples, save_path=tokens_path,
                                      texts=texts)
    if mode == "tokens":
        return None

    run_gradients_stage(params, cfg, tokens, gradients_path, saliency_path,
                        num_groups)
    run_hessians_stage(params, cfg, tokens, saliency_path, hessians_path,
                       num_groups, is_nosal, batch_size=hessian_batch_size)
    if mode == "hessians":
        return None

    if cb is None:
        cb = BitshiftCodebook(L=L, K=K, V=V, tlut_bits=tlut_bits,
                              decode_mode=decode_mode)
    # Pin the codebook table to the layer cache: completed layers were
    # Viterbi-encoded against a specific tlut, and table construction
    # (make_kmeans_tlut) is not bit-stable across code versions. On
    # resume the stored table replaces the freshly built one, so both
    # the remaining layers and the pack stage stay self-consistent.
    if cb.tlut is not None:
        tlut_path = os.path.join(quantized_path, "tlut.npz")
        if os.path.exists(tlut_path):
            stored = cache_util.load_npz_dict(tlut_path)["tlut"]
            if not np.allclose(stored, cb.tlut):
                logger.info("qtip: resuming with the cache's pinned tlut "
                            "(differs from the freshly built table)")
                cb = BitshiftCodebook(L=cb.L, K=cb.K, V=cb.V,
                                      tlut_bits=cb.tlut_bits,
                                      decode_mode=cb.decode_mode,
                                      tlut=stored)
        else:
            os.makedirs(quantized_path, exist_ok=True)
            cache_util.save_npz_dict(tlut_path, {"tlut": cb.tlut})
    run_qtip_stage(params, cfg, hessians_path, quantized_path, cb,
                   td_x, td_y, scale_override, sigma_reg,
                   ft_steps=ft_steps, ft_lr=ft_lr,
                   stream_format=stream_format, cycle=cycle)
    if mode == "quantize":
        return quantized_path

    qtip_format.save_packed(packed_path, cfg, params, quantized_path, cb,
                            td_x, td_y)
    return packed_path
