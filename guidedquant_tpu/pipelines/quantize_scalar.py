"""SqueezeLLM/any-precision scalar quantization pipeline.

Analog of ``any_precision_quantize`` (reference
``any_precision/quantization/main.py:19-211``): tokens -> gradients
(+grouped saliency) -> seed k-means + upscale -> pack. Cache-keyed and
stage/layer-resumable.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Sequence

import numpy as np

from ..calib import data as data_util
from ..calib.gradients import get_gradients
from ..models.config import ModelConfig
from ..formats import anyprec
from ..solvers.seed import seed_and_upscale_layer
from ..utils import cache as cache_util

logger = logging.getLogger(__name__)

DEFAULT_DATASET = "c4"
DEFAULT_SEQ_LEN = 512
DEFAULT_NUM_EXAMPLES = 100
DEFAULT_SEED_PRECISION = 3
DEFAULT_PARENT_PRECISION = 8


def _layer_weights_np(params, cfg: ModelConfig, l: int) -> Dict[str, np.ndarray]:
    return {m: np.asarray(params["layers"][m][l], np.float32)
            for m in cfg.module_names}


def run_gradients_stage(params, cfg: ModelConfig, tokens: np.ndarray,
                        gradients_path: str, saliency_path: Optional[str],
                        num_groups: Optional[int]):
    """Gradient + saliency capture with caching."""
    if os.path.exists(gradients_path) and (
            saliency_path is None or
            not cache_util.done_layers(saliency_path, cfg.num_layers)[0]):
        logger.info("gradients cached at %s", gradients_path)
        z = cache_util.load_npz_dict(gradients_path)
        grads = [{m: z[f"l{l}.{m}"] for m in cfg.module_names}
                 for l in range(cfg.num_layers)]
        return grads

    grads, sal = get_gradients(params, cfg, tokens,
                               num_groups=num_groups or 1,
                               compute_saliency=saliency_path is not None)
    flat = {f"l{l}.{m}": grads[l][m] for l in range(cfg.num_layers)
            for m in cfg.module_names}
    cache_util.save_npz_dict(gradients_path, flat)
    if saliency_path is not None:
        for l in range(cfg.num_layers):
            cache_util.save_npz_dict(
                cache_util.layer_path(saliency_path, l),
                {m: sal[l][m].astype(np.float32) for m in cfg.module_names})
    return grads


def run_seed_stage(params, cfg: ModelConfig, grads, quantized_path: str,
                   seed_precision: int, parent_precision: int):
    """Per-layer seed+upscale with skip-if-present resume."""
    todo, done = cache_util.done_layers(
        os.path.join(quantized_path, "weights"), cfg.num_layers)
    if done:
        logger.info("seed: skipping completed layers %s", done)
    for l in todo:
        weights = _layer_weights_np(params, cfg, l)
        luts, labels = seed_and_upscale_layer(
            weights, grads[l], seed_precision, parent_precision)
        cache_util.save_npz_dict(
            cache_util.layer_path(os.path.join(quantized_path, "weights"), l),
            {m: labels[m].astype(np.uint8) for m in cfg.module_names})
        for i, b in enumerate(range(seed_precision, parent_precision + 1)):
            cache_util.save_npz_dict(
                cache_util.layer_path(
                    os.path.join(quantized_path, f"lut_{b}"), l),
                {m: luts[m][i].astype(np.float16) for m in cfg.module_names})
        logger.info("seed: layer %d done", l)


def run_pack_stage(params, cfg: ModelConfig, quantized_path: str,
                   output_path: str, seed_precision: int,
                   parent_precision: int):
    qweights, luts = [], []
    for l in range(cfg.num_layers):
        labels = cache_util.load_npz_dict(
            cache_util.layer_path(os.path.join(quantized_path, "weights"), l))
        qweights.append(anyprec.pack_layer_codes(labels, parent_precision))
        by_bit = {}
        for b in range(seed_precision, parent_precision + 1):
            lut_l = cache_util.load_npz_dict(
                cache_util.layer_path(os.path.join(quantized_path, f"lut_{b}"), l))
            # fold group dim (group_count==1): [N, 1, 2^b] -> [N, 2^b]
            by_bit[b] = {m: v.reshape(v.shape[0], -1) for m, v in lut_l.items()}
        luts.append(by_bit)
    anyprec.save_packed(output_path, cfg, params, qweights, luts,
                        seed_precision, parent_precision)
    logger.info("packed model written to %s", output_path)


def any_precision_quantize(
        model, cfg: Optional[ModelConfig] = None, params=None,
        seed_precision: int = DEFAULT_SEED_PRECISION,
        parent_precision: int = DEFAULT_PARENT_PRECISION,
        mode: str = "pack",
        cache_dir: str = "cache",
        dataset: str = DEFAULT_DATASET,
        seq_len: int = DEFAULT_SEQ_LEN,
        num_examples: int = DEFAULT_NUM_EXAMPLES,
        num_groups: Optional[int] = None,
        tokenizer=None, texts: Optional[Sequence[str]] = None,
        tokens: Optional[np.ndarray] = None,
) -> Optional[str]:
    """Full scalar pipeline. ``model`` is a name (for cache keys); cfg/params
    must be supplied (or an HF path for ``model`` with auto-import).

    Returns the packed model dir (mode='pack').
    """
    assert mode in ("tokens", "gradients", "quantize", "pack")
    if cfg is None or params is None:
        from ..models.hf_import import load_hf_model
        cfg, params = load_hf_model(model)
    model_name = str(model).split("/")[-1]
    key = cache_util.dataset_key(model_name, dataset, num_examples, seq_len)

    tokens_path = f"{cache_dir}/tokens/{key}.npy"
    gradients_path = f"{cache_dir}/gradients/{key}.npz"
    saliency_path = (f"{cache_dir}/saliency/{key}_g{num_groups}"
                     if num_groups else None)
    quantized_path = (f"{cache_dir}/quantized/"
                      f"{model_name}-w{parent_precision}_orig{seed_precision}"
                      f"-{dataset}_s{num_examples}_blk{seq_len}")
    packed_path = (f"{cache_dir}/packed/"
                   f"anyprec-{model_name}-w{parent_precision}"
                   f"_orig{seed_precision}-{dataset}_s{num_examples}"
                   f"_blk{seq_len}")

    if tokens is None:
        tokens = data_util.get_tokens(dataset, "train", tokenizer, seq_len,
                                      num_examples, save_path=tokens_path,
                                      texts=texts)
    if mode == "tokens":
        return None

    grads = run_gradients_stage(params, cfg, tokens, gradients_path,
                                saliency_path, num_groups)
    if mode == "gradients":
        return None

    run_seed_stage(params, cfg, grads, quantized_path, seed_precision,
                   parent_precision)
    if mode == "quantize":
        return quantized_path

    run_pack_stage(params, cfg, quantized_path, packed_path,
                   seed_precision, parent_precision)
    return packed_path
