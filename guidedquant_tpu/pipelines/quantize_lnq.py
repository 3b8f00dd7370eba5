"""LNQ + GuidedQuant pipeline (the flagship).

Analog of ``layerwise_nuq`` (reference
``any_precision/quantization/layerwise_main.py:25-213``):
tokens -> gradients+saliency -> saliency-weighted Hessians -> SqueezeLLM
seed init at seed_precision -> LNQ alternating solve -> pack. Cache-keyed,
layer-resumable at the Hessian and quantize stages.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import numpy as np

from ..calib import data as data_util
from ..calib.hessians import accumulate_hessians
from ..models.config import ModelConfig
from ..solvers.lnq import train_least_squares
from ..utils import cache as cache_util
from .quantize_scalar import (
    run_gradients_stage, run_seed_stage, run_pack_stage, _layer_weights_np,
    DEFAULT_DATASET, DEFAULT_NUM_EXAMPLES, DEFAULT_SEED_PRECISION,
    DEFAULT_SEQ_LEN)

logger = logging.getLogger(__name__)


def run_hessians_stage(params, cfg: ModelConfig, tokens, saliency_path: str,
                       hessians_path: str, num_groups: int,
                       is_nosal: bool = False, batch_size: int = 4):
    todo, done = cache_util.done_layers(hessians_path, cfg.num_layers)
    if not todo:
        logger.info("hessians: all layers cached")
        return
    saliency = []
    for l in range(cfg.num_layers):
        sal_l = cache_util.load_npz_dict(cache_util.layer_path(saliency_path, l))
        if is_nosal:
            sal_l = {m: np.ones_like(v) for m, v in sal_l.items()}
        saliency.append(sal_l)

    def save_layer(l, hess_l):
        cache_util.save_npz_dict(cache_util.layer_path(hessians_path, l),
                                 {m: v.astype(np.float32)
                                  for m, v in hess_l.items()})

    lo, hi = min(todo), max(todo) + 1
    accumulate_hessians(params, cfg, tokens, saliency, num_groups=num_groups,
                        batch_size=batch_size, layer_range=(lo, hi),
                        on_layer_done=save_layer)


def run_lnq_stage(params, cfg: ModelConfig, init_path: str, hessians_path: str,
                  quantized_path: str, seed_precision: int,
                  num_iterations: int, cd_cycles: int,
                  sub_qlayer=None, shared_shape_tile=None,
                  codebook_family: str = "free"):
    todo, done = cache_util.done_layers(
        os.path.join(quantized_path, "weights"), cfg.num_layers)
    if sub_qlayer:
        todo = [l for l in todo if sub_qlayer[0] <= l < sub_qlayer[1]]
    if done:
        logger.info("lnq: skipping completed layers %s", done)
    ncl = 2 ** seed_precision
    for l in todo:
        weights = _layer_weights_np(params, cfg, l)
        init_labels = cache_util.load_npz_dict(
            cache_util.layer_path(os.path.join(init_path, "weights"), l))
        init_luts = cache_util.load_npz_dict(
            cache_util.layer_path(
                os.path.join(init_path, f"lut_{seed_precision}"), l))
        hess = cache_util.load_npz_dict(
            cache_util.layer_path(hessians_path, l))

        labels_out, luts_out, logs = {}, {}, {}
        for m in cfg.module_names:
            W = weights[m]
            N, K = W.shape
            lab0 = init_labels[m].reshape(N, K).astype(np.int32)
            C0 = init_luts[m].astype(np.float32).reshape(N, ncl)
            H = hess[m]  # [G, K, K]
            lab, C, log = train_least_squares(
                W, lab0, C0, H, num_iterations=num_iterations,
                cd_cycles=cd_cycles, shared_shape_tile=shared_shape_tile,
                codebook_family=codebook_family)
            labels_out[m] = lab.reshape(N, 1, K)
            luts_out[m] = C.reshape(N, 1, ncl).astype(np.float16)
            logs[m] = log
            logger.info("lnq: layer %d %s done (obj %.6f -> %.6f)", l, m,
                        log["objective"][0], min(log["objective"]))
        cache_util.save_npz_dict(
            cache_util.layer_path(os.path.join(quantized_path, "weights"), l),
            labels_out)
        cache_util.save_npz_dict(
            cache_util.layer_path(
                os.path.join(quantized_path, f"lut_{seed_precision}"), l),
            luts_out)
        cache_util.save_json(
            os.path.join(quantized_path, f"log_dict{l}.json"),
            {m: {k: list(map(float, v)) for k, v in lg.items()}
             for m, lg in logs.items()})


def layerwise_nuq(
        model, cfg: Optional[ModelConfig] = None, params=None,
        seed_precision: int = DEFAULT_SEED_PRECISION,
        mode: str = "pack",
        cache_dir: str = "cache",
        dataset: str = DEFAULT_DATASET,
        seq_len: int = DEFAULT_SEQ_LEN,
        num_examples: int = DEFAULT_NUM_EXAMPLES,
        num_groups: int = 1,
        num_iterations: int = 3,
        cd_cycles: int = 4,
        sub_qlayer=None,
        is_nosal: bool = False,
        shared_shape_tile=None,
        codebook_family: str = "free",
        tokenizer=None, texts: Optional[Sequence[str]] = None,
        tokens: Optional[np.ndarray] = None,
        hessian_batch_size: int = 4,
) -> Optional[str]:
    """Flagship LNQ pipeline. Returns packed model dir (mode='pack')."""
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
    ss = f"_ss{shared_shape_tile}" if shared_shape_tile else ""
    if codebook_family != "free":
        ss += f"_{codebook_family}"
    hessians_path = f"{cache_dir}/hessians/{key}_g{num_groups}{nosal}"
    init_path = (f"{cache_dir}/quantized/"
                 f"{model_name}-w{seed_precision}_orig{seed_precision}"
                 f"-{dataset}_s{num_examples}_blk{seq_len}")
    quantized_path = (f"{cache_dir}/layerwise_quantized/"
                      f"{model_name}-w{seed_precision}-{dataset}"
                      f"_s{num_examples}_blk{seq_len}_g{num_groups}"
                      f"_iter{num_iterations}_cd{cd_cycles}{nosal}{ss}")
    packed_path = (f"{cache_dir}/layerwise_packed/"
                   f"layerwise-{model_name}-w{seed_precision}-{dataset}"
                   f"_s{num_examples}_blk{seq_len}_g{num_groups}"
                   f"_iter{num_iterations}_cd{cd_cycles}{nosal}{ss}")

    if tokens is None:
        tokens = data_util.get_tokens(dataset, "train", tokenizer, seq_len,
                                      num_examples, save_path=tokens_path,
                                      texts=texts)
    if mode == "tokens":
        return None

    # gradients stage provides both the saliency and the seed-init weights
    grads = run_gradients_stage(params, cfg, tokens, gradients_path,
                                saliency_path, num_groups)
    run_hessians_stage(params, cfg, tokens, saliency_path, hessians_path,
                       num_groups, is_nosal, batch_size=hessian_batch_size)
    if mode == "hessians":
        return None

    # SqueezeLLM seed init at seed_precision (required initialization,
    # reference layerwise_main.py:151-155)
    run_seed_stage(params, cfg, grads, init_path, seed_precision,
                   seed_precision)
    run_lnq_stage(params, cfg, init_path, hessians_path, quantized_path,
                  seed_precision, num_iterations, cd_cycles, sub_qlayer,
                  shared_shape_tile=shared_shape_tile,
                  codebook_family=codebook_family)
    if mode == "quantize":
        return quantized_path

    run_pack_stage(params, cfg, quantized_path, packed_path,
                   seed_precision, seed_precision)
    return packed_path
