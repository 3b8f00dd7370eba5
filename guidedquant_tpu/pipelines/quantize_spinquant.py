"""SpinQuant W4A4 PTQ pipeline.

Analog of the reference's ``ptq.py`` / ``eval_utils/main.py:ptq_model``
(``spin_quant/ptq.py:24-116``): fuse norms -> fold R1/R2 rotations -> R4
Hadamard on down_proj -> (guided) GPTQ weight quantization against
rotated-input Hessians -> activation-quant wrappers -> eval-ready model.

Saliency comes from the *original* model's gradient stage (the reference
loads ``saliency/l{i}.pt`` computed by the any-precision pipeline);
Hessians are accumulated on the rotated model's module inputs, with the R4
Hadamard applied to the down_proj Hessian in closed form (H' = M H M^T).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from ..calib import data as data_util
from ..models.config import ModelConfig
from ..nn.act_quant import ActQuantLinear
from ..ops.hadamard import hadamard_matrix
from ..solvers.spinquant import gptq as gptq_mod
from ..solvers.spinquant.quant import WeightQuantConfig, rtn_quantize
from ..solvers.spinquant.rotation import (
    fuse_layer_norms, rotate_model, apply_r4_to_down, random_orthogonal)
from ..utils import cache as cache_util
from .quantize_scalar import run_gradients_stage, _layer_weights_np
from .quantize_lnq import run_hessians_stage

logger = logging.getLogger(__name__)


def _transform_down_hessian(H: np.ndarray, f: int) -> np.ndarray:
    """Runtime applies h' = matmul_hadU(h) = h @ Hm before down_proj, so the
    Hessian of the folded weight is H' = Hm^T H Hm."""
    Hm = hadamard_matrix(f)
    # two BLAS matmuls per group — a three-operand np.einsum without
    # optimize= evaluates the naive O(f^4) nested loop (hours at f=1536)
    H64 = np.asarray(H, np.float64)
    out = np.stack([Hm.T @ Hg @ Hm for Hg in H64])
    return out.astype(np.float32)


def spinquant_ptq(
        model, cfg: Optional[ModelConfig] = None, params=None,
        w_bits: int = 4, a_bits: int = 4,
        w_groupsize: int = -1, w_clip: bool = True, w_asym: bool = False,
        a_clip_ratio: float = 1.0, a_asym: bool = True,
        rotate: bool = True,
        R1: Optional[np.ndarray] = None, R2: Optional[np.ndarray] = None,
        guided: bool = False, num_groups: int = 1,
        percdamp: float = 0.01, actorder: bool = False,
        use_rtn: bool = False,
        cache_dir: str = "cache",
        dataset: str = "wikitext2", seq_len: int = 2048,
        num_examples: int = 128,
        tokenizer=None, texts: Optional[Sequence[str]] = None,
        tokens: Optional[np.ndarray] = None,
        hessian_batch_size: int = 4,
        rotation_seed: int = 0,
):
    """Returns (cfg', params') — the W4A4 fake-quant model (ActQuantLinear
    leaves)."""
    if cfg is None or params is None:
        from ..models.hf_import import load_hf_model
        cfg, params = load_hf_model(model)
    model_name = str(model).split("/")[-1]
    key = cache_util.dataset_key(model_name, dataset, num_examples, seq_len)
    G = num_groups if guided else 1

    if tokens is None:
        tokens_path = f"{cache_dir}/tokens/{key}.npy"
        tokens = data_util.get_tokens(dataset, "train", tokenizer, seq_len,
                                      num_examples, save_path=tokens_path,
                                      texts=texts)

    # 1) saliency from the ORIGINAL model
    gradients_path = f"{cache_dir}/gradients/{key}.npz"
    saliency_path = f"{cache_dir}/saliency/{key}_g{G}"
    if guided:
        run_gradients_stage(params, cfg, tokens, gradients_path,
                            saliency_path, G)

    # 2) fuse + rotate
    qcfg = cfg
    if rotate:
        params, qcfg = fuse_layer_norms(params, cfg)
        if R1 is None:
            R1 = random_orthogonal(cfg.hidden_size, seed=rotation_seed)
        if R2 is None:
            R2 = np.stack([random_orthogonal(cfg.head_dim,
                                             seed=rotation_seed + 1 + l)
                           for l in range(cfg.num_layers)])
        params = rotate_model(params, qcfg, R1, R2)

    # 3) Hessians on the R1/R2-rotated model (guided or unweighted).
    # R4 is NOT yet folded here: the dense forward used by the Hessian stage
    # applies no online Hadamard before down_proj, so folding R4 first would
    # corrupt the residual stream (x @ Hm^T @ W^T != x @ W^T). down_proj's
    # Hessian is mapped into the folded basis in closed form afterwards
    # (_transform_down_hessian), matching the reference which captures
    # inputs pre-Hadamard (spin_quant/eval_utils/gptq_guided_utils.py:49-78).
    rtag = "_rotpre4" if rotate else ""  # pre-R4 capture (cache-key bump)
    hessians_path = (f"{cache_dir}/hessians/{key}_g{G}"
                     f"{'' if guided else '_nosal'}{rtag}_sq")
    if not use_rtn:
        if not guided:
            # unweighted hessians need a saliency dir of ones; synthesize
            sal_ones = f"{cache_dir}/saliency/{key}_g1_ones"
            for l in range(qcfg.num_layers):
                p = cache_util.layer_path(sal_ones, l)
                if not os.path.exists(p):
                    N, S = tokens.shape
                    cache_util.save_npz_dict(p, {
                        m: np.ones((N, S, 1), np.float32)
                        for m in qcfg.module_names})
            sal_src = sal_ones
        else:
            sal_src = saliency_path
        run_hessians_stage(params, qcfg, tokens, sal_src, hessians_path,
                           G, is_nosal=False,
                           batch_size=hessian_batch_size)

    # 3.5) now fold the exact R4 Hadamard into down_proj; quantization below
    # sees the folded weight + basis-transformed Hessian.
    if rotate:
        params = apply_r4_to_down(params, qcfg)

    # 4) GPTQ (or RTN) per layer
    wq = WeightQuantConfig(bits=w_bits, perchannel=True, sym=not w_asym,
                           mse=w_clip)
    # native integer path: per-channel symmetric weights only (grouped
    # scales would need per-group int accumulation)
    native_ok = (not use_rtn and not w_asym and w_groupsize <= 0
                 and 2 <= w_bits <= 8)
    new_layers: Dict[str, list] = {m: [] for m in qcfg.module_names}
    new_ints: Dict[str, list] = {m: [] for m in qcfg.module_names}
    new_scales: Dict[str, list] = {m: [] for m in qcfg.module_names}
    for l in range(qcfg.num_layers):
        weights = _layer_weights_np(params, qcfg, l)
        hess = None
        if not use_rtn:
            hess = cache_util.load_npz_dict(
                cache_util.layer_path(hessians_path, l))
        for m in qcfg.module_names:
            W = weights[m]
            if use_rtn:
                Q = rtn_quantize(W, wq)
            else:
                H = hess[m]
                if rotate and m == "down_proj":
                    H = _transform_down_hessian(H, qcfg.intermediate_size)
                Q, Wint, Scale = gptq_mod.gptq_quantize(
                    W, H, wq, percdamp=percdamp,
                    groupsize=w_groupsize, actorder=actorder)
                if native_ok:
                    new_ints[m].append(Wint.astype(np.int8))
                    new_scales[m].append(Scale[:, 0].astype(np.float32))
            new_layers[m].append(Q)
        logger.info("spinquant: layer %d quantized", l)

    # 5) assemble W4A4 model with activation wrappers. With exact GPTQ
    # integer codes available, the runtime gets the MXU int8 execution
    # path (see nn.act_quant) — identical math to the fake-quant model.
    layers = dict(params["layers"])
    for m in qcfg.module_names:
        Wq = jnp.asarray(np.stack(new_layers[m]), jnp.float32)
        native = {}
        if native_ok:
            wi = np.stack(new_ints[m])
            native = dict(
                wq=jnp.asarray(wi),
                wscale=jnp.asarray(np.stack(new_scales[m])),
                wq_rowsum=jnp.asarray(wi.astype(np.float32).sum(-1)))
        layers[m] = ActQuantLinear(
            weight=Wq, bias=None,
            in_bits=a_bits, in_sym=not a_asym, in_clip=a_clip_ratio,
            online_had=(rotate and m == "down_proj"), **native)
    out_params = dict(params)
    out_params["layers"] = layers
    return qcfg, out_params
