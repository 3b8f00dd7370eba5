"""End-loss gradient and saliency capture.

TPU-native analog of the reference's hook-based capture
(``any_precision/quantization/gradients.py:10-224``):

- weight "gradients": per-module sum over calibration sequences of the
  *squared* weight gradient (the reference's ``square_grad_hook`` at
  ``gradients.py:131-137`` squares each backward's contribution before
  autograd accumulates it).
- saliency: per-module output-activation gradients, channel-grouped:
  ``mean_group((1e3 * g)^2)`` -> [num_seqs, seq_len, num_groups]
  (``gradients.py:98-113``).

Instead of hooks, the forward threads zero-valued additive "taps" through
every module output (``llama.forward_unrolled(taps=...)``); one ``jax.grad``
over (params, taps) yields both quantities in a single backward.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.config import ModelConfig

logger = logging.getLogger(__name__)

SALIENCY_SCALE = 1e3  # reference gradients.py:106


def _loss_fn(params, taps, cfg: ModelConfig, tokens, tap_range):
    logits = llama.forward_unrolled(params, cfg, tokens, taps=taps,
                                    tap_range=tap_range)
    return llama.cross_entropy_loss(logits, tokens)


@partial(jax.jit, static_argnames=("cfg", "num_groups", "tap_range"))
def gradient_step(params, cfg: ModelConfig, tokens: jnp.ndarray,
                  num_groups: int, tap_range=None):
    """One calibration sequence batch -> (squared weight grads, saliency).

    tokens: [B, S]. Returns:
      gsq:      {module: [L, out, in]} squared weight gradients (f32)
      saliency: {module: [L_tapped, B, S, G]}

    ``tap_range``: optional (lo, hi) — taps (and thus saliency memory) only
    for layers in the range (the reference's ``sub_saliency`` job-splitting
    flag, gradients.py:116-121).
    """
    L = llama.num_layers_of(params)
    B, S = tokens.shape
    lo, hi = tap_range or (0, L)

    # Per-SEQUENCE backwards (vmap over the batch): the reference's
    # square_grad_hook squares each sequence's weight gradient before
    # accumulating (sum_n g_n^2), which a single batched backward cannot
    # recover — (mean_n g_n)^2 != sum_n g_n^2 for B > 1. vmap keeps the
    # statistic exact at any batch size (incl. the dp-sharded mesh path).
    def per_seq(tok):
        taps = llama.make_taps(cfg, hi - lo, 1, S)
        wg, tg = jax.grad(_loss_fn, argnums=(0, 1))(
            params, taps, cfg, tok[None], tap_range or (0, L))
        proj = {m: wg["layers"][m] for m in cfg.module_names}
        gsq1 = jax.tree_util.tree_map(
            lambda g: g.astype(jnp.float32) ** 2, proj)
        sal1 = {m: tg[m][:, 0] for m in cfg.module_names}  # [Lt, S, out]
        return gsq1, sal1

    gsq_b, sal_b = jax.vmap(per_seq)(tokens)
    gsq = jax.tree_util.tree_map(lambda g: g.sum(axis=0), gsq_b)

    def group_sal(g):
        # g: [B, Lt, S, out] -> [Lt, B, S, G]
        out = g.shape[-1]
        gs = out // num_groups
        g = (g.astype(jnp.float32) * SALIENCY_SCALE) ** 2
        g = g.reshape(*g.shape[:-1], num_groups, gs).mean(axis=-1)
        return jnp.moveaxis(g, 0, 1)

    saliency = {m: group_sal(sal_b[m]) for m in cfg.module_names}
    return gsq, saliency


def get_gradients(params, cfg: ModelConfig, tokens: np.ndarray,
                  num_groups: int = 1, batch_size: int = 1,
                  compute_saliency: bool = True, mesh=None,
                  sub_saliency: Optional[Tuple[int, int]] = None,
                  ) -> Tuple[List[Dict[str, np.ndarray]],
                             Optional[List[Dict[str, np.ndarray]]]]:
    """Full calibration sweep (reference get_gradients driver loop,
    gradients.py:142-146).

    tokens: [N, S] int array. Returns:
      gradients: per-layer list of {module: [out, in]} accumulated grad^2
      saliency:  per-layer list of {module: [N, S, G]} (None if disabled)

    ``mesh``: optional jax Mesh — shards the sequence batch over 'dp' and
    parameters per the dense partition rules (the TPU-native replacement for
    the reference's splitted_models pipeline parallelism,
    splitted_models/llama.py:8-129).
    """
    N, S = tokens.shape
    L = cfg.num_layers
    acc_gsq = None
    sal_chunks: List[Dict[str, np.ndarray]] = []

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel import sharding as shard_mod
        specs = shard_mod.dense_param_specs(cfg)
        params = shard_mod.shard_params(mesh, params, specs)
        dp = mesh.devices.shape[0]
        assert batch_size % dp == 0 or batch_size == 1, \
            f"batch_size {batch_size} must be a multiple of dp={dp}"
        tok_sharding = NamedSharding(mesh, P("dp", None))
    else:
        tok_sharding = None

    for start in range(0, N, batch_size):
        batch = jnp.asarray(tokens[start:start + batch_size])
        if tok_sharding is not None and batch.shape[0] > 1:
            batch = jax.device_put(batch, tok_sharding)
        tap_range = tuple(sub_saliency) if sub_saliency else None
        gsq, sal = gradient_step(params, cfg, batch, num_groups,
                                 tap_range=tap_range)
        if acc_gsq is None:
            acc_gsq = gsq
        else:
            acc_gsq = jax.tree_util.tree_map(jnp.add, acc_gsq, gsq)
        if compute_saliency:
            sal_chunks.append({m: np.asarray(v) for m, v in sal.items()})
        logger.info("gradients: %d/%d sequences", min(start + batch_size, N), N)

    gradients = []
    for l in range(L):
        gradients.append({m: np.asarray(acc_gsq[m][l]) for m in cfg.module_names})

    saliency = None
    if compute_saliency:
        lo, hi = sub_saliency or (0, L)
        saliency = []
        for l in range(L):
            if not (lo <= l < hi):
                saliency.append(None)
                continue
            layer = {}
            for m in cfg.module_names:
                # [L_tapped, B, S, G] chunks -> concat batch -> [N, S, G]
                layer[m] = np.concatenate(
                    [c[m][l - lo] for c in sal_chunks], axis=0)
            saliency.append(layer)
    return gradients, saliency


def regroup_saliency(sal: np.ndarray, num_groups: int) -> np.ndarray:
    """[N, S, G0] -> [N, S, G] by averaging G0/G adjacent groups
    (reference layerwise regrouping, activations.py:495-502)."""
    N, S, g0 = sal.shape
    assert g0 % num_groups == 0
    return sal.reshape(N, S, num_groups, g0 // num_groups).mean(axis=-1)
