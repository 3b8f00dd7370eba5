"""Saliency-weighted layerwise Hessian accumulation.

Analog of the reference's ``SaliencyEngine`` +
``accumulate_saliency_weighted_hessians``
(``any_precision/quantization/activations.py:179-584``): for every target
linear module, accumulate the block-diagonal-Fisher proxy Hessian

    H[g, i, j] = sum_n  s_{n,g} * x_{n,i} * x_{n,j}

over all calibration tokens n, where x is the module *input* and s the
channel-group saliency of the module *output* (from the gradient stage).

We own the model, so instead of layer replication + forward hooks the layer
forward returns its per-module inputs directly
(``llama.module_inputs``), and the layer-by-layer activation propagation
(the reference's ``get_inps``/``update_outs``) is a host loop over a jitted
per-layer step. Accumulation runs as G MXU matmuls in f32.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.config import ModelConfig

logger = logging.getLogger(__name__)


def _xtx_grouped(x: jnp.ndarray, sal: jnp.ndarray) -> jnp.ndarray:
    """x [T, D], sal [T, G] -> [G, D, D] saliency-weighted X^T X.

    Matches SaliencyEngine.add_batch (activations.py:209-238) einsum.
    Implemented as G weighted syrk-style matmuls so it rides the MXU.
    """
    x = x.astype(jnp.float32)
    sal = sal.astype(jnp.float32)
    # [G, T, D] weighted copies are too big for large G; G is small (<=8).
    xs = x[None, :, :] * sal.T[:, :, None]  # [G, T, D]
    return jnp.einsum("ti,gtj->gij", x, xs,
                      preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("cfg",))
def layer_hessian_step(lp, cfg: ModelConfig, x: jnp.ndarray,
                       cos, sin, mask, sal: Dict[str, jnp.ndarray]):
    """One decoder layer on one batch: returns (layer_output, {m: [G,D,D]}).

    x: [B, S, D]; sal: {module: [B, S, G]}.
    """
    out, inputs = llama.module_inputs(lp, cfg, x, cos, sin, mask)
    hess = {}
    for m, xin in inputs.items():
        T = xin.shape[0] * xin.shape[1]
        hess[m] = _xtx_grouped(xin.reshape(T, xin.shape[-1]),
                               sal[m].reshape(T, sal[m].shape[-1]))
    return out, hess


@partial(jax.jit, static_argnames=("cfg",))
def _plain_layer_step(lp, cfg: ModelConfig, x, cos, sin, mask):
    return llama.decoder_layer(lp, cfg, x, cos, sin, mask)[0]


@partial(jax.jit, static_argnames=("cfg",))
def embed_step(params, cfg: ModelConfig, tokens):
    """Embedding + per-layer rope/mask. For cfg.layer_types models (Gemma3)
    cos/sin/mask come back stacked [L, ...] (global vs sliding per layer)
    and embed_tokens applies the sqrt(d) scale — matching forward_unrolled."""
    B, S = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
    cos, sin, mask, _ = llama.layer_rope_mask(cfg, positions, S, S)
    x = llama.embed_tokens(params, tokens, cfg)
    return x, cos, sin, mask


def accumulate_hessians(params, cfg: ModelConfig, tokens: np.ndarray,
                        saliency: List[Dict[str, np.ndarray]],
                        num_groups: int = 1, batch_size: int = 4,
                        layer_range: Optional[tuple] = None,
                        on_layer_done=None, mesh=None,
                        ) -> List[Dict[str, np.ndarray]]:
    """Sequential layer-by-layer sweep (reference activations.py:393-584).

    tokens: [N, S]; saliency: per-layer {module: [N, S, G0]} with G0 a
    multiple of num_groups (regrouped here by averaging, matching
    layerwise_main's regroup).

    Returns per-layer {module: [G, D_in, D_in]} f32 Hessians.
    ``on_layer_done(l, hessians_l)`` supports layer-resumable caching.
    """
    from .gradients import regroup_saliency

    N, S = tokens.shape
    L = cfg.num_layers
    lo, hi = layer_range or (0, L)

    tok_sharding = None
    if mesh is not None:
        # dp-shard the token batch; the XTX contraction's unsharded output
        # makes GSPMD insert the cross-device psum (the reference's
        # replicate + merge on device 0, activations.py:334-387)
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel import sharding as shard_mod
        params = shard_mod.shard_params(
            mesh, params, shard_mod.dense_param_specs(cfg))
        tok_sharding = NamedSharding(mesh, P("dp", None, None))

    # Current activations for the whole calibration set, in host memory
    # (the reference offloads to CPU the same way, activations.py:74-107).
    # meta holds per-batch (cos, sin, mask); stacked [L, ...] for
    # cfg.layer_types models, shared otherwise.
    per_layer_rope = bool(cfg.layer_types)
    acts: List[np.ndarray] = []
    meta = []
    for start in range(0, N, batch_size):
        batch = jnp.asarray(tokens[start:start + batch_size])
        x, cos, sin, mask = embed_step(params, cfg, batch)
        acts.append(np.asarray(x))
        # cos/sin are None for learned-position models (OPT) — no RoPE
        meta.append((None if cos is None else np.asarray(cos),
                     None if sin is None else np.asarray(sin),
                     np.asarray(mask)))

    results: List[Dict[str, np.ndarray]] = []
    for l in range(L):
        lp = llama.layer_slice(params["layers"], l)
        want = lo <= l < hi
        acc: Optional[Dict[str, jnp.ndarray]] = None
        sal_layer = None
        if want:
            sal_layer = {m: regroup_saliency(v, num_groups)
                         for m, v in saliency[l].items()}
        for bi, start in enumerate(range(0, N, batch_size)):
            stop = min(start + batch_size, N)
            x = jnp.asarray(acts[bi])
            if tok_sharding is not None and x.shape[0] > 1:
                x = jax.device_put(x, tok_sharding)
            cos_b, sin_b, mask_b = meta[bi]
            if per_layer_rope:
                cos_b, sin_b, mask_b = cos_b[l], sin_b[l], mask_b[l]
            cos = None if cos_b is None else jnp.asarray(cos_b)
            sin = None if sin_b is None else jnp.asarray(sin_b)
            mask_j = jnp.asarray(mask_b)
            if want:
                sal_b = {m: jnp.asarray(v[start:stop])
                         for m, v in sal_layer.items()}
                out, hess = layer_hessian_step(lp, cfg, x, cos, sin, mask_j, sal_b)
                if jax.tree_util.tree_reduce(
                        lambda a, b: a or b,
                        jax.tree_util.tree_map(
                            lambda h: bool(jnp.isnan(h).any()), hess), False):
                    raise ValueError(f"NaN in Hessian accumulation at layer {l}")
                acc = hess if acc is None else jax.tree_util.tree_map(
                    jnp.add, acc, hess)
            else:
                out = _plain_layer_step(lp, cfg, x, cos, sin, mask_j)
            acts[bi] = np.asarray(out)
        layer_result = ({m: np.asarray(v) for m, v in acc.items()}
                        if acc is not None else {})
        results.append(layer_result)
        if on_layer_done is not None and want:
            on_layer_done(l, layer_result)
        logger.info("hessians: layer %d/%d done", l + 1, L)
    return results
