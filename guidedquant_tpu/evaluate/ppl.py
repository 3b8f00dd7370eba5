"""Perplexity evaluation harness.

Analog of the reference's chunked ppl protocol
(``any_precision/evaluate/eval.py:162-234``, ``run_eval.py:32-67``):
non-overlapping context-length chunks over a contiguous token stream,
next-token NLL averaged over all predicted positions, ppl = exp(mean NLL).
Works identically for dense and packed (AnyPrecLinear) params.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.config import ModelConfig

logger = logging.getLogger(__name__)


@partial(jax.jit, static_argnames=("cfg",))
def _chunk_nll(params, cfg: ModelConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """tokens [B, S] -> summed next-token NLL over B*(S-1) positions."""
    logits = llama.forward(params, cfg, tokens)
    logits = logits[:, :-1].astype(jnp.float32)
    targets = tokens[:, 1:]
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(logz - gold)


def evaluate_ppl_layerwise(params, cfg: ModelConfig, token_stream: np.ndarray,
                           ctx_len: int = 2048, batch_size: int = 2,
                           verbose: bool = True) -> float:
    """Low-memory perplexity: activations for the whole eval set are
    propagated one decoder layer at a time (reference
    ``evaluate_ppl_layerwise``, any_precision/evaluate/eval.py) — only one
    layer's weights need be resident at a time, so huge models evaluate on
    small hosts. Numerically identical to evaluate_ppl.
    """
    from ..models.llama import (layer_slice, decoder_layer, layer_rope_mask,
                                embed_tokens, unembed)

    stream = np.asarray(token_stream).reshape(-1)
    n_chunks = len(stream) // ctx_len
    assert n_chunks > 0
    chunks = stream[:n_chunks * ctx_len].reshape(n_chunks, ctx_len)

    # cfg-aware embedding (Gemma3 sqrt(d) scale) + per-layer rope/mask for
    # mixed global/sliding models — keeps this numerically identical to
    # evaluate_ppl for every registered architecture.
    embed_fn = jax.jit(lambda p, t: embed_tokens(p, t, cfg))
    acts = []
    for s in range(0, n_chunks, batch_size):
        acts.append(np.asarray(embed_fn(
            {"embed": params["embed"]}, jnp.asarray(chunks[s:s + batch_size]))))

    pos = jnp.arange(ctx_len)[None, :]
    cos_a, sin_a, mask_a, stacked = layer_rope_mask(cfg, pos, ctx_len, ctx_len)

    @partial(jax.jit, static_argnames=("cfg",))
    def layer_fn(lp, cfg, x, cos, sin, mask):
        return decoder_layer(lp, cfg, x, cos, sin, mask)[0]

    L = cfg.num_layers
    for l in range(L):
        lp = layer_slice(params["layers"], l)
        cos, sin, mask = ((cos_a[l], sin_a[l], mask_a[l]) if stacked
                          else (cos_a, sin_a, mask_a))
        for i in range(len(acts)):
            acts[i] = np.asarray(layer_fn(lp, cfg, jnp.asarray(acts[i]),
                                          cos, sin, mask))
        if verbose:
            logger.info("layerwise ppl: layer %d/%d", l + 1, L)

    @partial(jax.jit, static_argnames=("cfg",))
    def head_nll(p, cfg, x, tokens):
        logits = unembed(p, cfg, x)[:, :-1].astype(jnp.float32)
        targets = tokens[:, 1:]
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
        return jnp.sum(logz - gold)

    head_params = {"embed": params["embed"],
                   "final_norm": params["final_norm"]}
    if "lm_head" in params:
        head_params["lm_head"] = params["lm_head"]
    total_nll, total_pred = 0.0, 0
    for i, s in enumerate(range(0, n_chunks, batch_size)):
        batch = jnp.asarray(chunks[s:s + batch_size])
        total_nll += float(head_nll(head_params, cfg, jnp.asarray(acts[i]),
                                    batch))
        total_pred += batch.shape[0] * (ctx_len - 1)
    return float(np.exp(total_nll / total_pred))


def evaluate_ppl(params, cfg: ModelConfig, token_stream: np.ndarray,
                 ctx_len: int = 2048, batch_size: int = 1,
                 verbose: bool = True) -> float:
    """token_stream: 1-D contiguous token ids (e.g. tokenized test set)."""
    stream = np.asarray(token_stream).reshape(-1)
    n_chunks = len(stream) // ctx_len
    assert n_chunks > 0, "token stream shorter than one context"
    chunks = stream[:n_chunks * ctx_len].reshape(n_chunks, ctx_len)

    total_nll, total_pred = 0.0, 0
    for s in range(0, n_chunks, batch_size):
        batch = jnp.asarray(chunks[s:s + batch_size])
        total_nll += float(_chunk_nll(params, cfg, batch))
        total_pred += batch.shape[0] * (ctx_len - 1)
        if verbose:
            logger.info("ppl: %d/%d chunks, running ppl %.4f",
                        min(s + batch_size, n_chunks), n_chunks,
                        float(np.exp(total_nll / total_pred)))
    return float(np.exp(total_nll / total_pred))
