"""Decode engine: jitted prefill + single-token decode over a static KV cache.

TPU-native analog of the reference's gpt-fast engine
(``inference/generate.py:76-186`` prefill/decode split and
``inference/model.py:63-79`` static KVCache): static shapes throughout, the
KV cache is a donated carry (XLA updates it in place), the whole layer stack
runs as one ``lax.scan``, and sampling is jitted. torch.compile + manual CUDA
graphs are replaced by a single jit with donated buffers.

Works identically for dense bf16 and AnyPrecLinear-packed parameters.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models import llama
from ..models.config import ModelConfig


@struct.dataclass
class DecodeState:
    """KV cache + position. kv_bits < 16 stores int8 codes with per
    (position, head) symmetric scales (quantized KV cache; the reference's
    KV4 path is SpinQuant's K/V fake quant, rotation_utils.py:150-229 —
    here it is a real integer cache). ``r3`` applies the online per-head
    Hadamard to q and k before caching (exact, improves K quantizability).
    """

    k: jnp.ndarray  # [L, B, S_max, KV, Dh] (dtype or int8)
    v: jnp.ndarray  # [L, B, S_max, KV, Dh]
    pos: jnp.ndarray  # [] int32 — number of tokens already in cache
    k_scale: Optional[jnp.ndarray] = None  # [L, B, S_max, KV, 1] f32
    v_scale: Optional[jnp.ndarray] = None
    kv_bits: int = struct.field(pytree_node=False, default=16)
    r3: bool = struct.field(pytree_node=False, default=False)


def init_state(cfg: ModelConfig, num_layers: int, batch: int, max_seq: int,
               dtype=jnp.bfloat16, sharding=None, kv_bits: int = 16,
               r3: bool = False) -> DecodeState:
    shape = (num_layers, batch, max_seq, cfg.num_kv_heads, cfg.head_dim)
    if kv_bits < 16:
        z = jnp.zeros(shape, jnp.int8)
        s = jnp.zeros(shape[:-1] + (1,), jnp.float32)
    else:
        z = jnp.zeros(shape, dtype)
        s = None
    if sharding is not None:
        z = jax.device_put(z, sharding)
    return DecodeState(k=z, v=jnp.copy(z), pos=jnp.array(0, jnp.int32),
                       k_scale=s, v_scale=None if s is None else jnp.copy(s),
                       kv_bits=kv_bits, r3=r3)


def _kv_quant(x: jnp.ndarray, bits: int):
    """x [B, S, KV, Dh] -> (int8 codes, scale [B, S, KV, 1])."""
    maxq = 2 ** (bits - 1) - 1
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / maxq
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -maxq - 1, maxq)
    return q.astype(jnp.int8), scale


def _attend(cfg: ModelConfig, q, k_all, v_all, t_mask):
    """q [B, S, H, Dh]; k/v [B, T, KV, Dh]; t_mask additive [S, T] or [1, T]."""
    B, S, H, Dh = q.shape
    KV = cfg.num_kv_heads
    G = H // KV
    qg = q.reshape(B, S, KV, G, Dh)
    scores = jnp.einsum("bskgd,btkd->bkgst", qg, k_all,
                        preferred_element_type=jnp.float32)
    scores = scores * llama._attn_scale(cfg) + t_mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bkgst,btkd->bskgd", probs, v_all)
    return ctx.reshape(B, S, H * Dh)


def _layer_step(lp, cfg: ModelConfig, x, cos, sin, kv_l, write_pos, t_mask,
                kv_bits: int = 16, r3: bool = False, layer_idx=None):
    """One decoder layer with cache write at ``write_pos`` (length-S block).

    kv_l: (k_cache [B, S_max, KV, Dh], v_cache[, k_scale, v_scale]);
    with ``layer_idx`` set (unrolled path) the caches are the FULL stacked
    [L, B, S_max, KV, Dh] arrays — the new k/v are point-written in place at
    (layer_idx, :, write_pos) instead of rewriting a per-layer slab (the
    slab round-trip costs ~20 us/layer at 8B geometry).
    Returns (out, new_kv_l).
    """
    from ..nn.linear import apply_linear
    B, S, _ = x.shape
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    h = llama._norm(cfg, x, lp["attn_norm"])
    if "qkv_proj" in lp:  # fused QKV (reference inference/model.py:175-181)
        qkv = apply_linear(lp["qkv_proj"], h)
        q = qkv[..., :cfg.q_dim].reshape(B, S, H, Dh)
        k = qkv[..., cfg.q_dim:cfg.q_dim + cfg.kv_dim].reshape(B, S, KV, Dh)
        v = qkv[..., cfg.q_dim + cfg.kv_dim:].reshape(B, S, KV, Dh)
    else:
        q = apply_linear(lp["q_proj"], h).reshape(B, S, H, Dh)
        k = apply_linear(lp["k_proj"], h).reshape(B, S, KV, Dh)
        v = apply_linear(lp["v_proj"], h).reshape(B, S, KV, Dh)
    if cfg.qk_norm:
        q = llama._norm(cfg, q, lp["q_norm"])
        k = llama._norm(cfg, k, lp["k_norm"])
    q = llama.apply_rope(q, cos, sin)
    k = llama.apply_rope(k, cos, sin)

    if r3:
        # per-head Hadamard on q and k (scores invariant; flattens K for
        # cache quantization — the reference's QKRotationWrapper)
        from ..ops.hadamard import matmul_hadU
        q = matmul_hadU(q.astype(jnp.float32)).astype(q.dtype)
        k = matmul_hadU(k.astype(jnp.float32)).astype(k.dtype)

    def _write(cache, val):
        if layer_idx is None:
            return jax.lax.dynamic_update_slice(
                cache, val.astype(cache.dtype), (0, write_pos, 0, 0))
        return jax.lax.dynamic_update_slice(
            cache, val.astype(cache.dtype)[None],
            (layer_idx, 0, write_pos, 0, 0))

    def _read(cache):
        return cache if layer_idx is None else cache[layer_idx]

    if kv_bits < 16:
        k_cache, v_cache, k_scale, v_scale = kv_l
        kq, ks = _kv_quant(k, kv_bits)
        vq, vs = _kv_quant(v, kv_bits)
        k_cache = _write(k_cache, kq)
        v_cache = _write(v_cache, vq)
        k_scale = _write(k_scale, ks)
        v_scale = _write(v_scale, vs)
        k_all = (_read(k_cache).astype(jnp.float32) * _read(k_scale)
                 ).astype(q.dtype)
        v_all = (_read(v_cache).astype(jnp.float32) * _read(v_scale)
                 ).astype(q.dtype)
        new_kv = (k_cache, v_cache, k_scale, v_scale)
    else:
        k_cache, v_cache = kv_l[:2]
        k_cache = _write(k_cache, k)
        v_cache = _write(v_cache, v)
        k_all, v_all = _read(k_cache), _read(v_cache)
        new_kv = (k_cache, v_cache)

    ctx = _attend(cfg, q, k_all, v_all, t_mask)
    attn_out = apply_linear(lp["o_proj"], ctx)
    if cfg.sandwich_norms:
        attn_out = llama._norm(cfg, attn_out, lp["post_attn_norm"])
    x = x + attn_out
    h = llama._norm(cfg, x, lp["mlp_norm"])
    if "gate_up_proj" in lp:  # fused Up/Gate (reference model.py:248-266)
        gu = apply_linear(lp["gate_up_proj"], h)
        f = cfg.intermediate_size
        g, u = gu[..., :f], gu[..., f:]
    else:
        g = apply_linear(lp["gate_proj"], h)
        u = apply_linear(lp["up_proj"], h)
    m = apply_linear(lp["down_proj"], llama._act(cfg, g) * u)
    if cfg.sandwich_norms:
        m = llama._norm(cfg, m, lp["post_mlp_norm"])
    x = x + m
    return x, new_kv


def unroll_layers(params: Dict) -> Dict:
    """Stacked [L, ...] layer pytree -> tuple of per-layer pytrees.

    Applied OUTSIDE jit at load time, so every per-layer leaf becomes its
    own device buffer. This matters for the quantized decode path: Pallas
    kernels are custom calls, and a custom call cannot consume a fused
    dynamic-slice — under ``lax.scan`` every layer's packed operand is
    materialized (an HBM->HBM copy of the layer's weights EVERY step,
    ~54 MB/layer at 8B 2-bit ~= 2.4 ms/step). With unrolled per-layer
    buffers the kernels bind their operands directly (the gpt-fast
    unrolled-layers analog, reference inference/model.py Transformer).
    """
    from ..models.llama import layer_slice, num_layers_of
    L = num_layers_of(params)
    out = dict(params)
    out["layers"] = tuple(layer_slice(params["layers"], i) for i in range(L))
    return out


def _run_stack(params, cfg: ModelConfig, tokens, state: DecodeState,
               positions) -> Tuple[jnp.ndarray, DecodeState]:
    """tokens [B, S] written at state.pos; returns (logits [B, S, V], state)."""
    B, S = tokens.shape
    S_max = state.k.shape[2]
    cos, sin = llama.rope_cos_sin(cfg, positions)
    compute_dtype = state.k.dtype if state.kv_bits >= 16 else jnp.bfloat16
    x = llama.embed_tokens(params, tokens, cfg).astype(compute_dtype)

    # additive mask over cache timeline: query i (global pos p_i) sees t <= p_i
    t_ids = jnp.arange(S_max)[None, :]
    t_mask = jnp.where(t_ids <= positions[0][:, None], 0.0, -1e30)  # [S, T]

    quant = state.kv_bits < 16
    per_layer = bool(cfg.layer_types)
    if per_layer:
        # Gemma3: local-theta rope + sliding mask on 'sliding' layers.
        # Selected per layer INSIDE the scan body from a [L] flag — the
        # global/local rope pair and the two masks are computed once and
        # never materialized as stacked [L, ...] arrays (they would be
        # L * B * S_max floats at long contexts).
        local_cfg = cfg.replace(rope_theta=cfg.rope_local_theta,
                                rope_scaling=None)
        cos_l, sin_l = llama.rope_cos_sin(local_cfg, positions)
        sliding_mask = jnp.where(
            (t_ids <= positions[0][:, None]) &
            (t_ids > positions[0][:, None] - cfg.sliding_window),
            0.0, -1e30)
        is_global = jnp.asarray([t == "global" for t in cfg.layer_types])

    if isinstance(params["layers"], (tuple, list)):
        # Unrolled path (per-layer weight buffers; see unroll_layers).
        # Full stacked caches are threaded through; each layer point-writes
        # its new k/v in place (no per-layer slab rewrites).
        kv_l = (state.k, state.v) + ((state.k_scale, state.v_scale)
                                     if quant else ())
        for i, lp in enumerate(params["layers"]):
            if per_layer and cfg.layer_types[i] != "global":
                c_, s_, mk = cos_l, sin_l, sliding_mask  # static branch
            else:
                c_, s_, mk = cos, sin, t_mask
            x, kv_l = _layer_step(lp, cfg, x, c_, s_, kv_l, state.pos,
                                  mk, kv_bits=state.kv_bits, r3=state.r3,
                                  layer_idx=i)
        new_kv = kv_l
    else:
        def body(carry, xs):
            x = carry
            if per_layer:
                lp, flag = xs[0], xs[1]
                kv_l = xs[2:]
                c_ = jnp.where(flag, cos, cos_l)
                s_ = jnp.where(flag, sin, sin_l)
                mk = jnp.where(flag, t_mask, sliding_mask)
            else:
                lp, kv_l = xs[0], xs[1:]
                c_, s_, mk = cos, sin, t_mask
            x, new_kv = _layer_step(lp, cfg, x, c_, s_, kv_l, state.pos,
                                    mk, kv_bits=state.kv_bits, r3=state.r3)
            return x, new_kv

        xs = (params["layers"],)
        if per_layer:
            xs = xs + (is_global,)
        xs = xs + (state.k, state.v)
        if quant:
            xs = xs + (state.k_scale, state.v_scale)
        x, new_kv = jax.lax.scan(body, x, xs)
    logits = llama.unembed(params, cfg, x)
    new_state = DecodeState(
        k=new_kv[0], v=new_kv[1], pos=state.pos + jnp.int32(S),
        k_scale=new_kv[2] if quant else None,
        v_scale=new_kv[3] if quant else None,
        kv_bits=state.kv_bits, r3=state.r3)
    return logits, new_state


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def prefill(params, cfg: ModelConfig, tokens: jnp.ndarray,
            state: DecodeState) -> Tuple[jnp.ndarray, DecodeState]:
    """tokens [B, S] -> (last-position logits [B, V], state)."""
    B, S = tokens.shape
    positions = state.pos + jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
    logits, state = _run_stack(params, cfg, tokens, state, positions)
    return logits[:, -1], state


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def decode_step(params, cfg: ModelConfig, token: jnp.ndarray,
                state: DecodeState) -> Tuple[jnp.ndarray, DecodeState]:
    """token [B] -> (logits [B, V], state)."""
    B = token.shape[0]
    positions = jnp.broadcast_to(state.pos[None, None], (B, 1))
    logits, state = _run_stack(params, cfg, token[:, None], state, positions)
    return logits[:, 0], state


def _sample_logits(logits: jnp.ndarray, key, temperature,
                   top_k: Optional[int]) -> jnp.ndarray:
    """Traceable sampling core: greedy if temperature == 0 else (top-k)
    categorical (reference generate.py:43-57)."""
    def greedy(_):
        return jnp.argmax(logits, axis=-1)

    def sampled(_):
        l = logits / jnp.maximum(temperature, 1e-6)
        if top_k is not None:
            kth = jnp.sort(l, axis=-1)[..., -top_k][..., None]
            l = jnp.where(l < kth, -jnp.inf, l)
        return jax.random.categorical(key, l, axis=-1)

    return jax.lax.cond(temperature == 0.0, greedy, sampled, None)


@partial(jax.jit, static_argnames=("top_k",))
def sample_token(logits: jnp.ndarray, key, temperature: float = 1.0,
                 top_k: Optional[int] = None) -> jnp.ndarray:
    return _sample_logits(logits, key, temperature, top_k)


@partial(jax.jit, static_argnames=("cfg", "n_tokens"), donate_argnums=(3,))
def decode_n_tokens(params, cfg: ModelConfig, token: jnp.ndarray,
                    state: DecodeState, n_tokens: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, DecodeState]:
    """Greedy-decode n tokens entirely on device (the analog of the
    reference's compiled decode loop, generate.py:92-139). Returns
    (tokens [B, n], last_logits, state)."""
    def body(carry, _):
        tok, state = carry
        logits, state = _run_stack(
            params, cfg, tok[:, None], state,
            jnp.broadcast_to(state.pos[None, None], (tok.shape[0], 1)))
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        return (nxt, state), nxt

    (tok, state), toks = jax.lax.scan(body, (token, state), None,
                                      length=n_tokens)
    return jnp.moveaxis(toks, 0, 1), tok, state


@partial(jax.jit, static_argnames=("cfg", "n_tokens", "top_k"),
         donate_argnums=(3,))
def decode_n_tokens_sampled(params, cfg: ModelConfig, token: jnp.ndarray,
                            state: DecodeState, n_tokens: int, key,
                            temperature=0.0, top_k: Optional[int] = None):
    """Sampled multi-token decode entirely on device. Returns
    (tokens [B, n], last_token, state, key). The device-side analog of the
    reference's compiled decode loop (generate.py:92-139) — on tunnel-style
    transports this removes the fixed per-token dispatch cost."""
    def body(carry, _):
        tok, state, key = carry
        logits, state = _run_stack(
            params, cfg, tok[:, None], state,
            jnp.broadcast_to(state.pos[None, None], (tok.shape[0], 1)))
        key, k0 = jax.random.split(key)
        nxt = _sample_logits(logits[:, 0], k0, temperature, top_k
                             ).astype(jnp.int32)
        return (nxt, state, key), nxt

    (tok, state, key), toks = jax.lax.scan(body, (token, state, key), None,
                                           length=n_tokens)
    return jnp.moveaxis(toks, 0, 1), tok, state, key


DECODE_CHUNK = 32  # device-side tokens per host round-trip in generate()


def generate(params, cfg: ModelConfig, prompt: np.ndarray,
             max_new_tokens: int, max_seq: Optional[int] = None,
             temperature: float = 0.0, top_k: Optional[int] = None,
             kv_dtype=jnp.bfloat16, kv_bits: int = 16, r3: bool = False,
             seed: int = 0, kv_sharding=None,
             ) -> Tuple[np.ndarray, Dict[str, float]]:
    """Generate loop with gpt-fast-style metrics (tok/s; reference
    generate.py:145-186, 374-381). Decode runs device-side in
    DECODE_CHUNK-token scans so the per-call dispatch cost is amortized
    (one host round-trip per chunk, not per token)."""
    prompt = np.atleast_2d(prompt)
    B, S = prompt.shape
    L = cfg.num_layers
    max_seq = max_seq or min(cfg.max_seq_len, S + max_new_tokens)
    state = init_state(cfg, L, B, max_seq, dtype=kv_dtype, kv_bits=kv_bits,
                       r3=r3, sharding=kv_sharding)
    key = jax.random.PRNGKey(seed)

    t0 = time.perf_counter()
    logits, state = prefill(params, cfg, jnp.asarray(prompt), state)
    key, k0 = jax.random.split(key)
    tok = sample_token(logits, k0, temperature, top_k)
    tok.block_until_ready()
    t_prefill = time.perf_counter() - t0

    out = [np.asarray(tok)[:, None]]
    t0 = time.perf_counter()
    remaining = max_new_tokens - 1
    while remaining > 0:
        n = min(DECODE_CHUNK, remaining)
        toks, tok, state, key = decode_n_tokens_sampled(
            params, cfg, jnp.asarray(tok, jnp.int32), state, n, key,
            temperature, top_k)
        out.append(np.asarray(toks))
        remaining -= n
    t_decode = time.perf_counter() - t0

    tokens = np.concatenate(out, axis=1)  # [B, new]
    metrics = {
        "prefill_s": t_prefill,
        "decode_s": t_decode,
        "decode_tok_s": (max_new_tokens - 1) * B / max(t_decode, 1e-9),
    }
    return np.concatenate([prompt, tokens], axis=1), metrics
