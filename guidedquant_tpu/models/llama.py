"""Pure-pytree Llama-family model stack.

TPU-native analog of the reference's two model stacks (HF-transformers
wrappers and the gpt-fast static Transformer, reference
``inference/model.py:81-405``): one functional implementation used for
calibration, quantization, evaluation and serving alike.

Design:
- Parameters are a nested dict pytree. Decoder layers are *stacked* along a
  leading axis so the forward pass is a single ``lax.scan`` (one trace/compile
  per layer type, weight-stationary, scan-friendly for XLA).
- Every projection weight is stored in ``(out_features, in_features)``
  orientation — the same (N, K) convention the quantization stack uses — and
  may be either a dense ``jnp.ndarray`` or a quantized-linear pytree (see
  ``guidedquant_tpu.nn.linear``). ``apply_linear`` dispatches.
- Attention/norm math matches HF ``LlamaModel`` bit-for-bit in f32 so that
  imported checkpoints reproduce reference logits.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .config import ModelConfig
from ..nn.linear import apply_linear

Params = Dict[str, Any]

MODULE_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj",
                "gate_proj", "up_proj", "down_proj")


# ---------------------------------------------------------------------------
# Init / parameter structure
# ---------------------------------------------------------------------------

def init_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random-init parameters (for tests/benchmarks; real use imports HF)."""
    d, f = cfg.hidden_size, cfg.intermediate_size
    qd, kvd = cfg.q_dim, cfg.kv_dim
    L = cfg.num_layers
    ks = jax.random.split(key, 10)

    def w(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(dtype)

    params: Params = {
        "embed": w(ks[0], (cfg.vocab_size, d), d),
        "layers": {
            "attn_norm": jnp.ones((L, d), dtype),
            "mlp_norm": jnp.ones((L, d), dtype),
            "q_proj": w(ks[1], (L, qd, d), d),
            "k_proj": w(ks[2], (L, kvd, d), d),
            "v_proj": w(ks[3], (L, kvd, d), d),
            "o_proj": w(ks[4], (L, d, qd), qd),
            "gate_proj": w(ks[5], (L, f, d), d),
            "up_proj": w(ks[6], (L, f, d), d),
            "down_proj": w(ks[7], (L, d, f), f),
        },
        "final_norm": jnp.ones((d,), dtype),
    }
    if cfg.qk_norm:
        params["layers"]["q_norm"] = jnp.ones((L, cfg.head_dim), dtype)
        params["layers"]["k_norm"] = jnp.ones((L, cfg.head_dim), dtype)
    if cfg.sandwich_norms:
        params["layers"]["post_attn_norm"] = jnp.ones((L, d), dtype)
        params["layers"]["post_mlp_norm"] = jnp.ones((L, d), dtype)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(ks[8], (cfg.vocab_size, d), d)
    return params


def layer_slice(layers: Params, i) -> Params:
    """Extract the pytree of a single decoder layer from stacked params."""
    return jax.tree_util.tree_map(lambda x: x[i], layers)


def num_layers_of(params: Params) -> int:
    return jax.tree_util.tree_leaves(params["layers"])[0].shape[0]


# ---------------------------------------------------------------------------
# RoPE (incl. llama-3.1 frequency scaling; reference inference/model.py:283-325)
# ---------------------------------------------------------------------------

def rope_inv_freq(cfg: ModelConfig) -> jnp.ndarray:
    half = cfg.head_dim // 2
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    rs = cfg.rope_scaling
    if rs is not None:
        # Llama-3.1 wavelength-dependent scaling.
        low_wl = rs.original_max_position_embeddings / rs.low_freq_factor
        high_wl = rs.original_max_position_embeddings / rs.high_freq_factor
        wavelen = 2.0 * jnp.pi / inv_freq
        # high-frequency (short wavelength): unscaled; low-frequency: /factor
        scaled = inv_freq / rs.factor
        smooth = (rs.original_max_position_embeddings / wavelen - rs.low_freq_factor) / (
            rs.high_freq_factor - rs.low_freq_factor)
        smooth = jnp.clip(smooth, 0.0, 1.0)
        mid = (1.0 - smooth) * scaled + smooth * inv_freq
        inv_freq = jnp.where(wavelen > low_wl, scaled,
                             jnp.where(wavelen < high_wl, inv_freq, mid))
    return inv_freq


def rope_cos_sin(cfg: ModelConfig, positions: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions [..., S] int -> cos/sin [..., S, head_dim] (HF half-duplicated)."""
    inv_freq = rope_inv_freq(cfg)
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [..., S, half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, S, H, Dh]; cos/sin [B, S, Dh] (HF rotate_half convention)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    return x * c + rot * s


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float,
             plus_one: bool = False) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if plus_one:  # Gemma convention: scale by (1 + w)
        w = 1.0 + w
    return (y * w).astype(x.dtype)


def _norm(cfg: ModelConfig, x: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    return rms_norm(x, weight, cfg.rms_norm_eps, cfg.norm_plus_one)


def _act(cfg: ModelConfig, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.hidden_act == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.silu(x)


def _attn_scale(cfg: ModelConfig) -> float:
    s = cfg.attn_scalar if cfg.attn_scalar > 0 else cfg.head_dim
    return 1.0 / float(s) ** 0.5


def attention(lp: Params, cfg: ModelConfig, x: jnp.ndarray,
              cos: jnp.ndarray, sin: jnp.ndarray,
              mask: Optional[jnp.ndarray],
              kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
              cache_pos: Optional[jnp.ndarray] = None,
              capture: Optional[dict] = None,
              ) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """One attention block.

    kv: optional preallocated (k_cache, v_cache), each [B, S_max, KVH, Dh];
    cache_pos: [S] positions at which to write the new k/v.
    Returns (output, updated_kv).
    """
    B, S, _ = x.shape
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    q = apply_linear(lp["q_proj"], x).reshape(B, S, H, Dh)
    k = apply_linear(lp["k_proj"], x).reshape(B, S, KV, Dh)
    v = apply_linear(lp["v_proj"], x).reshape(B, S, KV, Dh)

    if cfg.qk_norm:  # per-head RMSNorm before RoPE (Qwen3/Gemma3)
        q = _norm(cfg, q, lp["q_norm"])
        k = _norm(cfg, k, lp["k_norm"])
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if kv is not None:
        k_cache, v_cache = kv
        k_cache = k_cache.at[:, cache_pos].set(k.astype(k_cache.dtype))
        v_cache = v_cache.at[:, cache_pos].set(v.astype(v_cache.dtype))
        k_all, v_all = k_cache, v_cache
        new_kv = (k_cache, v_cache)
    else:
        k_all, v_all = k, v
        new_kv = None

    # GQA attention: group query heads over shared KV heads.
    G = H // KV
    qg = q.reshape(B, S, KV, G, Dh)
    scores = jnp.einsum("bskgd,btkd->bkgst", qg, k_all,
                        preferred_element_type=jnp.float32)
    scores = scores * _attn_scale(cfg)
    if mask is not None:
        scores = scores + mask  # mask broadcasts [B, 1, 1, S, T] or [S, T]
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bkgst,btkd->bskgd", probs, v_all)
    ctx = ctx.reshape(B, S, H * Dh)

    if capture is not None:
        capture["o_proj"] = ctx
    out = apply_linear(lp["o_proj"], ctx)
    return out, new_kv


def mlp(lp: Params, x: jnp.ndarray, capture: Optional[dict] = None,
        cfg: Optional[ModelConfig] = None) -> jnp.ndarray:
    g = apply_linear(lp["gate_proj"], x)
    u = apply_linear(lp["up_proj"], x)
    h = (_act(cfg, g) if cfg is not None else jax.nn.silu(g)) * u
    if capture is not None:
        capture["down_proj"] = h
    return apply_linear(lp["down_proj"], h)


def decoder_layer(lp: Params, cfg: ModelConfig, x: jnp.ndarray,
                  cos: jnp.ndarray, sin: jnp.ndarray,
                  mask: Optional[jnp.ndarray],
                  kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                  cache_pos: Optional[jnp.ndarray] = None,
                  capture: Optional[dict] = None,
                  ) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    h = _norm(cfg, x, lp["attn_norm"])
    if capture is not None:
        capture["q_proj"] = capture["k_proj"] = capture["v_proj"] = h
    attn_out, new_kv = attention(lp, cfg, h, cos, sin, mask, kv, cache_pos, capture)
    if cfg.sandwich_norms:  # Gemma3 post-attention norm inside the residual
        attn_out = _norm(cfg, attn_out, lp["post_attn_norm"])
    x = x + attn_out
    h = _norm(cfg, x, lp["mlp_norm"])
    if capture is not None:
        capture["gate_proj"] = capture["up_proj"] = h
    m = mlp(lp, h, capture, cfg)
    if cfg.sandwich_norms:
        m = _norm(cfg, m, lp["post_mlp_norm"])
    x = x + m
    return x, new_kv


def module_inputs(lp: Params, cfg: ModelConfig, x: jnp.ndarray,
                  cos: jnp.ndarray, sin: jnp.ndarray,
                  mask: Optional[jnp.ndarray]) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Run one decoder layer, returning (output, {module_name: module_input}).

    Used by the Hessian-accumulation stage (analog of the reference's
    ``_LayerWrapperThatAccumulatesSaliency`` hooks,
    ``any_precision/quantization/activations.py:244-260``) — since we own the
    model we return the per-module inputs directly instead of hooking.
    """
    cap: Dict[str, jnp.ndarray] = {}
    out, _ = decoder_layer(lp, cfg, x, cos, sin, mask, capture=cap)
    return out, cap


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------

def causal_mask(S: int, T: int, offset: int = 0, dtype=jnp.float32) -> jnp.ndarray:
    """[S, T] additive mask; query i attends to keys <= i + offset."""
    qi = jnp.arange(S)[:, None] + offset
    ki = jnp.arange(T)[None, :]
    return jnp.where(ki <= qi, 0.0, -jnp.inf).astype(dtype)


def embed_tokens(params: Params, tokens: jnp.ndarray,
                 cfg: Optional[ModelConfig] = None) -> jnp.ndarray:
    e = jnp.take(params["embed"], tokens, axis=0)
    if cfg is not None and cfg.embed_scale:  # Gemma3: sqrt(d) normalizer
        e = e * jnp.asarray(cfg.hidden_size ** 0.5, e.dtype)
    return e


def unembed(params: Params, cfg: ModelConfig, x: jnp.ndarray) -> jnp.ndarray:
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps,
                 cfg.norm_plus_one)
    head = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
    return apply_linear(head, x)


def layer_rope_mask(cfg: ModelConfig, positions: jnp.ndarray,
                    S: int, T: int, offset: int = 0):
    """Per-layer (cos, sin, mask) stacks for mixed global/sliding models.

    Returns (cos [L?..], sin, mask, None) — for uniform models the arrays
    are unstacked and shared; for cfg.layer_types models returns stacked
    [L, ...] arrays selecting global vs local rope/mask per layer.
    """
    cos_g, sin_g = rope_cos_sin(cfg, positions)
    base_mask = causal_mask(S, T, offset)
    if not cfg.layer_types:
        return cos_g, sin_g, base_mask, False
    local_cfg = cfg.replace(rope_theta=cfg.rope_local_theta,
                            rope_scaling=None)
    cos_l, sin_l = rope_cos_sin(local_cfg, positions)
    qi = jnp.arange(S)[:, None] + offset
    ki = jnp.arange(T)[None, :]
    in_window = ki > qi - cfg.sliding_window
    local_mask = jnp.where((ki <= qi) & in_window, 0.0, -jnp.inf
                           ).astype(base_mask.dtype)
    is_global = jnp.asarray([t == "global" for t in cfg.layer_types])
    cos = jnp.where(is_global[:, None, None, None], cos_g[None], cos_l[None])
    sin = jnp.where(is_global[:, None, None, None], sin_g[None], sin_l[None])
    mask = jnp.where(is_global[:, None, None], base_mask[None],
                     local_mask[None])
    return cos, sin, mask, True


def forward(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
            positions: Optional[jnp.ndarray] = None,
            mask: Optional[jnp.ndarray] = "causal",
            ) -> jnp.ndarray:
    """Full forward over stacked layers with lax.scan. tokens [B, S] -> logits [B, S, V]."""
    B, S = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
    cos, sin, mask_, stacked = layer_rope_mask(cfg, positions, S, S)
    if not (isinstance(mask, str) and mask == "causal"):
        mask_ = mask
        stacked = False
    x = embed_tokens(params, tokens, cfg)

    if stacked:
        def body(carry, xs):
            lp, c, s_, mk = xs
            y, _ = decoder_layer(lp, cfg, carry, c, s_, mk)
            return y, None
        x, _ = lax.scan(body, x, (params["layers"], cos, sin, mask_))
    else:
        def body(carry, lp):
            y, _ = decoder_layer(lp, cfg, carry, cos, sin, mask_)
            return y, None
        x, _ = lax.scan(body, x, params["layers"])
    return unembed(params, cfg, x)


def forward_unrolled(params: Params, cfg: ModelConfig, tokens: jnp.ndarray,
                     positions: Optional[jnp.ndarray] = None,
                     taps: Optional[Params] = None,
                     tap_range: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """Python-loop forward (one trace per layer).

    Used by calibration: if ``taps`` is given (pytree of zeros shaped like the
    per-module *outputs*, stacked [L, ...]), each module output gets
    ``out + tap`` added so that ``jax.grad`` w.r.t. the taps yields the
    per-module output-activation gradients — the hook-free analog of the
    reference's ``out.register_hook`` saliency capture
    (``any_precision/quantization/gradients.py:93-113``).
    """
    B, S = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
    cos, sin, mask, stacked = layer_rope_mask(cfg, positions, S, S)
    x = embed_tokens(params, tokens, cfg)
    L = num_layers_of(params)
    lo, hi = tap_range or (0, L)
    for i in range(L):
        lp = layer_slice(params["layers"], i)
        c, s_, mk = (cos[i], sin[i], mask[i]) if stacked else (cos, sin, mask)
        if taps is None or not (lo <= i < hi):
            x, _ = decoder_layer(lp, cfg, x, c, s_, mk)
        else:
            x = _decoder_layer_tapped(lp, cfg, x, c, s_, mk,
                                      layer_slice(taps, i - lo))
    return unembed(params, cfg, x)


def _decoder_layer_tapped(lp, cfg, x, cos, sin, mask, tap):
    """Decoder layer with additive taps on every target-module output."""
    B, S, _ = x.shape
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    h = _norm(cfg, x, lp["attn_norm"])
    q = (apply_linear(lp["q_proj"], h) + tap["q_proj"]).reshape(B, S, H, Dh)
    k = (apply_linear(lp["k_proj"], h) + tap["k_proj"]).reshape(B, S, KV, Dh)
    v = (apply_linear(lp["v_proj"], h) + tap["v_proj"]).reshape(B, S, KV, Dh)
    if cfg.qk_norm:
        q = _norm(cfg, q, lp["q_norm"])
        k = _norm(cfg, k, lp["k_norm"])
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    G = H // KV
    qg = q.reshape(B, S, KV, G, Dh)
    scores = jnp.einsum("bskgd,btkd->bkgst", qg, k,
                        preferred_element_type=jnp.float32) * _attn_scale(cfg)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bkgst,btkd->bskgd", probs, v).reshape(B, S, H * Dh)
    attn_out = apply_linear(lp["o_proj"], ctx) + tap["o_proj"]
    if cfg.sandwich_norms:
        attn_out = _norm(cfg, attn_out, lp["post_attn_norm"])
    x = x + attn_out

    h = _norm(cfg, x, lp["mlp_norm"])
    g = apply_linear(lp["gate_proj"], h) + tap["gate_proj"]
    u = apply_linear(lp["up_proj"], h) + tap["up_proj"]
    m = apply_linear(lp["down_proj"], _act(cfg, g) * u) + tap["down_proj"]
    if cfg.sandwich_norms:
        m = _norm(cfg, m, lp["post_mlp_norm"])
    x = x + m
    return x


def make_taps(cfg: ModelConfig, num_layers: int, B: int, S: int,
              dtype=jnp.float32) -> Params:
    """Zero taps pytree, stacked [L, B, S, out_features] per module."""
    d, f = cfg.hidden_size, cfg.intermediate_size
    shapes = {
        "q_proj": cfg.q_dim, "k_proj": cfg.kv_dim, "v_proj": cfg.kv_dim,
        "o_proj": d, "gate_proj": f, "up_proj": f, "down_proj": d,
    }
    return {m: jnp.zeros((num_layers, B, S, n), dtype) for m, n in shapes.items()}


def cross_entropy_loss(logits: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
    """Next-token CE averaged over predicted positions (HF labels=input_ids)."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = tokens[:, 1:]
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(logz - gold)
