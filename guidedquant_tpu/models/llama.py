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

def module_dims(cfg: ModelConfig) -> Dict[str, Tuple[int, int]]:
    """{module: (out_features, in_features)} for cfg.module_names."""
    d, f = cfg.hidden_size, cfg.intermediate_size
    dims = {"q_proj": (cfg.q_dim, d), "k_proj": (cfg.kv_dim, d),
            "v_proj": (cfg.kv_dim, d), "o_proj": (d, cfg.q_dim)}
    if cfg.mlp_type == "fc":
        dims.update({"fc1": (f, d), "fc2": (d, f)})
    else:
        dims.update({"gate_proj": (f, d), "up_proj": (f, d),
                     "down_proj": (d, f)})
    return {m: dims[m] for m in cfg.module_names}


def init_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random-init parameters (for tests/benchmarks; real use imports HF)."""
    d = cfg.hidden_size
    L = cfg.num_layers
    dims = module_dims(cfg)
    ks = jax.random.split(key, len(dims) + 3)

    def w(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) / jnp.sqrt(fan_in)).astype(dtype)

    layers: Params = {
        "attn_norm": jnp.ones((L, d), dtype),
    }
    for i, (m, (o, in_f)) in enumerate(dims.items()):
        layers[m] = w(ks[i], (L, o, in_f), in_f)
        if cfg.linear_bias:
            layers[m + "_bias"] = jnp.zeros((L, o), dtype)
    if not cfg.parallel_block:
        layers["mlp_norm"] = jnp.ones((L, d), dtype)
    if cfg.norm_type == "ln":
        layers["attn_norm_bias"] = jnp.zeros((L, d), dtype)
        if not cfg.parallel_block:
            layers["mlp_norm_bias"] = jnp.zeros((L, d), dtype)
    params: Params = {
        "embed": w(ks[-3], (cfg.vocab_size, d), d),
        "layers": layers,
        "final_norm": jnp.ones((d,), dtype),
    }
    if cfg.norm_type == "ln":
        params["final_norm_bias"] = jnp.zeros((d,), dtype)
    if cfg.pos_embed_type == "learned":
        params["pos_embed"] = w(ks[-2], (cfg.max_seq_len + cfg.pos_offset, d),
                                d)
    if cfg.qk_norm:
        params["layers"]["q_norm"] = jnp.ones((L, cfg.head_dim), dtype)
        params["layers"]["k_norm"] = jnp.ones((L, cfg.head_dim), dtype)
    if cfg.sandwich_norms:
        params["layers"]["post_attn_norm"] = jnp.ones((L, d), dtype)
        params["layers"]["post_mlp_norm"] = jnp.ones((L, d), dtype)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(ks[-1], (cfg.vocab_size, d), d)
        if cfg.lm_head_bias:
            params["lm_head_bias"] = jnp.zeros((cfg.vocab_size,), dtype)
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
    # Phi partial rotary: rope covers only the first fraction of head_dim
    # (reference phi arch; HF rotary_ndims = partial_rotary_factor * head_dim).
    rot_dim = int(cfg.head_dim * cfg.partial_rotary_factor)
    half = rot_dim // 2
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
    """x [B, S, H, Dh]; cos/sin [B, S, rot_dim] (HF rotate_half convention).

    rot_dim < Dh (Phi partial rotary) leaves the trailing dims untouched.
    """
    rot_dim = cos.shape[-1]
    x_pass = None
    if rot_dim < x.shape[-1]:
        x, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    half = rot_dim // 2
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    y = x * c + rot * s
    if x_pass is not None:
        y = jnp.concatenate([y, x_pass], axis=-1)
    return y


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


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _norm(cfg: ModelConfig, x: jnp.ndarray, weight: jnp.ndarray,
          bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if cfg.norm_type == "ln":  # OPT/Phi LayerNorm (eps shares rms_norm_eps)
        return layer_norm(x, weight, bias, cfg.rms_norm_eps)
    return rms_norm(x, weight, cfg.rms_norm_eps, cfg.norm_plus_one)


def _act(cfg: ModelConfig, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.hidden_act == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    if cfg.hidden_act == "relu":
        return jax.nn.relu(x)
    return jax.nn.silu(x)


def _lin(lp: Params, name: str, x: jnp.ndarray,
         tap: Optional[Params] = None) -> jnp.ndarray:
    """Apply a (possibly quantized) linear + optional bias + optional tap."""
    y = apply_linear(lp[name], x)
    b = lp.get(name + "_bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    if tap is not None:
        y = y + tap[name]
    return y


def _attn_scale(cfg: ModelConfig) -> float:
    s = cfg.attn_scalar if cfg.attn_scalar > 0 else cfg.head_dim
    return 1.0 / float(s) ** 0.5


def attention(lp: Params, cfg: ModelConfig, x: jnp.ndarray,
              cos: jnp.ndarray, sin: jnp.ndarray,
              mask: Optional[jnp.ndarray],
              kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
              cache_pos: Optional[jnp.ndarray] = None,
              capture: Optional[dict] = None,
              tap: Optional[Params] = None,
              ) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """One attention block.

    kv: optional preallocated (k_cache, v_cache), each [B, S_max, KVH, Dh];
    cache_pos: [S] positions at which to write the new k/v.
    cos/sin may be None (learned-position models — no RoPE).
    Returns (output, updated_kv).
    """
    B, S, _ = x.shape
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    q = _lin(lp, "q_proj", x, tap).reshape(B, S, H, Dh)
    k = _lin(lp, "k_proj", x, tap).reshape(B, S, KV, Dh)
    v = _lin(lp, "v_proj", x, tap).reshape(B, S, KV, Dh)

    if cfg.qk_norm:  # per-head RMSNorm before RoPE (Qwen3/Gemma3)
        q = _norm(cfg, q, lp["q_norm"])
        k = _norm(cfg, k, lp["k_norm"])
    if cos is not None:
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
    out = _lin(lp, "o_proj", ctx, tap)
    return out, new_kv


def mlp(lp: Params, x: jnp.ndarray, capture: Optional[dict] = None,
        cfg: Optional[ModelConfig] = None,
        tap: Optional[Params] = None) -> jnp.ndarray:
    if cfg is not None and cfg.mlp_type == "fc":  # OPT/Phi fc1→act→fc2
        h = _act(cfg, _lin(lp, "fc1", x, tap))
        if capture is not None:
            capture["fc2"] = h
        return _lin(lp, "fc2", h, tap)
    g = _lin(lp, "gate_proj", x, tap)
    u = _lin(lp, "up_proj", x, tap)
    h = (_act(cfg, g) if cfg is not None else jax.nn.silu(g)) * u
    if capture is not None:
        capture["down_proj"] = h
    return _lin(lp, "down_proj", h, tap)


def decoder_layer(lp: Params, cfg: ModelConfig, x: jnp.ndarray,
                  cos: jnp.ndarray, sin: jnp.ndarray,
                  mask: Optional[jnp.ndarray],
                  kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                  cache_pos: Optional[jnp.ndarray] = None,
                  capture: Optional[dict] = None,
                  tap: Optional[Params] = None,
                  ) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    h = _norm(cfg, x, lp["attn_norm"], lp.get("attn_norm_bias"))
    if capture is not None:
        capture["q_proj"] = capture["k_proj"] = capture["v_proj"] = h
    attn_out, new_kv = attention(lp, cfg, h, cos, sin, mask, kv, cache_pos,
                                 capture, tap)
    if cfg.parallel_block:  # Phi: attn + MLP both read the same normed input
        if capture is not None:
            capture["fc1" if cfg.mlp_type == "fc" else "gate_proj"] = h
        m = mlp(lp, h, capture, cfg, tap)
        return x + attn_out + m, new_kv
    if cfg.sandwich_norms:  # Gemma3 post-attention norm inside the residual
        attn_out = _norm(cfg, attn_out, lp["post_attn_norm"])
    x = x + attn_out
    h = _norm(cfg, x, lp["mlp_norm"], lp.get("mlp_norm_bias"))
    if capture is not None:
        if cfg.mlp_type == "fc":
            capture["fc1"] = h
        else:
            capture["gate_proj"] = capture["up_proj"] = h
    m = mlp(lp, h, capture, cfg, tap)
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
                 cfg: Optional[ModelConfig] = None,
                 positions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    e = jnp.take(params["embed"], tokens, axis=0)
    if cfg is not None and cfg.embed_scale:  # Gemma3: sqrt(d) normalizer
        e = e * jnp.asarray(cfg.hidden_size ** 0.5, e.dtype)
    if cfg is not None and cfg.pos_embed_type == "learned":
        if positions is None:
            S = tokens.shape[-1]
            positions = jnp.broadcast_to(jnp.arange(S), tokens.shape)
        # OPT offsets learned positions by 2 (HF OPTLearnedPositionalEmbedding)
        e = e + jnp.take(params["pos_embed"], positions + cfg.pos_offset,
                         axis=0).astype(e.dtype)
    return e


def unembed(params: Params, cfg: ModelConfig, x: jnp.ndarray) -> jnp.ndarray:
    x = _norm(cfg, x, params["final_norm"], params.get("final_norm_bias"))
    head = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
    logits = apply_linear(head, x)
    hb = params.get("lm_head_bias")
    if hb is not None:
        logits = logits + hb.astype(logits.dtype)
    return logits


def layer_rope_mask(cfg: ModelConfig, positions: jnp.ndarray,
                    S: int, T: int, offset: int = 0):
    """Per-layer (cos, sin, mask) stacks for mixed global/sliding models.

    Returns (cos [L?..], sin, mask, None) — for uniform models the arrays
    are unstacked and shared; for cfg.layer_types models returns stacked
    [L, ...] arrays selecting global vs local rope/mask per layer.
    """
    base_mask = causal_mask(S, T, offset)
    if cfg.pos_embed_type == "learned":  # OPT: no RoPE at all
        return None, None, base_mask, False
    cos_g, sin_g = rope_cos_sin(cfg, positions)
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
            remat: bool = False) -> jnp.ndarray:
    """Full forward over stacked layers with lax.scan. tokens [B, S] -> logits [B, S, V].

    remat=True checkpoints each scan step (training memory: only the [B,S,d]
    residual carry is saved per layer; attention scores/FFN intermediates are
    recomputed in the backward pass).
    """
    B, S = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
    cos, sin, mask_, stacked = layer_rope_mask(cfg, positions, S, S)
    if not (isinstance(mask, str) and mask == "causal"):
        mask_ = mask
        stacked = False
    x = embed_tokens(params, tokens, cfg, positions)

    if stacked:
        def body(carry, xs):
            lp, c, s_, mk = xs
            y, _ = decoder_layer(lp, cfg, carry, c, s_, mk)
            return y, None
        xs = (params["layers"], cos, sin, mask_)
    else:
        def body(carry, lp):
            y, _ = decoder_layer(lp, cfg, carry, cos, sin, mask_)
            return y, None
        xs = params["layers"]
    x, _ = lax.scan(jax.checkpoint(body) if remat else body, x, xs)
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
    x = embed_tokens(params, tokens, cfg, positions)
    L = num_layers_of(params)
    lo, hi = tap_range or (0, L)
    for i in range(L):
        lp = layer_slice(params["layers"], i)
        c, s_, mk = (cos[i], sin[i], mask[i]) if stacked else (cos, sin, mask)
        tap = (layer_slice(taps, i - lo)
               if taps is not None and lo <= i < hi else None)
        x, _ = decoder_layer(lp, cfg, x, c, s_, mk, tap=tap)
    return unembed(params, cfg, x)


def make_taps(cfg: ModelConfig, num_layers: int, B: int, S: int,
              dtype=jnp.float32) -> Params:
    """Zero taps pytree, stacked [L, B, S, out_features] per module."""
    dims = module_dims(cfg)
    return {m: jnp.zeros((num_layers, B, S, o), dtype)
            for m, (o, _) in dims.items()}


def cross_entropy_loss(logits: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
    """Next-token CE averaged over predicted positions (HF labels=input_ids)."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = tokens[:, 1:]
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(logz - gold)
