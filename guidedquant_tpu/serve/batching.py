"""Continuous batching: slot-based scheduler over the static decode engine.

The reference serves strictly batch-1 on one GPU (SURVEY.md §2.6 lists
continuous batching as absent); production TPU serving needs it, so this is
green-field: a fixed pool of batch slots over one static KV cache, per-slot
positions, asynchronous admission (prefill into a free slot) and retirement
(EOS / max length), with every step a single jitted batched decode.

Design notes:
- Static shapes throughout: the cache is [L, B_slots, S_max, KV, Dh]; slots
  join/leave by masking, never by reshaping.
- Per-slot cache writes use scatter (vmapped dynamic_update_slice over the
  slot axis) because slots sit at different positions.
- Inactive slots still compute (masked) — the XLA-friendly trade: decode
  cost is O(B_slots) regardless of occupancy, admission never recompiles.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..models import llama
from ..models.config import ModelConfig
from .engine import _attend


@struct.dataclass
class SlotState:
    """Ring-window mode (``wk is not None``): sliding-attention layers
    (cfg.layer_types) keep only the last W positions per slot in
    ``wk/wv [L_sliding, B, W, KV, Dh]`` (slot p -> ring index p % W);
    ``k/v`` then hold only the global layers. Same design as
    engine.DecodeState, with per-slot positions."""

    k: jnp.ndarray    # [L, B, S_max, KV, Dh] (dtype, or int8 codes)
    v: jnp.ndarray
    pos: jnp.ndarray  # [B] int32 — tokens currently in each slot's cache
    k_scale: Optional[jnp.ndarray] = None  # [L, B, S_max, KV, 1] f32
    v_scale: Optional[jnp.ndarray] = None
    wk: Optional[jnp.ndarray] = None
    wv: Optional[jnp.ndarray] = None
    wk_scale: Optional[jnp.ndarray] = None
    wv_scale: Optional[jnp.ndarray] = None
    kv_bits: int = struct.field(pytree_node=False, default=16)

    def group(self, window: bool):
        """Cache-array tuple for the global (or ring) layer group:
        (k, v[, k_scale, v_scale])."""
        a = (self.wk, self.wv, self.wk_scale, self.wv_scale) if window \
            else (self.k, self.v, self.k_scale, self.v_scale)
        return a[:2] if a[2] is None else a


def init_slots(cfg: ModelConfig, num_layers: int, slots: int, max_seq: int,
               dtype=jnp.bfloat16, window: int = 0,
               kv_bits: int = 16) -> SlotState:
    quant = kv_bits < 16

    def _alloc(L, T):
        shape = (L, slots, T, cfg.num_kv_heads, cfg.head_dim)
        if quant:
            return (jnp.zeros(shape, jnp.int8),
                    jnp.zeros(shape, jnp.int8),
                    jnp.zeros(shape[:-1] + (1,), jnp.float32),
                    jnp.zeros(shape[:-1] + (1,), jnp.float32))
        return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), None, None)

    pos = jnp.zeros((slots,), jnp.int32)
    if window > 0:
        assert cfg.layer_types and len(cfg.layer_types) == num_layers
        Lg = sum(t == "global" for t in cfg.layer_types)
        k, v, ks, vs = _alloc(Lg, max_seq)
        wk, wv, wks, wvs = _alloc(num_layers - Lg, min(window, max_seq))
        return SlotState(k=k, v=v, pos=pos, k_scale=ks, v_scale=vs,
                         wk=wk, wv=wv, wk_scale=wks, wv_scale=wvs,
                         kv_bits=kv_bits)
    k, v, ks, vs = _alloc(num_layers, max_seq)
    return SlotState(k=k, v=v, pos=pos, k_scale=ks, v_scale=vs,
                     kv_bits=kv_bits)


import os as _os

# Per-slot KV write strategy for the single-token decode step. A vmapped
# dynamic_update_slice over per-slot positions lowers to a select-rewrite
# of the whole [B, S, KV, Dh] slab on TPU (the engine's shared-position
# decode uses a cheap in-place DUS; slots genuinely differ in position, so
# the batcher cannot). "point" uses one XLA scatter at the B unique
# (slot, pos) rows instead. SLOT_WRITE=dus restores the vmapped form for
# A/B (see tools/perf/served_breakdown.py).
_SLOT_WRITE = _os.environ.get("SLOT_WRITE", "point")


def _write_slots(cache, new, pos):
    """cache [B, S, KV, Dh]; new [B, S_new, KV, Dh]; pos [B] write offsets."""
    if new.shape[1] == 1 and _SLOT_WRITE == "point":
        B = cache.shape[0]
        return cache.at[jnp.arange(B), pos].set(new[:, 0].astype(cache.dtype))

    def write_one(c, n, p):
        return jax.lax.dynamic_update_slice(c, n.astype(c.dtype), (p, 0, 0))
    return jax.vmap(write_one)(cache, new, pos)


def _ring_mask(pos, positions, Wb: int, window: int):
    """Additive mask [B, 1, 1, S, Wb+S] over concat(ring slots, fresh
    block). ``pos`` [B] tokens already cached per slot; ``positions``
    [B, S] global query positions. Ring slot j holds global position
    (pos-1) - ((pos-1-j) mod Wb), negative = never written."""
    pm1 = (pos - 1)[:, None]                      # [B, 1]
    j = jnp.arange(Wb)[None, :]
    g_ring = pm1 - jnp.mod(pm1 - j, Wb)           # [B, Wb]
    g = jnp.concatenate([g_ring, positions], axis=1)[:, None, :]  # [B,1,T]
    p = positions[:, :, None]                     # [B, S, 1]
    m = jnp.where((g >= 0) & (g <= p) & (g > p - window), 0.0, -1e30)
    return m[:, None, None]                       # [B, 1, 1, S, Wb+S]


def _slot_layer(lp, cfg: ModelConfig, x, cos, sin, kv_l, pos, t_mask,
                ring_window: int = 0, ring_prefill: bool = False,
                kv_bits: int = 16):
    """kv_l: (k, v) caches or (k, v, k_scale, v_scale) int8-code caches
    (engine-style quantized KV; scales per (slot, position, head))."""
    from ..nn.linear import apply_linear
    B, S, _ = x.shape
    H, KV, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    h = llama._norm(cfg, x, lp["attn_norm"])
    if "qkv_proj" in lp:
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
    quant = len(kv_l) == 4
    if quant:
        from .engine import _kv_quant

    if ring_window:
        # W-slot ring (read-before-write + concat, as in engine ring mode;
        # t_mask must be the _ring_mask over concat(ring, fresh block))
        Wb = kv_l[0].shape[1]
        m = min(S, Wb)
        if quant:
            kq, ks = _kv_quant(k, kv_bits)
            vq, vs = _kv_quant(v, kv_bits)
            # int8 codes + scales go straight into _attend (fold; see
            # engine._attend). The fresh block attends through its own
            # quantized codes, matching the dense-cache path.
            k_all = jnp.concatenate([kv_l[0], kq], axis=1)
            v_all = jnp.concatenate([kv_l[1], vq], axis=1)
            ks_all = jnp.concatenate([kv_l[2], ks], axis=1)
            vs_all = jnp.concatenate([kv_l[3], vs], axis=1)
            fresh = (kq, vq, ks, vs)
        else:
            k_ring, v_ring = kv_l
            kf, vf = k.astype(k_ring.dtype), v.astype(v_ring.dtype)
            fresh = (k, v)
            k_all = jnp.concatenate([k_ring, kf], axis=1)
            v_all = jnp.concatenate([v_ring, vf], axis=1)
            ks_all = vs_all = None
        ctx = _attend(cfg, q, k_all, v_all, t_mask, k_scale=ks_all,
                      v_scale=vs_all)

        if ring_prefill:
            # bucketed prefill: the caller rebuilds the ring by gathering
            # the last-W TRUE positions from the fresh block (a scatter of
            # right-padded blocks would pollute ring slots with pad K/V).
            # Return the fresh bf16 block; the caller re-quantizes.
            new_kv = (k, v)
        else:
            def write_one(c, n, p):
                slots = jnp.mod(p + (S - m) + jnp.arange(m), Wb)
                return c.at[slots].set(n[S - m:].astype(c.dtype))

            new_kv = tuple(jax.vmap(write_one)(c, n, pos)
                           for c, n in zip(kv_l, fresh))
    elif quant:
        kq, ks = _kv_quant(k, kv_bits)
        vq, vs = _kv_quant(v, kv_bits)
        new_kv = tuple(_write_slots(c, n, pos)
                       for c, n in zip(kv_l, (kq, vq, ks, vs)))
        ctx = _attend(cfg, q, new_kv[0], new_kv[1], t_mask,
                      k_scale=new_kv[2], v_scale=new_kv[3])
    else:
        k_cache, v_cache = kv_l
        k_cache = _write_slots(k_cache, k, pos)
        v_cache = _write_slots(v_cache, v, pos)
        new_kv = (k_cache, v_cache)
        ctx = _attend(cfg, q, k_cache, v_cache, t_mask)
    attn_out = apply_linear(lp["o_proj"], ctx)
    if cfg.sandwich_norms:
        attn_out = llama._norm(cfg, attn_out, lp["post_attn_norm"])
    x = x + attn_out
    h = llama._norm(cfg, x, lp["mlp_norm"])
    if "gate_up_proj" in lp:
        gu = apply_linear(lp["gate_up_proj"], h)
        f = cfg.intermediate_size
        g, u = gu[..., :f], gu[..., f:]
    else:
        g = apply_linear(lp["gate_proj"], h)
        u = apply_linear(lp["up_proj"], h)
    m = apply_linear(lp["down_proj"], llama._act(cfg, g) * u)
    if cfg.sandwich_norms:
        m = llama._norm(cfg, m, lp["post_mlp_norm"])
    return x + m, new_kv


def _layer_ropes_masks(cfg: ModelConfig, positions, T: int):
    """Per-layer-type rope/mask for cfg.layer_types models (Gemma3):
    (cos_l, sin_l, sliding_mask [B, 1, 1, S, T], is_global), or None for
    uniform models. ``positions`` [B, S] global query positions; the
    mask's last axis indexes the cache timeline 0..T-1."""
    if not cfg.layer_types:
        return None
    local_cfg = cfg.replace(rope_theta=cfg.rope_local_theta,
                            rope_scaling=None)
    cos_l, sin_l = llama.rope_cos_sin(local_cfg, positions)
    t_ids = jnp.arange(T)[None, None, :]
    p = positions[:, :, None]
    sliding = jnp.where((t_ids <= p) & (t_ids > p - cfg.sliding_window),
                        0.0, -1e30)  # [B, S, T]
    is_global = jnp.asarray([t == "global" for t in cfg.layer_types])
    return cos_l, sin_l, sliding[:, None, None], is_global


def _compute_dtype(state: SlotState):
    """Activation dtype: the cache dtype, unless the cache holds int8
    codes (quantized KV) — then bf16."""
    return state.k.dtype if state.kv_bits >= 16 else jnp.bfloat16


def _decode_step_impl(params, cfg: ModelConfig, tok: jnp.ndarray,
                      state: SlotState, active: jnp.ndarray):
    """One token for every slot (inactive slots masked). tok [B]; active [B]
    bool. Returns (logits [B, V], state with pos advanced on active)."""
    S_max = state.k.shape[2]
    positions = state.pos[:, None]  # [B, 1]
    cos, sin = llama.rope_cos_sin(cfg, positions)
    x = llama.embed_tokens(params, tok[:, None], cfg).astype(_compute_dtype(state))
    t_ids = jnp.arange(S_max)[None, None, :]
    # [B, 1, S]: slot b attends to t <= pos[b]
    t_mask = jnp.where(t_ids <= positions[:, :, None], 0.0, -1e30)
    # _attend expects mask broadcastable over [B, KV, G, S, T]
    mask = t_mask[:, None, None, :, :]
    pl_ctx = _layer_ropes_masks(cfg, positions, S_max)
    ring = state.wk is not None
    if ring:
        rmask = _ring_mask(state.pos, positions, state.wk.shape[2],
                           cfg.sliding_window)

    kv_g = state.group(window=False)
    kv_w = state.group(window=True) if ring else None
    if isinstance(params["layers"], (tuple, list)):
        # unrolled per-layer buffers (engine.unroll_layers): Pallas kernels
        # bind packed operands directly instead of consuming per-step
        # HBM->HBM copies of scan slices.
        gi = wi = 0
        for li, lp in enumerate(params["layers"]):
            sliding = pl_ctx is not None and cfg.layer_types[li] != "global"
            if ring and sliding:
                x, new = _slot_layer(
                    lp, cfg, x, pl_ctx[0], pl_ctx[1],
                    tuple(a[wi] for a in kv_w), state.pos, rmask,
                    ring_window=cfg.sliding_window, kv_bits=state.kv_bits)
                kv_w = tuple(a.at[wi].set(n) for a, n in zip(kv_w, new))
                wi += 1
                continue
            if sliding:
                c_, s_, mk = pl_ctx[0], pl_ctx[1], pl_ctx[2]
            else:
                c_, s_, mk = cos, sin, mask
            x, new = _slot_layer(lp, cfg, x, c_, s_,
                                 tuple(a[gi] for a in kv_g),
                                 state.pos, mk, kv_bits=state.kv_bits)
            kv_g = tuple(a.at[gi].set(n) for a, n in zip(kv_g, new))
            gi += 1
    else:
        assert not ring, "ring-window serving requires unrolled params"

        def body(carry, xs):
            x = carry
            if pl_ctx is not None:
                lp, flag, kv = xs
                c_ = jnp.where(flag, cos, pl_ctx[0])
                s_ = jnp.where(flag, sin, pl_ctx[1])
                mk = jnp.where(flag, mask, pl_ctx[2])
            else:
                lp, kv = xs
                c_, s_, mk = cos, sin, mask
            x, kv = _slot_layer(lp, cfg, x, c_, s_, kv, state.pos, mk,
                                kv_bits=state.kv_bits)
            return x, kv

        xs = ((params["layers"],)
              + ((pl_ctx[3],) if pl_ctx is not None else ())
              + (kv_g,))
        x, kv_g = jax.lax.scan(body, x, xs)
    logits = llama.unembed(params, cfg, x)[:, 0]
    new_pos = jnp.where(active, state.pos + 1, state.pos)
    quant = state.kv_bits < 16
    return logits, SlotState(
        k=kv_g[0], v=kv_g[1], pos=new_pos,
        k_scale=kv_g[2] if quant else None,
        v_scale=kv_g[3] if quant else None,
        wk=kv_w[0] if ring else None, wv=kv_w[1] if ring else None,
        wk_scale=kv_w[2] if ring and quant else None,
        wv_scale=kv_w[3] if ring and quant else None,
        kv_bits=state.kv_bits)


decode_step_slots = partial(jax.jit, static_argnames=("cfg",),
                            donate_argnums=(3,))(_decode_step_impl)


def _pick_next(logits, temps, key, top_k: Optional[int]):
    """Per-slot sampling: greedy where temps[b] == 0, else (top-k)
    categorical at that slot's temperature (the batcher analog of
    engine._sample_logits, vectorized over slots)."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if temps is None:
        return greedy
    l = logits / jnp.maximum(temps[:, None], 1e-6)
    if top_k is not None:
        kth = jnp.sort(l, axis=-1)[..., -top_k][..., None]
        l = jnp.where(l < kth, -jnp.inf, l)
    sampled = jax.random.categorical(key, l, axis=-1).astype(jnp.int32)
    return jnp.where(temps > 0.0, sampled, greedy)


@partial(jax.jit, static_argnames=("cfg", "n", "eos_id", "top_k"),
         donate_argnums=(3,))
def decode_chunk_slots(params, cfg: ModelConfig, tok: jnp.ndarray,
                       state: SlotState, active: jnp.ndarray, n: int,
                       eos_id: Optional[int] = None,
                       temps: Optional[jnp.ndarray] = None,
                       key: Optional[jnp.ndarray] = None,
                       top_k: Optional[int] = None):
    """``n`` decode steps for every slot entirely on device — one host
    round-trip per chunk instead of per token (the batcher analog of
    ``engine.decode_n_tokens``; on tunnel-style transports the
    per-dispatch cost dominates single-step batched decode). Greedy by
    default; ``temps [B]`` enables per-slot temperature sampling
    (0 = greedy for that slot) with an optional global top_k.

    A slot freezes inside the chunk when it emits ``eos_id`` or reaches the
    cache edge: its ``pos`` stops advancing and its later tokens are marked
    invalid. Admission/retirement stay host-side at chunk boundaries.

    Returns (toks [B, n], valid [B, n] bool, state, active_out).
    """
    S_max = state.k.shape[2]
    if temps is not None and key is None:
        raise ValueError("decode_chunk_slots: sampling (temps) requires an "
                         "explicit PRNG key — a silent default would replay "
                         "the same stream every chunk")
    if key is None:
        key = jax.random.PRNGKey(0)

    def body(carry, _):
        tok, state, act, key = carry
        logits, state = _decode_step_impl(params, cfg, tok, state, act)
        key, k0 = jax.random.split(key)
        nxt = _pick_next(logits, temps, k0, top_k)
        nxt = jnp.where(act, nxt, tok)
        new_act = act & (state.pos < S_max - 1)
        if eos_id is not None:
            new_act = new_act & (nxt != eos_id)
        return (nxt, state, new_act, key), (nxt, act)

    (tok, state, active, key), (toks, valid) = jax.lax.scan(
        body, (tok, state, active, key), None, length=n)
    return jnp.moveaxis(toks, 0, 1), jnp.moveaxis(valid, 0, 1), state, active


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def prefill_slot(params, cfg: ModelConfig, prompt: jnp.ndarray,
                 state: SlotState, slot: jnp.ndarray,
                 true_len: Optional[jnp.ndarray] = None):
    """Prefill one slot with prompt [1, S]; other slots untouched.

    Runs the prompt through the stack against an empty per-slot cache and
    scatters the new K/V into ``slot``. Returns (last logits [V], state).

    ``true_len`` (traced scalar <= S) supports length-bucketed prompts: the
    prompt is right-padded to a bucket size so one compilation serves every
    length in the bucket. Padded positions sit AFTER the real prompt; causal
    masking keeps real queries from seeing them, the returned logits are
    taken at ``true_len - 1``, and the slot position is set to ``true_len``
    (decode steps overwrite the padded cache entries before attending).
    """
    B = state.k.shape[1]
    S = prompt.shape[1]
    S_max = state.k.shape[2]
    if true_len is None:
        true_len = jnp.int32(S)
    positions = jnp.arange(S)[None, :]
    cos, sin = llama.rope_cos_sin(cfg, positions)
    x = llama.embed_tokens(params, prompt, cfg).astype(_compute_dtype(state))
    mask = llama.causal_mask(S, S_max)[None, None, None]
    pl_ctx = _layer_ropes_masks(cfg, positions, S_max)
    ring = state.wk is not None
    if ring:
        Wb = state.wk.shape[2]
        rmask = _ring_mask(jnp.zeros((1,), jnp.int32), positions, Wb,
                           cfg.sliding_window)
        # ring slot j must end holding the latest TRUE position == j mod W
        pm1 = true_len - 1
        g = pm1 - jnp.mod(pm1 - jnp.arange(Wb), Wb)
        g_src = jnp.clip(g, 0, S - 1)  # g<0 slots: junk, masked until
        #                                overwritten (decode ring mask)

    quant = state.kv_bits < 16

    def _fresh(T, dtype):
        z = jnp.zeros((1, T, cfg.num_kv_heads, cfg.head_dim), dtype)
        if quant:
            s = jnp.zeros((1, T, cfg.num_kv_heads, 1), jnp.float32)
            return (z, jnp.copy(z), s, jnp.copy(s))
        return (z, jnp.copy(z))

    def layer_into_slot(lp, x, kv_l, c_, s_, mk):
        # compute with an isolated cache for this slot
        kv_slot = _fresh(S_max, state.k.dtype)
        x, kv_slot = _slot_layer(lp, cfg, x, c_, s_, kv_slot,
                                 jnp.zeros((1,), jnp.int32), mk,
                                 kv_bits=state.kv_bits)
        kv_l = tuple(
            jax.lax.dynamic_update_slice(a, n, (slot, 0, 0, 0))
            for a, n in zip(kv_l, kv_slot))
        return x, kv_l

    def ring_into_slot(lp, x, kv_l, c_, s_):
        ring0 = _fresh(Wb, state.wk.dtype)
        x, (kf, vf) = _slot_layer(
            lp, cfg, x, c_, s_, ring0,
            jnp.zeros((1,), jnp.int32), rmask,
            ring_window=cfg.sliding_window, ring_prefill=True,
            kv_bits=state.kv_bits)
        ring_k, ring_v = kf[:, g_src], vf[:, g_src]
        if quant:
            from .engine import _kv_quant
            rkq, rks = _kv_quant(ring_k, state.kv_bits)
            rvq, rvs = _kv_quant(ring_v, state.kv_bits)
            new = (rkq, rvq, rks, rvs)
        else:
            new = (ring_k, ring_v)
        kv_l = tuple(
            jax.lax.dynamic_update_slice(a, n.astype(a.dtype),
                                         (slot, 0, 0, 0))
            for a, n in zip(kv_l, new))
        return x, kv_l

    kv_g = state.group(window=False)
    kv_w = state.group(window=True) if ring else None
    if isinstance(params["layers"], (tuple, list)):
        gi = wi = 0
        for li, lp in enumerate(params["layers"]):
            sliding = pl_ctx is not None and cfg.layer_types[li] != "global"
            if ring and sliding:
                x, new = ring_into_slot(lp, x,
                                        tuple(a[wi] for a in kv_w),
                                        pl_ctx[0], pl_ctx[1])
                kv_w = tuple(a.at[wi].set(n) for a, n in zip(kv_w, new))
                wi += 1
                continue
            if sliding:
                c_, s_, mk = pl_ctx[0], pl_ctx[1], pl_ctx[2]
            else:
                c_, s_, mk = cos, sin, mask
            x, new = layer_into_slot(lp, x, tuple(a[gi] for a in kv_g),
                                     c_, s_, mk)
            kv_g = tuple(a.at[gi].set(n) for a, n in zip(kv_g, new))
            gi += 1
    else:
        assert not ring, "ring-window serving requires unrolled params"

        def body(carry, xs):
            x = carry
            if pl_ctx is not None:
                lp, flag, kv = xs
                c_ = jnp.where(flag, cos, pl_ctx[0])
                s_ = jnp.where(flag, sin, pl_ctx[1])
                mk = jnp.where(flag, mask, pl_ctx[2])
            else:
                lp, kv = xs  # caches [B, S_max, KV, Dh]
                c_, s_, mk = cos, sin, mask
            x, kv = layer_into_slot(lp, x, kv, c_, s_, mk)
            return x, kv

        xs = ((params["layers"],)
              + ((pl_ctx[3],) if pl_ctx is not None else ())
              + (kv_g,))
        x, kv_g = jax.lax.scan(body, x, xs)
    x_last = jax.lax.dynamic_index_in_dim(x, true_len - 1, axis=1)
    logits = llama.unembed(params, cfg, x_last)[0, 0]
    new_pos = state.pos.at[slot].set(true_len)
    return logits, SlotState(
        k=kv_g[0], v=kv_g[1], pos=new_pos,
        k_scale=kv_g[2] if quant else None,
        v_scale=kv_g[3] if quant else None,
        wk=kv_w[0] if ring else None, wv=kv_w[1] if ring else None,
        wk_scale=kv_w[2] if ring and quant else None,
        wv_scale=kv_w[3] if ring and quant else None,
        kv_bits=state.kv_bits)


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3,))
def prefill_slots(params, cfg: ModelConfig, prompts: jnp.ndarray,
                  state: SlotState, slot_ids: jnp.ndarray,
                  true_lens: jnp.ndarray, valid: jnp.ndarray):
    """Batched admission: prefill up to B waiting requests in ONE forward.

    ``prompts`` [B, S] (length-bucketed, right-padded), ``slot_ids`` [B] a
    permutation of all slots whose first rows are the slots being filled
    (``valid`` marks them; invalid rows are dummy work whose cache writes
    are discarded). One compilation per (B, S) bucket; B is always the full
    slot count so occupancy never recompiles. Sequential per-request
    prefill was the dominant served-throughput cost (see PERF_NOTES).

    Returns (logits [B, V], state).
    """
    B, S = prompts.shape
    S_max = state.k.shape[2]
    positions = jnp.arange(S)[None, :]
    cos, sin = llama.rope_cos_sin(cfg, positions)
    x = llama.embed_tokens(params, prompts, cfg).astype(_compute_dtype(state))
    mask = llama.causal_mask(S, S_max)[None, None, None]
    vmask = valid[:, None, None, None]
    pl_ctx = _layer_ropes_masks(cfg, positions, S_max)
    ring = state.wk is not None
    wk_all, wv_all = state.wk, state.wv
    if ring:
        Wb = state.wk.shape[2]
        rmask = _ring_mask(jnp.zeros((B,), jnp.int32),
                           jnp.broadcast_to(positions, (B, S)), Wb,
                           cfg.sliding_window)
        pm1 = (true_lens - 1)[:, None]  # [B, 1]
        g = pm1 - jnp.mod(pm1 - jnp.arange(Wb)[None, :], Wb)
        g_src = jnp.clip(g, 0, S - 1)   # [B, Wb]

    quant = state.kv_bits < 16

    def _fresh(T, dtype):
        z = jnp.zeros((B, T, cfg.num_kv_heads, cfg.head_dim), dtype)
        if quant:
            s = jnp.zeros((B, T, cfg.num_kv_heads, 1), jnp.float32)
            return (z, jnp.copy(z), s, jnp.copy(s))
        return (z, jnp.copy(z))

    def _scatter(kv_l, new):
        # slot_ids is a permutation -> unique scatter indices; dummy rows
        # write their slot's existing cache back unchanged.
        return tuple(
            a.at[slot_ids].set(jnp.where(vmask, n.astype(a.dtype),
                                         a[slot_ids]))
            for a, n in zip(kv_l, new))

    def layer_into_slots(lp, x, kv_l, c_, s_, mk):
        kv_new = _fresh(S_max, state.k.dtype)
        x, kv_new = _slot_layer(lp, cfg, x, c_, s_, kv_new,
                                jnp.zeros((B,), jnp.int32), mk,
                                kv_bits=state.kv_bits)
        return x, _scatter(kv_l, kv_new)

    def ring_into_slots(lp, x, kv_l, c_, s_):
        ring0 = _fresh(Wb, state.wk.dtype)
        x, (kf, vf) = _slot_layer(
            lp, cfg, x, c_, s_, ring0,
            jnp.zeros((B,), jnp.int32), rmask,
            ring_window=cfg.sliding_window, ring_prefill=True,
            kv_bits=state.kv_bits)
        gidx = g_src[:, :, None, None]
        ring_k = jnp.take_along_axis(kf, gidx, axis=1)
        ring_v = jnp.take_along_axis(vf, gidx, axis=1)
        if quant:
            from .engine import _kv_quant
            rkq, rks = _kv_quant(ring_k, state.kv_bits)
            rvq, rvs = _kv_quant(ring_v, state.kv_bits)
            new = (rkq, rvq, rks, rvs)
        else:
            new = (ring_k, ring_v)
        return x, _scatter(kv_l, new)

    kv_g = state.group(window=False)
    kv_w = state.group(window=True) if ring else None
    if isinstance(params["layers"], (tuple, list)):
        gi2 = wi = 0
        for li, lp in enumerate(params["layers"]):
            sliding = pl_ctx is not None and cfg.layer_types[li] != "global"
            if ring and sliding:
                x, new = ring_into_slots(lp, x,
                                         tuple(a[wi] for a in kv_w),
                                         pl_ctx[0], pl_ctx[1])
                kv_w = tuple(a.at[wi].set(n) for a, n in zip(kv_w, new))
                wi += 1
                continue
            if sliding:
                c_, s_, mk = pl_ctx[0], pl_ctx[1], pl_ctx[2]
            else:
                c_, s_, mk = cos, sin, mask
            x, new = layer_into_slots(lp, x, tuple(a[gi2] for a in kv_g),
                                      c_, s_, mk)
            kv_g = tuple(a.at[gi2].set(n) for a, n in zip(kv_g, new))
            gi2 += 1
    else:
        assert not ring, "ring-window serving requires unrolled params"

        def body(carry, xs):
            x = carry
            if pl_ctx is not None:
                lp, flag, kv = xs
                c_ = jnp.where(flag, cos, pl_ctx[0])
                s_ = jnp.where(flag, sin, pl_ctx[1])
                mk = jnp.where(flag, mask, pl_ctx[2])
            else:
                lp, kv = xs
                c_, s_, mk = cos, sin, mask
            x, kv = layer_into_slots(lp, x, kv, c_, s_, mk)
            return x, kv

        xs = ((params["layers"],)
              + ((pl_ctx[3],) if pl_ctx is not None else ())
              + (kv_g,))
        x, kv_g = jax.lax.scan(body, x, xs)

    x_last = jax.vmap(
        lambda xr, n: jax.lax.dynamic_index_in_dim(xr, n - 1, axis=0,
                                                   keepdims=False)
    )(x, true_lens)  # [B, D]
    logits = llama.unembed(params, cfg, x_last[:, None])[:, 0]
    new_pos = state.pos.at[slot_ids].set(
        jnp.where(valid, true_lens, state.pos[slot_ids]))
    return logits, SlotState(
        k=kv_g[0], v=kv_g[1], pos=new_pos,
        k_scale=kv_g[2] if quant else None,
        v_scale=kv_g[3] if quant else None,
        wk=kv_w[0] if ring else None, wv=kv_w[1] if ring else None,
        wk_scale=kv_w[2] if ring and quant else None,
        wv_scale=kv_w[3] if ring and quant else None,
        kv_bits=state.kv_bits)


@dataclass
class Request:
    req_id: int
    prompt: np.ndarray
    max_new_tokens: int
    temperature: float = 0.0  # 0 = greedy for this request
    out: List[int] = field(default_factory=list)
    done: bool = False


class ContinuousBatcher:
    """Host-side scheduler: admit -> batched decode -> retire."""

    def __init__(self, params, cfg: ModelConfig, slots: int = 4,
                 max_seq: int = 512, eos_id: Optional[int] = None,
                 kv_dtype=jnp.bfloat16, mesh=None, chunk: int = 1,
                 window: Optional[int] = None, kv_bits: int = 16,
                 top_k: Optional[int] = None, seed: int = 0):
        # window: sliding-layer ring-buffer length (None = auto:
        # cfg.sliding_window for layer_types models on unrolled params;
        # 0 disables). Sliding layers then cache only W positions/slot.
        from .engine import check_engine_arch
        check_engine_arch(cfg)
        # Measured serving policy (PERF_NOTES r4, VERDICT r4 next 5): engage
        # the int-domain W{b}A8 kernels on affine-fast-path leaves when the
        # slot count is within the regime where A8 wins (<= ACT8_MAX_SLOTS).
        # SERVED_ACT=16 forces bf16 activations, SERVED_ACT=8 forces A8.
        import os as _os
        from ..nn.linear import apply_act8_policy
        _act_env = _os.environ.get("SERVED_ACT")
        _enable = None if _act_env is None else (_act_env == "8")
        params = apply_act8_policy(params, slots=slots, enable=_enable)
        if window is None:
            window = (cfg.sliding_window
                      if cfg.layer_types and cfg.sliding_window
                      and isinstance(params["layers"], (tuple, list))
                      else 0)
        self.window = window
        if mesh is not None:
            # tp-shard the packed weights over the mesh; the slot cache
            # shards kv-heads on 'tp' (multi-chip continuous batching —
            # green-field vs the reference's single-GPU batch-1 serving).
            from ..parallel import sharding as shd
            specs = shd.quantized_param_specs(cfg, params)
            params = shd.shard_params(mesh, params, specs)
        self.mesh = mesh
        self.params = params
        self.cfg = cfg
        self.slots = slots
        self.eos_id = eos_id
        self.state = init_slots(cfg, cfg.num_layers, slots, max_seq,
                                dtype=kv_dtype, window=window,
                                kv_bits=kv_bits)
        if mesh is not None:
            from jax.sharding import NamedSharding
            from ..parallel import sharding as shd
            sh = NamedSharding(mesh, shd.kv_cache_spec())

            def _put(a):
                return None if a is None else shd.put_global(a, sh)

            self.state = self.state.replace(
                k=_put(self.state.k), v=_put(self.state.v),
                k_scale=_put(self.state.k_scale),
                v_scale=_put(self.state.v_scale),
                wk=_put(self.state.wk), wv=_put(self.state.wv),
                wk_scale=_put(self.state.wk_scale),
                wv_scale=_put(self.state.wv_scale))
        self.max_seq = max_seq
        self.chunk = max(1, chunk)
        self.queue: List[Request] = []
        self._retired: List[int] = []
        self.slot_req: List[Optional[Request]] = [None] * slots
        self.cur_tok = np.zeros(slots, np.int32)
        self.slot_temp = np.zeros(slots, np.float32)
        self.top_k = top_k
        self._key = jax.random.PRNGKey(seed)       # device stream (chunks)
        self._host_rng = np.random.default_rng(seed + 1)  # per-token path
        self._next_id = 0
        self.finished: Dict[int, Request] = {}

    def _fetch(self, tree):
        """Device->host fetch of small control arrays. Across a
        multi-PROCESS mesh a jit output may not be fully addressable
        locally; process_allgather materializes the same global value on
        every process, keeping the host-side scheduling in lockstep (the
        multi-host serving analog of the reference's rank-identical
        control flow)."""
        if self.mesh is not None and jax.process_count() > 1:
            from jax.experimental import multihost_utils
            return multihost_utils.process_allgather(tree, tiled=True)
        return jax.device_get(tree)

    def submit(self, prompt: np.ndarray, max_new_tokens: int = 32,
               temperature: float = 0.0) -> int:
        rid = self._next_id
        self._next_id += 1
        self.queue.append(Request(rid, np.asarray(prompt).reshape(-1),
                                  max_new_tokens, temperature=temperature))
        return rid

    @staticmethod
    def _bucket(n: int) -> int:
        """Next power-of-2 >= n (min 8): one prefill compilation per bucket
        instead of one per distinct prompt length."""
        b = 8
        while b < n:
            b *= 2
        return b

    def _admit(self):
        free = [b for b in range(self.slots) if self.slot_req[b] is None]
        take = min(len(free), len(self.queue))
        if take == 0:
            return
        reqs = [self.queue.pop(0) for _ in range(take)]
        bucket = max(self._bucket(len(r.prompt)) for r in reqs)
        prompts = np.zeros((self.slots, bucket), np.int32)
        true_lens = np.ones(self.slots, np.int32)  # dummies index row 0
        valid = np.zeros(self.slots, bool)
        slot_ids = np.asarray(
            free[:take] + [b for b in range(self.slots)
                           if b not in free[:take]], np.int32)
        for i, r in enumerate(reqs):
            prompts[i, :len(r.prompt)] = r.prompt
            true_lens[i] = len(r.prompt)
            valid[i] = True
        logits, self.state = prefill_slots(
            self.params, self.cfg, jnp.asarray(prompts), self.state,
            jnp.asarray(slot_ids), jnp.asarray(true_lens),
            jnp.asarray(valid))
        if all(r.temperature == 0.0 for r in reqs):
            # greedy wave: fetch the device-side argmax ([B] ints) instead
            # of the full [B, V] logits — at a 128k vocab that fetch is
            # ~16 MB per admission wave over a tunnel transport
            toks = np.asarray(self._fetch(jnp.argmax(logits, axis=-1)),
                              np.int64)
        else:
            toks = self._pick_host(
                np.asarray(self._fetch(logits), np.float32),
                np.asarray([r.temperature for r in reqs]
                           + [0.0] * (self.slots - take), np.float32))
        for i, req in enumerate(reqs):
            b = int(slot_ids[i])
            tok = int(toks[i])
            req.out.append(tok)
            self.cur_tok[b] = tok
            self.slot_temp[b] = req.temperature
            self.slot_req[b] = req

    def _pick_host(self, logits: np.ndarray, temps: np.ndarray) -> np.ndarray:
        """Host-side per-row pick: greedy at temp 0, else top-k categorical
        (numpy RNG seeded from the batcher key stream)."""
        out = np.argmax(logits, axis=-1)
        if not (temps > 0).any():
            return out
        rng = self._host_rng  # host stream: no per-step device dispatches
        for b in np.nonzero(temps > 0)[0]:
            l = logits[b] / max(float(temps[b]), 1e-6)
            if self.top_k is not None:
                kth = np.sort(l)[-self.top_k]
                l = np.where(l < kth, -np.inf, l)
            p = np.exp(l - l.max())
            p /= p.sum()
            out[b] = rng.choice(len(p), p=p)
        return out

    def _retire(self, b: int):
        req = self.slot_req[b]
        req.done = True
        self.finished[req.req_id] = req
        self.slot_req[b] = None
        self.slot_temp[b] = 0.0  # freed slots sample greedily (fast path)
        self._retired.append(b)

    def _flush_retired(self):
        """One pos-reset for every slot retired this round (per-slot
        ``pos.at[b].set`` dispatches cost ~29 ms each on tunnel
        transports; batch them). Cache is left dirty — prefill rewrites."""
        if self._retired:
            idx = jnp.asarray(np.asarray(self._retired, np.int32))
            self.state = self.state.replace(
                pos=self.state.pos.at[idx].set(0))
            self._retired = []

    def step(self) -> bool:
        """Admit + one decode step. Returns True if any work remains."""
        self._admit()
        active = np.array([r is not None for r in self.slot_req])
        if not active.any():
            return bool(self.queue)
        logits, self.state = decode_step_slots(
            self.params, self.cfg, jnp.asarray(self.cur_tok), self.state,
            jnp.asarray(active))
        logits, pos_host = self._fetch((logits, self.state.pos))
        toks = self._pick_host(np.asarray(logits, np.float32),
                               self.slot_temp)
        for b in range(self.slots):
            req = self.slot_req[b]
            if req is None:
                continue
            tok = int(toks[b])
            req.out.append(tok)
            self.cur_tok[b] = tok
            if (len(req.out) >= req.max_new_tokens
                    or (self.eos_id is not None and tok == self.eos_id)
                    or int(pos_host[b]) >= self.max_seq - 1):
                self._retire(b)
        self._flush_retired()
        return any(r is not None for r in self.slot_req) or bool(self.queue)

    def step_chunk(self) -> bool:
        """Admit + ``self.chunk`` decode steps on device (one host
        round-trip). Slots freeze on-device at EOS / cache edge; admission
        and retirement happen here, at the chunk boundary."""
        self._admit()
        active = np.array([r is not None for r in self.slot_req])
        if not active.any():
            return bool(self.queue)
        temps, kc = None, None
        if (self.slot_temp > 0).any():
            self._key, kc = jax.random.split(self._key)
            temps = jnp.asarray(self.slot_temp)
        toks, valid, self.state, _ = decode_chunk_slots(
            self.params, self.cfg, jnp.asarray(self.cur_tok), self.state,
            jnp.asarray(active), self.chunk, self.eos_id,
            temps, kc, self.top_k)
        # one host fetch for all three (separate np.asarray calls are one
        # tunnel round trip each)
        toks, valid, pos_host = self._fetch((toks, valid, self.state.pos))
        for b in range(self.slots):
            req = self.slot_req[b]
            if req is None:
                continue
            hit_eos = False
            for i in range(self.chunk):
                if not valid[b, i] or len(req.out) >= req.max_new_tokens:
                    break
                tok = int(toks[b, i])
                req.out.append(tok)
                self.cur_tok[b] = tok
                if self.eos_id is not None and tok == self.eos_id:
                    hit_eos = True
                    break
            if (hit_eos or len(req.out) >= req.max_new_tokens
                    or int(pos_host[b]) >= self.max_seq - 1):
                self._retire(b)
        self._flush_retired()
        return any(r is not None for r in self.slot_req) or bool(self.queue)

    def run(self, max_steps: int = 10000) -> Dict[int, Request]:
        steps = 0
        step = self.step_chunk if self.chunk > 1 else self.step
        while step():
            steps += 1
            if steps > max_steps:
                raise RuntimeError("batcher did not converge")
        return self.finished
