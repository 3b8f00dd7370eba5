"""QTIP whole-model end-to-end finetune: SU / SV / tlut against a frozen
teacher.

TPU-native analog of the reference's ``finetune_susv_e2e``
(``qtip/quantize_llama/finetune.py:461-548``): after per-layer quantization
fixes the trellis codes, the continuous parameters around them — the sign
vectors SU/SV of every linear and (for quantlut_sym) the k-means lookup
table — are trained with a KD loss against the original FP model. The
reference runs teacher and student as separate processes trading softmax
targets over mp queues under FSDP; here both live in one jit with GSPMD
sharding available via ``mesh=``.

The tlut becomes a *per-module, per-layer* trainable [L, 2^tlut_bits, V]
leaf (strictly more expressive than the reference's shared table; decoding
stays traceable via nn.trellis.decode_tlut_dense_jnp so gradients reach it).
"""

from __future__ import annotations

import logging
from contextlib import nullcontext
from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models import llama
from ..models.config import ModelConfig
from ..nn.trellis import TrellisLinear

logger = logging.getLogger(__name__)


def extract_qtip_train_state(params, cfg: ModelConfig,
                             train_tlut: bool = True) -> Dict:
    """Packed QTIP params -> trainable {SU, SV[, tlut]} pytree."""
    SU, SV, tluts = {}, {}, {}
    for m in cfg.module_names:
        w: TrellisLinear = params["layers"][m]
        SU[m] = jnp.asarray(w.SU, jnp.float32)
        ws = jnp.asarray(w.Wscale, jnp.float32)
        if w.SV.ndim == 2:  # stacked [L, m] with Wscale [L]
            ws = ws[:, None]
        SV[m] = jnp.asarray(w.SV, jnp.float32) * ws
        if train_tlut and w.decode_mode == "quantlut_sym":
            if w.tlut is not None:
                tluts[m] = jnp.asarray(w.tlut, jnp.float32)
    ts = {"SU": SU, "SV": SV}
    if tluts:
        ts["tlut"] = tluts
    return ts


def with_tlut_leaves(params, cfg: ModelConfig, cb) -> Dict:
    """Give every quantlut_sym TrellisLinear a per-layer tlut leaf
    (broadcast from the shared codebook table) and drop the dense hatW
    cache so the forward decodes through the table."""
    layers = dict(params["layers"])
    for m in cfg.module_names:
        w: TrellisLinear = layers[m]
        if w.decode_mode != "quantlut_sym" or w.tlut is not None:
            continue
        L = w.SU.shape[0] if w.SU.ndim == 2 else None
        t = jnp.asarray(cb.tlut, jnp.float32)
        if L is not None:
            t = jnp.broadcast_to(t[None], (L,) + t.shape)
        layers[m] = w.replace(tlut=t, hatW=None)
    out = dict(params)
    out["layers"] = layers
    return out


def qtip_student_forward(train_state, static_params, cfg: ModelConfig,
                         tokens):
    """Student forward: SU/SV (and tlut) leaves swapped for trainables;
    Wscale folded into SV (the runtime multiplies SV * Wscale)."""
    layers = dict(static_params["layers"])
    for m in cfg.module_names:
        w: TrellisLinear = layers[m]
        upd = dict(SU=train_state["SU"][m], SV=train_state["SV"][m],
                   Wscale=jnp.ones_like(w.Wscale))
        if "tlut" in train_state and m in train_state["tlut"]:
            upd["tlut"] = train_state["tlut"][m]
        layers[m] = w.replace(**upd)
    p = dict(static_params)
    p["layers"] = layers
    return llama.forward(p, cfg, tokens)


def qtip_kd_step(train_state, opt_state, static_params, teacher_params,
                 cfg: ModelConfig, tokens, optimizer):
    from .finetune_e2e import kl_divergence_loss

    def loss_fn(ts):
        s_logits = qtip_student_forward(ts, static_params, cfg, tokens)
        t_logits = jax.lax.stop_gradient(
            llama.forward(teacher_params, cfg, tokens))
        return kl_divergence_loss(s_logits, t_logits)

    loss, grads = jax.value_and_grad(loss_fn)(train_state)
    updates, opt_state = optimizer.update(grads, opt_state, train_state)
    train_state = optax.apply_updates(train_state, updates)
    return loss, train_state, opt_state


def qtip_e2e_finetune(packed_params, cfg: ModelConfig, teacher_params,
                      tokens: np.ndarray, cb=None, steps: int = 50,
                      batch_size: int = 1, lr: float = 1e-4,
                      train_tlut: bool = True, mesh=None,
                      dp_axis: str = "dp"):
    """Returns (params with tuned SU/SV/tlut leaves, loss_history).

    The returned params keep the trellis codes untouched (round-trip safe);
    quantlut_sym leaves carry their tuned per-layer tlut and decode through
    it. ``finalize_qtip_params`` re-caches a dense hatW for serving.
    """
    params = packed_params
    if train_tlut and cb is not None and cb.decode_mode == "quantlut_sym":
        params = with_tlut_leaves(params, cfg, cb)
    train_state = extract_qtip_train_state(params, cfg, train_tlut=train_tlut)

    static_params = params  # leaves are swapped per-step in the forward

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel import sharding as shd
        assert batch_size % mesh.shape[dp_axis] == 0
        ts_specs = jax.tree_util.tree_map(lambda _: P(), train_state)
        train_state = shd.shard_params(mesh, train_state, ts_specs)
        teacher_params = shd.shard_params(
            mesh, teacher_params, shd.dense_param_specs(cfg))
        static_params = jax.device_put(static_params,
                                       NamedSharding(mesh, P()))
        token_sharding = NamedSharding(mesh, P(dp_axis, None))
    else:
        token_sharding = None

    optimizer = optax.adam(lr)
    opt_state = optimizer.init(train_state)
    step_fn = jax.jit(partial(qtip_kd_step, optimizer=optimizer),
                      static_argnames=("cfg",))

    N = tokens.shape[0]
    history = []
    ctx = mesh if mesh is not None else nullcontext()
    for step in range(steps):
        idx = (step * batch_size) % max(N - batch_size + 1, 1)
        batch = jnp.asarray(tokens[idx:idx + batch_size])
        if token_sharding is not None:
            batch = jax.device_put(batch, token_sharding)
        with ctx:
            loss, train_state, opt_state = step_fn(
                train_state, opt_state, static_params, teacher_params,
                cfg=cfg, tokens=batch)
        history.append(float(loss))
        if step % 10 == 0:
            logger.info("qtip_e2e step %d: KL %.5f", step, float(loss))

    # write tuned leaves back
    layers = dict(params["layers"])
    for m in cfg.module_names:
        w: TrellisLinear = layers[m]
        upd = dict(SU=train_state["SU"][m], SV=train_state["SV"][m],
                   Wscale=jnp.ones_like(w.Wscale))
        if "tlut" in train_state and m in train_state["tlut"]:
            upd["tlut"] = train_state["tlut"][m]
        layers[m] = w.replace(**upd)
    out = dict(params)
    out["layers"] = layers
    return out, history


def finalize_qtip_params(params, cfg: ModelConfig, cache_dense: bool = True):
    """Re-cache dense hatW from the tuned tlut for serving (the tlut decode
    path is the training form; serving prefers the cached/kernels paths)."""
    from ..nn.trellis import decode_tlut_dense_jnp
    layers = dict(params["layers"])
    for m in cfg.module_names:
        w: TrellisLinear = layers[m]
        if w.tlut is None or not cache_dense:
            continue
        if w.SU.ndim == 2:  # stacked [L, ...]
            L = w.SU.shape[0]
            hatW = jnp.stack([
                decode_tlut_dense_jnp(jax.tree_util.tree_map(
                    lambda a: a[l], w)) for l in range(L)])
        else:
            hatW = decode_tlut_dense_jnp(w)
        layers[m] = w.replace(hatW=hatW.astype(jnp.bfloat16))
    out = dict(params)
    out["layers"] = layers
    return out
