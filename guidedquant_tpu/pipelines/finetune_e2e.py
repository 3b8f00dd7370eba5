"""End-to-end knowledge-distillation finetune of a packed model (full_nuq).

TPU-native re-design of the reference's PV-Tuning pipeline
(``any_precision/quantization/full_main.py:712-911``,
``full_utils_v1.py`` KD loss, ``full_utils_v2.py`` StraightThroughAdamW):

- student = packed model unpacked to (codes, per-row codebooks) + latent
  dense weights; forward dequantizes with a straight-through estimator so
  gradients flow to both the latent weights (code re-selection signal) and
  the codebook entries.
- loss = KL(student || teacher) on calibration sequences (the reference's
  chunked ``compute_kl_divergence_loss_values``).
- optimizer = AdamW on {luts, latent}; after each step codes re-snap to the
  nearest centroid of the updated codebook (the reference's
  ``minimize_weight_mse`` re-fit), keeping the packed representation valid.
- The reference's FSDP/NCCL machinery (rank-sharded quantized masters,
  IntCodes smuggling, gather_object repack) collapses into GSPMD sharding
  of this step over a ('dp','fsdp','tp') mesh — see parallel/sharding.py.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models import llama
from ..models.config import ModelConfig
from ..nn.linear import AnyPrecLinear
from ..ops.pack import unpack_bitplanes_np, pack_bitplanes

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Straight-through dequantization
# ---------------------------------------------------------------------------

@jax.custom_vjp
def ste_snap(latent: jnp.ndarray, lut: jnp.ndarray) -> jnp.ndarray:
    """Forward: snap latent [N, K] to the nearest centroid of lut [N, C].
    Backward: identity to latent, one-hot scatter to lut."""
    codes = jnp.argmin(
        jnp.abs(latent[:, :, None] - lut[:, None, :]), axis=-1)
    return jnp.take_along_axis(lut, codes, axis=1)


def _snap_fwd(latent, lut):
    codes = jnp.argmin(
        jnp.abs(latent[:, :, None] - lut[:, None, :]), axis=-1)
    out = jnp.take_along_axis(lut, codes, axis=1)
    return out, (codes, lut.shape)


def _snap_bwd(res, g):
    codes, lut_shape = res
    onehot = jax.nn.one_hot(codes, lut_shape[-1], dtype=g.dtype)
    g_lut = jnp.einsum("nkc,nk->nc", onehot, g)
    return g, g_lut


ste_snap.defvjp(_snap_fwd, _snap_bwd)


def snap_codes(latent: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Hard code re-selection (minimize_weight_mse analog)."""
    return np.argmin(np.abs(latent[:, :, None] - lut[:, None, :]),
                     axis=-1).astype(np.uint8)


# ---------------------------------------------------------------------------
# Student state
# ---------------------------------------------------------------------------

def unpack_student(params, cfg: ModelConfig, bits: int):
    """Packed params -> (trainable {latent, luts}, static rest).

    latent: {module: [L, N, K] f32}; luts: {module: [L, N, C] f32}.
    """
    latent: Dict[str, jnp.ndarray] = {}
    luts: Dict[str, jnp.ndarray] = {}
    for m in cfg.module_names:
        w: AnyPrecLinear = params["layers"][m]
        qw = np.asarray(w.qweight)
        L = qw.shape[0]
        codes = np.stack([unpack_bitplanes_np(qw[l], bits) for l in range(L)])
        lut = np.asarray(w.luts[bits], np.float32)  # [L, N, C]
        deq = np.take_along_axis(lut, codes.astype(np.int64), axis=2)
        latent[m] = jnp.asarray(deq, jnp.float32)
        luts[m] = jnp.asarray(lut)
    return {"latent": latent, "luts": luts}


def student_forward(train_state, static_params, cfg: ModelConfig, tokens):
    """Forward with straight-through quantized projections."""
    layers = dict(static_params["layers"])
    for m in cfg.module_names:
        lat = train_state["latent"][m]
        lut = train_state["luts"][m]
        L, N, K = lat.shape
        W = jax.vmap(ste_snap)(lat, lut)  # [L, N, K]
        layers[m] = W
    p = dict(static_params)
    p["layers"] = layers
    return llama.forward(p, cfg, tokens)


# ---------------------------------------------------------------------------
# KD loss (full_utils_v1.compute_kl_divergence_loss_values)
# ---------------------------------------------------------------------------

def kl_divergence_loss(student_logits, teacher_logits):
    t = jax.nn.log_softmax(teacher_logits.astype(jnp.float32), axis=-1)
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=-1)
    return jnp.mean(jnp.sum(jnp.exp(t) * (t - s), axis=-1))


def kd_step(train_state, opt_state, static_params, teacher_params,
            cfg: ModelConfig, tokens, optimizer):
    def loss_fn(ts):
        s_logits = student_forward(ts, static_params, cfg, tokens)
        t_logits = llama.forward(teacher_params, cfg, tokens)
        t_logits = jax.lax.stop_gradient(t_logits)
        return kl_divergence_loss(s_logits, t_logits)

    loss, grads = jax.value_and_grad(loss_fn)(train_state)
    updates, opt_state = optimizer.update(grads, opt_state, train_state)
    train_state = optax.apply_updates(train_state, updates)
    return loss, train_state, opt_state


# ---------------------------------------------------------------------------
# Training-state checkpointing (reference save/load_training_state,
# full_main.py:464-515 — preemptible-compute resume)
# ---------------------------------------------------------------------------

def save_training_state(path: str, train_state, opt_state, step: int) -> None:
    import os
    from ..utils import cache as cache_util
    flat, treedef = jax.tree_util.tree_flatten((train_state, opt_state))
    arrays = {f"leaf{i}": np.asarray(x) for i, x in enumerate(flat)}
    arrays["step"] = np.asarray(step)
    cache_util.save_npz_dict(path, arrays)


def load_training_state(path: str, train_state_like, opt_state_like):
    """-> (train_state, opt_state, step) restored into the given structure."""
    from ..utils import cache as cache_util
    z = cache_util.load_npz_dict(path)
    flat_like, treedef = jax.tree_util.tree_flatten(
        (train_state_like, opt_state_like))
    flat = [jnp.asarray(z[f"leaf{i}"]) for i in range(len(flat_like))]
    ts, os_ = jax.tree_util.tree_unflatten(treedef, flat)
    return ts, os_, int(z["step"])


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def full_nuq_finetune(packed_params, cfg: ModelConfig, teacher_params,
                      tokens: np.ndarray, bits: int,
                      steps: int = 100, batch_size: int = 1,
                      lr: float = 1e-4, code_update_every: int = 1,
                      mesh=None, dp_axis: str = "dp",
                      checkpoint_path: str = None,
                      save_every: int = 0):
    """Finetune a packed student against an FP teacher.

    Returns (new_codes {module: [L,N,K] uint8}, new_luts {module: [L,N,C]},
    loss_history). Re-pack with ``repack_student``.
    """
    train_state = unpack_student(packed_params, cfg, bits)
    static_params = {
        "embed": teacher_params["embed"],
        "layers": {k: packed_params["layers"][k]
                   for k in ("attn_norm", "mlp_norm")},
        "final_norm": packed_params["final_norm"],
    }
    if "lm_head" in packed_params:
        static_params["lm_head"] = packed_params["lm_head"]

    if mesh is not None:
        # GSPMD-shard the KD step (replaces the reference's FSDP/NCCL
        # machinery, full_main.py:713-793): latent/lut masters tp+fsdp
        # sharded, teacher fsdp/tp sharded, batch on the dp axis. The
        # optimizer state inherits the train-state sharding from init.
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel import sharding as shd
        assert batch_size % mesh.shape[dp_axis] == 0, (
            f"batch_size {batch_size} must divide by "
            f"{dp_axis}={mesh.shape[dp_axis]}")
        ts_specs = {
            "latent": {m: P(None, "tp", "fsdp") for m in cfg.module_names},
            "luts": {m: P(None, "tp", None) for m in cfg.module_names},
        }
        train_state = shd.shard_params(mesh, train_state, ts_specs)
        teacher_params = shd.shard_params(
            mesh, teacher_params, shd.dense_param_specs(cfg))
        static_params = jax.device_put(
            static_params, NamedSharding(mesh, P()))
        _token_sharding = NamedSharding(mesh, P(dp_axis, None))
    else:
        _token_sharding = None

    optimizer = optax.adamw(lr)
    opt_state = optimizer.init(train_state)

    start_step = 0
    if checkpoint_path is not None:
        import os
        if os.path.exists(checkpoint_path):
            train_state, opt_state, start_step = load_training_state(
                checkpoint_path, train_state, opt_state)
            logger.info("resumed finetune from step %d", start_step)

    step_fn = jax.jit(partial(kd_step, optimizer=optimizer),
                      static_argnames=("cfg",))

    N = tokens.shape[0]
    history = []
    from contextlib import nullcontext
    mesh_ctx = mesh if mesh is not None else nullcontext()
    for step in range(start_step, steps):
        idx = (step * batch_size) % max(N - batch_size + 1, 1)
        batch = jnp.asarray(tokens[idx:idx + batch_size])
        if _token_sharding is not None:
            batch = jax.device_put(batch, _token_sharding)
        with mesh_ctx:
            loss, train_state, opt_state = step_fn(
                train_state, opt_state, static_params, teacher_params,
                cfg=cfg, tokens=batch)
        history.append(float(loss))
        if step % 10 == 0:
            logger.info("full_nuq step %d: KL %.5f", step, float(loss))
        if checkpoint_path is not None and save_every and \
                (step + 1) % save_every == 0:
            save_training_state(checkpoint_path, train_state, opt_state,
                                step + 1)

    # final hard code re-selection + writeback
    new_codes, new_luts = {}, {}
    for m in cfg.module_names:
        lat = np.asarray(train_state["latent"][m])
        lut = np.asarray(train_state["luts"][m])
        L = lat.shape[0]
        new_codes[m] = np.stack([snap_codes(lat[l], lut[l])
                                 for l in range(L)])
        new_luts[m] = lut
    return new_codes, new_luts, history


def repack_student(params, cfg: ModelConfig, new_codes, new_luts, bits: int):
    """Write finetuned codes/luts back into AnyPrecLinear leaves."""
    layers = dict(params["layers"])
    for m in cfg.module_names:
        w: AnyPrecLinear = layers[m]
        codes = new_codes[m]
        L = codes.shape[0]
        qw = np.stack([pack_bitplanes(codes[l], bits) for l in range(L)])
        luts = dict(w.luts)
        luts[bits] = jnp.asarray(new_luts[m], w.luts[bits].dtype)
        layers[m] = w.replace(qweight=jnp.asarray(qw), luts=luts,
                              qwords=None, pcoef=None, gpoly=None,
                              srow=None, mrow=None)
    out = dict(params)
    out["layers"] = layers
    return out
