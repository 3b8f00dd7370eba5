"""SpinQuant rotation machinery: norm fusion + R1/R2/R4 folding.

Analog of the reference's ``fuse_layer_norms``
(``spin_quant/utils/fuse_norm_utils.py:74``) and ``rotate_model``
(``spin_quant/eval_utils/rotation_utils.py:26-147``), operating on our
pytree params (weights stored (out, in), y = x @ W^T — same orientation as
torch, so the folding algebra matches the reference's line for line).
All folds run in f64.

R1 [d, d]:   embed/head + every residual-adjacent projection.
R2 [dh, dh]: per-layer, per-head on v_proj output / o_proj input.
R4 [f, f]:   exact Hadamard folded into down_proj input; runtime applies the
             matching online transform (ActQuantLinear.online_had).
R3:          online q/k rotation inside attention (KV-cache quant; engine).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ...models.config import ModelConfig
from ...ops.hadamard import matmul_hadU, random_hadamard_matrix


def _np64(x):
    return np.asarray(x, np.float64)


def fuse_layer_norms(params: Dict, cfg: ModelConfig) -> Dict:
    """Fold RMSNorm scales into the adjacent linears; norms become ones.

    attn_norm -> q/k/v, mlp_norm -> gate/up, final_norm -> lm_head (or the
    tied embedding's output use). Weight W (out, in): W <- W * diag(norm).
    """
    p = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    layers = dict(p["layers"])
    attn_w = _np64(layers["attn_norm"])  # [L, d]
    mlp_w = _np64(layers["mlp_norm"])
    for m in ("q_proj", "k_proj", "v_proj"):
        layers[m] = jnp.asarray(_np64(layers[m]) * attn_w[:, None, :],
                                params["layers"][m].dtype)
    for m in ("gate_proj", "up_proj"):
        layers[m] = jnp.asarray(_np64(layers[m]) * mlp_w[:, None, :],
                                params["layers"][m].dtype)
    layers["attn_norm"] = jnp.ones_like(layers["attn_norm"])
    layers["mlp_norm"] = jnp.ones_like(layers["mlp_norm"])
    p["layers"] = layers

    fin = _np64(p["final_norm"])
    if cfg.tie_word_embeddings:
        # tied head reads the embedding matrix; fold into a separate lm_head
        p["lm_head"] = jnp.asarray(_np64(p["embed"]) * fin[None, :],
                                   params["embed"].dtype)
        cfg = cfg.replace(tie_word_embeddings=False)
    else:
        p["lm_head"] = jnp.asarray(_np64(p["lm_head"]) * fin[None, :],
                                   params["lm_head"].dtype)
    p["final_norm"] = jnp.ones_like(p["final_norm"])
    return p, cfg


def random_orthogonal(n: int, seed: int = 0, mode: str = "hadamard") -> np.ndarray:
    if mode == "hadamard":
        return random_hadamard_matrix(n, jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    Q, R = np.linalg.qr(rng.normal(size=(n, n)))
    return Q * np.sign(np.diag(R))


def rotate_model(params: Dict, cfg: ModelConfig, R1: np.ndarray,
                 R2: Optional[np.ndarray] = None) -> Dict:
    """Fold R1 (and per-layer R2) into the weights (fp64, exact).

    R1 [d, d]; R2 [L, dh, dh] or None. Requires norms already fused.
    """
    d = cfg.hidden_size
    dh = cfg.head_dim
    R1 = _np64(R1)
    p = dict(params)
    layers = dict(p["layers"])

    p["embed"] = jnp.asarray(_np64(p["embed"]) @ R1, params["embed"].dtype)
    for m in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        W = _np64(layers[m])  # [L, out, d]
        layers[m] = jnp.asarray(np.einsum("lod,de->loe", W, R1),
                                params["layers"][m].dtype)
    for m in ("o_proj", "down_proj"):
        W = _np64(layers[m])  # [L, d, in]
        layers[m] = jnp.asarray(np.einsum("ed,ldi->lei", R1.T, W),
                                params["layers"][m].dtype)
    p["lm_head"] = jnp.asarray(_np64(p["lm_head"]) @ R1,
                               p["lm_head"].dtype)

    if R2 is not None:
        R2 = _np64(R2)  # [L, dh, dh]
        Wv = _np64(layers["v_proj"])  # [L, kv_dim, d]
        L = Wv.shape[0]
        KV = cfg.num_kv_heads
        Wv = Wv.reshape(L, KV, dh, d)
        # v'_head = v_head @ R2  =>  Wv'_head = R2^T Wv_head
        Wv = np.einsum("lhe,lkhd->lked", R2, Wv)
        layers["v_proj"] = jnp.asarray(Wv.reshape(L, KV * dh, d),
                                       params["layers"]["v_proj"].dtype)
        Wo = _np64(layers["o_proj"])  # [L, d, q_dim]
        H = cfg.num_heads
        Wo = Wo.reshape(L, d, H, dh)
        Wo = np.einsum("ldhi,lij->ldhj", Wo, R2)
        layers["o_proj"] = jnp.asarray(Wo.reshape(L, d, H * dh),
                                       params["layers"]["o_proj"].dtype)
    p["layers"] = layers
    return p


def apply_r4_to_down(params: Dict, cfg: ModelConfig) -> Dict:
    """Fold the exact Hadamard into down_proj's input side; the runtime must
    apply matmul_hadU to the activations before down_proj
    (rotation_utils.rotate_mlp_output + ActQuantWrapper.online_full_had)."""
    p = dict(params)
    layers = dict(p["layers"])
    W = jnp.asarray(_np64(layers["down_proj"]), jnp.float32)
    # W' = matmul_hadU(W along in axis): y = hadU(x) @ W'^T == x @ W^T
    Wp = matmul_hadU(W, axis=-1)
    layers["down_proj"] = jnp.asarray(np.asarray(Wp),
                                      params["layers"]["down_proj"].dtype)
    p["layers"] = layers
    return p


def check_rotation_invariance(params, rotated, cfg: ModelConfig,
                              tokens) -> float:
    """Max |logit diff| between original and rotated model (should be ~0)."""
    from ...models import llama
    a = np.asarray(llama.forward(params, cfg, tokens))
    b = np.asarray(llama.forward(rotated, cfg, tokens))
    return float(np.abs(a - b).max())
