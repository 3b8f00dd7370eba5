"""End-loss guidance quality: solving against the saliency-weighted Hessian
must yield a lower guided objective than solving against an unweighted
surrogate — the core GuidedQuant claim, verified on the real pipeline
artifacts (saliency -> Hessians -> LNQ)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedquant_tpu.models import llama, get_config
from guidedquant_tpu.calib.gradients import get_gradients
from guidedquant_tpu.calib.hessians import accumulate_hessians
from guidedquant_tpu.solvers.lnq import (
    train_least_squares, dampen_hessians, objective)
from guidedquant_tpu.solvers.seed import seed_and_upscale_module


def test_guided_hessian_beats_unweighted_on_guided_objective():
    cfg = get_config("tiny").replace(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 96, size=(6, 32), dtype=np.int32)

    grads, sal = get_gradients(params, cfg, tokens, num_groups=2)
    hess = accumulate_hessians(params, cfg, tokens, sal, num_groups=2,
                               batch_size=3)
    ones = [{m: np.ones_like(v) for m, v in layer.items()} for layer in sal]
    hess_plain = accumulate_hessians(params, cfg, tokens, ones,
                                     num_groups=2, batch_size=3)

    m = "gate_proj"
    W = np.asarray(params["layers"][m][0], np.float32)
    luts, labels = seed_and_upscale_module(W, grads[0][m], 2, 2)
    lab0 = labels.reshape(W.shape).astype(np.int32)
    C0 = luts[0].reshape(W.shape[0], -1).astype(np.float32)

    Hg = hess[0][m]
    Hp = hess_plain[0][m]
    lab_g, C_g, _ = train_least_squares(W, lab0, C0, Hg,
                                        num_iterations=2, cd_cycles=2)
    lab_p, C_p, _ = train_least_squares(W, lab0, C0, Hp,
                                        num_iterations=2, cd_cycles=2)
    Hg_d = jnp.asarray(dampen_hessians(Hg))
    obj_guided = float(objective(jnp.asarray(W), Hg_d,
                                 jnp.asarray(lab_g.astype(np.int32)),
                                 jnp.asarray(C_g)))
    obj_plain = float(objective(jnp.asarray(W), Hg_d,
                                jnp.asarray(lab_p.astype(np.int32)),
                                jnp.asarray(C_p)))
    assert obj_guided <= obj_plain * 1.001, (obj_guided, obj_plain)
    # and both beat the unoptimized seed init
    obj_seed = float(objective(jnp.asarray(W), Hg_d, jnp.asarray(lab0),
                               jnp.asarray(C0)))
    assert obj_guided <= obj_seed
