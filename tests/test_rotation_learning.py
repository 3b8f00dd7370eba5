"""Rotation-learning tests: loss descends, rotations stay orthogonal, and
learned rotations plug into the PTQ pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedquant_tpu.models import llama, get_config
from guidedquant_tpu.solvers.spinquant.rotation import fuse_layer_norms
from guidedquant_tpu.solvers.spinquant.optimize_rotation import (
    rotated_quantized_forward, optimize_rotations)
from guidedquant_tpu.pipelines.quantize_spinquant import spinquant_ptq
from guidedquant_tpu.evaluate import evaluate_ppl


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("tiny").replace(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    fused, fcfg = fuse_layer_norms(params, cfg)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 96, size=(4, 24), dtype=np.int32)
    return fcfg, fused, tokens


def test_identity_rotation_matches_plain_quant_forward(setup):
    cfg, fused, tokens = setup
    d, dh, L = cfg.hidden_size, cfg.head_dim, cfg.num_layers
    R1 = jnp.eye(d)
    R2 = jnp.stack([jnp.eye(dh)] * L)
    # w16 + identity rotations == plain forward
    loss = float(rotated_quantized_forward(
        fused, cfg, R1, R2, jnp.asarray(tokens[:1]), w_bits=16))
    logits = llama.forward(fused, cfg, jnp.asarray(tokens[:1]))
    ref = float(llama.cross_entropy_loss(logits, jnp.asarray(tokens[:1])))
    assert abs(loss - ref) < 1e-4


def test_rotation_learning_descends(setup):
    cfg, fused, tokens = setup
    R1, R2, hist = optimize_rotations(
        fused, cfg, tokens, steps=20, lr=0.1, w_bits=3, a_bits=16, seed=1)
    # orthogonality preserved
    np.testing.assert_allclose(R1 @ R1.T, np.eye(cfg.hidden_size), atol=1e-3)
    for l in range(cfg.num_layers):
        np.testing.assert_allclose(R2[l] @ R2[l].T, np.eye(cfg.head_dim),
                                   atol=1e-3)
    # average loss over last quarter < first quarter
    q = max(len(hist) // 4, 1)
    assert np.mean(hist[-q:]) <= np.mean(hist[:q]) + 1e-3, hist


def test_learned_rotations_into_ptq(setup, tmp_path):
    cfg, fused, tokens = setup
    R1, R2, _ = optimize_rotations(fused, cfg, tokens, steps=8, lr=0.05,
                                   w_bits=3, a_bits=16, seed=2)
    qcfg, qparams = spinquant_ptq(
        "tinysq", cfg=cfg, params=fused, w_bits=3, a_bits=16, rotate=True,
        R1=R1, R2=R2, cache_dir=str(tmp_path / "c"), dataset="synthetic",
        seq_len=24, num_examples=4, tokens=tokens)
    stream = np.random.default_rng(1).integers(0, 96, size=(240,),
                                               dtype=np.int32)
    ppl = evaluate_ppl(qparams, qcfg, stream, ctx_len=48, verbose=False)
    assert np.isfinite(ppl)
