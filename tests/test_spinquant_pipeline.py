"""SpinQuant pipeline + Cayley optimizer tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedquant_tpu.models import llama, get_config
from guidedquant_tpu.evaluate import evaluate_ppl
from guidedquant_tpu.pipelines.quantize_spinquant import spinquant_ptq
from guidedquant_tpu.solvers.spinquant import cayley
from guidedquant_tpu.nn.act_quant import ActQuantLinear


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("tiny").replace(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 96, size=(4, 32), dtype=np.int32)
    stream = rng.integers(0, 96, size=(384,), dtype=np.int32)
    return cfg, params, tokens, stream


def test_w8a8_pipeline_near_lossless(setup, tmp_path):
    cfg, params, tokens, stream = setup
    qcfg, qparams = spinquant_ptq(
        "tinysq", cfg=cfg, params=params, w_bits=8, a_bits=8, rotate=True,
        cache_dir=str(tmp_path / "c"), dataset="synthetic", seq_len=32,
        num_examples=4, tokens=tokens)
    assert isinstance(qparams["layers"]["q_proj"], ActQuantLinear)
    assert qparams["layers"]["down_proj"].online_had
    ppl_fp = evaluate_ppl(params, cfg, stream, ctx_len=48, verbose=False)
    ppl_q = evaluate_ppl(qparams, qcfg, stream, ctx_len=48, verbose=False)
    assert abs(np.log(ppl_q) - np.log(ppl_fp)) < 0.1, (ppl_q, ppl_fp)


def test_w4a4_guided_pipeline_runs(setup, tmp_path):
    cfg, params, tokens, stream = setup
    qcfg, qparams = spinquant_ptq(
        "tinysq", cfg=cfg, params=params, w_bits=4, a_bits=4, rotate=True,
        guided=True, num_groups=2,
        cache_dir=str(tmp_path / "c"), dataset="synthetic", seq_len=32,
        num_examples=4, tokens=tokens)
    ppl_fp = evaluate_ppl(params, cfg, stream, ctx_len=48, verbose=False)
    ppl_q = evaluate_ppl(qparams, qcfg, stream, ctx_len=48, verbose=False)
    assert np.isfinite(ppl_q)
    assert ppl_q < ppl_fp * 3.0


def test_rtn_vs_gptq(setup, tmp_path):
    cfg, params, tokens, stream = setup
    common = dict(cfg=cfg, params=params, w_bits=3, a_bits=16, rotate=False,
                  dataset="synthetic", seq_len=32, num_examples=4,
                  tokens=tokens)
    _, p_rtn = spinquant_ptq("tinysq", use_rtn=True,
                             cache_dir=str(tmp_path / "c1"), **common)
    _, p_gptq = spinquant_ptq("tinysq", use_rtn=False,
                              cache_dir=str(tmp_path / "c2"), **common)
    ppl_rtn = evaluate_ppl(p_rtn, cfg, stream, ctx_len=48, verbose=False)
    ppl_gptq = evaluate_ppl(p_gptq, cfg, stream, ctx_len=48, verbose=False)
    # GPTQ should not be (much) worse than RTN
    assert ppl_gptq < ppl_rtn * 1.1, (ppl_gptq, ppl_rtn)


# ---------------------------------------------------------------------------
# Cayley optimizer
# ---------------------------------------------------------------------------

def test_cayley_preserves_orthogonality_and_descends():
    n = 16
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (n, n))
    # target rotation
    Qt, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(1), (n, n)))

    def loss_fn(R):
        return jnp.sum((R @ A - Qt @ A) ** 2)

    R = jnp.eye(n)
    state = cayley.init(R)
    losses = [float(loss_fn(R))]
    for step in range(60):
        g = jax.grad(loss_fn)(R)
        R, state = cayley.update(g, state, R, lr=3e-3, momentum=0.9,
                                 qr_every=25)
        losses.append(float(loss_fn(R)))
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    assert float(cayley.orthogonality_error(R)) < 1e-3


def test_cayley_on_stacked_rotations():
    key = jax.random.PRNGKey(2)
    R = jnp.stack([jnp.eye(8)] * 3)
    state = cayley.init(R)
    tgt = jax.random.normal(key, (3, 8, 8))

    def loss_fn(R):
        return jnp.sum((R - tgt) ** 2)

    for _ in range(10):
        g = jax.grad(loss_fn)(R)
        R, state = cayley.update(g, state, R, lr=1e-2)
    assert float(cayley.orthogonality_error(R)) < 1e-3


def test_export_int_weights(setup, tmp_path):
    from guidedquant_tpu.formats.export import export_int_weights
    cfg, params, tokens, _ = setup
    qcfg, qparams = spinquant_ptq(
        "tinysq", cfg=cfg, params=params, w_bits=4, a_bits=16, rotate=False,
        use_rtn=True, w_clip=False, cache_dir=str(tmp_path / "c"),
        dataset="synthetic", seq_len=32, num_examples=4, tokens=tokens)
    out = export_int_weights(qparams, qcfg, str(tmp_path / "et"), bits=4)
    import numpy as _np, os as _os
    z = _np.load(_os.path.join(out, "int_model.npz"))
    q = z["layers.q_proj.int_weight"]
    assert q.dtype == _np.int8 and q.min() >= -8 and q.max() <= 7
    # reconstruction from exported ints matches the fake-quant weights
    W = _np.asarray(qparams["layers"]["q_proj"].weight)
    recon = q.astype(_np.float32) * z["layers.q_proj.scale"][..., None]
    _np.testing.assert_allclose(recon, W, atol=1e-4)
