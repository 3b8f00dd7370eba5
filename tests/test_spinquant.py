"""SpinQuant component tests: fake quant, STE, rotation invariance, GPTQ."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedquant_tpu.models import llama, get_config
from guidedquant_tpu.solvers.spinquant import quant as q
from guidedquant_tpu.solvers.spinquant.rotation import (
    fuse_layer_norms, rotate_model, apply_r4_to_down, random_orthogonal,
    check_rotation_invariance)
from guidedquant_tpu.solvers.spinquant.gptq import gptq_quantize, gptq_error


# ---------------------------------------------------------------------------
# quantizers
# ---------------------------------------------------------------------------

def test_sym_quant_roundtrip_exact_grid():
    cfg = q.ActQuantConfig(bits=4, sym=True)
    scale = jnp.asarray(0.5)
    grid = jnp.arange(-8, 8) * 0.5
    out = q.sym_quant_dequant(grid, scale, 7)
    np.testing.assert_allclose(np.asarray(out), np.clip(np.asarray(grid),
                                                        -4.0, 3.5))


def test_ste_gradient_is_identity():
    f = lambda x: jnp.sum(q.sym_quant_dequant(x, jnp.asarray(0.3), 7))
    g = jax.grad(f)(jnp.asarray([0.1, -0.7, 2.0]))
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.0, 1.0])


def test_act_fake_quant_per_token(rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 32)).astype(np.float32))
    cfg = q.ActQuantConfig(bits=4, sym=False)
    y = q.act_fake_quant(x, cfg)
    err = np.abs(np.asarray(y) - np.asarray(x))
    # error bounded by scale: (max-min)/15 per token
    rng_tok = (np.asarray(x).max(-1) - np.asarray(x).min(-1))
    assert (err.max(-1) <= rng_tok / 15 * 0.51 + 1e-6).all()
    # 16 bits = passthrough
    y16 = q.act_fake_quant(x, q.ActQuantConfig(bits=16))
    np.testing.assert_array_equal(np.asarray(y16), np.asarray(x))


def test_act_quant_groupwise(rng):
    x = jnp.asarray(rng.normal(size=(2, 3, 32)).astype(np.float32))
    cfg = q.ActQuantConfig(bits=4, sym=True, groupsize=8)
    y = q.act_fake_quant(x, cfg)
    assert np.isfinite(np.asarray(y)).all()
    # groupwise must beat per-token on a heteroscedastic input
    x2 = np.array(x)
    x2[..., :8] *= 100
    x2 = jnp.asarray(x2)
    e_grp = float(jnp.mean((q.act_fake_quant(x2, cfg) - x2)[..., 8:] ** 2))
    e_tok = float(jnp.mean((q.act_fake_quant(
        x2, q.ActQuantConfig(bits=4, sym=True)) - x2)[..., 8:] ** 2))
    assert e_grp < e_tok


def test_weight_mse_search_improves(rng):
    W = rng.normal(size=(16, 64)).astype(np.float32)
    W[0, 0] = 30.0  # outlier
    cfg_plain = q.WeightQuantConfig(bits=3, sym=True, mse=False)
    cfg_mse = q.WeightQuantConfig(bits=3, sym=True, mse=True)
    e_plain = ((q.rtn_quantize(W, cfg_plain) - W) ** 2).sum()
    e_mse = ((q.rtn_quantize(W, cfg_mse) - W) ** 2).sum()
    assert e_mse <= e_plain


# ---------------------------------------------------------------------------
# rotations
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_model():
    cfg = get_config("tiny").replace(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    # random norm weights to make fusion non-trivial
    k = jax.random.PRNGKey(5)
    params["layers"]["attn_norm"] = 1.0 + 0.1 * jax.random.normal(
        k, params["layers"]["attn_norm"].shape)
    params["layers"]["mlp_norm"] = 1.0 - 0.1 * jax.random.normal(
        k, params["layers"]["mlp_norm"].shape)
    params["final_norm"] = 1.0 + 0.05 * jax.random.normal(
        k, params["final_norm"].shape)
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, 96, size=(1, 12)))
    return cfg, params, tokens


def test_norm_fusion_preserves_logits(tiny_model):
    cfg, params, tokens = tiny_model
    fused, fcfg = fuse_layer_norms(params, cfg)
    diff = check_rotation_invariance(params, fused, cfg, tokens)
    # fused model uses its own cfg (untied head)
    a = np.asarray(llama.forward(params, cfg, tokens))
    b = np.asarray(llama.forward(fused, fcfg, tokens))
    assert np.abs(a - b).max() < 1e-4


def test_r1_r2_rotation_preserves_logits(tiny_model):
    cfg, params, tokens = tiny_model
    fused, fcfg = fuse_layer_norms(params, cfg)
    R1 = random_orthogonal(cfg.hidden_size, seed=1)
    R2 = np.stack([random_orthogonal(cfg.head_dim, seed=2 + l)
                   for l in range(cfg.num_layers)])
    rotated = rotate_model(fused, fcfg, R1, R2)
    a = np.asarray(llama.forward(fused, fcfg, tokens))
    b = np.asarray(llama.forward(rotated, fcfg, tokens))
    assert np.abs(a - b).max() < 2e-3, np.abs(a - b).max()


def test_r4_fold_matches_online_had(tiny_model):
    cfg, params, tokens = tiny_model
    fused, fcfg = fuse_layer_norms(params, cfg)
    folded = apply_r4_to_down(fused, fcfg)
    # manual check on one layer: hadU(x) @ W_folded^T == x @ W^T
    from guidedquant_tpu.ops.hadamard import matmul_hadU
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, cfg.intermediate_size)),
                    jnp.float32)
    W = fused["layers"]["down_proj"][0]
    Wf = folded["layers"]["down_proj"][0]
    y0 = x @ W.T
    y1 = matmul_hadU(x) @ Wf.T
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-3)


# ---------------------------------------------------------------------------
# GPTQ
# ---------------------------------------------------------------------------

def _hessian(rng, n, G=1):
    X = rng.normal(size=(G, 4 * n, n))
    return (np.einsum("gti,gtj->gij", X, X) / (4 * n) +
            0.01 * np.eye(n)).astype(np.float32)


def test_gptq_beats_rtn(rng):
    m = n = 32
    W = rng.normal(size=(m, n)).astype(np.float32)
    H = _hessian(rng, n)[0]
    cfg = q.WeightQuantConfig(bits=3, sym=True, perchannel=True)
    Q, Wint, Scale = gptq_quantize(W, H, cfg, blocksize=8)
    rtn = q.rtn_quantize(W, cfg)
    e_gptq = gptq_error(W, Q, H)
    e_rtn = gptq_error(W, rtn, H)
    assert e_gptq < e_rtn, (e_gptq, e_rtn)
    # int consistency: Q == Scale * Wint
    np.testing.assert_allclose(Q, Scale * Wint, atol=1e-6)


def test_guided_gptq_grouping_matters(rng):
    m = n = 32
    W = rng.normal(size=(m, n)).astype(np.float32)
    H2 = _hessian(rng, n, G=2)
    H2[1] *= 50.0
    cfg = q.WeightQuantConfig(bits=3, sym=True, perchannel=True)
    Qg, _, _ = gptq_quantize(W, H2, cfg, blocksize=8)
    Q1, _, _ = gptq_quantize(W, H2.mean(axis=0), cfg, blocksize=8)
    e_guided = gptq_error(W, Qg, H2)
    e_flat = gptq_error(W, Q1, H2)
    assert e_guided <= e_flat * 1.05, (e_guided, e_flat)


def test_gptq_actorder_and_groupsize(rng):
    m, n = 16, 32
    W = rng.normal(size=(m, n)).astype(np.float32)
    H = _hessian(rng, n)[0]
    cfg = q.WeightQuantConfig(bits=4, sym=False, perchannel=True)
    Q, _, _ = gptq_quantize(W, H, cfg, blocksize=8, groupsize=8,
                            actorder=True)
    assert np.isfinite(Q).all()
    assert gptq_error(W, Q, H) < 0.1


def test_native_int_matmul_matches_fake_quant():
    """The MXU int8 execution path (W4A4 as real integer math) must agree
    with the fake-quant dense path — same math, no dequantized tensors."""
    import jax.numpy as jnp
    from guidedquant_tpu.nn.act_quant import (ActQuantLinear,
                                              apply_act_quant_linear)
    rng = np.random.RandomState(0)
    N, K, T = 32, 64, 5
    q0 = rng.randint(-8, 8, size=(N, K)).astype(np.int8)
    ws0 = (rng.rand(N).astype(np.float32) * 0.5 + 0.5) * 0.02
    W = jnp.asarray(ws0[:, None] * q0.astype(np.float32))
    x = jnp.asarray(rng.randn(T, K).astype(np.float32))
    for in_sym in (True, False):
        fake = ActQuantLinear(weight=W, in_bits=4, in_sym=in_sym)
        nat = fake.replace(wq=jnp.asarray(q0),
                           wscale=jnp.asarray(ws0),
                           wq_rowsum=jnp.asarray(
                               q0.astype(np.float32).sum(-1)))
        y_f = np.asarray(apply_act_quant_linear(fake, x), np.float32)
        y_n = np.asarray(apply_act_quant_linear(nat, x), np.float32)
        scale = max(np.abs(y_f).max(), 1e-6)
        np.testing.assert_allclose(y_n / scale, y_f / scale, atol=2e-3), in_sym


def test_pipeline_emits_native_codes():
    """gptq sym per-channel codes satisfy Q == Scale * W_int, the identity
    the pipeline's native path relies on."""
    from guidedquant_tpu.solvers.spinquant import gptq as gptq_mod
    from guidedquant_tpu.solvers.spinquant.quant import WeightQuantConfig
    rng = np.random.RandomState(1)
    W = rng.randn(16, 32).astype(np.float32) * 0.05
    X = rng.randn(64, 32).astype(np.float32)
    H = (X.T @ X).astype(np.float32)
    cfg = WeightQuantConfig(bits=4, perchannel=True, sym=True)
    Q, Wint, Scale = gptq_mod.gptq_quantize(W, H, cfg)
    np.testing.assert_allclose(Q, Scale * Wint, rtol=1e-6, atol=1e-8)
    assert np.abs(Wint).max() <= 8


def test_gptq_asym_respects_grid():
    """Asymmetric GPTQ must use the zero-point grid: codes span at most
    2^b levels (regression: the zero point was dropped and the clip range
    allowed ~2^(b+1) levels)."""
    from guidedquant_tpu.solvers.spinquant import gptq as gptq_mod
    from guidedquant_tpu.solvers.spinquant.quant import WeightQuantConfig
    rng = np.random.RandomState(2)
    W = rng.randn(8, 32).astype(np.float32) * 0.05 + 0.03  # skewed range
    X = rng.randn(64, 32).astype(np.float32)
    H = (X.T @ X).astype(np.float32)
    cfg = WeightQuantConfig(bits=3, perchannel=True, sym=False)
    Q, Wint, Scale = gptq_mod.gptq_quantize(W, H, cfg)
    np.testing.assert_allclose(Q, Scale * Wint, rtol=1e-5, atol=1e-7)
    for r in range(W.shape[0]):
        codes = np.unique(np.round(Wint[r] / 1.0))
        assert codes.max() - codes.min() <= 2 ** 3 - 1, (r, codes)
    # quality sanity: asym on a skewed distribution beats the broken
    # sym-style rounding of the same scale
    assert np.isfinite(Q).all()
