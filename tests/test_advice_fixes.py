"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. spinquant: Hessians must be captured BEFORE the R4 fold (the dense
   forward applies no online Hadamard, so a post-fold model has a wrong
   residual stream).
2. calib.hessians / evaluate_ppl_layerwise: per-layer rope/mask + embed
   scale for cfg.layer_types models (Gemma3).
3. optimize_rotation: a_bits must actually be applied (W+A objective).
4. calib.gradients: sum-of-per-sequence-squared grads at batch_size > 1.
5. gptq: actorder+groupsize scales from the permuted working weight.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from guidedquant_tpu.models import llama
from guidedquant_tpu.models.config import ModelConfig, get_config


def _tiny_cfg(**kw):
    base = dict(name="tiny", vocab_size=96, hidden_size=32,
                intermediate_size=48, num_layers=2, num_heads=4,
                num_kv_heads=2, max_seq_len=64)
    base.update(kw)
    return ModelConfig(**base)


def _tiny_gemma_cfg():
    return _tiny_cfg(
        name="tiny-gemma", layer_types=("sliding", "global"),
        sliding_window=8, rope_local_theta=10000.0, rope_theta=1e6,
        embed_scale=True, sandwich_norms=True, norm_plus_one=True,
        qk_norm=True, tie_word_embeddings=True, hidden_act="gelu_tanh")


# --- 1. spinquant Hessian stage runs pre-R4 -------------------------------

def test_spinquant_hessians_capture_pre_r4(tmp_path, monkeypatch):
    """The params handed to the Hessian stage must be functionally equal to
    the original model (R1/R2 rotations are invariance-preserving; a folded
    R4 without its online Hadamard is not)."""
    from guidedquant_tpu.pipelines import quantize_spinquant as qs

    cfg = _tiny_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(2, 12), dtype=np.int64)
    ref_logits = np.asarray(llama.forward(params, cfg, jnp.asarray(tokens)))

    captured = {}
    real_stage = qs.run_hessians_stage

    def spy(p, c, tok, sal, path, G, **kw):
        captured["logits"] = np.asarray(
            llama.forward(p, c, jnp.asarray(tokens)))
        return real_stage(p, c, tok, sal, path, G, **kw)

    monkeypatch.setattr(qs, "run_hessians_stage", spy)
    qs.spinquant_ptq("tiny-model", cfg=cfg, params=params,
                     w_bits=4, a_bits=16, rotate=True, guided=False,
                     cache_dir=str(tmp_path), tokens=tokens,
                     hessian_batch_size=2)
    assert "logits" in captured
    np.testing.assert_allclose(captured["logits"], ref_logits,
                               rtol=2e-2, atol=2e-2)


# --- 2. per-layer rope/mask + embed scale in layerwise paths --------------

def test_layerwise_ppl_matches_forward_on_gemma_types():
    cfg = _tiny_gemma_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    stream = rng.integers(0, cfg.vocab_size, size=(3 * 16,), dtype=np.int64)

    from guidedquant_tpu.evaluate.ppl import evaluate_ppl, evaluate_ppl_layerwise
    p_full = evaluate_ppl(params, cfg, stream, ctx_len=16, verbose=False)
    p_layer = evaluate_ppl_layerwise(params, cfg, stream, ctx_len=16,
                                     verbose=False)
    assert np.isfinite(p_full)
    np.testing.assert_allclose(p_layer, p_full, rtol=1e-4)


def test_hessian_propagation_matches_full_forward_gemma():
    """accumulate_hessians' layer-by-layer propagation must follow the same
    residual stream as llama.forward for a layer_types model: check the
    Hessian of the LAST layer (it sees all upstream propagation) against a
    direct capture from the scan forward."""
    cfg = _tiny_gemma_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    N, S = 2, 12
    tokens = rng.integers(0, cfg.vocab_size, size=(N, S), dtype=np.int64)
    sal = [{m: np.ones((N, S, 1), np.float32)
            for m in cfg.module_names} for _ in range(cfg.num_layers)]

    from guidedquant_tpu.calib.hessians import accumulate_hessians
    hs = accumulate_hessians(params, cfg, tokens, sal, num_groups=1,
                             batch_size=2)

    # oracle: propagate through the first layer with forward-parity rope,
    # then compute module inputs of the last layer directly
    pos = jnp.broadcast_to(jnp.arange(S)[None, :], (N, S))
    cos, sin, mask, stacked = llama.layer_rope_mask(cfg, pos, S, S)
    assert stacked
    x = llama.embed_tokens(params, jnp.asarray(tokens), cfg)
    for l in range(cfg.num_layers - 1):
        lp = llama.layer_slice(params["layers"], l)
        x = llama.decoder_layer(lp, cfg, x, cos[l], sin[l], mask[l])[0]
    last = cfg.num_layers - 1
    lp = llama.layer_slice(params["layers"], last)
    _, inputs = llama.module_inputs(lp, cfg, x, cos[last], sin[last],
                                    mask[last])
    for m in ("q_proj", "down_proj"):
        xin = np.asarray(inputs[m], np.float32).reshape(-1, inputs[m].shape[-1])
        H_ref = xin.T @ xin
        np.testing.assert_allclose(hs[last][m][0], H_ref, rtol=1e-3,
                                   atol=1e-3 * np.abs(H_ref).max())


# --- 3. a_bits applied in rotation learning -------------------------------

def test_rotation_learning_applies_act_quant():
    from guidedquant_tpu.solvers.spinquant.rotation import (
        fuse_layer_norms, random_orthogonal)
    from guidedquant_tpu.solvers.spinquant.optimize_rotation import (
        rotated_quantized_forward)

    cfg = _tiny_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    params, fcfg = fuse_layer_norms(params, cfg)
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 12)))
    R1 = jnp.asarray(random_orthogonal(cfg.hidden_size, seed=0), jnp.float32)
    R2 = jnp.asarray(np.stack([np.eye(cfg.head_dim)] * cfg.num_layers),
                     jnp.float32)

    l16 = float(rotated_quantized_forward(params, fcfg, R1, R2, tokens,
                                          w_bits=4, a_bits=16))
    l4 = float(rotated_quantized_forward(params, fcfg, R1, R2, tokens,
                                         w_bits=4, a_bits=4))
    assert np.isfinite(l4) and np.isfinite(l16)
    assert abs(l4 - l16) > 1e-5, "a_bits=4 must change the objective"

    # gradient w.r.t. rotations still flows through the act fake-quant (STE)
    g = jax.grad(lambda r: rotated_quantized_forward(
        params, fcfg, r, R2, tokens, w_bits=4, a_bits=4))(R1)
    assert float(jnp.abs(g).max()) > 0


# --- 4. per-sequence grad squaring at batch > 1 ---------------------------

def test_gradient_batch_invariance():
    from guidedquant_tpu.calib.gradients import get_gradients

    cfg = _tiny_cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(4))
    rng = np.random.default_rng(4)
    tokens = rng.integers(0, cfg.vocab_size, size=(3, 10), dtype=np.int64)

    g1, s1 = get_gradients(params, cfg, tokens, num_groups=2, batch_size=1)
    g3, s3 = get_gradients(params, cfg, tokens, num_groups=2, batch_size=3)
    for l in range(cfg.num_layers):
        for m in cfg.module_names:
            np.testing.assert_allclose(g3[l][m], g1[l][m], rtol=2e-4,
                                       atol=1e-8)
            np.testing.assert_allclose(s3[l][m], s1[l][m], rtol=2e-4,
                                       atol=1e-8)


# --- 5. gptq group scales from the permuted working weight ----------------

def test_gptq_actorder_groupsize_scales():
    from guidedquant_tpu.solvers.spinquant.gptq import gptq_quantize, gptq_error
    from guidedquant_tpu.solvers.spinquant.quant import WeightQuantConfig

    rng = np.random.default_rng(5)
    n = 32
    # correlated Hessian with a strong diagonal spread so actorder permutes
    A = rng.normal(size=(n, 2 * n))
    H = (A @ A.T / (2 * n)) * np.geomspace(1, 50, n)[None, :] ** 0.5
    H = (H + H.T) / 2 + np.eye(n) * 1e-3
    W = rng.normal(size=(16, n)) * np.geomspace(0.1, 3.0, n)[None, :]
    cfg = WeightQuantConfig(bits=4, perchannel=True, sym=True, mse=False)

    Q, Wint, Scales = gptq_quantize(W.astype(np.float32), H, cfg,
                                    blocksize=16, groupsize=8, actorder=True)
    err = gptq_error(W, Q, H)
    assert np.isfinite(err) and err < 0.05, err
    # each emitted value must sit on its emitted per-group grid
    np.testing.assert_allclose(Q, Wint * Scales, rtol=1e-5, atol=1e-6)
    assert np.abs(Wint).max() <= 7


# --- r4 advice: two-level dequant resolve for wide LUTs -------------------

def test_dequantize_anyprec_two_level_wide_lut():
    """C in (32, 256]: the hi/lo-nibble two-level resolve must equal the
    direct per-row LUT gather (flat select-sum is only used for C<=32)."""
    import jax.numpy as jnp
    from guidedquant_tpu.nn.linear import AnyPrecLinear, dequantize_anyprec
    from guidedquant_tpu.ops.pack import pack_bitplanes

    rng = np.random.default_rng(0)
    for bits in (6, 8):
        N, K = 8, 64
        codes = rng.integers(0, 2 ** bits, size=(N, K))
        lut = rng.normal(size=(N, 2 ** bits)).astype(np.float32)
        qw = pack_bitplanes(codes, bits)
        w = AnyPrecLinear(qweight=jnp.asarray(qw),
                          luts={bits: jnp.asarray(lut)},
                          precision=bits, out_features=N, in_features=K)
        got = np.asarray(dequantize_anyprec(w))
        ref = np.take_along_axis(lut, codes, axis=1)
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


# --- r4 advice: wide-bit VMEM clamp must handle N % 128 != 0 --------------

def test_widebit_tile_clamp_divisor():
    """bits>=5 at TK>=4096 must clamp tile_n for ANY N > 128 (previously
    only when N % 128 == 0), to a divisor of N so the kernel's
    N % tile_n == 0 contract holds."""
    from guidedquant_tpu.ops.lut_kernels import _widebit_tile_n

    # the previously-missed case: N > 128, N % 128 != 0
    for N in (192, 384, 1000, 129):
        t = _widebit_tile_n(N, N, bits=5, TK=4096)
        assert t <= 128 and N % t == 0, (N, t)
    # 128-divisible N clamps to exactly 128
    assert _widebit_tile_n(4096, 256, bits=7, TK=4096) == 128
    # no clamp outside the wide-bit/long-K regime or when already <= 128
    assert _widebit_tile_n(4096, 256, bits=4, TK=4096) == 256
    assert _widebit_tile_n(4096, 256, bits=7, TK=2048) == 256
    assert _widebit_tile_n(4096, 128, bits=7, TK=4096) == 128
