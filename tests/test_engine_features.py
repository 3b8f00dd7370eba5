"""Engine feature tests: fused projections, quantized KV cache, R3."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedquant_tpu.models import llama, get_config
from guidedquant_tpu.serve import engine
from guidedquant_tpu.serve.fuse import fuse_projections, fusable


@pytest.fixture(scope="module")
def model():
    cfg = get_config("tiny").replace(vocab_size=96, hidden_size=32,
                                     intermediate_size=64, num_layers=2,
                                     num_heads=4, num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    return cfg, params


def test_fused_projections_match_unfused(model):
    cfg, params = model
    prompt = np.array([[3, 14, 15, 92]], dtype=np.int32)
    ref, _ = engine.generate(params, cfg, prompt, 8, kv_dtype=jnp.float32)
    fused = fuse_projections(params)
    assert "qkv_proj" in fused["layers"]
    out, _ = engine.generate(fused, cfg, prompt, 8, kv_dtype=jnp.float32)
    np.testing.assert_array_equal(out, ref)


def test_fused_anyprec(model, tmp_path):
    from guidedquant_tpu.pipelines import any_precision_quantize
    from guidedquant_tpu.formats.anyprec import load_packed
    cfg, params = model
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 96, size=(4, 32), dtype=np.int32)
    packed = any_precision_quantize(
        "tiny-fuse", cfg=cfg, params=params, seed_precision=4,
        parent_precision=4, cache_dir=str(tmp_path / "c"),
        dataset="synthetic", seq_len=32, num_examples=4, tokens=tokens)
    qcfg, qparams = load_packed(packed, dtype=jnp.float32)
    prompt = np.array([[3, 14, 15]], dtype=np.int32)
    ref, _ = engine.generate(qparams, qcfg, prompt, 6, kv_dtype=jnp.float32)
    fused = fuse_projections(qparams)
    out, _ = engine.generate(fused, qcfg, prompt, 6, kv_dtype=jnp.float32)
    np.testing.assert_array_equal(out, ref)


def test_r3_exact_with_fp_cache(model):
    """R3 per-head rotation of q and k leaves attention invariant."""
    cfg, params = model
    prompt = np.array([[7, 1, 2, 9]], dtype=np.int32)
    ref, _ = engine.generate(params, cfg, prompt, 8, kv_dtype=jnp.float32)
    out, _ = engine.generate(params, cfg, prompt, 8, kv_dtype=jnp.float32,
                             r3=True)
    np.testing.assert_array_equal(out, ref)


def test_kv8_cache_close_to_fp(model):
    cfg, params = model
    prompt = np.array([[7, 1, 2, 9]], dtype=np.int32)
    state_fp = engine.init_state(cfg, cfg.num_layers, 1, 32,
                                 dtype=jnp.float32)
    logits_fp, _ = engine.prefill(params, cfg, jnp.asarray(prompt), state_fp)
    state_q = engine.init_state(cfg, cfg.num_layers, 1, 32, kv_bits=8)
    logits_q, state_q = engine.prefill(params, cfg, jnp.asarray(prompt),
                                       state_q)
    assert state_q.k.dtype == jnp.int8
    a, b = np.asarray(logits_fp), np.asarray(logits_q)
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 0.05, rel


def test_kv4_r3_generates(model):
    cfg, params = model
    prompt = np.array([[7, 1, 2, 9]], dtype=np.int32)
    out, _ = engine.generate(params, cfg, prompt, 8, kv_bits=4, r3=True)
    assert out.shape == (1, 12)
    assert (out >= 0).all() and (out < cfg.vocab_size).all()


def test_int8_head_close_to_dense(model):
    from guidedquant_tpu.nn.linear import quantize_int8, apply_linear
    cfg, params = model
    W = params["layers"]["q_proj"][0]
    lin = quantize_int8(W)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, cfg.hidden_size)),
                    jnp.float32)
    y = np.asarray(apply_linear(lin, x))
    ref = np.asarray(x @ W.T)
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02, rel
    # stacked form
    lin_s = quantize_int8(params["layers"]["q_proj"])
    import jax as _jax
    y0 = np.asarray(apply_linear(_jax.tree_util.tree_map(lambda a: a[0], lin_s), x))
    np.testing.assert_allclose(y0, y, atol=1e-5)


def test_trellis_family_engine_decode():
    """QTIP-serving smoke: a trellis-quantized (kwords) model decodes
    through the engine, scan and unrolled paths agree (the bench's
    BENCH_FAMILY=trellis build)."""
    from guidedquant_tpu.models import get_config
    from guidedquant_tpu.serve import engine
    from __graft_entry__ import _build_quantized_llama

    cfg = get_config("tiny").replace(
        max_seq_len=128, hidden_size=256, intermediate_size=512,
        num_heads=4, num_kv_heads=4, head_dim=64, num_layers=2)
    params = _build_quantized_llama(cfg, 0, family="trellis")
    state = engine.init_state(cfg, cfg.num_layers, 1, 64)
    toks, _, _ = engine.decode_n_tokens(params, cfg,
                                        jnp.zeros((1,), jnp.int32), state, 4)
    state2 = engine.init_state(cfg, cfg.num_layers, 1, 64)
    toks2, _, _ = engine.decode_n_tokens(engine.unroll_layers(params), cfg,
                                         jnp.zeros((1,), jnp.int32), state2, 4)
    assert np.array_equal(np.asarray(toks), np.asarray(toks2))


def test_generate_eos_stop():
    """generate(eos_id=...) stops decoding once every row emits eos and
    pads the remainder with eos (HF generate semantics)."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from guidedquant_tpu.models import llama, get_config
    from guidedquant_tpu.serve import engine

    cfg = get_config("tiny").replace(vocab_size=96, hidden_size=32,
                                     intermediate_size=64, num_layers=2,
                                     num_heads=4, num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    p = np.array([[3, 14, 15]], np.int32)
    ref, _ = engine.generate(params, cfg, p, 8)
    eos = int(ref[0, p.shape[1] + 1])  # 2nd generated token
    out, _ = engine.generate(params, cfg, p, 8, eos_id=eos)
    gen = out[0, p.shape[1]:]
    first = int(np.argmax(gen == eos))
    assert gen[first] == eos
    assert (gen[first:] == eos).all()
    np.testing.assert_array_equal(gen[:first + 1], ref[0, p.shape[1]:
                                                       p.shape[1] + first + 1])
