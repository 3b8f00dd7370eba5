"""Decode-engine tests: incremental KV-cache decode must match full-forward
recomputation token-for-token (the reference's prefill/decode split,
inference/generate.py:76-139)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedquant_tpu.models import llama, get_config
from guidedquant_tpu.serve import engine


@pytest.fixture(scope="module")
def model():
    cfg = get_config("tiny").replace(vocab_size=96, hidden_size=32,
                                     intermediate_size=64, num_layers=2,
                                     num_heads=4, num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    return cfg, params


def _generate_via_full_forward(params, cfg, prompt, n):
    toks = np.array(prompt, dtype=np.int32)
    for _ in range(n):
        logits = llama.forward(params, cfg, jnp.asarray(toks))
        nxt = np.asarray(jnp.argmax(logits[:, -1], axis=-1))
        toks = np.concatenate([toks, nxt[:, None]], axis=1)
    return toks


def test_unrolled_layers_match_scan(model):
    """unroll_layers decode (per-layer weight buffers, the Pallas-operand
    binding path) must match the scan-stacked decode exactly."""
    cfg, params = model
    prompt = np.array([[5, 9, 2, 7]], np.int32)
    state1 = engine.init_state(cfg, cfg.num_layers, 1, 32)
    logits1, state1 = engine.prefill(params, cfg, jnp.asarray(prompt), state1)
    toks1, _, _ = engine.decode_n_tokens(
        params, cfg, jnp.argmax(logits1, -1).astype(jnp.int32), state1, 6)

    unrolled = engine.unroll_layers(params)
    assert isinstance(unrolled["layers"], tuple)
    state2 = engine.init_state(cfg, cfg.num_layers, 1, 32)
    logits2, state2 = engine.prefill(unrolled, cfg, jnp.asarray(prompt),
                                     state2)
    toks2, _, _ = engine.decode_n_tokens(
        unrolled, cfg, jnp.argmax(logits2, -1).astype(jnp.int32), state2, 6)
    # scan and unrolled have different fusion boundaries -> different bf16
    # intermediate rounding; greedy tokens must still agree exactly
    np.testing.assert_allclose(np.asarray(logits1, np.float32),
                               np.asarray(logits2, np.float32),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(np.asarray(toks1), np.asarray(toks2))


def test_unrolled_layers_gemma_pattern():
    """Unrolled path with per-layer sliding/global types (static branches)
    matches the scan path's jnp.where selection."""
    cfg = get_config("tiny").replace(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=4,
        num_heads=4, num_kv_heads=2, sliding_window=4,
        rope_local_theta=10000.0,
        layer_types=("sliding", "sliding", "global", "sliding"))
    params = llama.init_params(cfg, jax.random.PRNGKey(5))
    prompt = np.array([[3, 1, 4, 1, 5]], np.int32)
    out = []
    for p in (params, engine.unroll_layers(params)):
        state = engine.init_state(cfg, cfg.num_layers, 1, 16)
        logits, state = engine.prefill(p, cfg, jnp.asarray(prompt), state)
        toks, _, _ = engine.decode_n_tokens(
            p, cfg, jnp.argmax(logits, -1).astype(jnp.int32), state, 5)
        out.append((np.asarray(logits), np.asarray(toks)))
    np.testing.assert_allclose(out[0][0].astype(np.float32),
                               out[1][0].astype(np.float32),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(out[0][1], out[1][1])


def test_incremental_decode_matches_full_forward(model):
    cfg, params = model
    prompt = np.array([[3, 14, 15, 92, 65]], dtype=np.int32)
    ref = _generate_via_full_forward(params, cfg, prompt, 10)
    out, metrics = engine.generate(params, cfg, prompt, 10,
                                   kv_dtype=jnp.float32)
    np.testing.assert_array_equal(out, ref)
    assert metrics["decode_tok_s"] > 0


def test_batched_decode(model):
    cfg, params = model
    prompt = np.array([[3, 14, 15], [7, 1, 2]], dtype=np.int32)
    ref = _generate_via_full_forward(params, cfg, prompt, 6)
    out, _ = engine.generate(params, cfg, prompt, 6, kv_dtype=jnp.float32)
    np.testing.assert_array_equal(out, ref)


def test_decode_with_quantized_params(model, tmp_path):
    from guidedquant_tpu.pipelines import any_precision_quantize
    from guidedquant_tpu.formats.anyprec import load_packed
    cfg, params = model
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 96, size=(4, 32), dtype=np.int32)
    packed = any_precision_quantize(
        "tiny-engine", cfg=cfg, params=params, seed_precision=4,
        parent_precision=4, cache_dir=str(tmp_path / "c"),
        dataset="synthetic", seq_len=32, num_examples=4, tokens=tokens)
    qcfg, qparams = load_packed(packed, dtype=jnp.float32)
    prompt = np.array([[3, 14, 15, 9]], dtype=np.int32)
    ref = _generate_via_full_forward(qparams, qcfg, prompt, 8)
    out, _ = engine.generate(qparams, qcfg, prompt, 8, kv_dtype=jnp.float32)
    np.testing.assert_array_equal(out, ref)


def test_sampling_temperature_and_topk(model):
    cfg, params = model
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, 96)) * 3)
    g = engine.sample_token(logits, jax.random.PRNGKey(0), 0.0)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(jnp.argmax(logits, -1)))
    s = engine.sample_token(logits, jax.random.PRNGKey(0), 1.0, top_k=5)
    # top-k samples must come from the top-5 sets
    top5 = np.argsort(np.asarray(logits), axis=-1)[:, -5:]
    for b in range(2):
        assert int(s[b]) in top5[b]
