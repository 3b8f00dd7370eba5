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
