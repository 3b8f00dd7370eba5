"""Multi-chip sharding correctness on the virtual 8-device CPU mesh:
tp/dp-sharded decode must reproduce single-device logits, including at
real 70B-geometry dimensions (the divisibility/layout proof for the
multi-host target)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from guidedquant_tpu.models import llama, get_config
from guidedquant_tpu.parallel import make_mesh, sharding
from guidedquant_tpu.serve import engine


def _decode_logits(params, cfg, prompt, mesh=None, kv_sharding=None):
    state = engine.init_state(cfg, cfg.num_layers, 1, 16,
                              dtype=jnp.float32, sharding=kv_sharding)
    logits, state = engine.prefill(params, cfg, jnp.asarray(prompt), state)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    logits2, _ = engine.decode_step(params, cfg, tok, state)
    return np.asarray(logits, np.float32), np.asarray(logits2, np.float32)


def test_tp_sharded_decode_matches_unsharded():
    cfg = get_config("tiny").replace(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=8, num_kv_heads=8, max_seq_len=64)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    prompt = np.array([[5, 9, 3, 77]], dtype=np.int32)
    ref1, ref2 = _decode_logits(params, cfg, prompt)

    mesh = make_mesh(8, shape={"dp": 1, "fsdp": 2, "tp": 4})
    specs = sharding.dense_param_specs(cfg)
    sp = sharding.shard_params(mesh, params, specs)
    kv_shard = NamedSharding(mesh, sharding.kv_cache_spec())
    with mesh:
        got1, got2 = _decode_logits(sp, cfg, prompt, mesh, kv_shard)
    np.testing.assert_allclose(got1, ref1, atol=2e-4)
    np.testing.assert_allclose(got2, ref2, atol=2e-4)


def test_70b_geometry_sharded_step():
    """Real Llama-3.1-70B per-layer dimensions (d=8192, f=28672, 64 q /
    8 kv heads) divide cleanly over tp=8 and run a sharded fwd+bwd step."""
    cfg = get_config("llama-3.1-70b").replace(
        num_layers=1, vocab_size=512, max_seq_len=64)
    params = llama.init_params(cfg, jax.random.PRNGKey(1),
                               dtype=jnp.float32)
    mesh = make_mesh(8, shape={"dp": 1, "fsdp": 1, "tp": 8})
    specs = sharding.dense_param_specs(cfg)
    sp = sharding.shard_params(mesh, params, specs)
    tokens = jax.device_put(
        np.tile(np.arange(16, dtype=np.int32)[None], (2, 1)),
        NamedSharding(mesh, P("dp", None)))
    with mesh:
        loss, grads = jax.jit(
            lambda p, t: sharding.train_step(p, cfg, t))(sp, tokens)
        jax.block_until_ready(loss)
    assert np.isfinite(float(loss))
    # tp-sharded decode runs too
    prompt = np.array([[1, 2, 3]], dtype=np.int32)
    kv_shard = NamedSharding(mesh, sharding.kv_cache_spec())
    with mesh:
        l1, l2 = _decode_logits(sp, cfg, prompt, mesh, kv_shard)
    assert np.isfinite(l1).all() and np.isfinite(l2).all()


def test_tp_sharded_ring_window_decode():
    """tp-sharded Gemma3 ring-window decode (sliding layers in W-slot ring
    caches, kv-heads sharded on 'tp') matches the unsharded dense path."""
    cfg = get_config("tiny").replace(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=4, num_heads=8, num_kv_heads=8, max_seq_len=64,
        sliding_window=4, rope_local_theta=10000.0,
        layer_types=("sliding", "sliding", "global", "sliding"))
    stacked = llama.init_params(cfg, jax.random.PRNGKey(2))
    params = engine.unroll_layers(stacked)
    prompt = np.array([[5, 9, 3, 77, 12, 8]], dtype=np.int32)

    def run(p, kv_sharding=None):
        state = engine.init_state(cfg, cfg.num_layers, 1, 32,
                                  dtype=jnp.float32, sharding=kv_sharding,
                                  window=cfg.sliding_window)
        assert state.wk is not None
        logits, state = engine.prefill(p, cfg, jnp.asarray(prompt), state)
        toks, _, _ = engine.decode_n_tokens(
            p, cfg, jnp.argmax(logits, -1).astype(jnp.int32), state, 6)
        return np.asarray(logits, np.float32), np.asarray(toks)

    ref_l, ref_t = run(params)

    mesh = make_mesh(8, shape={"dp": 1, "fsdp": 2, "tp": 4})
    sp = sharding.shard_params(mesh, stacked,
                               sharding.dense_param_specs(cfg))
    sp = engine.unroll_layers(sp)  # per-layer slices keep their sharding
    kv_shard = NamedSharding(mesh, sharding.kv_cache_spec())
    with mesh:
        got_l, got_t = run(sp, kv_shard)
    np.testing.assert_allclose(got_l, ref_l, atol=2e-4)
    np.testing.assert_array_equal(got_t, ref_t)


def test_70b_geometry_sharded_quantized_decode():
    """Quantized (affine 2-bit) decode at real 70B per-layer dimensions,
    tp=8-sharded packed operands + KV — logits match the unsharded run
    (the serving-side divisibility/layout proof for the 70B target)."""
    from __graft_entry__ import _build_quantized_llama

    cfg = get_config("llama-3.1-70b").replace(
        num_layers=1, vocab_size=512, max_seq_len=32)
    qparams = _build_quantized_llama(cfg, 0, bits=2, family="affine",
                                     dtype=jnp.float32)
    prompt = np.array([[5, 9, 3, 77]], dtype=np.int32)
    ref1, ref2 = _decode_logits(qparams, cfg, prompt)

    mesh = make_mesh(8, shape={"dp": 1, "fsdp": 1, "tp": 8})
    sp = sharding.shard_params(
        mesh, qparams, sharding.quantized_param_specs(cfg, qparams))
    kv_shard = NamedSharding(mesh, sharding.kv_cache_spec())
    with mesh:
        got1, got2 = _decode_logits(sp, cfg, prompt, mesh, kv_shard)
    np.testing.assert_allclose(got1, ref1, atol=2e-3)
    np.testing.assert_allclose(got2, ref2, atol=2e-3)
