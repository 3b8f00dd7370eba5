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


def test_tp_sharded_trellis_decode_matches_unsharded():
    """tp-sharded QTIP trellis decode (TrellisLinear partition specs:
    kwords row-words / columns on 'tp', SU/SV sliced to match — the GSPMD
    form of the reference's rcp/tp_rank TP-sliced checkpoints,
    qtip/lib/linear/quantized_linear.py:42-44) == unsharded logits."""
    from __graft_entry__ import _build_quantized_llama

    cfg = get_config("tiny").replace(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=8, num_kv_heads=8, max_seq_len=64)
    qparams = _build_quantized_llama(cfg, 0, family="trellis",
                                     dtype=jnp.float32)
    prompt = np.array([[5, 9, 3, 77]], dtype=np.int32)
    ref1, ref2 = _decode_logits(qparams, cfg, prompt)

    mesh = make_mesh(8, shape={"dp": 1, "fsdp": 2, "tp": 4})
    specs = sharding.quantized_param_specs(cfg, qparams)
    sp = sharding.shard_params(mesh, qparams, specs)
    kv_shard = NamedSharding(mesh, sharding.kv_cache_spec())
    with mesh:
        got1, got2 = _decode_logits(sp, cfg, prompt, mesh, kv_shard)
    np.testing.assert_allclose(got1, ref1, atol=2e-3)
    np.testing.assert_allclose(got2, ref2, atol=2e-3)


def test_70b_geometry_sharded_trellis_decode():
    """Trellis (tpu2u K=2) decode at real Llama-3.1-70B per-layer
    dimensions, tp=8-sharded kwords/SU/SV + KV — logits match the
    unsharded run (the divisibility/layout proof that the quality-optimal
    2-bit family can serve the 70B multi-chip target)."""
    from __graft_entry__ import _build_quantized_llama

    cfg = get_config("llama-3.1-70b").replace(
        num_layers=1, vocab_size=512, max_seq_len=32)
    qparams = _build_quantized_llama(cfg, 0, family="trellis",
                                     dtype=jnp.float32)
    prompt = np.array([[5, 9, 3]], dtype=np.int32)
    ref1, ref2 = _decode_logits(qparams, cfg, prompt)

    mesh = make_mesh(8, shape={"dp": 1, "fsdp": 1, "tp": 8})
    sp = sharding.shard_params(
        mesh, qparams, sharding.quantized_param_specs(cfg, qparams))
    kv_shard = NamedSharding(mesh, sharding.kv_cache_spec())
    with mesh:
        got1, got2 = _decode_logits(sp, cfg, prompt, mesh, kv_shard)
    np.testing.assert_allclose(got1, ref1, atol=2e-3)
    np.testing.assert_allclose(got2, ref2, atol=2e-3)


def test_bcq_and_actquant_sharded_leaves():
    """quantized_param_specs covers BcqLinear and ActQuantLinear leaves:
    tp-sharded forward == unsharded for both backends."""
    import jax.random as jrandom
    from guidedquant_tpu.formats.bcq_format import bcqize_params
    from guidedquant_tpu.nn.act_quant import (ActQuantLinear,
                                              with_native_path)
    from guidedquant_tpu.nn.linear import apply_linear

    cfg = get_config("tiny").replace(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=8, num_kv_heads=8, max_seq_len=64)
    params = llama.init_params(cfg, jrandom.PRNGKey(0), dtype=jnp.float32)
    qparams = bcqize_params(params, cfg, bits=4, iters=2)
    prompt = np.array([[5, 9, 3, 77]], dtype=np.int32)
    ref1, ref2 = _decode_logits(qparams, cfg, prompt)

    mesh = make_mesh(8, shape={"dp": 1, "fsdp": 2, "tp": 4})
    sp = sharding.shard_params(
        mesh, qparams, sharding.quantized_param_specs(cfg, qparams))
    kv_shard = NamedSharding(mesh, sharding.kv_cache_spec())
    with mesh:
        got1, got2 = _decode_logits(sp, cfg, prompt, mesh, kv_shard)
    np.testing.assert_allclose(got1, ref1, atol=2e-3)
    np.testing.assert_allclose(got2, ref2, atol=2e-3)

    # ActQuantLinear leaf (stacked [L, out, in], native int8 path) through
    # the spec builder directly
    rng = np.random.default_rng(3)
    W = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32) * 0.1)
    leaf = with_native_path(ActQuantLinear(weight=W, in_bits=8, in_sym=True))
    x = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    ref = np.asarray(apply_linear(jax.tree_util.tree_map(
        lambda a: a[0], leaf), x))
    spec = sharding.quantized_param_specs(
        cfg, {"layers": {"q_proj": leaf}})["layers"]["q_proj"]
    sh = sharding.shard_params(mesh, leaf, spec)
    with mesh:
        got = np.asarray(apply_linear(
            jax.tree_util.tree_map(lambda a: a[0], sh), x))
    np.testing.assert_allclose(got, ref, atol=2e-4)


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
