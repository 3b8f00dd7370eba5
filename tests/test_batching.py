"""Continuous batching: concurrent slot decode must reproduce per-request
greedy generation exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedquant_tpu.models import llama, get_config
from guidedquant_tpu.serve import engine
from guidedquant_tpu.serve.batching import ContinuousBatcher


@pytest.fixture(scope="module")
def model():
    cfg = get_config("tiny").replace(vocab_size=96, hidden_size=32,
                                     intermediate_size=64, num_layers=2,
                                     num_heads=4, num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    return cfg, params


def test_batcher_matches_sequential_generate(model):
    cfg, params = model
    prompts = [
        np.array([3, 14, 15, 92], np.int32),
        np.array([7, 1], np.int32),
        np.array([42, 5, 9, 11, 60], np.int32),
    ]
    lens = [6, 9, 4]

    refs = []
    for p, n in zip(prompts, lens):
        out, _ = engine.generate(params, cfg, p[None], n,
                                 kv_dtype=jnp.float32)
        refs.append(out[0, len(p):].tolist())

    # 2 slots, 3 requests -> forces queueing + slot reuse
    b = ContinuousBatcher(params, cfg, slots=2, max_seq=64,
                          kv_dtype=jnp.float32)
    ids = [b.submit(p, n) for p, n in zip(prompts, lens)]
    done = b.run()
    assert sorted(done.keys()) == sorted(ids)
    for rid, ref in zip(ids, refs):
        assert done[rid].out == ref, (rid, done[rid].out, ref)


def test_batcher_eos_stops(model):
    cfg, params = model
    p = np.array([3, 14, 15], np.int32)
    out, _ = engine.generate(params, cfg, p[None], 8, kv_dtype=jnp.float32)
    second = int(out[0, len(p) + 1])  # make the 2nd generated token the EOS
    b = ContinuousBatcher(params, cfg, slots=1, max_seq=64, eos_id=second,
                          kv_dtype=jnp.float32)
    rid = b.submit(p, 8)
    done = b.run()
    assert done[rid].out[-1] == second
    assert len(done[rid].out) == 2
