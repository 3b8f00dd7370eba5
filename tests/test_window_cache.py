"""Ring-buffer sliding-window KV cache (Gemma3 long-context serving).

The dense path keeps every sliding layer's K/V over the full [S_max]
timeline and masks outside the window (reference semantics; the reference
has no long-context serving path at all — SURVEY.md §5.7). The ring path
stores only the last W positions per sliding layer. Oracle: the dense
sliding-mask decode — tokens must match exactly, logits closely.
"""

import numpy as np

import jax
import jax.numpy as jnp

from guidedquant_tpu.models import llama, get_config
from guidedquant_tpu.serve import engine


def _gemma_cfg():
    return get_config("tiny").replace(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=4,
        num_heads=4, num_kv_heads=2, sliding_window=4,
        rope_local_theta=10000.0,
        layer_types=("sliding", "sliding", "global", "sliding"))


def _run(params, cfg, prompt, n, s_max, window=0, kv_bits=16):
    state = engine.init_state(cfg, cfg.num_layers, 1, s_max,
                              kv_bits=kv_bits, window=window)
    logits, state = engine.prefill(params, cfg, jnp.asarray(prompt), state)
    toks, _, state = engine.decode_n_tokens(
        params, cfg, jnp.argmax(logits, -1).astype(jnp.int32), state, n)
    return np.asarray(logits, np.float32), np.asarray(toks), state


def test_ring_matches_dense_long_prompt():
    """Prompt longer than the window (prefill wraps the ring) + enough
    decode steps to wrap it again."""
    cfg = _gemma_cfg()
    params = engine.unroll_layers(llama.init_params(cfg, jax.random.PRNGKey(5)))
    prompt = np.array([[3, 1, 4, 1, 5, 9]], np.int32)  # S=6 > W=4

    lo_d, tk_d, _ = _run(params, cfg, prompt, 10, 32)
    lo_r, tk_r, state = _run(params, cfg, prompt, 10, 32,
                             window=cfg.sliding_window)

    # sliding layers hold only W positions; global layers the full timeline
    assert state.wk.shape == (3, 1, cfg.sliding_window, 2, cfg.head_dim)
    assert state.k.shape[0] == 1 and state.k.shape[2] == 32
    np.testing.assert_allclose(lo_d, lo_r, rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(tk_d, tk_r)


def test_ring_matches_dense_short_prompt():
    """Prompt shorter than the window: partially-filled ring (unwritten
    slots must stay masked)."""
    cfg = _gemma_cfg()
    params = engine.unroll_layers(llama.init_params(cfg, jax.random.PRNGKey(7)))
    prompt = np.array([[11, 2]], np.int32)

    lo_d, tk_d, _ = _run(params, cfg, prompt, 12, 32)
    lo_r, tk_r, _ = _run(params, cfg, prompt, 12, 32,
                         window=cfg.sliding_window)
    np.testing.assert_allclose(lo_d, lo_r, rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(tk_d, tk_r)


def test_ring_quantized_kv():
    """int8 KV cache in ring mode matches the dense-cache int8 oracle (both
    attend through the same quantized codes)."""
    cfg = _gemma_cfg()
    params = engine.unroll_layers(llama.init_params(cfg, jax.random.PRNGKey(9)))
    prompt = np.array([[7, 3, 2, 40, 8]], np.int32)

    lo_d, tk_d, _ = _run(params, cfg, prompt, 8, 32, kv_bits=8)
    lo_r, tk_r, state = _run(params, cfg, prompt, 8, 32,
                             window=cfg.sliding_window, kv_bits=8)
    assert state.wk.dtype == jnp.int8 and state.wk_scale is not None
    np.testing.assert_allclose(lo_d, lo_r, rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(tk_d, tk_r)


def test_ring_generate_entrypoint():
    """engine.generate(window=...) runs end to end on the ring path."""
    cfg = _gemma_cfg()
    params = engine.unroll_layers(llama.init_params(cfg, jax.random.PRNGKey(3)))
    prompt = np.array([[5, 9, 2, 7, 1]], np.int32)
    out_d, _ = engine.generate(params, cfg, prompt, 9, max_seq=32)
    out_r, _ = engine.generate(params, cfg, prompt, 9, max_seq=32,
                               window=cfg.sliding_window)
    np.testing.assert_array_equal(out_d, out_r)


def test_chunked_prefill_matches_unchunked():
    """generate(prefill_chunk=...) == one-shot prefill, incl. on the ring
    path (a block prefill crossing the window boundary mid-chunk)."""
    cfg = _gemma_cfg()
    params = engine.unroll_layers(llama.init_params(cfg, jax.random.PRNGKey(2)))
    prompt = np.array([[5, 9, 2, 7, 1, 3, 3, 8, 6, 6, 1]], np.int32)  # S=11
    for window in (0, cfg.sliding_window):
        out_a, _ = engine.generate(params, cfg, prompt, 8, max_seq=40,
                                   window=window)
        out_b, _ = engine.generate(params, cfg, prompt, 8, max_seq=40,
                                   window=window, prefill_chunk=4)
        np.testing.assert_array_equal(out_a, out_b)


def test_ring_far_position_indexing():
    """Ring indexing at positions far beyond the window (pos >> W): seed
    both caches from the same prefix, jump pos deep into the timeline by
    replaying tokens, and check ring decode still matches dense."""
    cfg = _gemma_cfg()
    params = engine.unroll_layers(llama.init_params(cfg, jax.random.PRNGKey(4)))
    prompt = np.array([[3, 1, 4, 1]], np.int32)
    n = 40  # decode far past W=4 (several full ring wraps)
    lo_d, tk_d, _ = _run(params, cfg, prompt, n, 64)
    lo_r, tk_r, st = _run(params, cfg, prompt, n, 64,
                          window=cfg.sliding_window)
    assert int(st.pos) == 4 + n
    np.testing.assert_array_equal(tk_d, tk_r)
