"""Headline benchmark: single-chip decode throughput, 2-bit LNQ-format vs
bf16 (the reference's 43 -> 130 tok/s on RTX 3090, BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value        = 2-bit decode tok/s / bf16 decode tok/s on the same geometry
vs_baseline  = value / 3.02   (the reference's measured FP16->2-bit speedup)

Runs on the default backend (the real TPU chip under axon). Model geometry
is Llama-3.2-1B-class so the bf16 baseline fits alongside the 2-bit model;
weights are random (throughput is weight-value independent).
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_SPEEDUP = 130.0 / 43.0  # BASELINE.md RTX 3090 numbers


def _decode_tok_s(params, cfg, n_tokens=64, batch=1, max_seq=640):
    """Steady-state decode throughput via the on-device decode loop.

    Timing notes (axon tunnel): block_until_ready alone is unreliable, and
    every jit call carries ~30 ms of fixed dispatch overhead — so we force a
    host value fetch and compute the per-token time from the SLOPE between a
    short and a long decode run (overhead cancels).
    """
    import jax
    import jax.numpy as jnp
    from guidedquant_tpu.serve import engine

    # fixed per-call dispatch overhead (measured with a null jit call)
    null = jax.jit(lambda a: a + 1)
    z = jnp.zeros((8, 128))
    _ = np.asarray(null(z))
    overhead = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(null(z))
        overhead = min(overhead, time.perf_counter() - t0)

    state = engine.init_state(cfg, cfg.num_layers, batch, max_seq)
    tok = jnp.zeros((batch,), jnp.int32)
    # warmup / compile
    _, tok2, _st = engine.decode_n_tokens(params, cfg, tok, state, n_tokens)
    _ = np.asarray(tok2)
    best = float("inf")
    for _rep in range(3):
        state2 = engine.init_state(cfg, cfg.num_layers, batch, max_seq)
        t0 = time.perf_counter()
        _, tok2, state2 = engine.decode_n_tokens(params, cfg, tok, state2,
                                                 n_tokens)
        _ = np.asarray(tok2)  # full sync
        best = min(best, time.perf_counter() - t0)
    step = max(best - overhead, 1e-9) / n_tokens
    return batch / step


def main():
    import jax
    import jax.numpy as jnp
    from guidedquant_tpu.models import llama, get_config
    from __graft_entry__ import _build_quantized_llama

    quick = os.environ.get("BENCH_QUICK", "0") == "1"
    cfg = get_config("llama-3.2-1b").replace(max_seq_len=1024)
    if quick:
        cfg = cfg.replace(num_layers=4)

    n_tokens = 32 if quick else 96

    from guidedquant_tpu.serve.fuse import fuse_projections

    params_bf16 = llama.init_params(cfg, jax.random.PRNGKey(0),
                                    dtype=jnp.bfloat16)
    bf16_tok_s = _decode_tok_s(fuse_projections(params_bf16), cfg, n_tokens)
    del params_bf16

    # BENCH_FAMILY selects the LNQ codebook family (decides the decode
    # kernel): affine (flagship: codebook_family="affine"), shared
    # (shared_shape_tile) or free (exact per-row-poly kernel).
    family = os.environ.get("BENCH_FAMILY", "affine")
    if os.environ.get("BENCH_SHARED", "1") != "1":  # legacy knob
        family = "free"
    qparams = fuse_projections(
        _build_quantized_llama(cfg, 0, bits=2, family=family))
    if os.environ.get("BENCH_INT8_HEAD", "1") == "1":
        # quantize the LM head to int8 (the largest bf16 term per step);
        # embedding gather stays bf16
        from guidedquant_tpu.nn.linear import quantize_int8
        head = qparams.get("lm_head", qparams["embed"])
        qparams = dict(qparams)
        qparams["lm_head"] = quantize_int8(head)
        cfg_q = cfg.replace(tie_word_embeddings=False)
    else:
        cfg_q = cfg
    q_tok_s = _decode_tok_s(qparams, cfg_q, n_tokens)

    ratio = q_tok_s / bf16_tok_s
    result = {
        "metric": "decode_speedup_2bit_vs_bf16_llama1b_1chip",
        "value": round(ratio, 4),
        "unit": "x (ratio of tok/s; bf16=%.1f, 2bit=%.1f tok/s)" % (
            bf16_tok_s, q_tok_s),
        "vs_baseline": round(ratio / REFERENCE_SPEEDUP, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
