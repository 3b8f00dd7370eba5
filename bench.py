"""Headline benchmark: single-chip decode throughput, 2-bit LNQ-format vs
bf16 (the reference's 43 -> 130 tok/s on RTX 3090 Llama-3.1-8B-Instruct,
BASELINE.md / reference README.md:91-97).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value        = 2-bit decode tok/s / bf16 decode tok/s on the same geometry
vs_baseline  = value / 3.02   (the reference's measured FP16->2-bit speedup)

Geometry (BENCH_GEOM):
  "8b" (default) — the north-star model (Llama-3.1-8B). bf16-8B weights are
    16.05 GB and DO NOT FIT in the v5e's 16 GB HBM (capacity itself is the
    first win of 2-bit); the bf16 baseline is extrapolated from the measured
    per-layer time slope at the same geometry (decode time is affine in
    layer count: t(L) = a + b*L with a = embed+head+sampling, b = per-layer
    cost — measured at several L that do fit, reported in the unit string).
    The quantized model is built DEVICE-SIDE (random codes; throughput is
    weight-value independent) so no multi-GB host->device tunnel upload.
  "1b" — Llama-3.2-1B geometry, both models fit: direct measured ratio.

Runs on the default backend (the real TPU chip under axon).
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
    host value fetch and subtract a measured null-call overhead.
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


def _build_quantized_device(cfg, bits=2, seed=7, family="affine"):
    """Fused quantized model built entirely on device (no host upload).

    Kernel operands only: random lane-tiled words ARE a valid packing of
    random codes, and decode throughput is weight-value independent. The
    bit-plane checkpoint `qweight` is a tiny placeholder — the decode hot
    path never reads it; this builder is for throughput benchmarking only.

    family: "affine" (uniform-grid LUT, code-dot kernel) or "free"
    (arbitrary per-row LUT, exact-polynomial kernel — the paper's
    free-codebook LNQ configuration; bits must be in KERNEL_BITS).

    BENCH_HEAD: "affine5" (default since round 5: the guided head ladder
    measured +0.087% ppl on the real 16k-vocab checkpoint — under the
    +0.1% near-lossless gate — at 5.128 ms vs int8's 5.192; see
    PERF_NOTES round 5), "affine4" (max speed: 4.901 ms / 204.0 tok/s at
    a recorded +0.34% ppl), "affine{1..8}", "int8", or "bf16".
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from guidedquant_tpu.nn.linear import AnyPrecLinear, Int8Linear
    from guidedquant_tpu.ops import lut_kernels

    d, f, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    V = cfg.vocab_size
    keys = iter(jax.random.split(jax.random.PRNGKey(seed), 64))
    if family == "free":
        assert bits in lut_kernels.KERNEL_BITS, (family, bits)

    def qlin(out_f, in_f, b=bits, stacked=True, k_tile_mult=1):
        TK = lut_kernels.tile_k_for(b)
        K_pad = ((in_f + TK - 1) // TK) * TK
        # optionally pad the tile count so block_k can batch grid steps
        n_t = K_pad // TK
        n_t = ((n_t + k_tile_mult - 1) // k_tile_mult) * k_tile_mult
        K_pad = n_t * TK
        lead = (L,) if stacked else ()

        def words(field_bits):
            W = K_pad * field_bits // 32
            return jax.random.randint(next(keys), lead + (out_f, W),
                                      -2**31, 2**31 - 1, jnp.int32)

        fs = lut_kernels.FIELD_SPLIT[b]
        qwords = words(b) if len(fs) == 1 else tuple(words(ff) for ff in fs)
        s = (jax.random.uniform(next(keys), lead + (out_f,)) * 0.5
             + 0.75) * 0.02
        m = jax.random.normal(next(keys), lead + (out_f,)) * 0.002
        C = 2 ** b
        if family == "free":
            # arbitrary (sorted-random) per-row LUT -> exact-poly kernel
            rng = np.random.default_rng(seed + out_f)
            lut_np = np.sort(rng.normal(size=lead + (out_f, C))
                             ).astype(np.float32) * 0.02
            flat = lut_np.reshape(-1, C)
            coef = lut_kernels.lut_to_poly(flat, b).astype(np.float32)
            pcoef = jnp.asarray(coef.reshape(lut_np.shape[:-1] + (C,)))
            luts = {b: jnp.asarray(lut_np, jnp.bfloat16)}
            srow = mrow = None
        else:
            pcoef = None
            luts = {b: (m[..., None] + s[..., None] *
                        jnp.arange(C, dtype=jnp.float32)
                        ).astype(jnp.bfloat16)}
            srow, mrow = s.astype(jnp.float32), m.astype(jnp.float32)
        return AnyPrecLinear(
            qweight=jnp.zeros(lead + (b, out_f, 8), jnp.int32),  # placeholder
            luts=luts, bias=None, qwords=qwords, pcoef=pcoef, gpoly=None,
            srow=srow, mrow=mrow,
            precision=b, out_features=out_f, in_features=in_f)

    # down-proj k-tiles: unpadded 7 tiles + 1-tile grid steps measured
    # faster than the old pad-to-8 + block_k=2 (160.3 vs 154.5 tok/s full
    # step) once block_k pipelining landed; pad only on request.
    pad_down = int(os.environ.get("BENCH_PAD_DOWN", "1"))
    # fused leaves built directly (avoids 2x transient HBM from concat)
    layers = {
        "attn_norm": jnp.ones((L, d), jnp.bfloat16),
        "mlp_norm": jnp.ones((L, d), jnp.bfloat16),
        "qkv_proj": qlin(cfg.q_dim + 2 * cfg.kv_dim, d),
        "o_proj": qlin(d, cfg.q_dim),
        "gate_up_proj": qlin(2 * f, d),
        "down_proj": qlin(d, f, k_tile_mult=pad_down),
    }
    head_mode = os.environ.get("BENCH_HEAD", "affine5")
    if head_mode.startswith("affine") and head_mode[6:].isdigit():
        # affine4/affine5/affine6...: b-bit affine any-prec head. The
        # affine code-dot kernel has ~flat pass count at every width, so
        # 5/6-bit heads keep the fast path with 5/8 / 6/8 of the int8
        # head's bytes (head_quant.py ladder picks the quality-viable b).
        head = qlin(V, d, b=int(head_mode[6:]), stacked=False)
    elif head_mode == "bf16":
        head = (jax.random.normal(next(keys), (V, d)) * 0.02
                ).astype(jnp.bfloat16)
    else:
        head = Int8Linear(
            q=jax.random.randint(next(keys), (V, d), -128, 128, jnp.int8),
            scale=jnp.full((V,), 2e-4, jnp.float32),
            out_features=V, in_features=d)
    params = {
        "embed": (jax.random.normal(next(keys), (V, d)) * 0.02
                  ).astype(jnp.bfloat16),
        "layers": layers,
        "final_norm": jnp.ones((d,), jnp.bfloat16),
        "lm_head": head,
    }
    return params, cfg.replace(tie_word_embeddings=False)


def _bf16_extrapolated_tok_s(cfg, layer_counts, n_tokens):
    """Measure bf16 decode at several layer counts that fit in HBM, fit
    t(L) = a + b*L by least squares, return (tok/s at cfg.num_layers,
    {L: measured tok/s})."""
    import gc
    import jax
    import jax.numpy as jnp
    from guidedquant_tpu.models import llama
    from guidedquant_tpu.serve.fuse import fuse_projections

    pts = {}
    for L in layer_counts:
        cfg_l = cfg.replace(num_layers=L)
        params = fuse_projections(
            llama.init_params(cfg_l, jax.random.PRNGKey(0),
                              dtype=jnp.bfloat16))
        pts[L] = _decode_tok_s(params, cfg_l, n_tokens)
        del params
        gc.collect()
    Ls = np.asarray(list(pts), np.float64)
    ts = 1.0 / np.asarray([pts[L] for L in pts], np.float64)  # step seconds
    b, a = np.polyfit(Ls, ts, 1)
    t_full = a + b * cfg.num_layers
    return 1.0 / t_full, pts


def _run_1b(quick):
    import jax
    import jax.numpy as jnp
    from guidedquant_tpu.models import llama, get_config
    from guidedquant_tpu.serve.fuse import fuse_projections
    from __graft_entry__ import _build_quantized_llama

    cfg = get_config("llama-3.2-1b").replace(max_seq_len=1024)
    if quick:
        cfg = cfg.replace(num_layers=4)
    n_tokens = 32 if quick else 96

    params_bf16 = llama.init_params(cfg, jax.random.PRNGKey(0),
                                    dtype=jnp.bfloat16)
    bf16_tok_s = _decode_tok_s(fuse_projections(params_bf16), cfg, n_tokens)
    del params_bf16

    family = os.environ.get("BENCH_FAMILY", "affine")
    if os.environ.get("BENCH_SHARED", "1") != "1":  # legacy knob
        family = "free"
    from guidedquant_tpu.serve.fuse import fusable
    qparams = _build_quantized_llama(cfg, 0, bits=2, family=family)
    if fusable(qparams):  # trellis (QTIP) serves unfused, like the
        qparams = fuse_projections(qparams)  # reference's no_fuse converter
    if os.environ.get("BENCH_INT8_HEAD", "1") == "1":
        from guidedquant_tpu.nn.linear import quantize_int8
        head = qparams.get("lm_head", qparams["embed"])
        qparams = dict(qparams)
        qparams["lm_head"] = quantize_int8(head)
        cfg_q = cfg.replace(tie_word_embeddings=False)
    else:
        cfg_q = cfg
    if os.environ.get("BENCH_UNROLL", "1") == "1":
        from guidedquant_tpu.serve.engine import unroll_layers
        qparams = unroll_layers(qparams)
    q_tok_s = _decode_tok_s(qparams, cfg_q, n_tokens)

    ratio = q_tok_s / bf16_tok_s
    tag = "" if family == "affine" else "_" + family
    return {
        "metric": "decode_speedup_2bit_vs_bf16_llama1b_1chip" + tag,
        "value": round(ratio, 4),
        "unit": "x (ratio of tok/s; bf16=%.1f, 2bit=%.1f tok/s)" % (
            bf16_tok_s, q_tok_s),
        "vs_baseline": round(ratio / REFERENCE_SPEEDUP, 4),
    }


def _run_8b(quick):
    import gc
    from guidedquant_tpu.models import get_config

    cfg = get_config("llama-3.1-8b").replace(max_seq_len=1024)
    n_tokens = 16 if quick else 64
    layer_counts = (2, 4) if quick else (4, 8, 12)

    # bf16 baseline: measured per-layer slope, extrapolated to 32 layers
    # (16.05 GB of bf16 weights cannot fit in 16 GB HBM).
    bf16_tok_s, pts = _bf16_extrapolated_tok_s(cfg, layer_counts, n_tokens)
    gc.collect()

    build_cfg = cfg.replace(num_layers=4) if quick else cfg
    qparams, cfg_q = _build_quantized_device(build_cfg, bits=2)
    if os.environ.get("BENCH_ACT", "8") == "8":
        # DEFAULT since round 4: int-domain W2A8 kernels (i32-word decode
        # + int8 MXU code-dot) — 5.19 ms vs 6.24 ms per 8B step (the r4
        # recorded headline runs measured 192.6-194.3 tok/s across tunnel
        # days; BENCH_r04.json recorded 194.3, vs 160.3 bf16-act). The A8
        # activation quantization is the only numeric change,
        # ppl-validated near-lossless on the real checkpoint
        # (2bit-affine-a8 1.3430 vs 2bit-affine 1.3409). BENCH_ACT=16
        # restores the bf16-activation kernels.
        from guidedquant_tpu.nn.linear import AnyPrecLinear, with_act8
        lay = dict(qparams["layers"])
        for k, v in lay.items():
            if isinstance(v, AnyPrecLinear):
                lay[k] = with_act8(v)
        qparams = dict(qparams, layers=lay)
        if (os.environ.get("BENCH_HEAD", "affine5").startswith("affine")
                and isinstance(qparams.get("lm_head"), AnyPrecLinear)):
            # BENCH_HEAD=affine{b} only (explicit gate, ADVICE r4): the
            # b-bit head takes the int8 MXU code-dot too (the int8 head
            # is ~0.70 ms of the step at its HBM SOL; reduced weight
            # bytes move it). with_act8 no-ops above 7 bits.
            qparams = dict(qparams, lm_head=with_act8(qparams["lm_head"]))
    if os.environ.get("BENCH_UNROLL", "1") == "1":
        # per-layer weight buffers: Pallas operands bind directly instead of
        # being re-materialized from scan slices every step (engine.unroll_layers)
        from guidedquant_tpu.serve.engine import unroll_layers
        qparams = unroll_layers(qparams)
    q_tok_s = _decode_tok_s(qparams, cfg_q, n_tokens)

    if quick:  # quick mode: compare at the same truncated depth
        bf16_4 = pts.get(4)
        ratio = q_tok_s / bf16_4 if bf16_4 else float("nan")
        unit = ("x QUICK-SMOKE 4-layer 8B-geometry (bf16=%.1f, 2bit=%.1f "
                "tok/s)" % (bf16_4 or 0.0, q_tok_s))
    else:
        ratio = q_tok_s / bf16_tok_s
        meas = ", ".join("L%d=%.1f" % (L, pts[L]) for L in pts)
        unit = ("x (2bit 8B measured %.1f tok/s; bf16 8B = 16.05GB > 16GB "
                "HBM, extrapolated %.1f tok/s from per-layer slope at %s)"
                % (q_tok_s, bf16_tok_s, meas))
    return {
        "metric": "decode_speedup_2bit_vs_bf16_llama8b_1chip",
        "value": round(ratio, 4),
        "unit": unit,
        "vs_baseline": round(ratio / REFERENCE_SPEEDUP, 4),
    }


def main():
    quick = os.environ.get("BENCH_QUICK", "0") == "1"
    geom = os.environ.get("BENCH_GEOM", "8b")
    if geom == "1b":
        result = _run_1b(quick)
    else:
        try:
            result = _run_8b(quick)
        except Exception as e:  # fall back so the driver still gets a line
            print("8b bench failed (%r); falling back to 1b" % e,
                  file=sys.stderr)
            result = _run_1b(quick)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
