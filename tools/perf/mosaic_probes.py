"""Isolated Mosaic capability probes (one risky construct per process).

Round-2 dead ends (PERF_NOTES.md): u8->bf16 cast unsupported, u8->int->bf16
chains crash the remote compile helper, jnp.int4 matmul crashes the worker.
Each is worth one cheap retest per round (stack versions move), plus new
variants that route around the broken cast:

  a  u8 decode -> i32 -> f32 dot      (skips the broken u8->bf16)
  b  i16-word decode -> i32 -> bf16   (narrow-int halfway house)
  c  int8 x int8 Pallas dot_general   (int-domain MXU; no cast at all)
  d  jnp.int4 native XLA matmul       (retest)
  e  u8 -> bf16 cast alone            (retest the original gap)

Usage: run ONE variant per process on the real chip with a timeout:
    timeout 180 python tools/perf/mosaic_probes.py a
Health-probe the worker between variants (tiny jit + np.asarray).
Prints PASS <variant> or raises; a hang means the worker is down.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

variant = sys.argv[1]
TN, TK = 256, 1024
W8 = TK // 4


def run_pallas(kernel, *args, out_dtype=jnp.float32, out_shape=None):
    out_shape = out_shape or (8, TN)
    y = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(a.shape, lambda: (0,) * a.ndim,
                               memory_space=pltpu.VMEM) for a in args],
        out_specs=pl.BlockSpec(out_shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
    )(*args)
    return np.asarray(y)


rng = np.random.RandomState(0)

if variant == "a":
    # u8 shift/and decode, cast u8 -> i32 -> f32, f32 dot (VPU or MXU)
    words = jnp.asarray(rng.randint(0, 256, (TN, W8)).astype(np.uint8))
    x = jnp.asarray(rng.randn(8, TK).astype(np.float32))

    def k(x_ref, w_ref, o_ref):
        tiled = jnp.tile(w_ref[:], (1, 4))
        sh = ((lax.broadcasted_iota(jnp.int32, (1, TK), 1) // W8) * 2
              ).astype(jnp.uint8)
        c = lax.shift_right_logical(tiled, jnp.broadcast_to(sh, tiled.shape)) & 3
        cf = c.astype(jnp.int32).astype(jnp.float32)
        o_ref[:] = lax.dot_general(x_ref[:], cf, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    y = run_pallas(k, x, words)
    # oracle
    w = np.asarray(words)
    # lane p maps to word p % W8, shift (p // W8) * 2
    codes = np.concatenate([(w >> (2 * i)) & 3 for i in range(4)], axis=1)
    ref = np.asarray(x) @ codes.astype(np.float32).T
    err = np.abs(y - ref).max() / np.abs(ref).max()
    assert err < 1e-3, err

elif variant == "b":
    # i16 words (8 2-bit codes/word), i16 shift/and, -> i32 -> bf16 dot
    W16 = TK // 8
    words = jnp.asarray(rng.randint(-2**15, 2**15, (TN, W16)).astype(np.int16))
    x = jnp.asarray(rng.randn(8, TK).astype(np.float32)).astype(jnp.bfloat16)

    def k(x_ref, w_ref, o_ref):
        tiled = jnp.tile(w_ref[:], (1, 8))
        sh = ((lax.broadcasted_iota(jnp.int32, (1, TK), 1) // W16) * 2
              ).astype(jnp.int16)
        c = lax.shift_right_logical(tiled, jnp.broadcast_to(sh, tiled.shape)) & 3
        cf = c.astype(jnp.int32).astype(jnp.bfloat16)
        o_ref[:] = lax.dot_general(x_ref[:], cf, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    y = run_pallas(k, x, words)
    w = np.asarray(words).view(np.uint16)
    codes = np.concatenate([(w >> (2 * i)) & 3 for i in range(8)], axis=1)
    ref = np.asarray(x, np.float32) @ codes.astype(np.float32).T
    err = np.abs(y - ref).max() / np.abs(ref).max()
    assert err < 2e-2, err

elif variant == "c":
    # int8 x int8 MXU dot inside Pallas (int-domain decode epilogue form)
    a = jnp.asarray(rng.randint(-127, 128, (8, TK)).astype(np.int8))
    b = jnp.asarray(rng.randint(-127, 128, (TN, TK)).astype(np.int8))

    def k(a_ref, b_ref, o_ref):
        o_ref[:] = lax.dot_general(a_ref[:], b_ref[:],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    y = run_pallas(k, a, b, out_dtype=jnp.int32)
    ref = np.asarray(a, np.int32) @ np.asarray(b, np.int32).T
    assert (y == ref).all()

elif variant == "d":
    # jnp.int4 native XLA matmul (no Pallas)
    a = jnp.asarray(rng.randint(-7, 8, (8, TK))).astype(jnp.int4)
    b = jnp.asarray(rng.randint(-7, 8, (TN, TK))).astype(jnp.int4)
    y = np.asarray(jax.jit(lambda a, b: lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32))(a, b))
    ref = (np.asarray(a, np.int32) @ np.asarray(b, np.int32).T)
    assert (y == ref).all()

elif variant == "e":
    # the original gap: u8 -> bf16 cast inside Pallas
    words = jnp.asarray(rng.randint(0, 256, (TN, TK)).astype(np.uint8))
    x = jnp.asarray(rng.randn(8, TK).astype(np.float32)).astype(jnp.bfloat16)

    def k(x_ref, w_ref, o_ref):
        cf = w_ref[:].astype(jnp.bfloat16)
        o_ref[:] = lax.dot_general(x_ref[:], cf, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    y = run_pallas(k, x, words)
    ref = np.asarray(x, np.float32) @ np.asarray(words, np.float32).T
    err = np.abs(y - ref).max() / np.abs(ref).max()
    assert err < 2e-2, err

elif variant == "f":
    # fully int-domain: u8 word decode (u8 shift/and) -> i8 codes -> int8
    # MXU dot vs int8 activations. No float cast anywhere — the W2A8
    # native decode form (per-row affine epilogue folds outside in f32).
    words = jnp.asarray(rng.randint(0, 256, (TN, W8)).astype(np.uint8))
    xq = jnp.asarray(rng.randint(-127, 128, (8, TK)).astype(np.int8))

    def k(x_ref, w_ref, o_ref):
        tiled = jnp.tile(w_ref[:], (1, 4))
        sh = ((lax.broadcasted_iota(jnp.int32, (1, TK), 1) // W8) * 2
              ).astype(jnp.uint8)
        c = lax.shift_right_logical(tiled, jnp.broadcast_to(sh, tiled.shape)) & 3
        ci = c.astype(jnp.int8)
        o_ref[:] = lax.dot_general(x_ref[:], ci, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    y = run_pallas(k, xq, words, out_dtype=jnp.int32)
    w = np.asarray(words)
    codes = np.concatenate([(w >> (2 * i)) & 3 for i in range(4)], axis=1)
    ref = np.asarray(xq, np.int32) @ codes.astype(np.int32).T
    assert (y == ref).all()

elif variant == "g":
    # i32-word decode (proven tile/shift/mask chain) -> i32 codes -> i8
    # cast -> int8 MXU dot vs int8 activations. The shift stays in i32
    # (narrow-int shrui fails to legalize on this stack — probes a/b);
    # the win is the 2x-rate int8 MXU dot on GEMM-sized batches.
    W = TK * 2 // 32
    words = jnp.asarray(rng.randint(-2**31, 2**31, (TN, W)).astype(np.int32))
    xq = jnp.asarray(rng.randint(-127, 128, (8, TK)).astype(np.int8))

    def k(x_ref, w_ref, o_ref):
        per_word = 16
        tiled = jnp.tile(w_ref[:], (1, per_word))
        sh = (lax.broadcasted_iota(jnp.int32, (1, TK), 1) // W) * 2
        c = lax.shift_right_logical(tiled, jnp.broadcast_to(sh, tiled.shape)) & 3
        ci = c.astype(jnp.int8)
        o_ref[:] = lax.dot_general(x_ref[:], ci, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    y = run_pallas(k, xq, words, out_dtype=jnp.int32)
    w = np.asarray(words).view(np.uint32)
    codes = np.concatenate([(w >> (2 * i)) & 3 for i in range(16)], axis=1)
    ref = np.asarray(xq, np.int32) @ codes.astype(np.int32).T
    assert (y == ref).all()

else:
    raise SystemExit(f"unknown variant {variant}")

print("PASS", variant, flush=True)
