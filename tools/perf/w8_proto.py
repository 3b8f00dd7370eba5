"""Prototype: u8-word affine code-dot kernel.

The production kernel decodes int32 lane-tiled words (tile + shift + and
+ cast on i32 vectors). The VPU retires narrow-int elementwise ops
several times faster than i32 (tools/perf/vpu_pass_bench.py: u8
shift+and ~5x), so this variant stores 4 codes per **uint8** word
(lane-tiled at W8 = TK*2/8) and decodes with u8 arithmetic:

    tiled = jnp.tile(w_u8, (1, per_word))   # [TN, TK] u8
    codes = (tiled >> 2*(lane // W8)) & 3   # u8 ops
    dot(x, codes.astype(bf16))

Usage:
  w8_proto.py cpu                  # interpret-mode correctness
  w8_proto.py hw SHAPE TILE_N BK   # timing on the real chip
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

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, '/root/repo')
from guidedquant_tpu.ops import lut_kernels as lk  # noqa: E402

BITS = 2
TK = 2048                 # lanes of codes per tile (match production)
PER_WORD = 8 // BITS      # 4 codes per u8 word
W8 = TK // PER_WORD       # 512 u8 words per tile row


def pack_u8(codes):
    """codes [N, K] (K % TK == 0) -> u8 words [N, K/PER_WORD]."""
    N, K = codes.shape
    assert K % TK == 0
    c = codes.reshape(N, K // TK, PER_WORD, W8).astype(np.uint16)
    sh = (np.arange(PER_WORD, dtype=np.uint16) * BITS)[None, None, :, None]
    w = (c << sh).sum(axis=2).astype(np.uint8)
    return w.reshape(N, -1)


def _w8_kernel(x_ref, sumx_ref, s_ref, m_ref, w_ref, o_ref, *, n_jsteps,
               block_k):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = None
    for t in range(block_k):
        w = w_ref[:, t * W8:(t + 1) * W8]           # [TN, W8] u8
        tiled = jnp.tile(w, (1, PER_WORD))          # [TN, TK] u8
        sh = ((lax.broadcasted_iota(jnp.int32, (1, TK), 1) // W8)
              * BITS).astype(jnp.uint8)
        c = lax.shift_right_logical(
            tiled, jnp.broadcast_to(sh, tiled.shape)) & 3
        d = lax.dot_general(x_ref[:, t * TK:(t + 1) * TK],
                            c.astype(jnp.bfloat16),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    o_ref[:] += acc

    @pl.when(j == n_jsteps - 1)
    def _():
        o_ref[:] = o_ref[:] * s_ref[:] + sumx_ref[:] * m_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_n", "block_k",
                                             "interpret"))
def w8_matmul(x, words, srow, mrow, tile_n=512, block_k=0, interpret=False):
    B, K_pad = x.shape
    N = words.shape[0]
    n_ktiles = K_pad // TK
    if block_k == 0:
        block_k = n_ktiles if n_ktiles * TK <= 4096 else 1
    assert n_ktiles % block_k == 0, (n_ktiles, block_k)
    n_jsteps = n_ktiles // block_k
    sumx = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    return pl.pallas_call(
        functools.partial(_w8_kernel, n_jsteps=n_jsteps, block_k=block_k),
        grid=(N // tile_n, n_jsteps),
        in_specs=[pl.BlockSpec((B, block_k * TK), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((B, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tile_n), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tile_n), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile_n, block_k * W8), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, tile_n), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), sumx, srow.astype(jnp.float32)[None, :],
      mrow.astype(jnp.float32)[None, :], words)


def _mk(shape_name, B):
    d, f = 4096, 14336
    shapes = {"qkv": (6144, d), "o": (d, d), "gate_up": (2 * f, d),
              "down": (d, f)}
    N, K = shapes[shape_name]
    K_pad = ((K + TK - 1) // TK) * TK
    rng = np.random.RandomState(0)
    codes = rng.randint(0, 4, size=(N, K_pad)).astype(np.uint8)
    words = jnp.asarray(pack_u8(codes))
    srow = jnp.ones((N,), jnp.float32) * 0.01
    mrow = jnp.zeros((N,), jnp.float32)
    x = jnp.asarray(rng.randn(B, K_pad).astype(np.float32))
    return x, words, srow, mrow, codes, K_pad


if sys.argv[1] == "cpu":
    N, K = 512, 4096
    rng = np.random.RandomState(1)
    codes = rng.randint(0, 4, size=(N, K)).astype(np.uint8)
    words = jnp.asarray(pack_u8(codes))
    srow = jnp.asarray(rng.rand(N).astype(np.float32))
    mrow = jnp.asarray(rng.randn(N).astype(np.float32))
    x = jnp.asarray(rng.randn(1, K).astype(np.float32))
    wd = (np.asarray(mrow)[:, None]
          + np.asarray(srow)[:, None] * codes.astype(np.float32))
    y_ref = np.asarray(x, np.float32) @ wd.T
    y = np.asarray(w8_matmul(x, words, srow, mrow, tile_n=256, block_k=1,
                             interpret=True))
    scale = np.abs(y_ref).max()
    err = np.abs(y - y_ref).max() / scale
    print("interpret rel err:", float(err))
    assert err < 1e-2
    y2 = np.asarray(w8_matmul(x, words, srow, mrow, tile_n=256, block_k=2,
                              interpret=True))
    print("bk2 rel err:", float(np.abs(y2 - y_ref).max() / scale))
    sys.exit(0)

shape_name, tile_n, block_k = sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
B = int(sys.argv[5]) if len(sys.argv) > 5 else 1
x, words, srow, mrow, codes, K_pad = _mk(shape_name, B)


def run(n_iter, x0):
    def body(i, acc):
        y = w8_matmul(acc, words, srow, mrow, tile_n=tile_n,
                      block_k=block_k)
        return x + jnp.pad(y[:, :1], ((0, 0), (0, K_pad - 1))) * 1e-9
    return jax.lax.fori_loop(0, n_iter, body, x0)


g = jax.jit(run, static_argnums=0)
_ = np.asarray(g(2, x))
n1, n2 = 300, 1500
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    _ = np.asarray(g(n1, x))
    t1 = time.perf_counter()
    _ = np.asarray(g(n2, x))
    t2 = time.perf_counter()
    best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
print(f"w8 {shape_name} B={B} tile_n={tile_n} block_k={block_k}: "
      f"{best*1e6:.1f} us", flush=True)
