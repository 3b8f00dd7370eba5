"""Prototype: x-slice affine code-dot kernel.

The production affine kernel decodes a [TN, TK] code tile via
jnp.tile(words) >> shift & mask (the tile is a real VPU copy pass). This
variant never materializes the full tile: for each bit-slot b it decodes
only [TN, W] codes ((words >> b*bits) & mask, no tile/concat) and dots the
matching x slice, accumulating in registers — per-element ALU drops from
~4 ops (copy+shift+and+cast) to 3 (shift+and+cast), at the cost of
per_word small MXU dots per k-tile.

Usage:
  xslice_proto.py cpu                 # interpret-mode correctness
  xslice_proto.py hw SHAPE TILE_N BK  # timing on the real chip
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


def _xs_kernel(x_ref, sumx_ref, s_ref, m_ref, w_ref, o_ref, *, bits,
               tile_k, n_jsteps, block_k):
    j = pl.program_id(1)
    per_word = 32 // bits
    W = tile_k * bits // 32

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    mask = (1 << bits) - 1
    acc = None
    for t in range(block_k):
        w = w_ref[:, t * W:(t + 1) * W]
        for b in range(per_word):
            c = ((lax.shift_right_logical(w, b * bits)) & mask
                 ).astype(jnp.bfloat16)
            xb = x_ref[:, t * tile_k + b * W: t * tile_k + (b + 1) * W]
            d = lax.dot_general(xb, c, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    o_ref[:] += acc

    @pl.when(j == n_jsteps - 1)
    def _():
        o_ref[:] = o_ref[:] * s_ref[:] + sumx_ref[:] * m_ref[:]


@functools.partial(jax.jit, static_argnames=("bits", "tile_n", "block_k",
                                             "interpret"))
def xs_matmul(x, words, srow, mrow, bits, tile_n=512, block_k=0,
              interpret=False):
    B, K_pad = x.shape
    N = words.shape[0]
    TK = lk.tile_k_for(bits)
    W = TK * bits // 32
    n_ktiles = words.shape[1] // W
    assert K_pad == n_ktiles * TK
    if block_k == 0:
        block_k = n_ktiles if n_ktiles * TK <= 4096 else 1
    n_jsteps = n_ktiles // block_k
    sumx = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    return pl.pallas_call(
        functools.partial(_xs_kernel, bits=bits, tile_k=TK,
                          n_jsteps=n_jsteps, block_k=block_k),
        grid=(N // tile_n, n_jsteps),
        in_specs=[pl.BlockSpec((B, block_k * TK), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((B, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tile_n), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tile_n), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tile_n, block_k * W), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, tile_n), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), sumx, srow.astype(jnp.float32)[None, :],
      mrow.astype(jnp.float32)[None, :], words)


def _mk(shape_name, B, bits=2):
    d, f = 4096, 14336
    shapes = {"qkv": (6144, d), "o": (d, d), "gate_up": (2 * f, d),
              "down": (d, f)}
    N, K = shapes[shape_name]
    TK = lk.tile_k_for(bits)
    K_pad = ((K + TK - 1) // TK) * TK
    Wt = K_pad * bits // 32
    key = jax.random.PRNGKey(0)
    words = jax.random.randint(key, (N, Wt), -2**31, 2**31 - 1, jnp.int32)
    srow = jnp.ones((N,), jnp.float32) * 0.01
    mrow = jnp.zeros((N,), jnp.float32)
    x = jax.random.normal(key, (B, K_pad), jnp.float32)
    return x, words, srow, mrow, K_pad


if sys.argv[1] == "cpu":
    bits = 2
    N, K = 512, 4096
    TK = lk.tile_k_for(bits)
    key = jax.random.PRNGKey(1)
    codes = np.asarray(jax.random.randint(key, (N, K), 0, 4, jnp.int32),
                       np.uint8)
    words = jnp.asarray(lk.pack_lane_tiled(codes, bits))
    srow = jnp.asarray(np.random.RandomState(0).rand(N).astype(np.float32))
    mrow = jnp.asarray(np.random.RandomState(1).randn(N).astype(np.float32))
    x = jnp.asarray(np.random.RandomState(2).randn(1, K).astype(np.float32))
    wdense = (np.asarray(mrow)[:, None]
              + np.asarray(srow)[:, None] * codes.astype(np.float32))
    y_ref = jnp.asarray(
        np.asarray(x, np.float32).astype(np.float32) @ wdense.T)
    y_xs = xs_matmul(x, words, srow, mrow, bits, tile_n=256, block_k=1,
                     interpret=True)
    err = float(jnp.max(jnp.abs(y_ref - y_xs)))
    print("interpret max err vs affine kernel:", err)
    assert err < 1e-3
    y_xs2 = xs_matmul(x, words, srow, mrow, bits, tile_n=256, block_k=2,
                      interpret=True)
    print("block_k=2 max err:", float(jnp.max(jnp.abs(y_ref - y_xs2))))
    sys.exit(0)

shape_name, tile_n, block_k = sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
B = int(sys.argv[5]) if len(sys.argv) > 5 else 1
x, words, srow, mrow, K_pad = _mk(shape_name, B)


def run(n_iter, x0):
    def body(i, acc):
        y = xs_matmul(acc, words, srow, mrow, 2, tile_n=tile_n,
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
print(f"xslice {shape_name} B={B} tile_n={tile_n} block_k={block_k}: "
      f"{best*1e6:.1f} us", flush=True)
