"""Sweep (tile_n, block_k) for the affine code-dot kernel at the 8B decode
shapes. One (shape, config) per invocation (axon rule: risky variants in
separate short processes). Timing: in-jit fori_loop with a threaded data
dependency, iteration-count delta.

Usage: affine_tune.py SHAPE TILE_N BLOCK_K [BATCH]
  SHAPE in {qkv, o, gate_up, down}  (8B geometry)
"""
import sys, time
import numpy as np
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from guidedquant_tpu.ops import lut_kernels

shape_name = sys.argv[1]
tile_n = int(sys.argv[2])
block_k = int(sys.argv[3])
B = int(sys.argv[4]) if len(sys.argv) > 4 else 1

d, f = 4096, 14336
shapes = {"qkv": (6144, d), "o": (d, d), "gate_up": (2 * f, d),
          "down": (d, f), "down7": (d, f)}
N, K = shapes[shape_name]
bits = 2
TK = lut_kernels.tile_k_for(bits)
K_pad = ((K + TK - 1) // TK) * TK
if shape_name == "down":  # down7 = unpadded 7 tiles
    K_pad = 8 * TK  # engine pads 7 -> 8 tiles (prime tile count)
W = K_pad * bits // 32
key = jax.random.PRNGKey(0)
words = jax.random.randint(key, (N, W), -2**31, 2**31 - 1, jnp.int32)
srow = jnp.ones((N,), jnp.float32) * 0.01
mrow = jnp.zeros((N,), jnp.float32)
x = jax.random.normal(key, (B, K_pad), jnp.float32)

n_ktiles = K_pad // TK
if N % tile_n or n_ktiles % block_k:
    print(f"{shape_name} tile_n={tile_n} block_k={block_k}: skip (indivisible)")
    sys.exit(0)
# decoded-tile VMEM guard (bf16): keep under ~4 MB
if tile_n * block_k * TK * 2 > 4 * 2**20:
    print(f"{shape_name} tile_n={tile_n} block_k={block_k}: skip (VMEM)")
    sys.exit(0)


def run(n_iter, x0):
    def body(i, acc):
        y = lut_kernels.lut_matmul_affine(acc, words, srow, mrow, bits,
                                          tile_n=tile_n, block_k=block_k)
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
print(f"{shape_name} [{N}x{K}] B={B} tile_n={tile_n} block_k={block_k}: "
      f"{best*1e6:.1f} us", flush=True)
