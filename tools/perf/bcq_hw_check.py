"""BCQ fused kernel: hardware correctness + timing vs dequant path."""
import sys, time
import numpy as np
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from guidedquant_tpu.ops.bcq import (bcq_fit, bcq_pack_signs,
                                     bcq_kernel_operands, bcq_dequant)
from guidedquant_tpu.ops.lut_kernels import bcq_matmul, tile_k_for

rng = np.random.default_rng(0)
N, K, Bp = 4096, 4096, 3
W = rng.normal(size=(N, K)).astype(np.float32) * 0.02
alpha, signs, bias = bcq_fit(W, Bp, iters=1)
packed = bcq_pack_signs(signs)
words, K_pad = bcq_kernel_operands(packed, K)
x = rng.normal(size=(1, K_pad)).astype(np.float32)

y = np.asarray(bcq_matmul(jnp.asarray(x), jnp.asarray(words),
                          jnp.asarray(alpha), jnp.asarray(bias)))
dense = np.asarray(bcq_dequant(jnp.asarray(alpha), jnp.asarray(packed),
                               jnp.asarray(bias), K))
ref = x[:, :K] @ dense.T
scale = np.abs(ref).max() + 1e-6
err = np.abs(y / scale - ref / scale).max()
print(f"HW correctness: max scaled err {err:.5f}", flush=True)
assert err < 2e-2

# timing (in-jit loop, threaded dependency)
wd = jnp.asarray(words); al = jnp.asarray(alpha); bi = jnp.asarray(bias)
xj = jnp.asarray(x)

def run(n_iter, x0):
    def body(i, acc):
        yy = bcq_matmul(acc, wd, al, bi)
        return xj + jnp.pad(yy[:, :1], ((0, 0), (0, K_pad - 1))) * 1e-9
    return jax.lax.fori_loop(0, n_iter, body, x0)

g = jax.jit(run, static_argnums=0)
np.asarray(g(2, xj))
n1, n2 = 300, 1500
best = 1e9
for _ in range(3):
    t0 = time.perf_counter(); np.asarray(g(n1, xj))
    t1 = time.perf_counter(); np.asarray(g(n2, xj))
    t2 = time.perf_counter()
    best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
print(f"bcq {Bp}-plane [{N}x{K}]: {best*1e6:.1f} us "
      f"(bf16 dense same shape ~46 us)", flush=True)
