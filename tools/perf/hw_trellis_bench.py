"""HW timing: trellis kernel (2mad / tpu2u) vs dense bf16 GEMV at 4096^2."""
import numpy as np, time, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
SEL = sys.argv[1] if len(sys.argv) > 1 else "all" 
from guidedquant_tpu.ops import trellis_kernel as tk

rng = np.random.default_rng(0)
N = 4096
words = rng.integers(-2**31, 2**31-1, size=(N//16, N), dtype=np.int64).astype(np.int32)
wj = jnp.asarray(words)
Wd = jnp.asarray(rng.normal(size=(N, N)), jnp.bfloat16)

def null_overhead():
    f = jax.jit(lambda a: a + 1); z = jnp.zeros((8,128))
    np.asarray(f(z)); best = 1e9
    for _ in range(5):
        t0=time.perf_counter(); np.asarray(f(z)); best=min(best, time.perf_counter()-t0)
    return best

def timeit(f, *a, iters=50):
    # loop inside jit with data dependency
    import functools
    @jax.jit
    def loop(x0, *rest):
        def body(i, x):
            y = f(x, *rest)
            # thread dependency: fold y back into x's first elements
            return x.at[0, :1].add(y[0, :1] * 1e-20)
        return jax.lax.fori_loop(0, iters, body, x0)[0, :8]
    x0 = jnp.asarray(rng.normal(size=(1, N)), jnp.bfloat16)
    np.asarray(loop(x0, *a))
    ov = null_overhead()
    best = 1e9
    for _ in range(4):
        t0=time.perf_counter(); np.asarray(loop(x0, *a)); best=min(best, time.perf_counter()-t0)
    return (best - ov) / iters

if SEL in ("all", "dense"):
    t_dense = timeit(lambda x, W: jnp.dot(x, W.T, preferred_element_type=jnp.float32).astype(jnp.bfloat16), Wd)
    print("dense bf16 GEMV: %.1f us" % (t_dense*1e6), flush=True)
for mode in ("tpu2u", "2mad"):
    if SEL not in ("all", mode):
        continue
    t = timeit(lambda x, w: tk.trellis_matmul(x, w, mode).astype(jnp.bfloat16), wj)
    print("trellis %s GEMV: %.1f us" % (mode, t*1e6), flush=True)
if SEL in ("all", "2madcheck"):
    from guidedquant_tpu.solvers.qtip.codebook import BitshiftCodebook
    cb = BitshiftCodebook(L=16, K=2, V=1, decode_mode="2mad")
    small = wj[:16, :512]
    d = np.asarray(tk.trellis_dequant(small, "2mad", cycle=256, dtype=jnp.float32))
    ref = tk.decode_kwords_dense_np(cb, np.asarray(small), 256, 512)
    print("2mad dequant max err:", np.abs(d - ref).max())
