"""8B-geometry decode-step breakdown on the real chip.

1) Full 2-bit step vs truncated-depth steps -> per-layer cost + fixed cost.
2) Per-module affine-kernel microbench at the four 8B shapes (in-jit
   fori_loop with a threaded data dependency; tunnel-safe timing).
"""
import sys, time
import numpy as np
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from guidedquant_tpu.models import get_config
from guidedquant_tpu.serve import engine

sys.path.insert(0, '/root/repo')
import importlib
bench = importlib.import_module("bench")

MODE = sys.argv[1] if len(sys.argv) > 1 else "all"
cfg = get_config("llama-3.1-8b").replace(max_seq_len=1024)


def null_overhead():
    f = jax.jit(lambda a: a + 1); z = jnp.zeros((8, 128))
    np.asarray(f(z)); best = 1e9
    for _ in range(5):
        t0 = time.perf_counter(); np.asarray(f(z))
        best = min(best, time.perf_counter() - t0)
    return best


def step_time(params, cfg2, n_tokens=48, reps=3):
    state = engine.init_state(cfg2, cfg2.num_layers, 1, 640)
    tok = jnp.zeros((1,), jnp.int32)
    _, tok2, _ = engine.decode_n_tokens(params, cfg2, tok, state, n_tokens)
    _ = np.asarray(tok2)
    ov = null_overhead()
    best = 1e9
    for _ in range(reps):
        st = engine.init_state(cfg2, cfg2.num_layers, 1, 640)
        t0 = time.perf_counter()
        _, tok2, st = engine.decode_n_tokens(params, cfg2, tok, st, n_tokens)
        _ = np.asarray(tok2)
        best = min(best, time.perf_counter() - t0)
    return (best - ov) / n_tokens


if MODE in ("all", "layers"):
    for L in (8, 16, 32):
        c = cfg.replace(num_layers=L)
        qp, cq = bench._build_quantized_device(c, bits=2)
        t = step_time(qp, cq)
        print(f"2bit L={L}: {t*1e6:.0f} us/step ({1.0/t:.1f} tok/s)",
              flush=True)
        del qp

if MODE in ("all", "kern"):
    # per-module kernel microbench (8B shapes), in-jit loop
    from guidedquant_tpu.ops import lut_kernels
    d, f = 4096, 14336
    shapes = {"qkv": (6144, d), "o": (d, d), "gate_up": (2 * f, d),
              "down": (d, f)}
    bits = 2
    TK = lut_kernels.tile_k_for(bits)
    for name, (N, K) in shapes.items():
        K_pad = ((K + TK - 1) // TK) * TK
        W = K_pad * bits // 32
        key = jax.random.PRNGKey(0)
        words = jax.random.randint(key, (N, W), -2**31, 2**31 - 1, jnp.int32)
        srow = jnp.ones((N,), jnp.float32) * 0.01
        mrow = jnp.zeros((N,), jnp.float32)
        x = jax.random.normal(key, (1, K_pad), jnp.float32)

        def run(n_iter, x0):
            def body(i, acc):
                # acc feeds the kernel -> real data dependency, no hoisting
                y = lut_kernels.lut_matmul_affine(acc, words, srow, mrow,
                                                  bits)
                return x + jnp.pad(y[:, :1], ((0, 0), (0, K_pad - 1))) * 1e-9
            return jax.lax.fori_loop(0, n_iter, body, x0)

        g = jax.jit(run, static_argnums=0)
        _ = np.asarray(g(2, x))
        # large iteration delta so kernel time >> per-call dispatch jitter
        n1, n2 = 300, 1500
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(g(n1, x))
            t1 = time.perf_counter()
            _ = np.asarray(g(n2, x))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
        print(f"kernel {name} [{N}x{K}]: {best*1e6:.1f} us", flush=True)

if MODE in ("all", "head"):
    # int8 head microbench
    from guidedquant_tpu.nn.linear import Int8Linear, apply_linear
    V, d = cfg.vocab_size, cfg.hidden_size
    key = jax.random.PRNGKey(1)
    head = Int8Linear(q=jax.random.randint(key, (V, d), -128, 128, jnp.int8),
                      scale=jnp.full((V,), 2e-4, jnp.float32),
                      out_features=V, in_features=d)
    x = jax.random.normal(key, (1, d), jnp.bfloat16)

    def run(n_iter, x0):
        def body(i, acc):
            y = apply_linear(head, acc)
            return x + y[:, :d].astype(x.dtype) * 1e-9
        return jax.lax.fori_loop(0, n_iter, body, x0)

    g = jax.jit(run, static_argnums=0)
    _ = np.asarray(g(2, x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); _ = np.asarray(g(100, x))
        t1 = time.perf_counter(); _ = np.asarray(g(200, x))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / 100)
    print(f"int8 head [{V}x{d}]: {best*1e6:.1f} us", flush=True)
