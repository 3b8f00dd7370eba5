"""VPU elementwise pass-throughput by dtype on the real chip.

The 2-bit decode kernel is VPU pass-count bound (PERF_NOTES.md); if the VPU
retires bf16/int16/int8 lanes at >1 element/lane/cycle, moving decode
arithmetic to a narrower dtype cuts the pass bill. This measures a
64-deep dependent elementwise chain per dtype.

Timing per CLAUDE.md rule 1: in-jit fori_loop threading a data dependency,
np.asarray sync, subtract measured null-call overhead.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 4096
ITERS = 64


def measure(fn, *args):
    out = np.asarray(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def null_overhead():
    f = jax.jit(lambda a: a + 1)
    z = jnp.zeros((8, 128))
    np.asarray(f(z))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(z))
        best = min(best, time.perf_counter() - t0)
    return best


def chain_float(dtype):
    @jax.jit
    def f(x):
        def body(i, x):
            return x * jnp.asarray(1.0001, dtype) + jnp.asarray(1e-6, dtype)
        return jax.lax.fori_loop(0, ITERS, body, x)[0, :8]
    return f, (jnp.ones((N, N), dtype),)


def chain_int(dtype):
    @jax.jit
    def f(x):
        def body(i, x):
            return (x ^ jnp.asarray(i, dtype)) + jnp.asarray(1, dtype)
        return jax.lax.fori_loop(0, ITERS, body, x)[0, :8]
    return f, (jnp.ones((N, N), dtype),)


def chain_shift(dtype):
    """shift+mask chain (the decode inner ops)."""
    @jax.jit
    def f(x):
        def body(i, x):
            return ((x >> jnp.asarray(1, dtype)) & jnp.asarray(3, dtype)) + x
        return jax.lax.fori_loop(0, ITERS, body, x)[0, :8]
    return f, (jnp.ones((N, N), dtype),)


def main():
    import sys, os
    sel = sys.argv[1] if len(sys.argv) > 1 else None
    print("backend:", jax.default_backend(), flush=True)
    ov = null_overhead()
    print(f"null-call overhead: {ov*1e3:.2f} ms")
    elems = N * N * ITERS
    rows = []
    for name, mk, dt in [
        ("f32 fma", chain_float, jnp.float32),
        ("bf16 fma", chain_float, jnp.bfloat16),
        ("f16 fma", chain_float, jnp.float16),
        ("i32 xor+add", chain_int, jnp.int32),
        ("i16 xor+add", chain_int, jnp.int16),
        ("i8 xor+add", chain_int, jnp.int8),
        ("i32 shift+and+add", chain_shift, jnp.int32),
        ("i16 shift+and+add", chain_shift, jnp.int16),
        ("u8 shift+and+add", chain_shift, jnp.uint8),
    ]:
        if sel and sel not in name:
            continue
        try:
            f, args = mk(dt)
            t, _ = measure(f, *args)
            t -= ov
            rows.append((name, t / ITERS * 1e6, elems / t / 1e12))
            print(f"{name}: {t/ITERS*1e6:.2f} us/pass", flush=True)
        except Exception as e:  # noqa: BLE001
            rows.append((name, float("nan"), 0.0))
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}")
    print(f"{'case':<22}{'us/pass':>10}{'Telem/s':>10}")
    for name, us, tes in rows:
        print(f"{name:<22}{us:>10.2f}{tes:>10.2f}")


if __name__ == "__main__":
    main()
