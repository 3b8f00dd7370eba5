"""Prototype: power-basis LUT-GEMV ("pdot") vs the existing kernels.

Idea: y_n = sum_k L_n[c_nk] x_k with L_n an arbitrary per-row codebook.
Write L_n[c] = sum_j coef_{n,j} c^j (exact interpolating polynomial). Then

    y_n = sum_j coef_{n,j} * (P_j x)_n,   P_j = elementwise c^j

The kernel builds the power matrices c^j with cheap bf16 VPU passes
(c, c*c, c2*c — integer-valued, exact in bf16 for c < 2^8) and runs one
MXU dot per power; the per-row coefficient combine moves to an O(N)
epilogue OUTSIDE the kernel. This removes the per-row broadcast-FMA
passes (the expensive part of the exact kernel) and the shared-shape
family restriction, at the cost of (2^b - 1) dots (MXU is idle at GEMV
batch sizes).

Usage:
  python tools/perf/pdot_proto.py cpu      # interpret-mode correctness
  python tools/perf/pdot_proto.py hw2      # HW: 2-bit pdot correctness+timing
  python tools/perf/pdot_proto.py hw3      # HW: 3-bit pdot
  python tools/perf/pdot_proto.py base     # HW: existing exact/shared timing
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

sys.path.insert(0, __file__.rsplit("/", 3)[0])
from guidedquant_tpu.ops import lut_kernels as lk  # noqa: E402

LANE_WORDS = 128


def tile_k_for(bits):
    # 3-bit: 10 codes per word (30 bits used, 2 wasted)
    per_word = 32 // bits if bits != 3 else 10
    return LANE_WORDS * per_word


def pack_lane_tiled_gen(codes, bits):
    """codes [N, K] -> [N, K/per_word] int32 lane-tiled (3-bit: 10/word)."""
    per_word = 32 // bits if bits != 3 else 10
    TK = tile_k_for(bits)
    N, K = codes.shape
    assert K % TK == 0
    n_tiles = K // TK
    c = codes.reshape(N, n_tiles, per_word, LANE_WORDS).astype(np.uint32)
    shifts = (np.arange(per_word, dtype=np.uint32) * bits)[None, None, :, None]
    words = (c << shifts).sum(axis=2, dtype=np.uint32)
    return words.reshape(N, n_tiles * LANE_WORDS).view(np.int32)


def _basis_mats(codes, bits):
    """codes [TN, TK] int32 -> list of 2^bits - 1 bf16 basis matrices
    (excluding the constant-1 basis, handled via sum(x) outside).

    All basis values are integers <= 27, exact in bf16:
      bits 1/2: powers of c (c^3 <= 27)
      bits 3:   c = 4*b2 + lo -> {lo^j} x {1, b2}
      bits 4:   c = 4*hi + lo -> {lo^j} x {hi^i}
    """
    if bits <= 2:
        c = codes.astype(jnp.bfloat16)
        mats, p = [], c
        for _ in range(1, 2 ** bits):
            mats.append(p)
            p = p * c
        return mats
    lo = (codes & 3).astype(jnp.bfloat16)
    hi = lax.shift_right_logical(codes, 2).astype(jnp.bfloat16)
    los = [None, lo, lo * lo, lo * lo * lo]
    his = [None, hi] if bits == 3 else [None, hi, hi * hi, hi * hi * hi]
    mats = los[1:]
    for h in his[1:]:
        mats.append(h)
        for l in los[1:]:
            mats.append(h * l)
    return mats


def basis_matrix_np(bits):
    """[C, C] basis-evaluation matrix B with B[c, j] = basis_j(c), computed
    with the EXACT bf16 rounding sequence the kernel uses (so the
    coefficient solve absorbs any bf16 product rounding, e.g. hi^3*lo^3=729
    which exceeds bf16's 8-bit mantissa)."""
    def bf(x):
        return np.asarray(jnp.asarray(x, jnp.bfloat16), np.float64)

    C = 2 ** bits
    cv = np.arange(C, dtype=np.float64)
    if bits <= 2:
        cols, p = [np.ones(C)], bf(cv)
        for _ in range(1, C):
            cols.append(p)
            p = bf(p * bf(cv))
        return np.stack(cols, axis=1)
    lo, hi = bf(cv % 4), bf(cv // 4)
    los = [None, lo, bf(lo * lo), bf(bf(lo * lo) * lo)]
    his = [None, hi] if bits == 3 else [None, hi, bf(hi * hi),
                                        bf(bf(hi * hi) * hi)]
    cols = [np.ones(C)] + los[1:]
    for h in his[1:]:
        cols.append(h)
        for l in los[1:]:
            cols.append(bf(h * l))
    return np.stack(cols, axis=1)


def _pdot_kernel(x_ref, w_ref, *o_refs, bits, tile_k):
    j = pl.program_id(1)
    per_word = 32 // bits if bits != 3 else 10
    words = w_ref[:]
    tiled = jnp.tile(words, (1, per_word))
    shift = (lax.broadcasted_iota(jnp.int32, (1, tile_k), 1)
             // LANE_WORDS) * bits
    codes = lax.shift_right_logical(tiled, jnp.broadcast_to(shift, tiled.shape))
    codes = codes & ((1 << bits) - 1)
    x = x_ref[:]
    for o, p in zip(o_refs, _basis_mats(codes, bits)):
        @pl.when(j == 0)
        def _():
            o[:] = jnp.zeros_like(o)

        o[:] += lax.dot_general(x, p, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("bits", "tile_n", "interpret"))
def pdot_matmul(x, words, coef, bits, tile_n=256, interpret=False):
    """y[B, N] = x @ decode(words)^T; coef [N, 2^bits] monomial coefficients."""
    B, K_pad = x.shape
    N = words.shape[0]
    TK = tile_k_for(bits)
    n_ktiles = words.shape[1] // LANE_WORDS
    assert K_pad == n_ktiles * TK
    C = 2 ** bits
    outs = pl.pallas_call(
        functools.partial(_pdot_kernel, bits=bits, tile_k=TK),
        grid=(N // tile_n, n_ktiles),
        in_specs=[
            pl.BlockSpec((B, TK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, LANE_WORDS), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((B, tile_n), lambda i, j: (0, i),
                                memory_space=pltpu.VMEM)] * (C - 1),
        out_shape=[jax.ShapeDtypeStruct((B, N), jnp.float32)] * (C - 1),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), words)
    sumx = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)  # [B, 1]
    y = sumx * coef[None, :, 0]
    for jj in range(1, C):
        y = y + outs[jj - 1] * coef[None, :, jj]
    return y


def _pdot_cat_kernel(x_ref, w_ref, o_ref, *, bits, tile_k):
    """Single-dot variant: basis matrices concatenated on the sublane axis;
    o_ref [B, (C-1)*tile_n]."""
    j = pl.program_id(1)
    per_word = 32 // bits if bits != 3 else 10
    words = w_ref[:]
    tiled = jnp.tile(words, (1, per_word))
    shift = (lax.broadcasted_iota(jnp.int32, (1, tile_k), 1)
             // LANE_WORDS) * bits
    codes = lax.shift_right_logical(tiled, jnp.broadcast_to(shift, tiled.shape))
    codes = codes & ((1 << bits) - 1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    P = jnp.concatenate(_basis_mats(codes, bits), axis=0)
    o_ref[:] += lax.dot_general(x_ref[:], P, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("bits", "tile_n", "interpret"))
def pdot_cat_matmul(x, words, coef, bits, tile_n=256, interpret=False):
    B, K_pad = x.shape
    N = words.shape[0]
    TK = tile_k_for(bits)
    n_ktiles = words.shape[1] // LANE_WORDS
    assert K_pad == n_ktiles * TK
    C = 2 ** bits
    out = pl.pallas_call(
        functools.partial(_pdot_cat_kernel, bits=bits, tile_k=TK),
        grid=(N // tile_n, n_ktiles),
        in_specs=[
            pl.BlockSpec((B, TK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, LANE_WORDS), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, (C - 1) * tile_n), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, (C - 1) * N), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), words)
    # out[:, i*(C-1)*tn : ...] = [D_1 tile_i | ... | D_{C-1} tile_i]
    D = out.reshape(B, N // tile_n, C - 1, tile_n)
    sumx = jnp.sum(x.astype(jnp.float32), axis=1)[:, None]  # [B, 1]
    cf = coef.reshape(N // tile_n, tile_n, C)
    y = jnp.einsum("btjn,tnj->btn", D, cf[:, :, 1:]).reshape(B, N)
    return y + sumx * coef[None, :, 0]


def _v2_kernel(x_ref, w_ref, coef_ref, o_ref, *, bits, tile_k,
               bf16_horner, shl_extract):
    """v1 exact kernel + optional bf16 Horner / 2-shift extraction."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    per_word = 32 // bits
    words = w_ref[:]
    tiled = jnp.tile(words, (1, per_word))
    if shl_extract:
        # shift code to the top bits, then one fixed logical shift down:
        # saves the mask pass
        sh = (32 - bits) - (lax.broadcasted_iota(jnp.int32, (1, tile_k), 1)
                            // LANE_WORDS) * bits
        up = lax.shift_left(tiled, jnp.broadcast_to(sh, tiled.shape))
        codes = lax.shift_right_logical(up, 32 - bits)
    else:
        shift = (lax.broadcasted_iota(jnp.int32, (1, tile_k), 1)
                 // LANE_WORDS) * bits
        codes = lax.shift_right_logical(
            tiled, jnp.broadcast_to(shift, tiled.shape))
        codes = codes & ((1 << bits) - 1)
    C = 2 ** bits
    if bf16_horner:
        cf = codes.astype(jnp.bfloat16)
        w = jnp.broadcast_to(coef_ref[:, C - 1][:, None].astype(jnp.bfloat16),
                             cf.shape)
        for i in range(C - 2, -1, -1):
            w = w * cf + coef_ref[:, i][:, None].astype(jnp.bfloat16)
    else:
        cf = codes.astype(jnp.float32)
        w = jnp.broadcast_to(coef_ref[:, C - 1][:, None], cf.shape)
        for i in range(C - 2, -1, -1):
            w = w * cf + coef_ref[:, i][:, None]
        w = w.astype(jnp.bfloat16)
    o_ref[:] += lax.dot_general(x_ref[:], w.astype(jnp.bfloat16),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("bits", "tile_n", "bf16_horner",
                                             "shl_extract", "interpret"))
def v2_matmul(x, words, coef, bits, tile_n=256, bf16_horner=True,
              shl_extract=False, interpret=False):
    B, K_pad = x.shape
    N = words.shape[0]
    TK = tile_k_for(bits)
    n_ktiles = words.shape[1] // LANE_WORDS
    C = 2 ** bits
    return pl.pallas_call(
        functools.partial(_v2_kernel, bits=bits, tile_k=TK,
                          bf16_horner=bf16_horner, shl_extract=shl_extract),
        grid=(N // tile_n, n_ktiles),
        in_specs=[
            pl.BlockSpec((B, TK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, LANE_WORDS), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, C), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tile_n), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), words, coef.astype(jnp.float32))


def _v3_kernel(x_ref, w_ref, coef_ref, o_ref, *, bits, tile_k, splits):
    """v1 + k-splits inside the body: dot(chunk i) is independent of
    decode(chunk i+1), letting the VLIW scheduler overlap MXU and VPU."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    per_word = 32 // bits
    C = 2 ** bits
    ck = tile_k // splits  # == tile_k_for(bits); W == LANE_WORDS per chunk
    acc = None
    for s in range(splits):
        words = w_ref[:, s * LANE_WORDS:(s + 1) * LANE_WORDS]
        tiled = jnp.tile(words, (1, per_word))
        shift = (lax.broadcasted_iota(jnp.int32, (1, ck), 1)
                 // LANE_WORDS) * bits
        codes = lax.shift_right_logical(
            tiled, jnp.broadcast_to(shift, tiled.shape))
        codes = codes & ((1 << bits) - 1)
        cf = codes.astype(jnp.float32)
        w = jnp.broadcast_to(coef_ref[:, C - 1][:, None], cf.shape)
        for i in range(C - 2, -1, -1):
            w = w * cf + coef_ref[:, i][:, None]
        d = lax.dot_general(x_ref[:, s * ck:(s + 1) * ck],
                            w.astype(jnp.bfloat16),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    o_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("bits", "tile_n", "splits",
                                             "interpret"))
def v3_matmul(x, words, coef, bits, tile_n=256, splits=2, interpret=False):
    """Standard lane-tiled packing; each grid cell processes ``splits``
    consecutive k-tiles with interleaved decode/dot chains (ILP)."""
    B, K_pad = x.shape
    N = words.shape[0]
    TK = tile_k_for(bits) * splits
    n_ktiles = words.shape[1] // (LANE_WORDS * splits)
    C = 2 ** bits
    return pl.pallas_call(
        functools.partial(_v3_kernel, bits=bits, tile_k=TK, splits=splits),
        grid=(N // tile_n, n_ktiles),
        in_specs=[
            pl.BlockSpec((B, TK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, LANE_WORDS * splits), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, C), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tile_n), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), words, coef.astype(jnp.float32))


def poly_coef(lut, bits):
    """[N, 2^b] lut -> basis coefficients (f64 solve vs basis_matrix_np)."""
    B = basis_matrix_np(bits)
    return np.linalg.solve(B, np.asarray(lut, np.float64).T).T.astype(
        np.float32)


def make_problem(bits, N=4096, K=4096, B=1, seed=0):
    rng = np.random.default_rng(seed)
    C = 2 ** bits
    codes = rng.integers(0, C, size=(N, K), dtype=np.uint8)
    TK = tile_k_for(bits)
    K_pad = ((K + TK - 1) // TK) * TK
    if K_pad != K:
        codes = np.concatenate(
            [codes, np.zeros((N, K_pad - K), np.uint8)], axis=1)
    lut = np.sort(rng.normal(size=(N, C)).astype(np.float32), axis=1)
    words = pack_lane_tiled_gen(codes, bits)
    coef = poly_coef(lut, bits)
    x = rng.normal(size=(B, K_pad)).astype(np.float32)
    W = np.take_along_axis(lut, codes[:, :K].astype(np.int64), axis=1) \
        if False else lut[np.arange(N)[:, None], codes]
    y_ref = x[:, :W.shape[1]] @ W.T
    return codes, words, coef, lut, x, y_ref


def check(bits, interpret):
    codes, words, coef, lut, x, y_ref = make_problem(bits, N=512, K=2 * tile_k_for(bits), B=3)
    y = np.asarray(pdot_matmul(jnp.asarray(x), jnp.asarray(words),
                               jnp.asarray(coef), bits, interpret=interpret))
    err = np.abs(y - y_ref).max() / np.abs(y_ref).max()
    print(f"pdot {bits}-bit rel err: {err:.5f}", flush=True)
    assert err < 3e-2, err
    y2 = np.asarray(pdot_cat_matmul(jnp.asarray(x), jnp.asarray(words),
                                    jnp.asarray(coef), bits,
                                    interpret=interpret))
    err2 = np.abs(y2 - y_ref).max() / np.abs(y_ref).max()
    print(f"pdot-cat {bits}-bit rel err: {err2:.5f}", flush=True)
    assert err2 < 3e-2, err2
    if bits in (1, 2):
        mono = np.linalg.solve(
            np.vander(np.arange(2 ** bits, dtype=np.float64), 2 ** bits,
                      increasing=True),
            lut.astype(np.float64).T).T.astype(np.float32)
        for bh in (False, True):
            for se in (False, True):
                y3 = np.asarray(v2_matmul(
                    jnp.asarray(x), jnp.asarray(words), jnp.asarray(mono),
                    bits, bf16_horner=bh, shl_extract=se,
                    interpret=interpret))
                err3 = np.abs(y3 - y_ref).max() / np.abs(y_ref).max()
                print(f"v2 {bits}-bit bf16={bh} shl={se} rel err: "
                      f"{err3:.5f}", flush=True)
                assert err3 < 3e-2, err3
    # decode-value accuracy: bf16 basis values + f32 coef combine vs true lut
    Bm = np.asarray(jnp.asarray(basis_matrix_np(bits), jnp.bfloat16),
                    np.float64)  # [C, C] as the kernel computes them
    approx = Bm @ coef.astype(np.float64).T  # [C, N]
    derr = np.abs(approx.T - lut).max() / np.abs(lut).max()
    print(f"  decode-value max rel err vs lut: {derr:.2e}", flush=True)


def null_overhead():
    f = jax.jit(lambda a: a + 1)
    z = jnp.zeros((8, 128))
    np.asarray(f(z))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(z))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(fn, x0, *args, iters=50):
    @jax.jit
    def loop(x0, *rest):
        def body(i, x):
            y = fn(x, *rest)
            return x.at[0, :1].add(y[0, :1].astype(x.dtype) * 1e-20)
        return jax.lax.fori_loop(0, iters, body, x0)[0, :8]
    np.asarray(loop(x0, *args))
    ov = null_overhead()
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(loop(x0, *args))
        best = min(best, time.perf_counter() - t0)
    return (best - ov) / iters


def hw(bits):
    codes, words, coef, lut, x, y_ref = make_problem(bits, N=4096, K=4096)
    y = np.asarray(pdot_cat_matmul(jnp.asarray(x), jnp.asarray(words),
                                   jnp.asarray(coef), bits))
    err = np.abs(y - y_ref).max() / np.abs(y_ref).max()
    print(f"HW pdot-cat {bits}-bit rel err: {err:.5f}", flush=True)
    xj = jnp.asarray(x, jnp.bfloat16)
    t = timeit(lambda x, w, c: pdot_cat_matmul(x, w, c, bits)
               .astype(jnp.bfloat16), xj, jnp.asarray(words),
               jnp.asarray(coef))
    print(f"HW pdot-cat {bits}-bit GEMV: {t*1e6:.1f} us", flush=True)


def base():
    rng = np.random.default_rng(0)
    N = K = 4096
    bits = 2
    codes = rng.integers(0, 4, size=(N, K), dtype=np.uint8)
    lut = np.sort(rng.normal(size=(N, 4)).astype(np.float32), axis=1)
    words = lk.pack_lane_tiled(codes, bits)
    coef = lk.lut_to_poly(lut, bits)
    xj = jnp.asarray(rng.normal(size=(1, K)), jnp.bfloat16)
    t = timeit(lambda x, w, c: lk.lut_matmul_tiled(x, w, c, bits)
               .astype(jnp.bfloat16), xj, jnp.asarray(words),
               jnp.asarray(coef))
    print(f"HW exact v1 2-bit GEMV: {t*1e6:.1f} us", flush=True)
    Wd = jnp.asarray(rng.normal(size=(N, K)), jnp.bfloat16)
    t = timeit(lambda x, W: jnp.dot(x, W.T, preferred_element_type=jnp.float32)
               .astype(jnp.bfloat16), xj, Wd)
    print(f"HW dense bf16 GEMV: {t*1e6:.1f} us", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    if mode == "cpu":
        for b in (1, 2, 3, 4):
            check(b, interpret=True)
        print("CPU interpret OK")
    elif mode == "hw2":
        hw(2)
    elif mode == "int4":
        x = jnp.asarray(np.arange(-8, 8), jnp.int8)
        try:
            q = jax.jit(lambda a: a.astype(jnp.int4))(x)
            print("int4 convert ok:", np.asarray(q.astype(jnp.int8)))
            a = jnp.asarray(np.random.default_rng(0).integers(
                -8, 8, (256, 256)), jnp.int4)
            b = jnp.asarray(np.random.default_rng(1).integers(
                -8, 8, (256, 256)), jnp.int4)
            y = jax.jit(lambda a, b: lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32))(a, b)
            print("int4 matmul ok:", np.asarray(y)[:2, :2])
        except Exception as e:
            print("int4 FAILED:", type(e).__name__, str(e)[:200])
    elif mode == "hwv3":
        rng = np.random.default_rng(0)
        N = K = 4096
        codes = rng.integers(0, 4, size=(N, K), dtype=np.uint8)
        lut = np.sort(rng.normal(size=(N, 4)).astype(np.float32), axis=1)
        words = lk.pack_lane_tiled(codes, 2)
        mono = np.linalg.solve(
            np.vander(np.arange(4, dtype=np.float64), 4, increasing=True),
            lut.astype(np.float64).T).T.astype(np.float32)
        W = lut[np.arange(N)[:, None], codes]
        x = rng.normal(size=(1, K)).astype(np.float32)
        y_ref = x @ W.T
        xj = jnp.asarray(x, jnp.bfloat16)
        for splits in (2, 1):
            y = np.asarray(v3_matmul(jnp.asarray(x), jnp.asarray(words),
                                     jnp.asarray(mono), 2, splits=splits))
            err = np.abs(y - y_ref).max() / np.abs(y_ref).max()
            t = timeit(lambda x, w, c: v3_matmul(
                x, w, c, 2, splits=splits).astype(jnp.bfloat16),
                xj, jnp.asarray(words), jnp.asarray(mono))
            print(f"HW v3 splits={splits}: {t*1e6:.1f} us (err {err:.5f})",
                  flush=True)
    elif mode == "hwv2":
        rng = np.random.default_rng(0)
        N = K = 4096
        codes = rng.integers(0, 4, size=(N, K), dtype=np.uint8)
        lut = np.sort(rng.normal(size=(N, 4)).astype(np.float32), axis=1)
        words = lk.pack_lane_tiled(codes, 2)
        mono = np.linalg.solve(
            np.vander(np.arange(4, dtype=np.float64), 4, increasing=True),
            lut.astype(np.float64).T).T.astype(np.float32)
        W = lut[np.arange(N)[:, None], codes]
        x = rng.normal(size=(1, K)).astype(np.float32)
        y_ref = x @ W.T
        xj = jnp.asarray(x, jnp.bfloat16)
        for bh in (True, False):
            for se in (True, False):
                y = np.asarray(v2_matmul(jnp.asarray(x), jnp.asarray(words),
                                         jnp.asarray(mono), 2,
                                         bf16_horner=bh, shl_extract=se))
                err = np.abs(y - y_ref).max() / np.abs(y_ref).max()
                t = timeit(lambda x, w, c: v2_matmul(
                    x, w, c, 2, bf16_horner=bh, shl_extract=se)
                    .astype(jnp.bfloat16), xj, jnp.asarray(words),
                    jnp.asarray(mono))
                print(f"HW v2 bf16={bh} shl={se}: {t*1e6:.1f} us "
                      f"(err {err:.5f})", flush=True)
    elif mode == "hw3":
        hw(3)
    elif mode == "hw4":
        hw(4)
    elif mode == "base":
        base()
