"""Affine (uniform per-row grid) codebook family: fit, kernel, LNQ solve.

The affine family L_n[c] = m_n + s_n * c is the cheapest TPU decode form:
the MXU consumes raw code values and the per-row affine lands in an O(N)
epilogue (no in-kernel LUT resolve at all). RTN / GPTQ / SpinQuant weights
are exactly in-family; LNQ can solve within it (codebook_family="affine").
Oracle pattern: kernel vs dequant+matmul (reference test strategy,
SURVEY.md §4)."""

import numpy as np  # noqa: F401  (see kernel GEMM test below)
import pytest

from guidedquant_tpu.ops import lut_kernels

import jax.numpy as jnp

from guidedquant_tpu.ops.lut_kernels import (
    fit_affine, pack_lane_tiled, lut_matmul_affine, lut_matmul_affine_flex,
    tile_k_for)


def _affine_luts(rng, N, C):
    s = (rng.random(N) + 0.5).astype(np.float32)
    m = (rng.normal(size=N) * 0.1).astype(np.float32)
    j = np.arange(C, dtype=np.float32)
    return m[:, None] + s[:, None] * j[None, :], s, m


def test_fit_affine_recovers_grid(rng):
    lut, s, m = _affine_luts(rng, 256, 4)
    sf, mf, relerr = fit_affine(lut)
    assert relerr < 1e-6
    np.testing.assert_allclose(sf, s, rtol=1e-5)
    np.testing.assert_allclose(mf, m, atol=1e-5)


def test_fit_affine_general_reports_error(rng):
    lut = rng.normal(size=(256, 4)).astype(np.float32)
    _, _, relerr = fit_affine(lut)
    assert relerr > 1e-3  # arbitrary luts are NOT in the family


@pytest.mark.parametrize("bits,B", [(1, 1), (2, 1), (2, 4), (4, 1),
                                    (3, 1), (3, 2), (5, 1), (6, 1), (7, 1),
                                    (8, 1), (2, 16)])
def test_affine_kernel_matches_oracle(bits, B, rng):
    from jax.experimental.pallas import tpu as pltpu
    TK = tile_k_for(bits)
    N, K = 256, TK
    C = 2 ** bits
    codes = rng.integers(0, C, size=(N, K), dtype=np.uint8)
    lut, s, m = _affine_luts(rng, N, C)
    x = rng.normal(size=(B, K)).astype(np.float32)
    packed = pack_lane_tiled(codes, bits)
    words = (tuple(jnp.asarray(p) for p in packed)
             if isinstance(packed, tuple) else jnp.asarray(packed))
    ref = x @ np.take_along_axis(lut, codes.astype(np.int64), 1).T
    with pltpu.force_tpu_interpret_mode():
        y = lut_matmul_affine(jnp.asarray(x), words, jnp.asarray(s),
                              jnp.asarray(m), bits, tile_n=128)
    scale = np.abs(ref).max() + 1e-6
    # wide grids accumulate bf16 code-value rounding; scale tolerance
    atol = 2e-2 if bits <= 4 else 4e-2
    np.testing.assert_allclose(np.asarray(y) / scale, ref / scale, atol=atol)


def test_affine_gemm_batch_tiled_matches_oracle(rng):
    """Prefill GEMM path (B > MAX_BATCH): batch grid axis + per-block weight
    streaming must match the dequant oracle, including batch padding."""
    from jax.experimental.pallas import tpu as pltpu
    bits = 2
    TK = tile_k_for(bits)
    N, K, B = 128, TK, 80  # B pads to 2 x tile_b=48? -> exercises pad+slice
    C = 2 ** bits
    codes = rng.integers(0, C, size=(N, K), dtype=np.uint8)
    lut, s, m = _affine_luts(rng, N, C)
    x = rng.normal(size=(B, K)).astype(np.float32)
    words = jnp.asarray(pack_lane_tiled(codes, bits))
    ref = x @ np.take_along_axis(lut, codes.astype(np.int64), 1).T
    with pltpu.force_tpu_interpret_mode():
        # multi-block grid: tile_b=32 -> 3 batch blocks with 16 pad rows
        y = lut_matmul_affine(jnp.pad(jnp.asarray(x), ((0, 16), (0, 0))),
                              words, jnp.asarray(s), jnp.asarray(m), bits,
                              tile_n=128, tile_b=32)
    scale = np.abs(ref).max() + 1e-6
    got = np.asarray(y)
    np.testing.assert_allclose(got[:B] / scale, ref / scale, atol=2e-2)
    assert np.abs(got[B:]).max() < 1e-6  # pad rows stay zero

    # and through the flex wrapper (auto pad/tile/slice)
    with pltpu.force_tpu_interpret_mode():
        yf = lut_matmul_affine_flex(jnp.asarray(x), words, jnp.asarray(s),
                                    jnp.asarray(m), bits, out_features=N)
    np.testing.assert_allclose(np.asarray(yf) / scale, ref / scale,
                               atol=2e-2)


@pytest.mark.parametrize("block_k", [1, 2, 4])
def test_affine_block_k_matches_oracle(block_k, rng):
    """Multi-lane-tile grid steps (block_k) decode identically."""
    from jax.experimental.pallas import tpu as pltpu
    bits = 2
    TK = tile_k_for(bits)
    N, K = 256, 4 * TK
    codes = rng.integers(0, 4, size=(N, K), dtype=np.uint8)
    lut, s, m = _affine_luts(rng, N, 4)
    x = rng.normal(size=(1, K)).astype(np.float32)
    words = jnp.asarray(pack_lane_tiled(codes, bits))
    ref = x @ np.take_along_axis(lut, codes.astype(np.int64), 1).T
    with pltpu.force_tpu_interpret_mode():
        y = lut_matmul_affine(jnp.asarray(x), words, jnp.asarray(s),
                              jnp.asarray(m), bits, tile_n=128,
                              block_k=block_k)
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(np.asarray(y) / scale, ref / scale, atol=2e-2)


def test_affine_block_k_composite_3bit(rng):
    """block_k > 1 with composite-width per-field word arrays."""
    from jax.experimental.pallas import tpu as pltpu
    bits = 3
    TK = tile_k_for(bits)
    N, K = 128, 2 * TK
    codes = rng.integers(0, 8, size=(N, K), dtype=np.uint8)
    lut, s, m = _affine_luts(rng, N, 8)
    x = rng.normal(size=(1, K)).astype(np.float32)
    words = tuple(jnp.asarray(p) for p in pack_lane_tiled(codes, bits))
    ref = x @ np.take_along_axis(lut, codes.astype(np.int64), 1).T
    with pltpu.force_tpu_interpret_mode():
        y = lut_matmul_affine(jnp.asarray(x), words, jnp.asarray(s),
                              jnp.asarray(m), bits, tile_n=128, block_k=2)
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(np.asarray(y) / scale, ref / scale, atol=2e-2)


def test_with_kernel_layout_engages_affine_3bit(rng):
    """3-bit uniform grids engage the composite-field affine kernel and the
    forward matches the dequant oracle (VERDICT item 4: 3-bit fused)."""
    from jax.experimental.pallas import tpu as pltpu
    from guidedquant_tpu.nn.linear import (
        AnyPrecLinear, with_kernel_layout, apply_linear, dequantize_anyprec)
    from guidedquant_tpu.ops.pack import pack_bitplanes
    bits, N, K = 3, 128, 96
    C = 2 ** bits
    codes = rng.integers(0, C, size=(N, K), dtype=np.uint8)
    lut, s, m = _affine_luts(rng, N, C)
    q = pack_bitplanes(codes, bits)
    w = AnyPrecLinear(qweight=jnp.asarray(q), luts={bits: jnp.asarray(lut)},
                      precision=bits, out_features=N, in_features=K)
    w2 = with_kernel_layout(w)
    assert w2.srow is not None and isinstance(w2.qwords, tuple)
    assert w2.pcoef is None
    x = jnp.asarray(rng.normal(size=(2, K)).astype(np.float32))
    ref = x @ dequantize_anyprec(w).T
    with pltpu.force_tpu_interpret_mode():
        y = apply_linear(w2, x)
    scale = float(jnp.abs(ref).max()) + 1e-6
    np.testing.assert_allclose(np.asarray(y) / scale, np.asarray(ref) / scale,
                               atol=2e-2)


def test_affine_flex_pads_k(rng):
    """flex wrapper zero-pads K; padded positions must not contribute
    (code 0 decodes to m != 0, but x is zero there and the epilogue's
    sum(x) only covers real positions)."""
    from jax.experimental.pallas import tpu as pltpu
    bits = 2
    N, K = 128, 100  # K << TILE_K forces padding
    C = 2 ** bits
    codes = rng.integers(0, C, size=(N, K), dtype=np.uint8)
    lut, s, m = _affine_luts(rng, N, C)
    x = rng.normal(size=(3, K)).astype(np.float32)
    from guidedquant_tpu.ops.lut_kernels import pad_to_tiles
    padded, _ = pad_to_tiles(codes, bits)
    words = jnp.asarray(pack_lane_tiled(padded, bits))
    ref = x @ np.take_along_axis(lut, codes.astype(np.int64), 1).T
    with pltpu.force_tpu_interpret_mode():
        y = lut_matmul_affine_flex(jnp.asarray(x), words, jnp.asarray(s),
                                   jnp.asarray(m), bits, out_features=N)
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(np.asarray(y) / scale, ref / scale, atol=2e-2)


def test_with_kernel_layout_engages_affine(rng):
    """Uniform-grid luts -> srow/mrow set, gpoly None; forward matches the
    dequant oracle."""
    from jax.experimental.pallas import tpu as pltpu
    from guidedquant_tpu.nn.linear import (
        AnyPrecLinear, with_kernel_layout, apply_linear, dequantize_anyprec)
    from guidedquant_tpu.ops.pack import pack_bitplanes
    bits, N, K = 2, 128, 128
    C = 2 ** bits
    codes = rng.integers(0, C, size=(N, K), dtype=np.uint8)
    lut, s, m = _affine_luts(rng, N, C)
    q = pack_bitplanes(codes, bits)
    w = AnyPrecLinear(qweight=jnp.asarray(q), luts={bits: jnp.asarray(lut)},
                      precision=bits, out_features=N, in_features=K)
    w2 = with_kernel_layout(w)
    assert w2.srow is not None and w2.gpoly is None
    x = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32))
    ref = x @ dequantize_anyprec(w).T
    with pltpu.force_tpu_interpret_mode():
        y = apply_linear(w2, x)
    scale = float(jnp.abs(ref).max()) + 1e-6
    np.testing.assert_allclose(np.asarray(y) / scale, np.asarray(ref) / scale,
                               atol=2e-2)


def test_with_kernel_layout_skips_affine_for_free_luts(rng):
    """Genuinely non-uniform luts must NOT engage the affine path (it would
    change the result)."""
    from guidedquant_tpu.nn.linear import AnyPrecLinear, with_kernel_layout
    from guidedquant_tpu.ops.pack import pack_bitplanes
    bits, N, K = 2, 128, 128
    codes = rng.integers(0, 4, size=(N, K), dtype=np.uint8)
    lut = np.sort(rng.normal(size=(N, 4)).astype(np.float32), axis=1)
    q = pack_bitplanes(codes, bits)
    w = AnyPrecLinear(qweight=jnp.asarray(q), luts={bits: jnp.asarray(lut)},
                      precision=bits, out_features=N, in_features=K)
    w2 = with_kernel_layout(w)
    assert not (w2.gpoly is None and w2.srow is not None)


def test_update_c_affine_is_family_minimizer(rng):
    """update_C_affine returns the exact WLS minimizer within the affine
    family given assignments: random (m, s) perturbations never improve the
    guided objective."""
    from guidedquant_tpu.solvers.lnq import (
        update_C_affine, objective, dampen_hessians)
    N, D, ncl = 64, 32, 4
    W = rng.normal(size=(N, D)).astype(np.float32)
    X = rng.normal(size=(2, 4 * D, D)).astype(np.float32)
    H = (np.einsum("gti,gtj->gij", X, X) / (4 * D) +
         0.05 * np.eye(D)).astype(np.float32)
    H = dampen_hessians(H)
    labels = rng.integers(0, ncl, size=(N, D)).astype(np.int32)
    C = update_C_affine(W, H, labels, ncl)
    # in-family check
    sf, mf, relerr = fit_affine(C)
    assert relerr < 1e-5
    base = float(objective(jnp.asarray(W), jnp.asarray(H),
                           jnp.asarray(labels), jnp.asarray(C)))
    j = np.arange(ncl, dtype=np.float32)
    for _ in range(5):
        dm = rng.normal(size=N).astype(np.float32) * 0.01
        ds = rng.normal(size=N).astype(np.float32) * 0.01
        C2 = C + dm[:, None] + ds[:, None] * j[None, :]
        o2 = float(objective(jnp.asarray(W), jnp.asarray(H),
                             jnp.asarray(labels), jnp.asarray(C2)))
        assert o2 >= base - 1e-6 * max(abs(base), 1.0)


def test_lnq_affine_end_to_end(rng):
    """train_least_squares(codebook_family='affine') returns in-family C
    with bounded objective inflation vs the free solution."""
    from guidedquant_tpu.solvers.lnq import train_least_squares
    N, D, ncl = 128, 32, 4
    W = rng.normal(size=(N, D)).astype(np.float32)
    X = rng.normal(size=(1, 4 * D, D)).astype(np.float32)
    H = (np.einsum("gti,gtj->gij", X, X) / (4 * D) +
         0.05 * np.eye(D)).astype(np.float32)
    C0 = np.sort(rng.normal(size=(N, ncl)).astype(np.float32), axis=1)
    lab0 = np.argmin(np.abs(W[:, :, None] - C0[:, None, :]), axis=2)

    lab_f, C_f, log_f = train_least_squares(W, lab0.astype(np.int32), C0, H,
                                            num_iterations=2, cd_cycles=2)
    lab_a, C_a, log_a = train_least_squares(W, lab0.astype(np.int32), C0, H,
                                            num_iterations=2, cd_cycles=2,
                                            codebook_family="affine")
    _, _, relerr = fit_affine(C_a)
    assert relerr < 1e-5
    # affine objective within 3x of the free solution on random data
    assert (log_a["objective"][-1]
            <= max(log_f["objective"][-1], 1e-12) * 3.0 + 1e-9)
    # the alternation improved on the projected init
    assert log_a["objective"][-1] <= log_a["objective"][0] + 1e-9


def _w2a8_oracle(x, codes, s, m):
    """Exact A8 semantics of lut_matmul_affine_w2a8: per-token absmax/127
    activation quantization, exact int code-dot, affine epilogue."""
    sx = np.maximum(np.abs(x).max(1, keepdims=True), 1e-30) / 127.0
    xq = np.clip(np.round(x / sx), -127, 127)
    return ((sx * xq) @ (s[:, None] * codes.astype(np.float32)).T
            + x.sum(1, keepdims=True) * m[None, :])


@pytest.mark.parametrize("bits,B", [(2, 1), (2, 4), (3, 1), (4, 2), (7, 1)])
def test_w2a8_kernel_matches_oracle(bits, B, rng):
    """Int-domain W{b}A8 kernel vs the A8 oracle (decode-batch shapes);
    consumes the SAME int32 lane-tiled operand as the bf16 affine kernel."""
    from jax.experimental.pallas import tpu as pltpu
    from guidedquant_tpu.ops.lut_kernels import lut_matmul_affine_w2a8
    TK = tile_k_for(bits)
    N, K = 256, TK
    C = 2 ** bits
    codes = rng.integers(0, C, size=(N, K), dtype=np.uint8)
    _, s, m = _affine_luts(rng, N, C)
    x = rng.normal(size=(B, K)).astype(np.float32)
    packed = pack_lane_tiled(codes, bits)
    words = (tuple(jnp.asarray(p) for p in packed)
             if isinstance(packed, tuple) else jnp.asarray(packed))
    ref = _w2a8_oracle(x, codes, s, m)
    with pltpu.force_tpu_interpret_mode():
        y = lut_matmul_affine_w2a8(jnp.asarray(x), words, jnp.asarray(s),
                                   jnp.asarray(m), bits, tile_n=128)
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(np.asarray(y) / scale, ref / scale, atol=1e-5)


def test_w2a8_gemm_batch_tiled_and_k_pad(rng):
    """flex wrapper: B > MAX_BATCH batch tiling + K padding both match the
    oracle (padded K positions carry x = 0, so neither the int dot nor the
    sum(x)*m epilogue sees them)."""
    from jax.experimental.pallas import tpu as pltpu
    from guidedquant_tpu.ops import lut_kernels
    from guidedquant_tpu.ops.lut_kernels import (
        lut_matmul_affine_w2a8_flex, pad_to_tiles)
    bits = 2
    N, K, B = 128, 100, lut_kernels.MAX_BATCH + 16  # K and B both pad
    C = 2 ** bits
    codes = rng.integers(0, C, size=(N, K), dtype=np.uint8)
    _, s, m = _affine_luts(rng, N, C)
    x = rng.normal(size=(B, K)).astype(np.float32)
    padded, _ = pad_to_tiles(codes, bits)
    words = jnp.asarray(pack_lane_tiled(padded, bits))
    ref = _w2a8_oracle(x, codes, s, m)
    with pltpu.force_tpu_interpret_mode():
        y = lut_matmul_affine_w2a8_flex(jnp.asarray(x), words,
                                        jnp.asarray(s), jnp.asarray(m),
                                        bits, out_features=N)
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(np.asarray(y) / scale, ref / scale, atol=1e-5)


def test_with_act8_dispatch(rng, monkeypatch):
    """with_act8 engages the w2a8 route only for affine-path leaves and
    apply_linear then matches the A8 oracle; gpoly/no-kernel/wide leaves
    are no-ops."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from guidedquant_tpu.nn.linear import (
        AnyPrecLinear, with_kernel_layout, with_act8, apply_linear)
    from guidedquant_tpu.ops.pack import pack_bitplanes
    bits, N, K = 2, 128, 128
    C = 2 ** bits
    codes = rng.integers(0, C, size=(N, K), dtype=np.uint8)
    lut, s, m = _affine_luts(rng, N, C)
    q = pack_bitplanes(codes, bits)
    w = with_kernel_layout(AnyPrecLinear(
        qweight=jnp.asarray(q), luts={bits: jnp.asarray(lut)},
        precision=bits, out_features=N, in_features=K))
    w8 = with_act8(w)
    assert w8.act_bits == 8
    # dispatch gate is backend-conditioned; force it for the CPU test
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    x = rng.normal(size=(2, K)).astype(np.float32)
    ref = _w2a8_oracle(x, codes, np.asarray(w.srow), np.asarray(w.mrow))
    with pltpu.force_tpu_interpret_mode():
        y = apply_linear(w8, jnp.asarray(x))
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(np.asarray(y) / scale, ref / scale, atol=1e-5)

    # no-ops: leaf without kernel operands; wide precision
    w_plain = AnyPrecLinear(qweight=jnp.asarray(q),
                            luts={bits: jnp.asarray(lut)},
                            precision=bits, out_features=N, in_features=K)
    assert with_act8(w_plain).act_bits == 16
    w_wide = w.replace(precision=8)
    assert with_act8(w_wide).act_bits == 16


def test_fuse_preserves_act_bits(rng):
    """fuse_projections must thread act_bits through (ADVICE r3: silent
    reset to 16 would drop the int8 path on act8-then-fuse ordering)."""
    from guidedquant_tpu.nn.linear import (
        AnyPrecLinear, with_kernel_layout, with_act8)
    from guidedquant_tpu.serve.fuse import _concat_linears
    from guidedquant_tpu.ops.pack import pack_bitplanes
    bits, N, K = 2, 128, 128
    C = 2 ** bits
    ws = []
    for _ in range(3):
        codes = rng.integers(0, C, size=(N, K), dtype=np.uint8)
        lut, _, _ = _affine_luts(rng, N, C)
        w = with_kernel_layout(AnyPrecLinear(
            qweight=jnp.asarray(pack_bitplanes(codes, bits)),
            luts={bits: jnp.asarray(lut)},
            precision=bits, out_features=N, in_features=K))
        ws.append(with_act8(w))
    fused = _concat_linears(ws, axis_n=0)
    assert fused.act_bits == 8
    assert fused.out_features == 3 * N


def test_unpack_lane_tiled_traceable_matches_np():
    """jnp lane-tiled unpack (device prefill path) == numpy oracle, all
    widths incl. composite fields."""
    rng = np.random.RandomState(3)
    for bits in (1, 2, 3, 4, 5, 6, 7, 8):
        TK = lut_kernels.tile_k_for(bits)
        N, K = 16, TK + 128  # force padding
        codes = rng.randint(0, 2 ** bits, size=(N, K)).astype(np.uint8)
        padded, K_pad = lut_kernels.pad_to_tiles(codes, bits)
        words = lut_kernels.pack_lane_tiled(padded, bits)
        ref = lut_kernels.unpack_lane_tiled_np(
            words if not isinstance(words, tuple)
            else tuple(np.asarray(w) for w in words), bits, K)
        words_j = (tuple(jnp.asarray(w) for w in words)
                   if isinstance(words, tuple) else jnp.asarray(words))
        got = np.asarray(lut_kernels.unpack_lane_tiled(words_j, bits, K))
        np.testing.assert_array_equal(got, ref.astype(np.int32)), bits
