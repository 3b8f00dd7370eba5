"""Shared-shape codebook family: fit, restriction, fast-kernel equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedquant_tpu.ops.lut_kernels import (
    fit_shared_shape, shape_to_poly, pack_lane_tiled, pad_to_tiles,
    lut_matmul_shared, tile_k_for)
from guidedquant_tpu.solvers.lnq import restrict_shared_shape


def _family_luts(rng, N, C, tile):
    """Construct luts exactly in the shared-shape family."""
    T = N // tile
    g = np.sort(rng.normal(size=(T, C)), axis=1)
    g = g / np.sqrt((g ** 2).mean(axis=1, keepdims=True))
    s = rng.random(N) + 0.5
    m = rng.normal(size=N) * 0.1
    return (m[:, None] + s[:, None] * np.repeat(g, tile, axis=0)
            ).astype(np.float32)


def test_fit_recovers_in_family_exactly(rng):
    N, C, tile = 256, 4, 128
    lut = _family_luts(rng, N, C, tile)
    g, s, m, relerr = fit_shared_shape(lut, tile)
    assert relerr < 1e-6, relerr
    approx = m[:, None] + s[:, None] * np.repeat(g, tile, axis=0)
    np.testing.assert_allclose(approx, lut, atol=1e-5)


def test_fit_general_luts_reports_error(rng):
    lut = rng.normal(size=(256, 4)).astype(np.float32)
    _, _, _, relerr = fit_shared_shape(lut, 128)
    assert relerr > 1e-3  # arbitrary luts are NOT in the family


def test_restrict_shared_shape_snaps(rng):
    C = np.sort(rng.normal(size=(256, 4)).astype(np.float32), axis=1)
    snapped, fit = restrict_shared_shape(C, 128)
    g2, s2, m2, relerr2 = fit_shared_shape(snapped, fit["rows_per_tile"])
    assert relerr2 < 1e-5  # snapped luts are exactly in-family


@pytest.mark.parametrize("bits", [1, 2])
def test_shared_kernel_matches_oracle(bits, rng):
    from jax.experimental.pallas import tpu as pltpu
    TK = tile_k_for(bits)
    N, K, tile = 256, TK, 128
    C = 2 ** bits
    codes = rng.integers(0, C, size=(N, K), dtype=np.uint8)
    lut = _family_luts(rng, N, C, tile)
    g, s, m, relerr = fit_shared_shape(lut, tile)
    assert relerr < 1e-6
    gpoly = shape_to_poly(g, bits)
    x = rng.normal(size=(1, K)).astype(np.float32)
    words = jnp.asarray(pack_lane_tiled(codes, bits))
    ref = x @ np.take_along_axis(lut, codes.astype(np.int64), 1).T
    with pltpu.force_tpu_interpret_mode():
        y = lut_matmul_shared(jnp.asarray(x), words, jnp.asarray(gpoly),
                              jnp.asarray(s), jnp.asarray(m), bits,
                              tile_n=tile)
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(np.asarray(y) / scale, ref / scale, atol=2e-2)


def test_lnq_with_shared_shape_end_to_end(rng):
    """train_least_squares(shared_shape_tile=...) returns in-family C with
    bounded objective inflation."""
    from guidedquant_tpu.solvers.lnq import train_least_squares, objective
    from guidedquant_tpu.solvers.lnq import dampen_hessians
    N, D, ncl = 128, 32, 4
    W = rng.normal(size=(N, D)).astype(np.float32)
    X = rng.normal(size=(1, 4 * D, D)).astype(np.float32)
    H = (np.einsum("gti,gtj->gij", X, X) / (4 * D) +
         0.05 * np.eye(D)).astype(np.float32)
    C0 = np.sort(rng.normal(size=(N, ncl)).astype(np.float32), axis=1)
    lab0 = np.argmin(np.abs(W[:, :, None] - C0[:, None, :]), axis=2)

    lab_f, C_f, log_f = train_least_squares(W, lab0.astype(np.int32), C0, H,
                                            num_iterations=2, cd_cycles=2)
    lab_s, C_s, log_s = train_least_squares(W, lab0.astype(np.int32), C0, H,
                                            num_iterations=2, cd_cycles=2,
                                            shared_shape_tile=64)
    _, _, _, relerr = fit_shared_shape(C_s, 64)
    assert relerr < 1e-5
    # shared-shape objective within 2x of the free solution
    assert log_s["objective"][-1] <= max(log_f["objective"][-1], 1e-12) * 2.0 + 1e-9
