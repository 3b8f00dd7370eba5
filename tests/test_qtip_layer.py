"""End-to-end QTIP linear quantization tests: forward equivalence,
approximation quality, guided grouping."""

import numpy as np
import pytest

import jax.numpy as jnp

from guidedquant_tpu.solvers.qtip.codebook import BitshiftCodebook
from guidedquant_tpu.solvers.qtip.quantize_layer import (
    quantize_linear_qtip, build_trellis_linear)
from guidedquant_tpu.nn.trellis import (
    apply_trellis, effective_dense_weight, decode_trellis_dense,
    dense_to_tiles, tiles_to_dense)


@pytest.fixture(scope="module")
def cb():
    # small trellis for test speed; 2 bits/weight (K=2, V=1)
    rng = np.random.default_rng(0)
    tlut = np.sort(rng.normal(size=(1 << 8,)))[..., None].astype(np.float32)
    return BitshiftCodebook(L=8, K=2, V=1, tlut_bits=8, decode_mode="lut",
                            tlut=tlut)


def _instance(rng, m=32, n=32, g=1):
    W = rng.normal(size=(m, n)).astype(np.float32)
    X = rng.normal(size=(g, 4 * n, n)).astype(np.float32)
    H = np.einsum("gti,gtj->gij", X, X) / (4 * n)
    return W, H.astype(np.float32)


def test_tile_roundtrip(rng):
    W = rng.normal(size=(32, 48))
    t = dense_to_tiles(W, 16, 16)
    np.testing.assert_array_equal(tiles_to_dense(t, 32, 48, 16, 16), W)


def test_quantize_and_forward_consistency(cb, rng):
    m = n = 32
    W, H = _instance(rng, m, n)
    art = quantize_linear_qtip(W, H, cb, td_x=16, td_y=16, seed=1)
    assert art["proxy_err"] < 0.2, art["proxy_err"]

    lin = build_trellis_linear(art, cb, m, n)
    # cached hatW decodes the packed trellis to exactly hatWr
    np.testing.assert_allclose(np.asarray(lin.hatW), art["hatWr"], atol=1e-5)

    # forward == x @ W_eff^T exactly, and W_eff ~= W
    x = rng.normal(size=(3, n)).astype(np.float32)
    y = np.asarray(apply_trellis(lin, jnp.asarray(x)))
    W_eff = effective_dense_weight(lin)
    np.testing.assert_allclose(y, x @ W_eff.T, atol=1e-4)

    rel = np.linalg.norm(W_eff - W) / np.linalg.norm(W)
    assert rel < 0.45, rel  # 2-bit trellis on gaussian weights

    yref = x @ W.T
    rel_y = np.linalg.norm(y - yref) / np.linalg.norm(yref)
    assert rel_y < 0.6, rel_y


def test_grouped_hessians_change_solution(cb, rng):
    m = n = 32
    W, H1 = _instance(rng, m, n, g=1)
    # 2 groups with very different scales -> different solutions
    _, H2a = _instance(rng, m, n, g=1)
    H2 = np.stack([H1[0], 100.0 * H2a[0]])
    a1 = quantize_linear_qtip(W, H1, cb, seed=3)
    a2 = quantize_linear_qtip(W, H2, cb, seed=3)
    assert not np.array_equal(a1["trellis"], a2["trellis"])
    assert a2["proxy_err"] < 1.0


def test_higher_K_improves_quality(rng):
    rng2 = np.random.default_rng(7)
    tlut = np.sort(rng2.normal(size=(1 << 8,)))[..., None].astype(np.float32)
    cb2 = BitshiftCodebook(L=8, K=2, V=1, tlut_bits=8, decode_mode="lut",
                           tlut=tlut)
    cb3 = BitshiftCodebook(L=8, K=4, V=1, tlut_bits=8, decode_mode="lut",
                           tlut=tlut)
    W, H = _instance(rng, 32, 32)
    e2 = quantize_linear_qtip(W, H, cb2, seed=5)["proxy_err"]
    e4 = quantize_linear_qtip(W, H, cb3, seed=5)["proxy_err"]
    assert e4 < e2, (e4, e2)


def test_finetune_susv_reduces_weighted_error(cb, rng):
    from guidedquant_tpu.solvers.qtip.finetune import finetune_susv, _loss
    import jax.numpy as jnp
    m = n = 32
    W, H = _instance(rng, m, n, g=2)
    art = quantize_linear_qtip(W, H, cb, td_x=16, td_y=16, seed=9)
    art2 = finetune_susv(art, W, H, steps=40, lr=3e-3)
    l0, l1 = art2["finetune_loss"]
    assert l1 < l0, (l0, l1)
    # runtime module with tuned SU/SV still forward-consistent
    lin = build_trellis_linear(art2, cb, m, n)
    x = rng.normal(size=(2, n)).astype(np.float32)
    y = np.asarray(apply_trellis(lin, jnp.asarray(x)))
    W_eff = effective_dense_weight(lin)
    np.testing.assert_allclose(y, x @ W_eff.T, atol=1e-4)
    # and the tuned effective weight is a better fit than the original signs
    rel2 = np.linalg.norm(W_eff - W) / np.linalg.norm(W)
    lin0 = build_trellis_linear(art, cb, m, n)
    rel0 = np.linalg.norm(effective_dense_weight(lin0) - W) / np.linalg.norm(W)
    assert rel2 <= rel0 * 1.02
