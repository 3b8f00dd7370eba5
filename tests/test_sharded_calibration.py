"""Mesh-sharded calibration must match single-device results bit-for-bit
(within f32 reduction tolerance)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedquant_tpu.models import llama, get_config
from guidedquant_tpu.calib.gradients import get_gradients
from guidedquant_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("tiny").replace(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=4)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 96, size=(4, 16), dtype=np.int32)
    return cfg, params, tokens


def test_dp_sharded_gradients_match(setup):
    cfg, params, tokens = setup
    g_ref, s_ref = get_gradients(params, cfg, tokens, num_groups=2,
                                 batch_size=2)
    mesh = make_mesh(8, shape={"dp": 2, "fsdp": 2, "tp": 2})
    with mesh:
        g_sh, s_sh = get_gradients(params, cfg, tokens, num_groups=2,
                                   batch_size=2, mesh=mesh)
    for l in range(cfg.num_layers):
        for m in g_ref[l]:
            scale = np.abs(g_ref[l][m]).max() + 1e-12
            np.testing.assert_allclose(g_sh[l][m] / scale,
                                       g_ref[l][m] / scale, atol=1e-4)
            np.testing.assert_allclose(s_sh[l][m], s_ref[l][m],
                                       rtol=1e-3, atol=1e-5)


def test_dp_sharded_hessians_match(setup):
    from guidedquant_tpu.calib.gradients import get_gradients
    from guidedquant_tpu.calib.hessians import accumulate_hessians
    cfg, params, tokens = setup
    _, sal = get_gradients(params, cfg, tokens, num_groups=2)
    ref = accumulate_hessians(params, cfg, tokens, sal, num_groups=2,
                              batch_size=2)
    mesh = make_mesh(8, shape={"dp": 2, "fsdp": 2, "tp": 2})
    with mesh:
        got = accumulate_hessians(params, cfg, tokens, sal, num_groups=2,
                                  batch_size=2, mesh=mesh)
    for l in range(cfg.num_layers):
        for m in ref[l]:
            scale = np.abs(ref[l][m]).max() + 1e-9
            np.testing.assert_allclose(got[l][m] / scale, ref[l][m] / scale,
                                       atol=2e-4)
