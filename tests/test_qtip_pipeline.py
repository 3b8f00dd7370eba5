"""QTIP pipeline e2e on a tiny model: quantize -> pack -> reload -> eval."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedquant_tpu.models import llama, get_config
from guidedquant_tpu.pipelines.quantize_qtip import quantize_qtip
from guidedquant_tpu.formats import qtip_format
from guidedquant_tpu.solvers.qtip.codebook import BitshiftCodebook
from guidedquant_tpu.evaluate import evaluate_ppl


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("tiny").replace(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 96, size=(4, 32), dtype=np.int32)
    stream = rng.integers(0, 96, size=(384,), dtype=np.int32)
    cb_rng = np.random.default_rng(1)
    tlut = np.sort(cb_rng.normal(size=(1 << 8,)))[..., None].astype(np.float32)
    cb = BitshiftCodebook(L=8, K=2, V=1, tlut_bits=8, decode_mode="lut",
                          tlut=tlut)
    return cfg, params, tokens, stream, cb


def test_qtip_pipeline_e2e(setup, tmp_path):
    cfg, params, tokens, stream, cb = setup
    packed = quantize_qtip(
        "tinyqtip", cfg=cfg, params=params, K=2, L=8, V=1, tlut_bits=8,
        decode_mode="lut", td_x=8, td_y=8, cache_dir=str(tmp_path / "c"),
        dataset="synthetic", seq_len=32, num_examples=4, num_groups=2,
        tokens=tokens, cb=cb)
    assert os.path.exists(os.path.join(packed, "model.npz"))

    qcfg, qparams = qtip_format.load_packed(packed, dtype=jnp.float32, cb=cb)
    ppl_fp = evaluate_ppl(params, cfg, stream, ctx_len=48, verbose=False)
    ppl_q = evaluate_ppl(qparams, qcfg, stream, ctx_len=48, verbose=False)
    assert np.isfinite(ppl_q)
    assert ppl_q < ppl_fp * 2.0, (ppl_q, ppl_fp)

    # proxy errors recorded per module
    qd = os.path.join(str(tmp_path / "c"), "qtip_quantized")
    layer0 = np.load(os.path.join(qd, os.listdir(qd)[0], "l0.npz"))
    for m in cfg.module_names:
        assert float(layer0[f"{m}.proxy_err"]) < 0.5


def test_qtip_pipeline_resume(setup, tmp_path):
    cfg, params, tokens, _, cb = setup
    kw = dict(cfg=cfg, params=params, K=2, L=8, V=1, tlut_bits=8,
              decode_mode="lut", td_x=8, td_y=8,
              cache_dir=str(tmp_path / "c"), dataset="synthetic",
              seq_len=32, num_examples=4, num_groups=1, tokens=tokens, cb=cb)
    d1 = quantize_qtip("tinyqtip", **kw)
    m1 = dict(np.load(os.path.join(d1, "model.npz")))
    d2 = quantize_qtip("tinyqtip", **kw)
    m2 = dict(np.load(os.path.join(d2, "model.npz")))
    for k in m1:
        np.testing.assert_array_equal(m1[k], m2[k])


def test_qtip_pipeline_column_format(setup, tmp_path):
    """stream_format="column" end-to-end: kwords land in the packed
    checkpoint, reload serves via the kernel-format decode path, and ppl
    matches the tile256 run's quality class."""
    cfg, params, tokens, stream, _ = setup
    cb = BitshiftCodebook(L=10, K=2, V=1, decode_mode="tpu2u")
    packed = quantize_qtip(
        "tinyqtip", cfg=cfg, params=params, K=2, L=10, V=1,
        decode_mode="tpu2u", td_x=8, td_y=8, stream_format="column",
        cycle=32, cache_dir=str(tmp_path / "c"),
        dataset="synthetic", seq_len=32, num_examples=4, num_groups=1,
        tokens=tokens, cb=cb)
    qcfg, qparams = qtip_format.load_packed(packed, dtype=jnp.float32, cb=cb)
    for m in cfg.module_names:
        assert qparams["layers"][m].kwords is not None
        assert qparams["layers"][m].hatW is None
    ppl_fp = evaluate_ppl(params, cfg, stream, ctx_len=48, verbose=False)
    ppl_q = evaluate_ppl(qparams, qcfg, stream, ctx_len=48, verbose=False)
    assert np.isfinite(ppl_q)
    assert ppl_q < ppl_fp * 2.5, (ppl_q, ppl_fp)
