"""QTIP whole-model E2E finetune (SU/SV/tlut vs a frozen teacher).

Reference analog: qtip/quantize_llama/finetune.py:461-548
(finetune_susv_e2e). Done criteria (VERDICT item 7): KL decreases, the
repacked model round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedquant_tpu.models import llama, get_config
from guidedquant_tpu.pipelines.quantize_qtip import quantize_qtip
from guidedquant_tpu.pipelines.qtip_e2e import (
    qtip_e2e_finetune, finalize_qtip_params, with_tlut_leaves)
from guidedquant_tpu.formats import qtip_format
from guidedquant_tpu.solvers.qtip.codebook import BitshiftCodebook
from guidedquant_tpu.evaluate import evaluate_ppl


@pytest.fixture(scope="module")
def qsetup(tmp_path_factory):
    cfg = get_config("tiny").replace(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 96, size=(6, 32), dtype=np.int32)
    cb = BitshiftCodebook(L=8, K=2, V=2, tlut_bits=6,
                          decode_mode="quantlut_sym", seed=3)
    packed = quantize_qtip(
        "tinyqsym", cfg=cfg, params=params, K=2, L=8, V=2, tlut_bits=6,
        decode_mode="quantlut_sym", td_x=8, td_y=8,
        cache_dir=str(tmp_path_factory.mktemp("c")),
        dataset="synthetic", seq_len=32, num_examples=6,
        num_groups=1, tokens=tokens, cb=cb)
    qcfg, qparams = qtip_format.load_packed(packed, dtype=jnp.float32, cb=cb)
    return cfg, params, qcfg, qparams, tokens, cb


def test_tlut_decode_matches_dense_oracle(qsetup):
    """decode_tlut_dense_jnp(trellis, cb.tlut) must equal the host
    decode_trellis_dense (bit-exact modulo f32)."""
    from guidedquant_tpu.nn.trellis import (
        decode_trellis_dense, decode_tlut_dense_jnp)
    cfg, _, qcfg, qparams, _, cb = qsetup
    w = qparams["layers"]["q_proj"]
    w0 = jax.tree_util.tree_map(lambda a: a[0], w)  # layer 0
    ref = decode_trellis_dense(cb, np.asarray(w0.trellis).view(np.uint16),
                               w.out_features, w.in_features, w.td_x, w.td_y)
    w0t = w0.replace(tlut=jnp.asarray(cb.tlut))
    got = np.asarray(decode_tlut_dense_jnp(w0t))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_qtip_e2e_kd_descends_and_roundtrips(qsetup):
    cfg, teacher, qcfg, qparams, tokens, cb = qsetup
    out, hist = qtip_e2e_finetune(qparams, qcfg, teacher, tokens, cb=cb,
                                  steps=25, lr=2e-3)
    q = max(len(hist) // 4, 1)
    assert np.mean(hist[-q:]) < np.mean(hist[:q]), (hist[:3], hist[-3:])

    # trellis codes untouched (round-trip safe)
    for m in qcfg.module_names:
        np.testing.assert_array_equal(
            np.asarray(out["layers"][m].trellis),
            np.asarray(qparams["layers"][m].trellis))

    # tuned tlut leaves exist and moved
    w = out["layers"]["q_proj"]
    assert w.tlut is not None
    base = with_tlut_leaves(qparams, qcfg, cb)["layers"]["q_proj"]
    assert not np.allclose(np.asarray(w.tlut), np.asarray(base.tlut))

    # finalize re-caches dense hatW consistent with the tlut decode
    fin = finalize_qtip_params(out, qcfg)
    stream = np.concatenate([tokens.reshape(-1)] * 2)
    ppl_t = evaluate_ppl(out, qcfg, stream, ctx_len=48, verbose=False)
    ppl_f = evaluate_ppl(
        {**fin, "layers": {k: (v.replace(tlut=None)
                               if hasattr(v, "tlut") else v)
                           for k, v in fin["layers"].items()}},
        qcfg, stream, ctx_len=48, verbose=False)
    assert np.isfinite(ppl_t) and np.isfinite(ppl_f)
    np.testing.assert_allclose(ppl_f, ppl_t, rtol=2e-2)


def test_qtip_e2e_improves_kd_vs_baseline(qsetup):
    """E2E finetune must beat the un-finetuned student on the KD objective
    over the calibration set (the reference's acceptance signal)."""
    from guidedquant_tpu.pipelines.finetune_e2e import kl_divergence_loss
    cfg, teacher, qcfg, qparams, tokens, cb = qsetup
    out, _ = qtip_e2e_finetune(qparams, qcfg, teacher, tokens, cb=cb,
                               steps=25, lr=2e-3)
    batch = jnp.asarray(tokens[:2])
    t_logits = llama.forward(teacher, cfg, batch)
    kl0 = float(kl_divergence_loss(
        llama.forward(qparams, qcfg, batch), t_logits))
    kl1 = float(kl_divergence_loss(
        llama.forward(out, qcfg, batch), t_logits))
    assert kl1 < kl0, (kl0, kl1)
