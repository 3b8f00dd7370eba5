"""High-level API + fake_pack tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedquant_tpu.models import llama, get_config
from guidedquant_tpu.pipelines import any_precision_quantize
from guidedquant_tpu.serve.model_api import QuantizedCausalLM
from guidedquant_tpu.evaluate.fake_pack import fake_pack


@pytest.fixture(scope="module")
def packed_dir(tmp_path_factory):
    cfg = get_config("tiny").replace(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 96, size=(4, 32), dtype=np.int32)
    return any_precision_quantize(
        "tinyapi", cfg=cfg, params=params, seed_precision=2,
        parent_precision=4,
        cache_dir=str(tmp_path_factory.mktemp("c")), dataset="synthetic",
        seq_len=32, num_examples=4, tokens=tokens)


def test_from_quantized_generate_and_precision_switch(packed_dir):
    lm = QuantizedCausalLM.from_quantized(packed_dir, dtype=jnp.float32)
    assert lm.precision == 4
    out, metrics = lm.generate(np.array([[5, 9, 3]]), max_new_tokens=6)
    assert out.shape == (1, 9)
    lm.set_precision(2)
    assert lm.precision == 2
    out2, _ = lm.generate(np.array([[5, 9, 3]]), max_new_tokens=6)
    assert out2.shape == (1, 9)

    stream = np.random.default_rng(2).integers(0, 96, size=(192,))
    ppl = lm.evaluate_ppl(stream, ctx_len=48, verbose=False)
    assert np.isfinite(ppl)


def test_fake_pack_matches_quantized_forward(packed_dir):
    lm = QuantizedCausalLM.from_quantized(packed_dir, dtype=jnp.float32,
                                          fuse=False)
    dense = fake_pack(lm.params, lm.cfg)
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 96, (1, 10)))
    a = np.asarray(llama.forward(lm.params, lm.cfg, toks))
    b = np.asarray(llama.forward(dense, lm.cfg, toks))
    np.testing.assert_allclose(a, b, atol=1e-4)
    # dense leaves are plain arrays
    assert isinstance(dense["layers"]["q_proj"], jnp.ndarray)


def test_lm_eval_bridge_gated():
    from guidedquant_tpu.evaluate import lm_eval_bridge
    try:
        import lm_eval  # noqa
        has = True
    except ImportError:
        has = False
    if not has:
        with pytest.raises(ImportError, match="lm-eval"):
            lm_eval_bridge.run_lm_eval(None, None, None)


def test_int8_head_option(packed_dir):
    lm = QuantizedCausalLM.from_quantized(packed_dir, dtype=jnp.float32,
                                          int8_head=True)
    from guidedquant_tpu.nn.linear import Int8Linear
    assert isinstance(lm.params["lm_head"], Int8Linear)
    out, _ = lm.generate(np.array([[5, 9, 3]]), max_new_tokens=5)
    assert out.shape == (1, 8)


def test_head_bits_option(packed_dir):
    """head_bits=5: data-free per-row affine head (MSE-grid, the measured
    near-lossless config) on the fast kernel path, a8-engaged."""
    lm = QuantizedCausalLM.from_quantized(packed_dir, dtype=jnp.float32,
                                          head_bits=5)
    from guidedquant_tpu.nn.linear import AnyPrecLinear
    head = lm.params["lm_head"]
    assert isinstance(head, AnyPrecLinear) and head.precision == 5
    assert head.srow is not None and head.qwords is not None  # affine path
    assert head.act_bits == 8  # a8 policy covers the head
    out, _ = lm.generate(np.array([[5, 9, 3]]), max_new_tokens=5)
    assert out.shape == (1, 8)

    # the quantized head is close to the dense head it replaces
    import jax.numpy as jnp2
    from guidedquant_tpu.nn.linear import dequantize_anyprec
    lm2 = QuantizedCausalLM.from_quantized(packed_dir, dtype=jnp.float32)
    W = np.asarray(lm2.params.get("lm_head", lm2.params["embed"]),
                   np.float32)
    Wq = np.asarray(dequantize_anyprec(head, dtype=jnp2.float32))
    rel = np.linalg.norm(Wq - W) / np.linalg.norm(W)
    # ~expected 5-bit affine noise on Gaussian weights (step/sqrt(12))
    assert rel < 0.06, rel

    with pytest.raises(ValueError):
        QuantizedCausalLM.from_quantized(packed_dir, int8_head=True,
                                         head_bits=5)
