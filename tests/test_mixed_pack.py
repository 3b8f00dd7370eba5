"""Mixed-precision packing: per-module bit-widths from separate caches."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedquant_tpu.models import llama, get_config
from guidedquant_tpu.pipelines import any_precision_quantize
from guidedquant_tpu.formats.anyprec import mixed_pack, load_mixed_packed
from guidedquant_tpu.evaluate import evaluate_ppl


def test_mixed_pack_roundtrip(tmp_path):
    cfg = get_config("tiny").replace(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 96, size=(4, 32), dtype=np.int32)

    qdir = any_precision_quantize(
        "tinymix", cfg=cfg, params=params, seed_precision=2,
        parent_precision=4, mode="quantize", cache_dir=str(tmp_path / "c"),
        dataset="synthetic", seq_len=32, num_examples=4, tokens=tokens)

    # attention at 4-bit, mlp at 3-bit (reference layerwise_config idea)
    configs = {m: {"lut_path": qdir, "precision": 4}
               for m in ("q_proj", "k_proj", "v_proj", "o_proj")}
    configs.update({m: {"lut_path": qdir, "precision": 3}
                    for m in ("gate_proj", "up_proj", "down_proj")})
    out = str(tmp_path / "mixed")
    mixed_pack(out, cfg, params, configs)
    assert os.path.exists(os.path.join(out, "model.npz"))

    mcfg, mparams = load_mixed_packed(out, dtype=jnp.float32)
    assert mparams["layers"]["q_proj"].precision == 4
    assert mparams["layers"]["down_proj"].precision == 3

    stream = rng.integers(0, 96, size=(192,), dtype=np.int32)
    ppl = evaluate_ppl(mparams, mcfg, stream, ctx_len=48, verbose=False)
    assert np.isfinite(ppl)
