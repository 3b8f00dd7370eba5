"""OPT / Phi architecture parity vs HuggingFace transformers (tiny random
models) + AutoArchConfig-style autodetection.

Reference analog: ``any_precision/analyzer/architectures/{opt,phi}.yaml`` and
``AutoArchConfig`` (``any_precision/analyzer/analyzer.py:139-173``). These
archs exercise the non-Llama structural axes: LayerNorm with bias, fc MLP,
learned positions (OPT), parallel attn+MLP block and partial rotary (Phi).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from guidedquant_tpu.models import llama
from guidedquant_tpu.models.hf_import import autodetect_arch, load_hf_model


def _tiny_opt():
    torch = pytest.importorskip("torch")
    from transformers import OPTConfig, OPTForCausalLM

    torch.manual_seed(0)
    model = OPTForCausalLM(OPTConfig(
        vocab_size=128, hidden_size=64, ffn_dim=112, num_hidden_layers=3,
        num_attention_heads=4, max_position_embeddings=64,
        do_layer_norm_before=True, word_embed_proj_dim=64,
        activation_function="relu",
    ))
    model.eval()
    return model


def _tiny_phi():
    torch = pytest.importorskip("torch")
    from transformers import PhiConfig, PhiForCausalLM

    torch.manual_seed(0)
    model = PhiConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, partial_rotary_factor=0.5,
        hidden_act="gelu_new", attn_implementation="eager",
        resid_pdrop=0.0, embd_pdrop=0.0, attention_dropout=0.0,
    )
    model = PhiForCausalLM(model)
    model.eval()
    return model


@pytest.mark.parametrize("builder,arch", [(_tiny_opt, "opt"),
                                          (_tiny_phi, "phi")])
def test_logits_match_hf(builder, arch):
    torch = pytest.importorskip("torch")
    model = builder()
    cfg, params = load_hf_model(model, dtype=jnp.float32)
    assert cfg.arch == arch
    assert cfg.mlp_type == "fc" and cfg.norm_type == "ln"

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.vocab_size, size=(2, 13), dtype=np.int64)

    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(tokens)).logits.numpy()

    ours = np.asarray(llama.forward(params, cfg, jnp.asarray(tokens)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)

    unrolled = np.asarray(
        llama.forward_unrolled(params, cfg, jnp.asarray(tokens)))
    np.testing.assert_allclose(unrolled, ref, atol=2e-4, rtol=2e-3)


def test_calibration_smoke_fc_arch():
    """gradient capture + module_inputs work on fc/parallel-block archs."""
    import jax
    from guidedquant_tpu.models.config import get_config
    from guidedquant_tpu.calib.gradients import gradient_step

    cfg = get_config("phi-2").replace(
        vocab_size=64, hidden_size=32, intermediate_size=48, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=-1, max_seq_len=32)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, size=(2, 8)))

    gsq, sal = gradient_step(params, cfg, tokens, num_groups=2)
    assert set(gsq) == set(cfg.module_names)
    assert gsq["fc1"].shape == (2, 48, 32)
    assert sal["fc2"].shape[-1] == 2
    assert all(np.isfinite(np.asarray(v)).all() for v in gsq.values())

    # module_inputs capture covers every target module (Hessian stage input)
    lp = llama.layer_slice(params["layers"], 0)
    x = jnp.zeros((1, 8, 32), jnp.float32)
    pos = jnp.arange(8)[None]
    cos, sin, mask, _ = llama.layer_rope_mask(cfg, pos, 8, 8)
    _, cap = llama.module_inputs(lp, cfg, x, cos, sin, mask)
    assert set(cap) == set(cfg.module_names)


def test_autodetect_arch():
    for builder, prefix, n_mod in [
        (_tiny_opt, "model.decoder.layers.", 6),
        (_tiny_phi, "model.layers.", 6),
    ]:
        model = builder()
        info = autodetect_arch(model.state_dict().keys())
        assert info["layers_prefix"] == prefix
        assert len(info["module_names"]) == n_mod


def test_opt_hessian_accumulation():
    """accumulate_hessians on a learned-position (no-RoPE) arch — cos/sin
    are None end to end (regression: np.asarray(None) crashed the sweep)."""
    import jax
    from guidedquant_tpu.models.config import get_config
    from guidedquant_tpu.calib.gradients import get_gradients
    from guidedquant_tpu.calib.hessians import accumulate_hessians

    cfg = get_config("opt-1.3b").replace(
        vocab_size=64, hidden_size=32, intermediate_size=48, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=-1, max_seq_len=40)
    params = llama.init_params(cfg, jax.random.PRNGKey(1))
    tokens = np.random.default_rng(1).integers(0, 64, size=(4, 8)
                                               ).astype(np.int32)
    _, sal = get_gradients(params, cfg, tokens, num_groups=1, batch_size=2)
    hs = accumulate_hessians(params, cfg, tokens, sal, num_groups=1,
                             batch_size=2)
    assert len(hs) == 2
    for h in hs:
        assert set(h) == set(cfg.module_names)
        for m, H in h.items():
            assert np.isfinite(H).all(), m
            np.testing.assert_allclose(H[0], H[0].T, rtol=1e-4, atol=1e-5)


def test_engine_rejects_unsupported_archs():
    """OPT/Phi are quantization/eval-side (like the reference's llama-only
    gpt-fast engine); the serving engine must fail fast, not AttributeError
    deep inside a traced layer."""
    import pytest
    from guidedquant_tpu.models.config import get_config
    from guidedquant_tpu.serve import engine
    for name in ("opt-1.3b", "phi-2"):
        with pytest.raises(NotImplementedError):
            engine.check_engine_arch(get_config(name))
    engine.check_engine_arch(get_config("llama-3.2-1b"))  # served fine
