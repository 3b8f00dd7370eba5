"""Model forward parity vs HuggingFace transformers (tiny random Llama).

The reference builds directly on HF models; our from-scratch stack must
reproduce HF logits so that perplexity comparisons are apples-to-apples.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from guidedquant_tpu.models import llama
from guidedquant_tpu.models.hf_import import load_hf_model


def _tiny_hf_model(tie=False, llama3_rope=False):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    kwargs = dict(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=112,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=tie,
        attn_implementation="eager",
    )
    if llama3_rope:
        kwargs["rope_scaling"] = {
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 32,
        }
    torch.manual_seed(0)
    model = LlamaForCausalLM(LlamaConfig(**kwargs))
    model.eval()
    return model


@pytest.mark.parametrize("tie,llama3_rope", [(False, False), (True, True)])
def test_logits_match_hf(tie, llama3_rope):
    torch = pytest.importorskip("torch")
    model = _tiny_hf_model(tie=tie, llama3_rope=llama3_rope)
    cfg, params = load_hf_model(model, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.vocab_size, size=(2, 17), dtype=np.int64)

    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(tokens)).logits.numpy()

    ours_scan = np.asarray(llama.forward(params, cfg, jnp.asarray(tokens)))
    ours_unrolled = np.asarray(
        llama.forward_unrolled(params, cfg, jnp.asarray(tokens)))

    np.testing.assert_allclose(ours_scan, ref, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(ours_unrolled, ref, atol=2e-4, rtol=2e-4)


def test_ce_loss_matches_hf():
    torch = pytest.importorskip("torch")
    model = _tiny_hf_model()
    cfg, params = load_hf_model(model, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, 33), dtype=np.int64)
    with torch.no_grad():
        t = torch.from_numpy(tokens)
        ref_loss = model(input_ids=t, labels=t).loss.item()
    logits = llama.forward(params, cfg, jnp.asarray(tokens))
    loss = float(llama.cross_entropy_loss(logits, jnp.asarray(tokens)))
    assert abs(loss - ref_loss) < 1e-3


def test_tapped_forward_is_identity_at_zero():
    model = _tiny_hf_model()
    cfg, params = load_hf_model(model, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 9)))
    taps = llama.make_taps(cfg, cfg.num_layers, 1, 9)
    base = llama.forward_unrolled(params, cfg, tokens)
    tapped = llama.forward_unrolled(params, cfg, tokens, taps=taps)
    np.testing.assert_allclose(np.asarray(base), np.asarray(tapped), atol=1e-5)


def test_qwen3_logits_match_hf():
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128,
        attn_implementation="eager"))
    model.eval()
    cfg, params = load_hf_model(model, dtype=jnp.float32)
    assert cfg.qk_norm
    rng = np.random.default_rng(4)
    tokens = rng.integers(0, 128, size=(2, 11), dtype=np.int64)
    with pytest.importorskip("torch").no_grad():
        ref = model(input_ids=__import__("torch").from_numpy(tokens)).logits.numpy()
    ours = np.asarray(llama.forward(params, cfg, jnp.asarray(tokens)))
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=3e-4)


def test_qwen3_engine_decode():
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM
    from guidedquant_tpu.serve import engine
    torch.manual_seed(1)
    model = Qwen3ForCausalLM(Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128,
        attn_implementation="eager"))
    model.eval()
    cfg, params = load_hf_model(model, dtype=jnp.float32)
    prompt = np.array([[5, 9, 3]], dtype=np.int32)
    out, _ = engine.generate(params, cfg, prompt, 8, kv_dtype=jnp.float32)
    ref = model.generate(__import__("torch").from_numpy(prompt.astype(np.int64)),
                         max_new_tokens=8, do_sample=False)[0].numpy()
    np.testing.assert_array_equal(out[0], ref)


def _tiny_gemma3(layer_types=("sliding_attention", "full_attention")):
    torch = pytest.importorskip("torch")
    from transformers import Gemma3TextConfig, Gemma3ForCausalLM
    torch.manual_seed(0)
    model = Gemma3ForCausalLM(Gemma3TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, sliding_window=8,
        layer_types=list(layer_types), attn_implementation="eager"))
    model.eval()
    return model


def test_gemma3_logits_match_hf():
    torch = pytest.importorskip("torch")
    model = _tiny_gemma3()
    cfg, params = load_hf_model(model, dtype=jnp.float32)
    assert cfg.sandwich_norms and cfg.norm_plus_one and cfg.embed_scale
    assert cfg.layer_types == ("sliding", "global")
    rng = np.random.default_rng(5)
    tokens = rng.integers(0, 128, size=(1, 20), dtype=np.int64)
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(tokens)).logits.numpy()
    ours = np.asarray(llama.forward(params, cfg, jnp.asarray(tokens)))
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=5e-3)
    # unrolled path agrees too
    ours2 = np.asarray(llama.forward_unrolled(params, cfg,
                                              jnp.asarray(tokens)))
    np.testing.assert_allclose(ours2, ref, atol=5e-3, rtol=5e-3)


def test_gemma3_engine_decode_matches_hf():
    torch = pytest.importorskip("torch")
    from guidedquant_tpu.serve import engine
    model = _tiny_gemma3()
    cfg, params = load_hf_model(model, dtype=jnp.float32)
    prompt = np.array([[5, 9, 3, 22]], dtype=np.int32)
    out, _ = engine.generate(params, cfg, prompt, 10, kv_dtype=jnp.float32,
                             max_seq=32)
    ref = model.generate(__import__("torch").from_numpy(prompt.astype(np.int64)),
                         max_new_tokens=10, do_sample=False)[0].numpy()
    np.testing.assert_array_equal(out[0], ref)
