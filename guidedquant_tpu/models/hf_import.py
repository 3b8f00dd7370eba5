"""HuggingFace checkpoint import: torch/safetensors state dict -> pytree.

Analog of the reference's reliance on ``AutoModelForCausalLM`` + the
``ModelAnalyzer`` accessors (``any_precision/analyzer/analyzer.py:45-137``):
we convert an HF Llama-family checkpoint into the stacked-pytree layout of
``guidedquant_tpu.models.llama`` once, up front.

Weights stay in HF's (out_features, in_features) orientation, which is the
(N, K) convention used throughout the quantization stack.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np
import jax.numpy as jnp

from .config import ModelConfig, RopeScaling


_FC_MODULES = ("q_proj", "k_proj", "v_proj", "o_proj", "fc1", "fc2")


def config_from_hf(hf_config) -> ModelConfig:
    """Build a ModelConfig from a transformers config object.

    Covers the reference's architecture-YAML registry (llama/qwen3/gemma3/
    mistral/opt/phi, ``any_precision/analyzer/architectures/*.yaml``); any
    other rope+gated-MLP model_type falls through to Llama semantics — the
    analog of ``AutoArchConfig`` (``analyzer.py:139-173``).
    """
    arch0 = getattr(hf_config, "model_type", "llama")
    name = getattr(hf_config, "name_or_path", "hf-import") or "hf-import"
    if arch0 == "opt":
        # Pre-LN OPT only (125m/1.3b+); 350m's post-LN + embed projection
        # is out of scope, as in the reference's opt.yaml.
        assert getattr(hf_config, "do_layer_norm_before", True), \
            "post-LayerNorm OPT variants unsupported"
        assert getattr(hf_config, "word_embed_proj_dim",
                       hf_config.hidden_size) == hf_config.hidden_size, \
            "OPT word_embed_proj_dim != hidden_size unsupported"
        return ModelConfig(
            arch="opt", name=name, norm_type="ln", mlp_type="fc",
            pos_embed_type="learned", pos_offset=2,
            linear_bias=getattr(hf_config, "enable_bias", True),
            hidden_act=hf_config.activation_function,
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.ffn_dim,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_attention_heads,
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings", True),
            max_seq_len=hf_config.max_position_embeddings,
            module_names=_FC_MODULES)
    if arch0 == "phi":
        act = hf_config.hidden_act
        return ModelConfig(
            arch="phi", name=name, norm_type="ln", mlp_type="fc",
            linear_bias=True, parallel_block=True, lm_head_bias=True,
            partial_rotary_factor=getattr(hf_config, "partial_rotary_factor",
                                          0.5),
            hidden_act="gelu_tanh" if act.startswith("gelu") else act,
            rope_theta=getattr(hf_config, "rope_theta", 10000.0),
            rms_norm_eps=getattr(hf_config, "layer_norm_eps", 1e-5),
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            intermediate_size=hf_config.intermediate_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=getattr(hf_config, "num_key_value_heads", None)
            or hf_config.num_attention_heads,
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings",
                                        False),
            max_seq_len=hf_config.max_position_embeddings,
            module_names=_FC_MODULES)
    rs = None
    raw = getattr(hf_config, "rope_scaling", None)
    if raw:
        # transformers uses {"rope_type": "llama3", ...}
        rt = raw.get("rope_type", raw.get("type", None))
        if rt == "llama3":
            rs = RopeScaling(
                factor=raw["factor"],
                low_freq_factor=raw["low_freq_factor"],
                high_freq_factor=raw["high_freq_factor"],
                original_max_position_embeddings=raw["original_max_position_embeddings"],
            )
        elif rt in (None, "default"):
            rs = None
        else:
            raise NotImplementedError(f"rope scaling {rt!r}")
    head_dim = getattr(hf_config, "head_dim", None)
    if head_dim is None:
        head_dim = hf_config.hidden_size // hf_config.num_attention_heads
    arch = getattr(hf_config, "model_type", "llama")
    gemma = arch in ("gemma3", "gemma3_text")
    extra = {}
    if gemma:
        layer_types = tuple(
            "global" if t == "full_attention" else "sliding"
            for t in getattr(hf_config, "layer_types", []))
        extra = dict(
            norm_plus_one=True, sandwich_norms=True,
            hidden_act="gelu_tanh",
            attn_scalar=float(getattr(hf_config, "query_pre_attn_scalar",
                                      hf_config.head_dim)),
            embed_scale=True,
            rope_local_theta=float(getattr(hf_config,
                                           "rope_local_base_freq", 10000.0)),
            sliding_window=int(getattr(hf_config, "sliding_window", 0) or 0),
            layer_types=layer_types,
        )
    return ModelConfig(
        arch=arch,
        qk_norm=arch in ("qwen3", "qwen3_moe") or gemma,
        **extra,
        name=getattr(hf_config, "name_or_path", "hf-import") or "hf-import",
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=getattr(hf_config, "num_key_value_heads",
                             hf_config.num_attention_heads),
        head_dim=head_dim,
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        rope_scaling=rs,
        rms_norm_eps=hf_config.rms_norm_eps,
        tie_word_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        max_seq_len=getattr(hf_config, "max_position_embeddings", 4096),
    )


_LAYER_KEYS = {
    "q_proj": "self_attn.q_proj.weight",
    "k_proj": "self_attn.k_proj.weight",
    "v_proj": "self_attn.v_proj.weight",
    "o_proj": "self_attn.o_proj.weight",
    "gate_proj": "mlp.gate_proj.weight",
    "up_proj": "mlp.up_proj.weight",
    "down_proj": "mlp.down_proj.weight",
    "attn_norm": "input_layernorm.weight",
    "mlp_norm": "post_attention_layernorm.weight",
}

# Per-arch HF module paths (without .weight/.bias suffix).
_OPT_MODULES = {
    "q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
    "v_proj": "self_attn.v_proj", "o_proj": "self_attn.out_proj",
    "fc1": "fc1", "fc2": "fc2",
    "attn_norm": "self_attn_layer_norm", "mlp_norm": "final_layer_norm",
}
_PHI_MODULES = {
    "q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
    "v_proj": "self_attn.v_proj", "o_proj": "self_attn.dense",
    "fc1": "mlp.fc1", "fc2": "mlp.fc2",
    "attn_norm": "input_layernorm",
}


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor
    t = t.detach().cpu()
    if str(t.dtype) == "torch.bfloat16":
        t = t.float()
    return t.numpy()


def params_from_state_dict(state: Dict[str, Any], cfg: ModelConfig,
                           dtype=jnp.float32) -> Dict[str, Any]:
    """HF state_dict (torch tensors or numpy) -> stacked pytree."""
    def get(k):
        return _to_np(state[k])

    L = cfg.num_layers
    if cfg.arch == "opt":
        prefix, embed_key, final_norm_key = (
            "model.decoder.layers.", "model.decoder.embed_tokens.weight",
            "model.decoder.final_layer_norm.weight")
        modules = dict(_OPT_MODULES)
    elif cfg.arch == "phi":
        prefix, embed_key, final_norm_key = (
            "model.layers.", "model.embed_tokens.weight",
            "model.final_layernorm.weight")
        modules = dict(_PHI_MODULES)
    else:
        prefix, embed_key, final_norm_key = (
            "model.layers.", "model.embed_tokens.weight", "model.norm.weight")
        modules = None

    keys = {}
    if modules is not None:
        for ours, theirs in modules.items():
            keys[ours] = theirs + ".weight"
            is_norm = ours.endswith("_norm")
            if (is_norm and cfg.norm_type == "ln") or \
                    (not is_norm and cfg.linear_bias):
                keys[ours + "_bias"] = theirs + ".bias"
    else:
        keys = dict(_LAYER_KEYS)
        if cfg.qk_norm:
            keys["q_norm"] = "self_attn.q_norm.weight"
            keys["k_norm"] = "self_attn.k_norm.weight"
        if cfg.sandwich_norms:
            # Gemma3 naming: input/post_attention are the attention sandwich,
            # pre/post_feedforward the MLP sandwich
            keys["post_attn_norm"] = "post_attention_layernorm.weight"
            keys["mlp_norm"] = "pre_feedforward_layernorm.weight"
            keys["post_mlp_norm"] = "post_feedforward_layernorm.weight"
    layers: Dict[str, Any] = {}
    for ours, theirs in keys.items():
        stacked = np.stack(
            [get(f"{prefix}{i}.{theirs}") for i in range(L)], axis=0)
        layers[ours] = jnp.asarray(stacked, dtype)

    params: Dict[str, Any] = {
        "embed": jnp.asarray(get(embed_key), dtype),
        "layers": layers,
        "final_norm": jnp.asarray(get(final_norm_key), dtype),
    }
    if cfg.norm_type == "ln":
        params["final_norm_bias"] = jnp.asarray(
            get(final_norm_key.replace(".weight", ".bias")), dtype)
    if cfg.pos_embed_type == "learned":
        params["pos_embed"] = jnp.asarray(
            get("model.decoder.embed_positions.weight"), dtype)
    if not cfg.tie_word_embeddings:
        key = "lm_head.weight"
        if key not in state:  # some tied checkpoints omit it
            key = embed_key
        params["lm_head"] = jnp.asarray(get(key), dtype)
        if cfg.lm_head_bias:
            params["lm_head_bias"] = jnp.asarray(get("lm_head.bias"), dtype)
    return params


def autodetect_arch(state_keys) -> Dict[str, Any]:
    """Scan a state_dict's keys for the decoder-layer prefix and the Linear
    module names inside one layer — the TPU-build analog of the reference's
    ``AutoArchConfig`` (``any_precision/analyzer/analyzer.py:139-173``),
    which walks ``nn.Linear`` instances of an instantiated model.

    Returns ``{"layers_prefix": str, "module_names": tuple}``.
    """
    import re
    pat = re.compile(r"^(.*\.layers\.)0\.(.+)\.weight$")
    prefix = None
    modules = []
    for k in state_keys:
        m = pat.match(k)
        if not m:
            continue
        prefix = m.group(1)
        path = m.group(2)
        leaf = path.split(".")[-1]
        if "norm" in path.lower():
            continue
        modules.append(leaf)
    if prefix is None:
        raise ValueError("no '<...>.layers.N.' decoder structure found")
    return {"layers_prefix": prefix, "module_names": tuple(modules)}


def load_hf_model(model_or_path, dtype=jnp.float32):
    """Load a transformers model (object or path) -> (cfg, params).

    Accepts an already-instantiated ``transformers`` model to keep tests
    hermetic (no network).
    """
    if isinstance(model_or_path, (str, os.PathLike)):
        from transformers import AutoModelForCausalLM
        model = AutoModelForCausalLM.from_pretrained(model_or_path)
    else:
        model = model_or_path
    cfg = config_from_hf(model.config)
    params = params_from_state_dict(model.state_dict(), cfg, dtype)
    return cfg, params
