"""Model configuration registry.

TPU-native analog of the reference's two config systems: the gpt-fast
``ModelArgs`` registry (reference ``inference/model.py:24-61``) and the
architecture YAML registry (``any_precision/analyzer/architectures/*.yaml``).
One dataclass covers both: geometry for the compute stack, plus the
module-name metadata the quantization pipelines need.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class RopeScaling:
    """Llama-3.1-style frequency-dependent RoPE scaling."""

    factor: float = 8.0
    low_freq_factor: float = 1.0
    high_freq_factor: float = 4.0
    original_max_position_embeddings: int = 8192


@dataclass(frozen=True)
class ModelConfig:
    name: str = "unnamed"
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = -1  # -1 -> hidden_size // num_heads
    rope_theta: float = 10000.0
    rope_scaling: Optional[RopeScaling] = None
    rms_norm_eps: float = 1e-5
    tie_word_embeddings: bool = False
    qk_norm: bool = False  # per-head RMSNorm on q/k (Qwen3/Gemma3)
    # Gemma3-family behaviors (defaults = Llama semantics)
    norm_plus_one: bool = False      # RMSNorm weight as (1 + w)
    sandwich_norms: bool = False     # post-attn/post-mlp norms inside residual
    hidden_act: str = "silu"         # "silu" | "gelu_tanh"
    attn_scalar: float = 0.0         # 0 -> 1/sqrt(head_dim); else 1/sqrt(s)
    embed_scale: bool = False        # multiply embeddings by sqrt(hidden)
    rope_local_theta: float = 0.0    # sliding layers' rope theta (0 = n/a)
    sliding_window: int = 0          # local attention window (0 = global)
    layer_types: Tuple[str, ...] = ()  # per-layer "sliding"/"global" pattern
    # OPT/Phi-family structure (defaults = Llama semantics)
    norm_type: str = "rms"           # "rms" | "ln" (LayerNorm with bias)
    mlp_type: str = "gated"          # "gated" (gate/up/down) | "fc" (fc1/fc2)
    pos_embed_type: str = "rope"     # "rope" | "learned" (OPT)
    pos_offset: int = 0              # OPT learned-position offset (2)
    linear_bias: bool = False        # attention/MLP linears carry biases
    parallel_block: bool = False     # Phi: attn+MLP share one input LN
    partial_rotary_factor: float = 1.0  # Phi: rope on first fraction of Dh
    lm_head_bias: bool = False       # Phi lm_head carries a bias
    max_seq_len: int = 4096
    # Quantization-pipeline metadata (analog of the arch YAMLs:
    # reference any_precision/analyzer/architectures/llama.yaml).
    arch: str = "llama"
    module_names: Tuple[str, ...] = (
        "q_proj", "k_proj", "v_proj", "o_proj",
        "gate_proj", "up_proj", "down_proj",
    )

    def __post_init__(self):
        if self.head_dim == -1:
            object.__setattr__(self, "head_dim", self.hidden_size // self.num_heads)

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim

    def num_params(self, include_embeddings: bool = True) -> int:
        """Parameter count (for bandwidth/FLOPs accounting in benchmarks)."""
        d, f = self.hidden_size, self.intermediate_size
        mlp_w = 2 * d * f if self.mlp_type == "fc" else 3 * d * f
        per_layer = (
            d * self.q_dim + 2 * d * self.kv_dim + self.q_dim * d  # attn
            + mlp_w
            + 2 * d  # norms
        )
        n = self.num_layers * per_layer + d
        if include_embeddings:
            n += self.vocab_size * d
            if not self.tie_word_embeddings:
                n += self.vocab_size * d
        return n

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        return json.dumps(d, indent=2)

    @staticmethod
    def from_json(s: str) -> "ModelConfig":
        d = json.loads(s)
        if d.get("rope_scaling") is not None:
            d["rope_scaling"] = RopeScaling(**d["rope_scaling"])
        if isinstance(d.get("module_names"), list):
            d["module_names"] = tuple(d["module_names"])
        if isinstance(d.get("layer_types"), list):
            d["layer_types"] = tuple(d["layer_types"])
        return ModelConfig(**d)


def _llama31_scaling() -> RopeScaling:
    return RopeScaling(factor=8.0, low_freq_factor=1.0, high_freq_factor=4.0,
                       original_max_position_embeddings=8192)


# Registry mirroring the reference's supported families
# (inference/model.py:53-61 plus the analyzer YAML set).
CONFIGS = {
    "llama-2-7b": ModelConfig(
        name="llama-2-7b", vocab_size=32000, hidden_size=4096,
        intermediate_size=11008, num_layers=32, num_heads=32, num_kv_heads=32,
        rope_theta=10000.0, rms_norm_eps=1e-5, max_seq_len=4096),
    "llama-2-13b": ModelConfig(
        name="llama-2-13b", vocab_size=32000, hidden_size=5120,
        intermediate_size=13824, num_layers=40, num_heads=40, num_kv_heads=40,
        rope_theta=10000.0, rms_norm_eps=1e-5, max_seq_len=4096),
    "llama-2-70b": ModelConfig(
        name="llama-2-70b", vocab_size=32000, hidden_size=8192,
        intermediate_size=28672, num_layers=80, num_heads=64, num_kv_heads=8,
        rope_theta=10000.0, rms_norm_eps=1e-5, max_seq_len=4096),
    "llama-3-8b": ModelConfig(
        name="llama-3-8b", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_layers=32, num_heads=32, num_kv_heads=8,
        rope_theta=500000.0, rms_norm_eps=1e-5, max_seq_len=8192),
    "llama-3.1-8b": ModelConfig(
        name="llama-3.1-8b", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_layers=32, num_heads=32, num_kv_heads=8,
        rope_theta=500000.0, rope_scaling=_llama31_scaling(),
        rms_norm_eps=1e-5, max_seq_len=8192),
    "llama-3.1-70b": ModelConfig(
        name="llama-3.1-70b", vocab_size=128256, hidden_size=8192,
        intermediate_size=28672, num_layers=80, num_heads=64, num_kv_heads=8,
        rope_theta=500000.0, rope_scaling=_llama31_scaling(),
        rms_norm_eps=1e-5, max_seq_len=8192),
    "llama-3.2-1b": ModelConfig(
        name="llama-3.2-1b", vocab_size=128256, hidden_size=2048,
        intermediate_size=8192, num_layers=16, num_heads=32, num_kv_heads=8,
        head_dim=64, rope_theta=500000.0, rope_scaling=_llama31_scaling(),
        rms_norm_eps=1e-5, tie_word_embeddings=True, max_seq_len=8192),
    "llama-3.2-3b": ModelConfig(
        name="llama-3.2-3b", vocab_size=128256, hidden_size=3072,
        intermediate_size=8192, num_layers=28, num_heads=24, num_kv_heads=8,
        head_dim=128, rope_theta=500000.0, rope_scaling=_llama31_scaling(),
        rms_norm_eps=1e-5, tie_word_embeddings=True, max_seq_len=8192),
    "qwen3-8b": ModelConfig(
        name="qwen3-8b", vocab_size=151936, hidden_size=4096,
        intermediate_size=12288, num_layers=36, num_heads=32, num_kv_heads=8,
        head_dim=128, rope_theta=1000000.0, rms_norm_eps=1e-6, qk_norm=True,
        max_seq_len=32768, arch="qwen3"),
    "gemma3-4b": ModelConfig(
        name="gemma3-4b", vocab_size=262208, hidden_size=2560,
        intermediate_size=10240, num_layers=34, num_heads=8, num_kv_heads=4,
        head_dim=256, rope_theta=1000000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=True, qk_norm=True, norm_plus_one=True,
        sandwich_norms=True, hidden_act="gelu_tanh", attn_scalar=256.0,
        embed_scale=True, rope_local_theta=10000.0, sliding_window=1024,
        layer_types=tuple(("global" if (i + 1) % 6 == 0 else "sliding")
                          for i in range(34)),
        max_seq_len=8192, arch="gemma3"),
    "mistral-7b": ModelConfig(
        name="mistral-7b", vocab_size=32000, hidden_size=4096,
        intermediate_size=14336, num_layers=32, num_heads=32, num_kv_heads=8,
        rope_theta=10000.0, rms_norm_eps=1e-5, max_seq_len=8192,
        arch="mistral"),
    # OPT family (reference architectures/opt.yaml): pre-LN LayerNorm with
    # bias, learned positions (offset 2), ReLU fc MLP, biased linears.
    "opt-1.3b": ModelConfig(
        name="opt-1.3b", vocab_size=50272, hidden_size=2048,
        intermediate_size=8192, num_layers=24, num_heads=32, num_kv_heads=32,
        rms_norm_eps=1e-5, norm_type="ln", mlp_type="fc",
        pos_embed_type="learned", pos_offset=2, linear_bias=True,
        hidden_act="relu", tie_word_embeddings=True, max_seq_len=2048,
        arch="opt",
        module_names=("q_proj", "k_proj", "v_proj", "o_proj", "fc1", "fc2")),
    # Phi-2 (reference architectures/phi.yaml): parallel attn+MLP block,
    # partial rotary, LayerNorm, gelu fc MLP, biased linears + head bias.
    "phi-2": ModelConfig(
        name="phi-2", vocab_size=51200, hidden_size=2560,
        intermediate_size=10240, num_layers=32, num_heads=32, num_kv_heads=32,
        rope_theta=10000.0, rms_norm_eps=1e-5, norm_type="ln", mlp_type="fc",
        linear_bias=True, parallel_block=True, partial_rotary_factor=0.4,
        hidden_act="gelu_tanh", lm_head_bias=True, max_seq_len=2048,
        arch="phi",
        module_names=("q_proj", "k_proj", "v_proj", "o_proj", "fc1", "fc2")),
    # Small configs for tests and CI.
    "tiny": ModelConfig(
        name="tiny", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, rope_theta=10000.0,
        rms_norm_eps=1e-5, max_seq_len=128),
    "tiny-tied": ModelConfig(
        name="tiny-tied", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, rope_theta=500000.0,
        rope_scaling=_llama31_scaling(), rms_norm_eps=1e-5,
        tie_word_embeddings=True, max_seq_len=128),
}


def get_config(name: str) -> ModelConfig:
    key = name.lower()
    if key in CONFIGS:
        return CONFIGS[key]
    # Fuzzy match on substrings, mirroring Transformer.from_name
    # (reference inference/model.py:125-134).
    matches = [k for k in CONFIGS if k in key]
    if len(matches) == 1:
        return CONFIGS[matches[0]]
    if matches:
        # prefer the longest (most specific) match
        best = max(matches, key=len)
        ties = [m for m in matches if len(m) == len(best)]
        if len(ties) == 1:
            return CONFIGS[best]
    raise KeyError(f"No model config matching {name!r}; known: {sorted(CONFIGS)}")
