"""High-level model API: the ``AnyPrecisionForCausalLM`` analog.

Mirrors the reference's HF-style runtime surface
(``any_precision/modules/AnyPrecisionForCausalLM.py:101-175``):
``from_quantized`` loads a packed dir, ``set_precision`` switches bit-width
at runtime, ``generate`` runs the jitted engine.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp


class QuantizedCausalLM:
    def __init__(self, cfg, params, backend: str = "anyprec", mesh=None):
        self.cfg = cfg
        self.params = params
        self.backend = backend
        self.mesh = mesh
        self._fused = None

    # -- loading -----------------------------------------------------------

    @classmethod
    def from_quantized(cls, model_dir: str, precision: Optional[int] = None,
                       dtype=jnp.bfloat16, fuse: bool = True,
                       int8_head: bool = False, mesh=None,
                       unroll: bool = True, act8: Optional[bool] = None,
                       head_bits: Optional[int] = None):
        import os
        from ..utils.cache import load_json
        meta = load_json(os.path.join(model_dir, "config.json"))
        if "quip_params" in meta:
            from ..formats import qtip_format
            cfg, params = qtip_format.load_packed(model_dir, dtype=dtype)
            backend = "qtip"
        else:
            from ..formats.anyprec import load_packed
            cfg, params = load_packed(model_dir, precision=precision,
                                      dtype=dtype)
            backend = "anyprec"
        if int8_head and head_bits:
            raise ValueError("int8_head and head_bits are exclusive")
        if int8_head:
            from ..nn.linear import quantize_int8
            head = params.get("lm_head", params["embed"])
            params = dict(params)
            params["lm_head"] = quantize_int8(head)
            cfg = cfg.replace(tie_word_embeddings=False)
        elif head_bits:
            # b-bit per-row affine head on the fast code-dot kernel path
            # (data-free MSE-grid; 5-bit measured +0.08% ppl on the real
            # checkpoint — PERF_NOTES round 5). The a8 policy below also
            # applies to it when the backend qualifies.
            from ..nn.linear import quantize_affine
            head = params.get("lm_head", params["embed"])
            params = dict(params)
            params["lm_head"] = quantize_affine(head, bits=head_bits)
            cfg = cfg.replace(tie_word_embeddings=False)
        if backend == "anyprec":
            # Measured-best decode config (PERF_NOTES r4): W{b}A8 int-MXU
            # kernels on affine-fast-path leaves (B=1 decode is the <=32
            # regime where A8 wins; +0.15% ppl, quality-gated).
            # ``act8=False`` or GQ_ACT8=0 opts out; no-op off the affine
            # fast path.
            from ..nn.linear import (AnyPrecLinear, apply_act8_policy,
                                     with_act8)
            if act8 is None and os.environ.get("GQ_ACT8") == "0":
                act8 = False
            params = apply_act8_policy(params, slots=1, enable=act8)
            if (act8 is not False
                    and isinstance(params.get("lm_head"), AnyPrecLinear)):
                params = dict(params,
                              lm_head=with_act8(params["lm_head"]))
        obj = cls(cfg, params, backend, mesh=mesh)
        if fuse:
            obj.fuse()
        if mesh is not None:
            obj.shard(mesh)
        elif unroll:
            # single-chip decode: per-layer weight buffers (Pallas operands
            # bind directly; see engine.unroll_layers). Mesh-sharded params
            # stay stacked — GSPMD shards the stacked leaves.
            obj.unroll()
        return obj

    def fuse(self):
        from .fuse import fusable, fuse_projections
        if self._fused is None and fusable(self.params):
            self._fused = fuse_projections(self.params)
        return self

    def unroll(self):
        """Unroll the fused decode copy only — ``self.params`` stays
        stacked for forward()/evaluate_ppl (lax.scan paths)."""
        from .engine import unroll_layers
        from .fuse import fusable
        if self._fused is None and fusable(self.params):
            self.fuse()
        if (self._fused is not None
                and not isinstance(self._fused["layers"], (tuple, list))):
            self._fused = unroll_layers(self._fused)
        return self

    def shard(self, mesh):
        """tp/fsdp-shard the serving params over the mesh (GSPMD; the
        multi-chip serving path — no reference counterpart, BASELINE
        north-star). Call ``parallel.distributed.init_distributed`` first
        on multi-host."""
        from ..parallel import sharding
        self.mesh = mesh
        target = self._fused if self._fused is not None else self.params
        specs = sharding.quantized_param_specs(self.cfg, target)
        sharded = sharding.shard_params(mesh, target, specs)
        if self._fused is not None:
            self._fused = sharded
        else:
            self.params = sharded
        return self

    # -- runtime precision switch (anyprec only) ---------------------------

    @property
    def precision(self) -> Optional[int]:
        if self.backend != "anyprec":
            return None
        return self.params["layers"]["q_proj"].precision

    def set_precision(self, bits: int):
        assert self.backend == "anyprec"
        from ..formats.anyprec import set_model_precision
        self.params = set_model_precision(self.params, bits)
        self._fused = None
        self.fuse()
        return self

    # -- inference ---------------------------------------------------------

    def generate(self, prompt_ids: np.ndarray, max_new_tokens: int = 100,
                 temperature: float = 0.0, top_k: Optional[int] = None,
                 kv_bits: int = 16, r3: bool = False, seed: int = 0,
                 window: Optional[int] = None,
                 eos_id: Optional[int] = None):
        """``window``: sliding-layer ring-buffer size for cfg.layer_types
        models (None = auto: cfg.sliding_window when the model has sliding
        layers and the params are unrolled; 0 disables)."""
        from . import engine
        params = self._fused if self._fused is not None else self.params
        if window is None:
            window = (self.cfg.sliding_window
                      if self.cfg.layer_types and self.cfg.sliding_window
                      and isinstance(params["layers"], (tuple, list)) else 0)
        kv_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            from ..parallel import sharding as shd
            kv_sharding = NamedSharding(self.mesh, shd.kv_cache_spec())
        return engine.generate(params, self.cfg, prompt_ids, max_new_tokens,
                               temperature=temperature, top_k=top_k,
                               kv_bits=kv_bits, r3=r3, seed=seed,
                               kv_sharding=kv_sharding, window=window,
                               eos_id=eos_id)

    def forward(self, tokens: np.ndarray):
        from ..models import llama
        return llama.forward(self.params, self.cfg, jnp.asarray(tokens))

    def evaluate_ppl(self, token_stream, ctx_len: int = 2048, **kw):
        from ..evaluate import evaluate_ppl
        return evaluate_ppl(self.params, self.cfg, token_stream,
                            ctx_len=ctx_len, **kw)
