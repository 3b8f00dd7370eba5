"""Partition-spec rules for params, KV caches, and training steps.

Megatron-style layout expressed as GSPMD annotations (the pattern in
SNIPPETS.md [1]): q/k/v/gate/up are column-parallel (out-features on 'tp'),
o/down are row-parallel (in-features on 'tp'), dense remainders are sharded
on 'fsdp', activations/batch on 'dp'. XLA inserts the all-reduce after
row-parallel matmuls and the FSDP all-gathers automatically.

Quantized params shard the same way: ``qweight`` [L, bits, N, K/32] and
``luts`` [L, N, 2^b] both carry the out-features axis N; row-parallel
modules shard the packed K/32 axis instead (32 codes per int32 word keeps
any tp-degree dividing K/32 exact).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import llama
from ..models.config import ModelConfig
from ..nn.linear import AnyPrecLinear

# (out_axis, in_axis) per module for dense [L, out, in] weights.
_COL = ("tp", "fsdp")   # column-parallel: out on tp
_ROW = ("fsdp", "tp")   # row-parallel: in on tp
MODULE_PARTITION = {
    "q_proj": _COL, "k_proj": _COL, "v_proj": _COL,
    "gate_proj": _COL, "up_proj": _COL,
    "o_proj": _ROW, "down_proj": _ROW,
}


def dense_param_specs(cfg: ModelConfig) -> Dict[str, Any]:
    layers = {
        "attn_norm": P(None, None),
        "mlp_norm": P(None, None),
    }
    for m, (oa, ia) in MODULE_PARTITION.items():
        layers[m] = P(None, oa, ia)  # [L, out, in]
    specs: Dict[str, Any] = {
        "embed": P("fsdp", None),
        "layers": layers,
        "final_norm": P(None),
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P("tp", "fsdp")
    return specs


# Fused projection leaves (serve/fuse.py) are column-parallel like their
# components.
_FUSED_PARTITION = {"qkv_proj": _COL, "gate_up_proj": _COL}


def _anyprec_spec(w: AnyPrecLinear, oa: str) -> AnyPrecLinear:
    if oa == "tp":  # column parallel: shard N
        qspec = P(None, None, "tp", None)   # [L, bits, N, K/32]
        wspec = P(None, "tp", None)         # [L, N, K_pad*bits/32]
        lspec = {b: P(None, "tp", None) for b in w.luts}
    else:  # row parallel: shard packed K
        qspec = P(None, None, None, "tp")
        wspec = P(None, None, "tp")
        lspec = {b: P(None, None, None) for b in w.luts}
    cspec = P(None, "tp", None) if oa == "tp" else P(None, None, None)
    rspec = P(None, "tp") if oa == "tp" else P(None, None)  # [L, N] rows
    if w.qwords is None:
        wq = None
    elif isinstance(w.qwords, tuple):  # composite-width field arrays
        wq = tuple(wspec for _ in w.qwords)
    else:
        wq = wspec
    return AnyPrecLinear(
        qweight=qspec, luts=lspec, bias=None if w.bias is None else P(None),
        qwords=wq,
        pcoef=None if w.pcoef is None else cspec,
        gpoly=None if w.gpoly is None else cspec,
        srow=None if w.srow is None else rspec,
        mrow=None if w.mrow is None else rspec,
        precision=w.precision, out_features=w.out_features,
        in_features=w.in_features, act_bits=w.act_bits)


def _trellis_spec(w, oa: str):
    """Partition specs for a stacked [L, ...] TrellisLinear.

    The reference provisions TP-sliced trellis checkpoints via ``rcp`` /
    ``tp_rank`` (``qtip/lib/linear/quantized_linear.py:42-44``,
    ``qtip/lib/algo/finetune.py:300-315``): row-parallel modules slice
    out-features, column-parallel slice in-features. Here the same layout
    is a GSPMD annotation: column-parallel (out on 'tp') shards the
    m-derived axes (SV, hatW rows, kwords row-words), row-parallel shards
    the n-derived axes (SU, hatW cols, kwords columns). K=3's phase-plane
    kwords [L, 3, m/32, n] shard the m/32 (col) or n (row) axis.
    """
    from ..nn.trellis import TrellisLinear
    col = oa == "tp"
    if w.kwords is None:
        kw = None
    elif w.kwords.ndim == 4:  # K=3 phase planes [L, 3, m/32, n]
        kw = P(None, None, "tp", None) if col else P(None, None, None, "tp")
    else:                     # uniform K [L, m*K/32, n]
        kw = P(None, "tp", None) if col else P(None, None, "tp")
    # reference-format trellis [L, B_tiles, T*K/16]: tiles are (m_tile,
    # n_tile) row-major, so contiguous chunks belong to m-tiles — shardable
    # on 'tp' only for column-parallel; replicate otherwise.
    tre = P(None, "tp", None) if col else P(None, None, None)
    if w.trellis.shape[-1] == 1:  # kwords-path placeholder: replicate
        tre = P(None, None, None)
    return TrellisLinear(
        trellis=tre,
        SU=P(None, None) if col else P(None, "tp"),
        SV=P(None, "tp") if col else P(None, None),
        Wscale=P(None),
        hatW=None if w.hatW is None else (
            P(None, "tp", None) if col else P(None, None, "tp")),
        kwords=kw,
        tlut=None if w.tlut is None else P(None, None, None),
        cycle=w.cycle, L_bits=w.L_bits, K=w.K, V=w.V,
        tlut_bits=w.tlut_bits, decode_mode=w.decode_mode,
        td_x=w.td_x, td_y=w.td_y,
        out_features=w.out_features, in_features=w.in_features)


def _bcq_spec(w, oa: str):
    """Stacked BcqLinear: alpha [L, N, B], packed/qwords [L, B, N, K/32],
    qbias [L, N]. Column-parallel shards N, row-parallel the packed K."""
    from ..nn.bcq_linear import BcqLinear
    col = oa == "tp"
    pspec = P(None, None, "tp", None) if col else P(None, None, None, "tp")
    return BcqLinear(
        alpha=P(None, "tp", None) if col else P(None, None, None),
        packed=pspec,
        qbias=P(None, "tp") if col else P(None, None),
        qwords=None if w.qwords is None else pspec,
        out_features=w.out_features, in_features=w.in_features)


def _actquant_spec(w, oa: str, ia: str):
    """Stacked ActQuantLinear: dense-weight layout plus the int8 native
    operands (wq like the weight; per-row wscale/rowsum follow N)."""
    from ..nn.act_quant import ActQuantLinear
    col = oa == "tp"
    row = P(None, "tp") if col else P(None, None)
    return ActQuantLinear(
        weight=P(None, oa, ia),
        bias=None if w.bias is None else row,
        wq=None if w.wq is None else P(None, oa, ia),
        wscale=None if w.wscale is None else row,
        wq_rowsum=None if w.wq_rowsum is None else row,
        in_bits=w.in_bits, in_sym=w.in_sym, in_groupsize=w.in_groupsize,
        in_clip=w.in_clip, out_bits=w.out_bits, out_sym=w.out_sym,
        online_had=w.online_had)


def quantized_param_specs(cfg: ModelConfig, params) -> Dict[str, Any]:
    """Specs for a packed model (AnyPrecLinear / TrellisLinear / BcqLinear /
    ActQuantLinear / Int8Linear leaves; fused or unfused)."""
    from ..nn.linear import Int8Linear
    from ..nn.trellis import TrellisLinear
    from ..nn.bcq_linear import BcqLinear
    from ..nn.act_quant import ActQuantLinear
    part = {**MODULE_PARTITION, **_FUSED_PARTITION}
    layers: Dict[str, Any] = {}
    for name, w in params["layers"].items():
        if isinstance(w, AnyPrecLinear):
            oa, _ia = part.get(name, _COL)
            layers[name] = _anyprec_spec(w, oa)
        elif isinstance(w, TrellisLinear):
            oa, _ia = part.get(name, _COL)
            layers[name] = _trellis_spec(w, oa)
        elif isinstance(w, BcqLinear):
            oa, _ia = part.get(name, _COL)
            layers[name] = _bcq_spec(w, oa)
        elif isinstance(w, ActQuantLinear):
            oa, ia = part.get(name, _COL)
            layers[name] = _actquant_spec(w, oa, ia)
        elif isinstance(w, Int8Linear):
            oa, ia = part.get(name, _COL)
            layers[name] = Int8Linear(
                q=P(None, oa if oa == "tp" else None,
                    "tp" if oa != "tp" else None),
                scale=P(None, "tp") if oa == "tp" else P(None, None),
                out_features=w.out_features, in_features=w.in_features)
        else:
            layers[name] = P()  # norms etc.: replicated
    specs: Dict[str, Any] = {
        "embed": P("fsdp", None),
        "layers": layers,
        "final_norm": P(),
    }
    if "lm_head" in params:
        w = params["lm_head"]
        if isinstance(w, Int8Linear):
            specs["lm_head"] = Int8Linear(
                q=P("tp", "fsdp"), scale=P("tp"),
                out_features=w.out_features, in_features=w.in_features)
        else:
            specs["lm_head"] = P("tp", "fsdp")
    return specs


def kv_cache_spec() -> P:
    # [L, B, S_max, KV, Dh]: batch on dp, kv heads on tp
    return P(None, "dp", None, "tp", None)


def to_named(mesh: Mesh, specs):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))


def put_global(x, s: NamedSharding):
    """device_put that also works when ``s`` spans multiple PROCESSES:
    every process must hold the same host value (the single-controller
    assumption of the reference's torchrun launches); each contributes its
    addressable shards via make_array_from_callback."""
    if jax.process_count() > 1:
        import numpy as np
        xn = np.asarray(x)
        return jax.make_array_from_callback(
            xn.shape, s, lambda idx, xn=xn: xn[idx])
    return jax.device_put(x, s)


def shard_params(mesh: Mesh, params, specs):
    shardings = to_named(mesh, specs)
    return jax.tree_util.tree_map(put_global, params, shardings)


# ---------------------------------------------------------------------------
# Reference training step (calibration-style full fwd+bwd) for multi-chip
# validation; the KD finetune pipeline reuses this skeleton.
# ---------------------------------------------------------------------------

def train_step(params, cfg: ModelConfig, tokens):
    """loss + grads of the causal-LM loss (full backward, dp batch)."""
    def loss_fn(p):
        logits = llama.forward(p, cfg, tokens)
        return llama.cross_entropy_loss(logits, tokens)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    return loss, grads
