"""Projection fusion for the decode engine.

Analog of the reference's fused QKV / fused Up-Gate projections
(``inference/model.py:175-181,206-215,248-266`` and the checkpoint fuser
``sqllm_llama_convert_fuse.py:70-113``): q/k/v (resp. gate/up) share the
same input, so their weights concatenate along the output dimension into a
single matmul / single LUT-GEMV kernel launch.

Works for dense arrays, AnyPrecLinear (bit-planes, LUTs, lane-tiled words
and poly coefficients all concatenate along the row axis) and
ActQuantLinear. TrellisLinear is not fusable (per-module input sign
vectors SU differ), matching the reference's ``fuse_linears=backend!='qtip'``
gate (generate.py load_model).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..nn.linear import AnyPrecLinear
from ..nn.act_quant import ActQuantLinear
from ..nn.trellis import TrellisLinear


def _concat_linears(ws, axis_n: int):
    """Concatenate linear leaves along the out-features axis."""
    first = ws[0]
    if isinstance(first, AnyPrecLinear):
        luts = {b: jnp.concatenate([w.luts[b] for w in ws], axis=axis_n)
                for b in first.luts}
        qwords = None
        pcoef = None
        gpoly = srow = mrow = None
        if all(w.qwords is not None for w in ws):
            if isinstance(first.qwords, tuple):  # composite-width fields
                qwords = tuple(
                    jnp.concatenate([w.qwords[i] for w in ws], axis=axis_n)
                    for i in range(len(first.qwords)))
            else:
                qwords = jnp.concatenate([w.qwords for w in ws], axis=axis_n)
            if all(w.pcoef is not None for w in ws):
                pcoef = jnp.concatenate([w.pcoef for w in ws], axis=axis_n)
        if all(w.gpoly is None and w.srow is not None for w in ws):
            # affine family: rows concatenate freely (gpoly stays None so
            # the dispatcher keeps the affine kernel path)
            srow = jnp.concatenate([w.srow for w in ws], axis=axis_n)
            mrow = jnp.concatenate([w.mrow for w in ws], axis=axis_n)
        elif all(w.gpoly is not None for w in ws):
            # valid iff every module's rows are whole tiles of equal size
            tiles = {w.out_features // w.gpoly.shape[axis_n] for w in ws}
            if len(tiles) == 1:
                gpoly = jnp.concatenate([w.gpoly for w in ws], axis=axis_n)
                srow = jnp.concatenate([w.srow for w in ws], axis=axis_n)
                mrow = jnp.concatenate([w.mrow for w in ws], axis=axis_n)
        return AnyPrecLinear(
            qweight=jnp.concatenate([w.qweight for w in ws], axis=axis_n + 1),
            luts=luts, bias=None, qwords=qwords, pcoef=pcoef,
            gpoly=gpoly, srow=srow, mrow=mrow,
            precision=first.precision,
            out_features=sum(w.out_features for w in ws),
            in_features=first.in_features,
            act_bits=first.act_bits)
    if isinstance(first, ActQuantLinear):
        return ActQuantLinear(
            weight=jnp.concatenate([w.weight for w in ws], axis=axis_n),
            bias=None, in_bits=first.in_bits, in_sym=first.in_sym,
            in_groupsize=first.in_groupsize, in_clip=first.in_clip,
            out_bits=first.out_bits, out_sym=first.out_sym,
            online_had=first.online_had)
    if isinstance(first, TrellisLinear):
        raise TypeError("TrellisLinear is not fusable (per-module SU)")
    # dense
    return jnp.concatenate(ws, axis=axis_n)


def fusable(params: Dict) -> bool:
    return not isinstance(params["layers"]["q_proj"], TrellisLinear)


def fuse_projections(params: Dict) -> Dict:
    """Return params with 'qkv_proj' and 'gate_up_proj' fused leaves added
    (stacked [L, ...] layout; axis 1 is out-features after the L axis)."""
    lp = params["layers"]
    fused = dict(lp)
    fused["qkv_proj"] = _concat_linears(
        [lp["q_proj"], lp["k_proj"], lp["v_proj"]], axis_n=1)
    fused["gate_up_proj"] = _concat_linears(
        [lp["gate_proj"], lp["up_proj"]], axis_n=1)
    for k in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        del fused[k]
    out = dict(params)
    out["layers"] = fused
    return out
