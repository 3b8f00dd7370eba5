"""Seed quantizer driver: SqueezeLLM-style weighted k-means + any-precision
upscale, per (row, group).

Analog of ``_seed_and_upscale_layer`` / ``seed_and_upscale``
(``any_precision/quantization/quantize.py:77-332``), with the numba prange
row loop replaced by the fully vectorized solver in ``kmeans1d``.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Tuple

import numpy as np

from .kmeans1d import seed_and_upscale_rows

logger = logging.getLogger(__name__)


def seed_and_upscale_module(weight: np.ndarray, gradient: np.ndarray,
                            seed_bit: int, parent_bit: int,
                            group_count: int = 1,
                            ) -> Tuple[List[np.ndarray], np.ndarray]:
    """One linear module.

    weight, gradient: [N, K] f32. Returns:
      luts_by_bit: list over b in [seed_bit, parent_bit] of [N, group_count, 2^b]
      labels:      [N, group_count, K // group_count] uint8 parent codes
    Sample weights are the squared-gradient saliencies, masked where the
    weight is exactly zero (reference quantize.py:111-113).
    """
    N, K = weight.shape
    gs = K // group_count
    assert gs * group_count == K, f"group_count {group_count} !| {K}"

    x = weight.astype(np.float32).reshape(N * group_count, gs)
    sw = (gradient.astype(np.float32) * (weight != 0)).reshape(N * group_count, gs)

    luts, labels = seed_and_upscale_rows(x, sw, seed_bit, parent_bit)
    luts_by_bit = [l.reshape(N, group_count, -1) for l in luts]
    return luts_by_bit, labels.reshape(N, group_count, gs)


def seed_and_upscale_layer(weights: Dict[str, np.ndarray],
                           gradients: Dict[str, np.ndarray],
                           seed_bit: int, parent_bit: int,
                           group_count: int = 1):
    """All target modules of one decoder layer.

    Returns ({module: [luts_by_bit]}, {module: labels}).
    """
    luts_out, labels_out = {}, {}
    for name, w in weights.items():
        luts, labels = seed_and_upscale_module(
            w, gradients[name], seed_bit, parent_bit, group_count)
        luts_out[name] = luts
        labels_out[name] = labels
        logger.info("seed: %s %s done", name, w.shape)
    return luts_out, labels_out


def dequant_from_labels(labels: np.ndarray, lut: np.ndarray,
                        bits: int, parent_bit: int) -> np.ndarray:
    """Reconstruct [N, K] weights at ``bits`` precision from parent labels
    (b-bit code = MSB prefix of the parent code)."""
    N, G, gs = labels.shape
    codes = labels.astype(np.int64) >> (parent_bit - bits)
    out = np.take_along_axis(
        lut.astype(np.float32), codes.reshape(N, G, gs), axis=2)
    return out.reshape(N, G * gs)
