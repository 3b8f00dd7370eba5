"""Device mesh construction.

The reference's distributed backend is NCCL/torchrun (SURVEY.md §5.8); the
TPU-native design is a single named ``jax.sharding.Mesh`` with
('dp', 'fsdp', 'tp') axes — data parallel, ZeRO-3-style parameter sharding,
and tensor parallel — over ICI. GSPMD/pjit inserts the collectives the
reference issues by hand through FSDP/NCCL.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("dp", "fsdp", "tp")


def mesh_shape_for(n_devices: int) -> Tuple[int, int, int]:
    """Factor n into (dp, fsdp, tp), preferring tp then fsdp."""
    assert n_devices >= 1
    tp = 1
    for cand in (8, 4, 2, 1):
        if n_devices % cand == 0:
            tp = cand
            break
    rest = n_devices // tp
    fsdp = 1
    for cand in (8, 4, 2, 1):
        if rest % cand == 0:
            fsdp = cand
            break
    dp = rest // fsdp
    return dp, fsdp, tp


def make_mesh(n_devices: Optional[int] = None,
              shape: Optional[Dict[str, int]] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    if shape is None:
        dp, fsdp, tp = mesh_shape_for(n)
    else:
        dp, fsdp, tp = (shape.get("dp", 1), shape.get("fsdp", 1),
                        shape.get("tp", 1))
    assert dp * fsdp * tp == n, (dp, fsdp, tp, n)
    arr = np.asarray(devices[:n]).reshape(dp, fsdp, tp)
    return Mesh(arr, AXES)
