"""Cache tree: keyed, layer-resumable artifacts.

Mirrors the reference's filesystem-checkpoint resume semantics (SURVEY.md
§5.3/§5.4; reference ``layerwise_main.py:48-69`` path scheme,
``quantize.py:239-250`` skip-if-present): every pipeline stage writes
per-layer files under a key derived from (model, dataset, samples, seq_len,
groups, ...) and re-running skips completed layers.

Artifacts are ``.npz`` dicts (module name -> array) instead of ``.pt``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import numpy as np


def dataset_key(model_name: str, dataset: str, num_examples: int,
                seq_len: int) -> str:
    return f"{model_name}-{dataset}_s{num_examples}_blk{seq_len}"


def save_npz_dict(path: str, d: Dict[str, np.ndarray]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **d)
    os.replace(tmp, path)


def load_npz_dict(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def layer_path(base: str, layer: int) -> str:
    return os.path.join(base, f"l{layer}.npz")


def done_layers(base: str, num_layers: int) -> Tuple[List[int], List[int]]:
    """(todo, done) split by file existence (reference _load_progress)."""
    todo, done = [], []
    for l in range(num_layers):
        (done if os.path.exists(layer_path(base, l)) else todo).append(l)
    return todo, done


def save_json(path: str, obj) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2)


def load_json(path: str):
    with open(path) as f:
        return json.load(f)
