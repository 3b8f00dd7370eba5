"""Results ledger: incremental, recursively sorted results.json.

Analog of the reference's ``run_eval.py:125-179`` ledger — nested
``{model: {ppl: {dataset: {bits: value}}, lm-eval: ...}}`` merged
incrementally so repeated runs skip completed entries (the golden-file
regression pattern, SURVEY.md §4).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict


def _deep_merge(dst: Dict, src: Dict) -> Dict:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = v
    return dst


def _deep_sort(obj):
    if isinstance(obj, dict):
        return {k: _deep_sort(obj[k]) for k in sorted(obj)}
    return obj


def load_results(path: str = "results.json") -> Dict:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def record_result(path: str, model: str, kind: str, dataset: str,
                  key: str, value: Any) -> Dict:
    """e.g. record_result('results.json', 'layerwise-llama...', 'ppl',
    'wikitext2', '4', 6.13)."""
    results = load_results(path)
    _deep_merge(results, {model: {kind: {dataset: {str(key): value}}}})
    results = _deep_sort(results)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(results, f, indent=2)
    os.replace(tmp, path)
    return results


def has_result(path: str, model: str, kind: str, dataset: str,
               key: str) -> bool:
    r = load_results(path)
    try:
        return str(key) in r[model][kind][dataset]
    except KeyError:
        return False
