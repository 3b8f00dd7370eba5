"""Calibration token sampling.

Port of the reference's sampling semantics
(``any_precision/quantization/datautils.py:61-198``) — the three sampling
strategies and per-dataset routing are preserved exactly, because the
calibration recipe (dataset, seed, strategy) affects final perplexity:

- ``sample_tokenize``             truncate-from-start  (c4/ptb/pileval)
- ``sample_tokenize_from_middle`` random window within each doc (redpajama,
                                  following PV-Tuning)
- ``sample_concat_tokenize``      join all docs with "\\n\\n", sample
                                  non-overlapping windows (wikitext2)

Dataset loading goes through HF ``datasets`` and is import-gated so the rest
of the stack works fully offline (tests inject synthetic text corpora).
"""

from __future__ import annotations

import logging
import os
import random
from typing import Callable, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Dataset loaders (reference datautils.py:9-58); network-gated.
# ---------------------------------------------------------------------------

def _load_texts(dataset_name: str, split: str) -> List[str]:
    from datasets import load_dataset  # gated import

    if dataset_name == "wikitext2":
        assert split in ("train", "validation", "test")
        return load_dataset("wikitext", "wikitext-2-raw-v1", split=split)["text"]
    if dataset_name == "ptb":
        assert split in ("train", "validation", "test")
        data = load_dataset("ptb_text_only", "penn_treebank", split=split,
                            trust_remote_code=True)["sentence"]
        return [s.replace("<unk>", "< u n k >") for s in data]
    if dataset_name == "c4":
        files = {"train": "en/c4-train.00000-of-01024.json.gz",
                 "validation": "en/c4-validation.00000-of-00008.json.gz"}
        assert split in files
        return load_dataset("allenai/c4", data_files={split: files[split]},
                            split=split)["text"]
    if dataset_name == "pileval":
        return load_dataset("mit-han-lab/pile-val-backup", split="validation")["text"]
    if dataset_name == "redpajama":
        assert split == "train", "RedPajama only has a train split"
        return load_dataset("togethercomputer/RedPajama-Data-1T-Sample",
                            split=split, trust_remote_code=True)["text"]
    raise ValueError(f"Unknown dataset {dataset_name}")


# ---------------------------------------------------------------------------
# Sampling strategies. ``encode`` maps text -> 1-D int array.
# ---------------------------------------------------------------------------

def sample_tokenize(texts: Sequence[str], encode: Callable, seq_len: int,
                    num_samples: int, seed: Optional[int] = None) -> List[np.ndarray]:
    assert num_samples <= len(texts)
    rnd = random.Random(seed)
    selected, samples = set(), []
    while len(samples) < num_samples:
        idx = rnd.randint(0, len(texts) - 1)
        if idx in selected:
            continue
        tokens = np.asarray(encode(texts[idx]))
        if len(tokens) < seq_len:
            continue
        selected.add(idx)
        samples.append(tokens[:seq_len])
    return samples


def sample_tokenize_from_middle(texts: Sequence[str], encode: Callable,
                                seq_len: int, num_samples: int,
                                seed: Optional[int] = None) -> List[np.ndarray]:
    assert num_samples <= len(texts)
    rnd = random.Random(seed)
    selected, samples = set(), []
    while len(samples) < num_samples:
        idx = rnd.randint(0, len(texts) - 1)
        if idx in selected:
            continue
        tokens = np.asarray(encode(texts[idx]))
        if len(tokens) < seq_len:
            continue
        start = rnd.randint(0, len(tokens) - seq_len)
        selected.add(idx)
        samples.append(tokens[start:start + seq_len])
    return samples


def sample_concat_tokenize(texts: Sequence[str], encode: Callable,
                           seq_len: int, num_samples: int,
                           seed: Optional[int] = None) -> List[np.ndarray]:
    rnd = random.Random(seed)
    logger.info("Tokenizing %d texts", len(texts))
    all_tokens = np.asarray(encode("\n\n".join(texts)))
    selected, samples = set(), []
    while len(samples) < num_samples:
        idx = rnd.randint(0, len(all_tokens) - seq_len - 1)
        if selected:
            closest = min(selected, key=lambda x: abs(x - idx))
            if closest - seq_len <= idx <= closest + seq_len:
                continue
        selected.add(idx)
        samples.append(all_tokens[idx:idx + seq_len].copy())
    return samples


_STRATEGY_BY_DATASET = {
    "wikitext2": sample_concat_tokenize,
    "redpajama": sample_tokenize_from_middle,  # following PV-Tuning
}


def get_tokens(dataset_name: str, split: str, tokenizer, seq_len: int,
               num_samples: int, save_path: Optional[str] = None,
               seed: Optional[int] = None,
               texts: Optional[Sequence[str]] = None) -> np.ndarray:
    """Sample calibration tokens -> [num_samples, seq_len] int32.

    ``texts`` overrides dataset loading (for offline/test use).
    Cached to ``save_path`` (.npy) when given — the token cache is the first
    resumable artifact of every pipeline (reference layerwise_main.py cache
    scheme, SURVEY.md §5.4).
    """
    if save_path is not None and os.path.isfile(save_path):
        logger.info("Loading tokens from %s", save_path)
        return np.load(save_path)

    if texts is None:
        logger.info("Fetching dataset: %s", dataset_name)
        texts = _load_texts(dataset_name, split)

    def encode(t: str) -> np.ndarray:
        out = tokenizer(t)
        ids = out["input_ids"] if isinstance(out, dict) else out.input_ids
        return np.asarray(ids, dtype=np.int32).reshape(-1)

    strategy = _STRATEGY_BY_DATASET.get(dataset_name, sample_tokenize)
    logger.info("Sampling %d x %d tokens from %s via %s", num_samples, seq_len,
                dataset_name, strategy.__name__)
    samples = strategy(texts, encode, seq_len, num_samples, seed)
    tokens = np.stack(samples).astype(np.int32)

    if save_path is not None:
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        np.save(save_path, tokens)
        logger.info("Saved tokens to %s", save_path)
    return tokens
