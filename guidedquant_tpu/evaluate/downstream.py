"""Local downstream-task evaluation: identifier completion on held-out code.

lm-eval's task data is network-gated in this image, so none of the
reference's zeroshot tasks (``run_eval.py:38-42``) can run offline. This
module is the honest local analog: it builds a multiple-choice
identifier-completion task (the boolq/piqa/arc *loglikelihood* request
type) and a greedy-completion exact-match task (the *generate_until*
request type) from the same held-out corpus used for perplexity, and runs
both through the lm-eval bridge's request primitives
(:class:`~guidedquant_tpu.evaluate.lm_eval_bridge._JaxLM`) — so the bridge
is exercised end-to-end on real data and quantized models get a
downstream-accuracy number next to their ppl in the ledger.

Task definition: at a site where an identifier *recurs* (it already
appears in the visible context window), predict it from the context.
Distractors are other identifiers from the same window, so chance is
1/n_choices and the task measures in-context retrieval — a capability that
degrades measurably under aggressive quantization.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Sequence

import numpy as np

from .lm_eval_bridge import _JaxLM

IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]{3,}")


def identifier_items(text: str, n_items: int, ctx_chars: int = 512,
                     n_choices: int = 4, seed: int = 0) -> List[Dict]:
    """Build multiple-choice items from raw source text.

    Each item: ``{"ctx": str, "choices": [str], "answer": int}`` where
    ``ctx`` is exactly ``ctx_chars`` characters ending right before an
    identifier that already occurs inside ``ctx``, and ``choices`` holds
    the true identifier plus ``n_choices-1`` distractor identifiers drawn
    from the same window.
    """
    rng = np.random.default_rng(seed)
    sites = [m for m in IDENT.finditer(text) if m.start() > ctx_chars]
    order = rng.permutation(len(sites))
    items: List[Dict] = []
    for si in order:
        if len(items) >= n_items:
            break
        m = sites[si]
        name = m.group()
        ctx = text[m.start() - ctx_chars:m.start()]
        window_ids = sorted(set(IDENT.findall(ctx)))
        if name not in window_ids:
            continue  # not predictable by retrieval — skip
        distract = [w for w in window_ids if w != name]
        if len(distract) < n_choices - 1:
            continue
        picks = rng.choice(len(distract), n_choices - 1, replace=False)
        choices = [distract[int(i)] for i in picks]
        answer = int(rng.integers(n_choices))
        choices.insert(answer, name)
        items.append({"ctx": ctx, "choices": choices, "answer": answer})
    return items


def evaluate_identifier_completion(
        cfg, params, text: str, encode: Callable[[str], Sequence[int]],
        n_items: int = 200, ctx_chars: int = 512, n_choices: int = 4,
        gen_items: int = 50, max_length: int = 0, seed: int = 0,
        verbose: bool = False) -> Dict:
    """Run the identifier-completion task end-to-end through the bridge.

    Returns ``{"n", "acc", "acc_norm", "gen_n", "gen_exact"}``:
    ``acc`` argmax of summed loglikelihood over choices (lm-eval ``acc``),
    ``acc_norm`` length-normalized (lm-eval ``acc_norm``), ``gen_exact``
    greedy-generation token-prefix exact-match rate on the first
    ``gen_items`` items.
    """
    lm = _JaxLM(cfg, params, tokenizer=None,
                max_length=max_length or cfg.max_seq_len)
    items = identifier_items(text, n_items, ctx_chars, n_choices, seed)
    n_correct = n_correct_norm = 0
    for idx, it in enumerate(items):
        ctx_toks = list(encode(it["ctx"]))
        lls, norms = [], []
        for ch in it["choices"]:
            cont = list(encode(ch))
            ll, _ = lm.loglikelihood_tokens(ctx_toks, cont)
            lls.append(ll)
            norms.append(ll / max(1, len(cont)))
        n_correct += int(np.argmax(lls)) == it["answer"]
        n_correct_norm += int(np.argmax(norms)) == it["answer"]
        if verbose and (idx + 1) % 25 == 0:
            print(f"  mc {idx + 1}/{len(items)}: "
                  f"acc {n_correct / (idx + 1):.3f}", flush=True)

    gen_correct = 0
    gen_n = min(gen_items, len(items))
    for it in items[:gen_n]:
        true = list(encode(it["choices"][it["answer"]]))
        out = lm.greedy_generate(list(encode(it["ctx"])), len(true))
        gen_correct += out[:len(true)] == true

    return {
        "n": len(items),
        "acc": n_correct / max(1, len(items)),
        "acc_norm": n_correct_norm / max(1, len(items)),
        "gen_n": gen_n,
        "gen_exact": gen_correct / max(1, gen_n),
    }
