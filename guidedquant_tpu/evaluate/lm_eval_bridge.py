"""lm-evaluation-harness bridge.

Analog of the reference's lm-eval integration
(``any_precision/evaluate/eval.py:run_lm_eval``, task list
``run_eval.py:38-42``). Import-gated: the harness is optional and needs
network for task data; absent it, ``run_lm_eval`` raises with a clear
message.
"""

from __future__ import annotations

import logging
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

DEFAULT_TASKS = ["boolq", "piqa", "social_iqa", "arc_easy", "arc_challenge",
                 "hellaswag", "winogrande", "openbookqa"]


class _JaxLM:
    """Minimal lm-eval ``LM`` adapter over our jitted forward."""

    def __init__(self, cfg, params, tokenizer, batch_size: int = 1,
                 max_length: int = 2048):
        import jax.numpy as jnp
        from ..models import llama
        self.cfg, self.params = cfg, params
        self.tok = tokenizer
        self.batch_size = batch_size
        self.max_length = max_length
        self._forward = lambda t: llama.forward(params, cfg, jnp.asarray(t))

    def loglikelihood_tokens(self, context: List[int], continuation: List[int]):
        import jax.numpy as jnp
        toks = np.asarray(context + continuation)[None, -self.max_length:]
        logits = np.asarray(self._forward(toks), np.float32)[0]
        # next-token logprobs for the continuation positions
        start = toks.shape[1] - len(continuation)
        lls, greedy = 0.0, True
        for i, tok in enumerate(continuation):
            pos = start + i - 1
            row = logits[pos]
            row = row - np.log(np.exp(row - row.max()).sum()) - row.max()
            lls += float(row[tok])
            greedy &= int(np.argmax(logits[pos])) == tok
        return lls, greedy


def run_lm_eval(cfg, params, tokenizer, tasks: Optional[List[str]] = None,
                batch_size: int = 1):
    """Run lm-eval tasks; returns the results dict."""
    try:
        import lm_eval  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "lm-eval is not installed in this environment; downstream task "
            "evaluation needs `pip install lm-eval` plus network access for "
            "task data. Perplexity evaluation (evaluate_ppl) is fully "
            "offline.") from e

    from lm_eval.api.model import LM
    from lm_eval import simple_evaluate

    bridge = _JaxLM(cfg, params, tokenizer, batch_size)

    class Wrapped(LM):
        def loglikelihood(self, requests):
            out = []
            for req in requests:
                ctx, cont = req.args
                c = tokenizer(ctx)["input_ids"]
                k = tokenizer(cont, add_special_tokens=False)["input_ids"]
                out.append(bridge.loglikelihood_tokens(c, k))
            return out

        def loglikelihood_rolling(self, requests):
            raise NotImplementedError

        def generate_until(self, requests):
            raise NotImplementedError

    return simple_evaluate(model=Wrapped(),
                           tasks=tasks or DEFAULT_TASKS)
