"""lm-evaluation-harness bridge.

Analog of the reference's lm-eval integration
(``any_precision/evaluate/eval.py:282-422`` ``run_lm_eval``, task list
``run_eval.py:38-42``). Import-gated: the harness is optional and needs
network for task data; absent it, ``run_lm_eval`` raises with a clear
message. The token-level request implementations live on ``_JaxLM`` so they
are fully offline-testable without lm-eval installed.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# Canonical zeroshot suite (reference run_eval.py:38-42).
DEFAULT_TASKS = ["boolq", "piqa", "social_iqa", "arc_easy", "arc_challenge",
                 "hellaswag", "winogrande", "openbookqa"]


class _JaxLM:
    """Minimal lm-eval ``LM`` adapter over our jitted forward."""

    def __init__(self, cfg, params, tokenizer, batch_size: int = 1,
                 max_length: int = 2048):
        import jax
        import jax.numpy as jnp
        from ..models import llama
        self.cfg, self.params = cfg, params
        self.tok = tokenizer
        self.batch_size = batch_size
        self.max_length = max_length
        # params must be an ARGUMENT, not a closure capture: captured
        # arrays are baked into the HLO as literals, and on the axon
        # remote-compile transport a 190M-param model's serialized
        # constants exceed the request-body limit (HTTP 413).
        fwd = jax.jit(lambda p, t: llama.forward(p, cfg, t))
        self._forward = lambda t: fwd(self.params, jnp.asarray(t))

    # -- helpers -----------------------------------------------------------

    def _logprobs(self, tokens: np.ndarray) -> np.ndarray:
        """tokens [S] -> log-softmax logits [S, V] (f32, on host).

        Requests arrive at many distinct lengths; the forward is jitted, so
        each length would recompile. Right-pad to the next multiple of 64
        (causal-safe: positions < S never attend to the pad region) so a
        handful of compiled shapes serves every request length."""
        n = len(tokens)
        m = ((n + 63) // 64) * 64
        if m > self.max_length:
            m = n  # near-window requests: score exactly, no padding
        padded = np.zeros(m, np.int32)
        padded[:n] = tokens
        logits = np.asarray(self._forward(padded[None]), np.float32)[0, :n]
        m = logits.max(axis=-1, keepdims=True)
        lse = m + np.log(np.exp(logits - m).sum(axis=-1, keepdims=True))
        return logits - lse

    def loglikelihood_tokens(self, context: List[int], continuation: List[int]
                             ) -> Tuple[float, bool]:
        # lm-eval convention: always condition on >= 1 context token (a
        # 0/eot prefix for empty contexts); left-truncate continuations
        # that overflow the window and score only the surviving part —
        # a negative position would silently wrap to the wrong row.
        context = list(context) or [0]
        toks = np.asarray(list(context) + list(continuation)
                          )[-self.max_length:]
        if len(toks) - len(continuation) < 1:
            continuation = list(continuation)[-(len(toks) - 1):]
        lp = self._logprobs(toks)
        start = len(toks) - len(continuation)
        lls, greedy = 0.0, True
        for i, tok in enumerate(continuation):
            pos = start + i - 1
            lls += float(lp[pos, tok])
            greedy &= int(np.argmax(lp[pos])) == tok
        return lls, greedy

    def rolling_loglikelihood_tokens(self, tokens: List[int],
                                     prefix_token: int = 0) -> float:
        """Sum log p(t_i | t_<i) over ALL tokens of a document, scored in
        disjoint windows of ``max_length`` (lm-eval's rolling convention:
        each window is conditioned on one token of left context — the
        previous window's last token, or ``prefix_token`` for the first)."""
        total = 0.0
        i = 0
        n = len(tokens)
        while i < n:
            window = tokens[i:i + self.max_length - 1]
            ctx = [prefix_token] if i == 0 else [tokens[i - 1]]
            toks = np.asarray(ctx + list(window))
            lp = self._logprobs(toks)
            for j, tok in enumerate(window):
                total += float(lp[j, tok])
            i += len(window)
        return total

    def greedy_generate(self, context: List[int], max_new_tokens: int,
                        stop_sequences: Sequence[List[int]] = (),
                        eos_token_id: Optional[int] = None) -> List[int]:
        """Greedy decode; stops at eos or when the generated suffix ends with
        any tokenized stop sequence. Returns only the generated tokens."""
        toks = list(context)[-max(1, self.max_length - max_new_tokens):]
        out: List[int] = []
        for _ in range(max_new_tokens):
            lp = self._logprobs(np.asarray(toks[-self.max_length:]))
            nxt = int(np.argmax(lp[-1]))
            if eos_token_id is not None and nxt == eos_token_id:
                break
            out.append(nxt)
            toks.append(nxt)
            if any(len(s) > 0 and out[-len(s):] == list(s)
                   for s in stop_sequences):
                break
        return out


def _truncate_at_stops(text: str, stops: Sequence[str]) -> str:
    for s in stops:
        idx = text.find(s)
        if idx >= 0:
            text = text[:idx]
    return text


def run_lm_eval(cfg, params, tokenizer, tasks: Optional[List[str]] = None,
                batch_size: int = 1, max_length: int = 2048):
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

    bridge = _JaxLM(cfg, params, tokenizer, batch_size, max_length)
    eos = getattr(tokenizer, "eos_token_id", None)

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
            out = []
            prefix = eos if eos is not None else 0
            for req in requests:
                (text,) = req.args
                toks = tokenizer(text, add_special_tokens=False)["input_ids"]
                out.append(bridge.rolling_loglikelihood_tokens(toks, prefix))
            return out

        def generate_until(self, requests):
            out = []
            for req in requests:
                ctx, gen_kwargs = req.args
                stops = list(gen_kwargs.get("until", []) or [])
                max_new = int(gen_kwargs.get("max_gen_toks", 128))
                c = tokenizer(ctx)["input_ids"]
                stop_tok = [tokenizer(s, add_special_tokens=False)["input_ids"]
                            for s in stops]
                gen = bridge.greedy_generate(c, max_new, stop_tok, eos)
                text = tokenizer.decode(gen)
                out.append(_truncate_at_stops(text, stops))
            return out

    return simple_evaluate(model=Wrapped(),
                           tasks=tasks or DEFAULT_TASKS)
