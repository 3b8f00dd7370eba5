"""Tests for the local downstream task (identifier completion).

This is the offline analog of the reference's lm-eval zeroshot protocol
(``run_eval.py:38-42``): items are built from held-out source text and run
through the SAME bridge request primitives lm-eval would use.
"""

import numpy as np
import pytest

import jax

from guidedquant_tpu.models import llama
from guidedquant_tpu.models.config import get_config
from guidedquant_tpu.evaluate.downstream import (
    IDENT, identifier_items, evaluate_identifier_completion)
from guidedquant_tpu.evaluate.lm_eval_bridge import _JaxLM

TEXT = "\n".join(
    f"def compute_thing_{i}(value_arg, other_name):\n"
    f"    partial_sum = value_arg + other_name\n"
    f"    result_val = partial_sum * value_arg\n"
    f"    return result_val + partial_sum\n"
    for i in range(40))


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = get_config("tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_identifier_items_structure():
    items = identifier_items(TEXT, n_items=20, ctx_chars=200, n_choices=4,
                             seed=0)
    assert len(items) == 20
    for it in items:
        assert len(it["ctx"]) == 200
        assert len(it["choices"]) == 4
        truth = it["choices"][it["answer"]]
        # predictable-by-retrieval: the answer occurs inside the context
        assert truth in set(IDENT.findall(it["ctx"]))
        # distractors are distinct from the answer
        assert it["choices"].count(truth) == 1


def test_identifier_items_deterministic():
    a = identifier_items(TEXT, 10, ctx_chars=200, seed=3)
    b = identifier_items(TEXT, 10, ctx_chars=200, seed=3)
    assert a == b


def test_evaluate_identifier_completion(tiny_lm):
    cfg, params = tiny_lm
    # byte-level encoding, clipped into the tiny model's 256-vocab
    vocab = cfg.vocab_size

    def encode(s):
        return [b % vocab for b in s.encode("latin-1")]

    res = evaluate_identifier_completion(
        cfg, params, TEXT, encode, n_items=6, gen_items=2,
        ctx_chars=96, max_length=cfg.max_seq_len, seed=0)
    assert res["n"] == 6 and res["gen_n"] == 2
    for k in ("acc", "acc_norm", "gen_exact"):
        assert 0.0 <= res[k] <= 1.0


def test_bridge_bucket_padding_is_causal_safe(tiny_lm):
    """The bridge right-pads requests to 64-token buckets; padding must not
    change loglikelihoods (causal masking)."""
    cfg, params = tiny_lm
    ctx, cont = [5, 9, 2, 7], [3, 8]
    # max_length 64 -> request (len 6) is padded to 64
    padded = _JaxLM(cfg, params, None, max_length=64)
    ll_p, greedy_p = padded.loglikelihood_tokens(ctx, cont)
    # max_length 6 -> bucket (64) exceeds the window, so no padding
    exact = _JaxLM(cfg, params, None, max_length=6)
    ll_e, greedy_e = exact.loglikelihood_tokens(ctx, cont)
    assert greedy_p == greedy_e
    np.testing.assert_allclose(ll_p, ll_e, rtol=2e-4, atol=2e-5)
