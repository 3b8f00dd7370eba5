"""Offline tests for the lm-eval bridge request implementations.

The reference runs the 8-task zeroshot suite through lm-eval
(``any_precision/evaluate/eval.py:282-422``); lm-eval itself (and its task
data) needs network, so here we test the token-level request logic on
``_JaxLM`` directly with a tiny model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from guidedquant_tpu.models import llama
from guidedquant_tpu.models.config import get_config
from guidedquant_tpu.evaluate.lm_eval_bridge import (
    DEFAULT_TASKS, _JaxLM, _truncate_at_stops)


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = get_config("tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_default_tasks_match_reference():
    # reference run_eval.py:38-42
    assert DEFAULT_TASKS == ["boolq", "piqa", "social_iqa", "arc_easy",
                             "arc_challenge", "hellaswag", "winogrande",
                             "openbookqa"]


def test_loglikelihood_tokens(tiny_lm):
    cfg, params = tiny_lm
    lm = _JaxLM(cfg, params, tokenizer=None, max_length=64)
    ctx = [1, 2, 3]
    cont = [4, 5]
    ll, greedy = lm.loglikelihood_tokens(ctx, cont)
    # manual: next-token logprobs from the full sequence
    toks = np.asarray(ctx + cont)
    lp = lm._logprobs(toks)
    expect = lp[2, 4] + lp[3, 5]
    assert np.isclose(ll, expect, atol=1e-5)
    assert isinstance(greedy, bool)


def test_rolling_single_window_matches_prefix_scoring(tiny_lm):
    cfg, params = tiny_lm
    lm = _JaxLM(cfg, params, tokenizer=None, max_length=64)
    doc = [5, 9, 2, 7, 7, 1]
    ll = lm.rolling_loglikelihood_tokens(doc, prefix_token=0)
    expect, _ = lm.loglikelihood_tokens([0], doc)
    assert np.isclose(ll, expect, atol=1e-5)


def test_rolling_multi_window(tiny_lm):
    """Forcing max_length=4 splits the doc into windows of 3 tokens, each
    conditioned on the previous window's last token."""
    cfg, params = tiny_lm
    lm = _JaxLM(cfg, params, tokenizer=None, max_length=4)
    doc = [5, 9, 2, 7, 7, 1, 3]
    ll = lm.rolling_loglikelihood_tokens(doc, prefix_token=0)

    expect = 0.0
    expect += lm.loglikelihood_tokens([0], doc[0:3])[0]
    expect += lm.loglikelihood_tokens([doc[2]], doc[3:6])[0]
    expect += lm.loglikelihood_tokens([doc[5]], doc[6:7])[0]
    assert np.isclose(ll, expect, atol=1e-5)


def test_greedy_generate_matches_argmax_and_stops(tiny_lm):
    cfg, params = tiny_lm
    lm = _JaxLM(cfg, params, tokenizer=None, max_length=64)
    ctx = [3, 1, 4]
    gen = lm.greedy_generate(ctx, max_new_tokens=5)
    assert len(gen) == 5
    # manual greedy rollout
    toks = list(ctx)
    for g in gen:
        lp = lm._logprobs(np.asarray(toks))
        assert int(np.argmax(lp[-1])) == g
        toks.append(g)
    # stop sequence: the first generated token as a 1-token stop seq
    gen2 = lm.greedy_generate(ctx, max_new_tokens=5,
                              stop_sequences=[[gen[0]]])
    assert gen2 == [gen[0]]
    # eos stop: eos == first generated token -> nothing generated
    gen3 = lm.greedy_generate(ctx, max_new_tokens=5, eos_token_id=gen[0])
    assert gen3 == []


def test_truncate_at_stops():
    assert _truncate_at_stops("a b STOP c", ["STOP"]) == "a b "
    assert _truncate_at_stops("a b c", ["STOP"]) == "a b c"
    assert _truncate_at_stops("x\n\ny", ["\n\n", "y"]) == "x"
