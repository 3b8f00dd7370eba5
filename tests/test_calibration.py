"""Calibration parity: our tap-based capture must reproduce the reference's
hook-based quantities (squared weight grads, grouped output saliency,
saliency-weighted Hessians) on the same tiny model.

The torch side below re-implements the documented reference semantics
(any_precision/quantization/gradients.py:93-137, activations.py:209-238)
as an independent oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from guidedquant_tpu.models import llama
from guidedquant_tpu.models.hf_import import load_hf_model
from guidedquant_tpu.calib.gradients import get_gradients, regroup_saliency, SALIENCY_SCALE
from guidedquant_tpu.calib.hessians import accumulate_hessians

MODULES_HF = {
    "q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
    "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj",
    "gate_proj": "mlp.gate_proj", "up_proj": "mlp.up_proj",
    "down_proj": "mlp.down_proj",
}


@pytest.fixture(scope="module")
def tiny():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    model = LlamaForCausalLM(LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, attn_implementation="eager"))
    model.eval()
    cfg, params = load_hf_model(model)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 96, size=(3, 12), dtype=np.int64)
    return model, cfg, params, tokens


def _torch_oracle(model, tokens, num_groups):
    """Weight grad^2 accumulation + grouped saliency via hooks (oracle)."""
    import torch
    layers = model.model.layers
    gsq = [{m: torch.zeros_like(dict(l.named_modules())[h].weight)
            for m, h in MODULES_HF.items()} for l in layers]
    sal = [{m: [] for m in MODULES_HF} for _ in layers]

    hooks = []
    for li, layer in enumerate(layers):
        mods = dict(layer.named_modules())
        for m, h in MODULES_HF.items():
            mod = mods[h]

            def fwd_hook(module, inp, out, li=li, m=m):
                out.retain_grad()

                def grad_hook(grad):
                    b, s, n = grad.shape
                    gs = n // num_groups
                    g2 = (grad.float() * SALIENCY_SCALE).pow(2)
                    sal[li][m].append(
                        g2.view(b, s, num_groups, gs).mean(-1).detach())
                out.register_hook(grad_hook)
            hooks.append(mod.register_forward_hook(fwd_hook))

    for seq in tokens:
        t = torch.from_numpy(seq[None])
        loss = model(input_ids=t, labels=t).loss
        # square-per-backward accumulation (reference square_grad_hook):
        model.zero_grad()
        loss.backward()
        for li, layer in enumerate(layers):
            mods = dict(layer.named_modules())
            for m, h in MODULES_HF.items():
                gsq[li][m] += mods[h].weight.grad.float() ** 2
    for h in hooks:
        h.remove()
    sal_cat = [{m: torch.cat(v, 0).numpy() for m, v in d.items()} for d in sal]
    gsq_np = [{m: v.numpy() for m, v in d.items()} for d in gsq]
    return gsq_np, sal_cat


def test_gradients_and_saliency_match_oracle(tiny):
    model, cfg, params, tokens = tiny
    G = 2
    ours_g, ours_s = get_gradients(params, cfg, tokens, num_groups=G)
    ref_g, ref_s = _torch_oracle(model, tokens, G)
    for l in range(cfg.num_layers):
        for m in MODULES_HF:
            np.testing.assert_allclose(ours_g[l][m], ref_g[l][m],
                                       atol=1e-8, rtol=2e-3)
            np.testing.assert_allclose(ours_s[l][m], ref_s[l][m],
                                       atol=1e-6, rtol=2e-3)


def test_hessians_match_direct_computation(tiny):
    """H[g,i,j] must equal sum_n s_ng x_ni x_nj with x the true module
    inputs — computed here independently via torch forward hooks."""
    import torch
    model, cfg, params, tokens = tiny
    G = 2
    _, sal = get_gradients(params, cfg, tokens, num_groups=G)
    hess = accumulate_hessians(params, cfg, tokens, sal, num_groups=G,
                               batch_size=2)

    # capture true module inputs with torch
    inputs = [{m: [] for m in MODULES_HF} for _ in model.model.layers]
    hooks = []
    for li, layer in enumerate(model.model.layers):
        mods = dict(layer.named_modules())
        for m, h in MODULES_HF.items():
            def hook(module, inp, out, li=li, m=m):
                inputs[li][m].append(inp[0].detach().float())
            hooks.append(mods[h].register_forward_hook(hook))
    with torch.no_grad():
        for seq in tokens:
            model(input_ids=torch.from_numpy(seq[None]))
    for h in hooks:
        h.remove()

    for l in range(cfg.num_layers):
        for m in MODULES_HF:
            X = torch.cat(inputs[l][m], 0).reshape(-1, inputs[l][m][0].shape[-1])
            S = torch.from_numpy(sal[l][m]).reshape(-1, G).float()
            ref = torch.einsum("ni,nj,ng->gij", X, X, S).numpy()
            got = hess[l][m]
            assert got.shape == ref.shape
            scale = np.abs(ref).max() + 1e-9
            np.testing.assert_allclose(got / scale, ref / scale, atol=5e-4)
            # symmetry + PSD-ish sanity
            np.testing.assert_allclose(got, np.swapaxes(got, 1, 2), atol=1e-5 * scale)


def test_regroup_saliency():
    x = np.arange(24, dtype=np.float32).reshape(1, 2, 12)
    r = regroup_saliency(x, 3)
    assert r.shape == (1, 2, 3)
    np.testing.assert_allclose(r[0, 0, 0], x[0, 0, :4].mean())


def test_sub_saliency_range_matches_full(tiny):
    """sub_saliency=(1,2) must reproduce the full run's layer-1 saliency
    (and the weight grads are unaffected)."""
    model, cfg, params, tokens = tiny
    g_full, s_full = get_gradients(params, cfg, tokens, num_groups=2)
    g_sub, s_sub = get_gradients(params, cfg, tokens, num_groups=2,
                                 sub_saliency=(1, 2))
    assert s_sub[0] is None and s_sub[1] is not None
    for m in MODULES_HF:
        np.testing.assert_allclose(s_sub[1][m], s_full[1][m],
                                   rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(g_sub[0][m], g_full[0][m],
                                   rtol=1e-4, atol=1e-10)
