"""Decode-step component breakdown on the real chip (1B geometry).

Times decode_n_tokens for model variants that null out components:
full / no-head (logits = x slice) / dense-attention-only (no MLP) etc.,
via monkeypatched engine pieces. Differences give per-component cost.
"""
import sys, time
import numpy as np
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from guidedquant_tpu.models import llama, get_config
from guidedquant_tpu.serve import engine
from guidedquant_tpu.serve.fuse import fuse_projections
from __graft_entry__ import _build_quantized_llama

MODE = sys.argv[1] if len(sys.argv) > 1 else "all"

def null_overhead():
    f = jax.jit(lambda a: a + 1); z = jnp.zeros((8, 128))
    np.asarray(f(z)); best = 1e9
    for _ in range(5):
        t0 = time.perf_counter(); np.asarray(f(z))
        best = min(best, time.perf_counter() - t0)
    return best

def tok_s(params, cfg, n_tokens=64, batch=1, max_seq=640, reps=3):
    state = engine.init_state(cfg, cfg.num_layers, batch, max_seq)
    tok = jnp.zeros((batch,), jnp.int32)
    _, tok2, _ = engine.decode_n_tokens(params, cfg, tok, state, n_tokens)
    _ = np.asarray(tok2)
    ov = null_overhead()
    best = 1e9
    for _ in range(reps):
        st = engine.init_state(cfg, cfg.num_layers, batch, max_seq)
        t0 = time.perf_counter()
        _, tok2, st = engine.decode_n_tokens(params, cfg, tok, st, n_tokens)
        _ = np.asarray(tok2)
        best = min(best, time.perf_counter() - t0)
    return (best - ov) / n_tokens

cfg = get_config("llama-3.2-1b").replace(max_seq_len=1024)

def report(name, params, cfg2=None):
    t = tok_s(params, cfg2 or cfg)
    print(f"{name}: {t*1e6:.0f} us/step ({1.0/t:.0f} tok/s)", flush=True)
    return t

if MODE in ("all", "bf16"):
    p = fuse_projections(llama.init_params(cfg, jax.random.PRNGKey(0),
                                           dtype=jnp.bfloat16))
    report("bf16 full", p)
    del p

if MODE in ("all", "q"):
    from guidedquant_tpu.nn.linear import quantize_int8
    qp = fuse_projections(_build_quantized_llama(cfg, 0, bits=2))
    head = qp.get("lm_head", qp["embed"])
    qp = dict(qp); qp["lm_head"] = quantize_int8(head)
    cfg_q = cfg.replace(tie_word_embeddings=False)
    t_full = report("2bit+int8head full", qp, cfg_q)
    # no head: replace lm_head with a tiny dense (vocab 256)
    qp2 = dict(qp); qp2["lm_head"] = jnp.zeros((256, cfg.hidden_size),
                                               jnp.bfloat16)
    t_nh = report("2bit tiny-head", qp2, cfg_q)
    # head-only estimate
    print(f"  -> head cost ~{(t_full-t_nh)*1e6:.0f} us", flush=True)
    # layers cost via 8 vs 16 layers (slope)
    cfg8 = cfg_q.replace(num_layers=8)
    qp8 = dict(qp)
    qp8["layers"] = jax.tree.map(lambda a: a[:8], qp["layers"])
    t8 = report("2bit 8-layer", qp8, cfg8)
    print(f"  -> per-layer ~{(t_full-t8)/8*1e6:.1f} us; "
          f"16 layers ~{(t_full-t8)*2e6:.0f} us; "
          f"fixed+attn+head ~{(2*t8-t_full)*1e6:.0f} us", flush=True)
