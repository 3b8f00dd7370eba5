"""8B-geometry QTIP trellis decode throughput on the real chip.

Full QTIP serving semantics per linear (SU sign -> Hadamard -> fused
trellis kernel -> Hadamard -> SV*scale, Kronecker-matmul FWHT), int8 LM
head, unrolled decode. Weights are device-built random kernel words
(decode throughput is value-independent; ~1.8 GB at 2 bits — the
capacity story: bf16 8B does not fit in 16 GB HBM at all).

Env: T8B_LAYERS, T8B_BATCH, T8B_K (2|3|4), T8B_MODE (tpu2u|2mad).
"""
import os, sys, time
import numpy as np
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from guidedquant_tpu.models import get_config
from guidedquant_tpu.serve import engine
from guidedquant_tpu.nn.trellis import TrellisLinear
from guidedquant_tpu.nn.linear import quantize_int8

L = int(os.environ.get("T8B_LAYERS", "32"))
B = int(os.environ.get("T8B_BATCH", "1"))
K = int(os.environ.get("T8B_K", "2"))
MODE = os.environ.get("T8B_MODE", "tpu2u")
cfg = get_config("llama-3.1-8b").replace(max_seq_len=1024, num_layers=L,
                                         tie_word_embeddings=False)
d, f = cfg.hidden_size, cfg.intermediate_size
keys = iter(jax.random.split(jax.random.PRNGKey(11), 64))


def tlin(out_f, in_f):
    # kernel-word layout: [m*K/32, n] uniform K; [3, m/32, n] phase planes
    # at K=3 (see ops.trellis_kernel.states_to_kwords)
    shape = ((L, 3, out_f // 32, in_f) if K == 3
             else (L, out_f * K // 32, in_f))
    kw = jax.random.randint(next(keys), shape, -2**31, 2**31 - 1, jnp.int32)
    su = (jax.random.randint(next(keys), (L, in_f), 0, 2) * 2 - 1
          ).astype(jnp.bfloat16)
    sv = (jax.random.randint(next(keys), (L, out_f), 0, 2) * 2 - 1
          ).astype(jnp.float32)
    return TrellisLinear(
        trellis=jnp.zeros((L, 1, 1), jnp.uint16),
        SU=su, SV=sv, Wscale=jnp.full((L,), 0.02, jnp.float32),
        kwords=kw, decode_mode=MODE, K=K, V=1,
        out_features=out_f, in_features=in_f)


params = {
    "embed": (jax.random.normal(next(keys), (cfg.vocab_size, d)) * 0.02
              ).astype(jnp.bfloat16),
    "layers": {
        "attn_norm": jnp.ones((L, d), jnp.bfloat16),
        "mlp_norm": jnp.ones((L, d), jnp.bfloat16),
        "q_proj": tlin(cfg.q_dim, d),
        "k_proj": tlin(cfg.kv_dim, d),
        "v_proj": tlin(cfg.kv_dim, d),
        "o_proj": tlin(d, cfg.q_dim),
        "gate_proj": tlin(f, d),
        "up_proj": tlin(f, d),
        "down_proj": tlin(d, f),
    },
    "final_norm": jnp.ones((d,), jnp.bfloat16),
    "lm_head": quantize_int8(
        (jax.random.normal(next(keys), (cfg.vocab_size, d)) * 0.02
         ).astype(jnp.bfloat16)),
}
params = engine.unroll_layers(params)

null = jax.jit(lambda a: a + 1)
z = jnp.zeros((8, 128))
np.asarray(null(z))
ov = 1e9
for _ in range(5):
    t0 = time.perf_counter(); np.asarray(null(z))
    ov = min(ov, time.perf_counter() - t0)

n = 48
state = engine.init_state(cfg, L, B, 640)
tok = jnp.zeros((B,), jnp.int32)
t0 = time.perf_counter()
_, t2, _ = engine.decode_n_tokens(params, cfg, tok, state, n)
np.asarray(t2)
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(4):
    st = engine.init_state(cfg, L, B, 640)
    t0 = time.perf_counter()
    _, t2, st = engine.decode_n_tokens(params, cfg, tok, st, n)
    np.asarray(t2)
    best = min(best, time.perf_counter() - t0)
step = (best - ov) / n
print(f"trellis8b L={L} B={B} K={K} mode={MODE}: {step*1e3:.3f} ms/step "
      f"({B/step:.1f} tok/s/chip)", flush=True)
