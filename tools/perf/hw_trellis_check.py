"""Hardware bit-exactness check of the fused trellis kernel.

Builds a random-but-valid tail-biting column-cyclic bit stream, packs it to
kernel words, and compares trellis_matmul / trellis_dequant on the real
chip against the numpy decode oracle.

Usage: hw_trellis_check.py [mode] [K]   (mode: tpu2u|2mad, K: 2|3|4)
"""
import numpy as np, time, sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import jax, jax.numpy as jnp
from guidedquant_tpu.ops import trellis_kernel as tk
from guidedquant_tpu.solvers.qtip.codebook import BitshiftCodebook

rng = np.random.default_rng(0)
mode = sys.argv[1] if len(sys.argv) > 1 else "tpu2u"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 2
cb = BitshiftCodebook(L=16, K=K, V=1, decode_mode=mode)
m_, n_, cycle = 256, 512, 256
nbits = K * cycle
bits = rng.integers(0, 2, size=((m_//cycle)*n_, nbits), dtype=np.uint8)
ext = np.concatenate([bits, bits[:, :16]], axis=1)  # tail-biting wrap
w16v = (1 << np.arange(15, -1, -1))
states = np.zeros(((m_//cycle)*n_, cycle), np.int32)
for r in range(cycle):
    states[:, r] = (ext[:, K*r:K*r+16] * w16v).sum(1)
Qidxs = states.reshape(m_//cycle, n_, cycle).transpose(0,2,1).reshape(m_, n_)
words = tk.states_to_kwords(cb, Qidxs, cycle=cycle)
dense = tk.decode_kwords_dense_np(cb, words, m_, n_, cycle=cycle)
x = rng.normal(size=(1, n_)).astype(np.float32)
t0 = time.time()
y = np.asarray(tk.trellis_matmul(jnp.asarray(x), jnp.asarray(words), mode,
                                 cycle=cycle, K=K))
print("matmul compile+run", round(time.time()-t0,1), "s", flush=True)
y_ref = x @ dense.T
err = np.abs(y - y_ref).max() / max(np.abs(y_ref).max(), 1e-9)
print("rel err matmul:", err)
d = np.asarray(tk.trellis_dequant(jnp.asarray(words), mode, cycle=cycle,
                                  K=K, dtype=jnp.float32))
print("dequant exact:", np.abs(d - dense).max())
assert err < 2e-2
print("HW OK", mode, "K =", K)
