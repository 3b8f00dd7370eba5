"""Trace the W2A8 batched decode step (VERDICT r4 next 8).

W2A8 wins through B~32 (+7% served) but loses -6% at B=64; the asserted
cause ("the per-token A8 quantization pass and the int8-dot epilogue
scale with batch") was never traced. This captures an xplane trace of
the B=32 and B=64 W2A8 steps at L=8 (the r4 trace depth), aggregates
device-op time with jax.profiler.ProfileData, and prints the top ops
per batch — showing whether the A8 quantize/epilogue ops are the terms
that grow, or whether they fused away (in which case the 32/64 serving
policy split should collapse).

Usage: w2a8_b64_trace.py [batches] [layers]
"""
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, '/root/repo')
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from guidedquant_tpu.models import get_config  # noqa: E402
from guidedquant_tpu.serve import engine  # noqa: E402

import importlib  # noqa: E402
bench = importlib.import_module("bench")

BATCHES = [int(b) for b in (sys.argv[1] if len(sys.argv) > 1
                            else "32,64").split(",")]
LAYERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N_STEPS = int(os.environ.get("TRACE_STEPS", "8"))

cfg = get_config("llama-3.1-8b").replace(max_seq_len=1024,
                                         num_layers=LAYERS)
params, cfg = bench._build_quantized_device(cfg, bits=2)
from guidedquant_tpu.nn.linear import AnyPrecLinear, with_act8  # noqa: E402
lay = {k: (with_act8(v) if isinstance(v, AnyPrecLinear) else v)
       for k, v in params["layers"].items()}
params = engine.unroll_layers(dict(params, layers=lay))


def device_op_times(logdir):
    """Aggregate event durations (us) by op KIND on the device 'XLA Ops'
    line only (other lines — modules, async, steps — hold overlapping
    parent regions that would double-count). Instance suffixes are
    stripped so e.g. all W2A8 kernel calls aggregate to one row; the
    'while' row is the loop parent and contains the rest."""
    import glob
    import re
    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert files, f"no xplane under {logdir}"
    pd = jax.profiler.ProfileData.from_file(files[0])
    agg = defaultdict(float)
    for plane in pd.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev.name.split(" = ")[0].lstrip("%")
                kind = re.sub(r"[.\d]+$", "", name)
                agg[kind] += ev.duration_ns / 1e3
    return agg


for B in BATCHES:
    state = engine.init_state(cfg, cfg.num_layers, B, 640)
    tok = jnp.zeros((B,), jnp.int32)
    # warm-up/compile
    _, tok2, _ = engine.decode_n_tokens(params, cfg, tok, state, N_STEPS)
    _ = np.asarray(tok2)
    logdir = f"/tmp/xplane_b{B}"
    os.system(f"rm -rf {logdir}")
    st = engine.init_state(cfg, cfg.num_layers, B, 640)
    jax.profiler.start_trace(logdir)
    _, tok2, st = engine.decode_n_tokens(params, cfg, tok, st, N_STEPS)
    _ = np.asarray(tok2)
    jax.profiler.stop_trace()
    time.sleep(1)
    agg = device_op_times(logdir)
    tot = sum(agg.values())
    print(f"\n=== B={B} L={LAYERS} {N_STEPS} steps: device total "
          f"{tot/1e3:.2f} ms ({tot/1e3/N_STEPS:.3f} ms/step) ===")
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:18]:
        print(f"  {us/N_STEPS:9.1f} us/step  {100*us/tot:4.1f}%  "
              f"{name[:90]}")
