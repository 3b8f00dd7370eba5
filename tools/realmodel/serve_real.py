"""Serve the REAL quantized checkpoint through the engine + continuous
batcher on the chip, and print its served tok/s next to the ledger ppl it
matches (VERDICT r3 next 5: one artifact with both a ppl and a tok/s —
no more synthetic-weights-only throughput).

Pipeline: layerwise_nuq 2-bit (cached/resumable stages; the SAME packed
artifact whose held-out ppl is the ``2bit-free`` row in results.json) ->
load_packed(kernel_layout=True) -> fuse -> continuous batcher with real
prompts sampled from the held-out corpus.

Usage: timeout 3600 python tools/realmodel/serve_real.py [bits-family]
       (default 2-affine: the fused-kernel-served config; 2-free serves
        the exact-poly kernel path)
Env: SERVE_MODEL=pybyte-27m|pyword-190m (pyword = the word-vocab 190M
     model whose geometry actually stresses the engine — VERDICT r4
     next 7b), SERVE_SLOTS, NEW_TOK.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))
from train_lm import load_params, model_preset  # noqa: E402

SPEC = sys.argv[1] if len(sys.argv) > 1 else "2-affine"
BITS, FAMILY = int(SPEC.split("-")[0]), SPEC.split("-")[1]
MODEL = os.environ.get("SERVE_MODEL", "pybyte-27m")
SLOTS = int(os.environ.get("SERVE_SLOTS", "16"))
NEW_TOK = int(os.environ.get("NEW_TOK", "96"))
SEQ, NEX = 512, 128
CACHE = "cache/realmodel"


def main():
    import logging
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s: %(message)s")
    import jax.numpy as jnp
    from guidedquant_tpu.pipelines.quantize_lnq import layerwise_nuq
    from guidedquant_tpu.formats.anyprec import load_packed
    from guidedquant_tpu.serve import engine
    from guidedquant_tpu.serve.batching import ContinuousBatcher
    from guidedquant_tpu.serve.fuse import fuse_projections

    word = MODEL != "pybyte-27m"
    cfg = model_preset(MODEL, SEQ)
    params = load_params(f"{CACHE}/ckpt_word.npz" if word
                         else f"{CACHE}/ckpt.npz")
    z = np.load(f"{CACHE}/corpus_word.npz" if word
                else f"{CACHE}/corpus.npz")
    train, val = z["train"], z["val"]
    rng = np.random.default_rng(1)
    starts = rng.integers(0, train.size - SEQ, size=NEX)
    tokens = train[starts[:, None] + np.arange(SEQ)].astype(np.int32)

    packed = layerwise_nuq(
        cfg.name, cfg=cfg, params=params, seed_precision=BITS,
        cache_dir=CACHE, dataset="pycorpus", seq_len=SEQ,
        num_examples=NEX, num_groups=1, num_iterations=3, cd_cycles=4,
        codebook_family=FAMILY, tokens=tokens)
    _qcfg, qparams = load_packed(packed, precision=BITS, dtype=jnp.float32)

    ledger_key = f"{BITS}bit-{FAMILY}"
    res = json.load(open("results.json"))
    ppl = res.get(cfg.name, {}).get("ppl", {}).get("pycorpus-val",
                                                   {}).get(ledger_key)

    # keep the checkpoint's own head (numerics identical to the ledger row)
    sp = dict(fuse_projections(qparams))
    scfg = cfg.replace(max_seq_len=SEQ)
    sp = engine.unroll_layers(sp)

    # real prompts from the held-out stream
    n_req = SLOTS * 2
    prompts = [np.asarray(val[i * 64:(i * 64) + int(r)], np.int32)
               for i, r in enumerate(rng.integers(8, 33, size=n_req))]

    b = ContinuousBatcher(sp, scfg, slots=SLOTS, max_seq=256, chunk=32)
    for p in prompts[:SLOTS]:
        b.submit(p, 8)
    b.run()  # warm-up/compile

    dt, tot = 1e9, 0
    for _ in range(3):
        b = ContinuousBatcher(sp, scfg, slots=SLOTS, max_seq=256, chunk=32)
        for p in prompts:
            b.submit(p, NEW_TOK)
        t0 = time.perf_counter()
        done = b.run()
        d = time.perf_counter() - t0
        tot = sum(len(r.out) for r in done.values())
        dt = min(dt, d)
    print(f"REAL {MODEL} {ledger_key} (ledger ppl "
          f"{ppl if ppl is not None else 'MISSING'}): slots={SLOTS} "
          f"{tot} tokens in {dt:.2f}s -> {tot/dt:.0f} served tok/s/chip",
          flush=True)


if __name__ == "__main__":
    main()
