"""Guided LM-head quantization quality ladder (VERDICT r4 next 3).

The W2A8 8B step spends ~0.70 ms (13%) in the int8 LM head; the 4-bit
affine head (BENCH_HEAD=affine4) removes half of that but cost +0.34% ppl
with the best *data-free* per-row quantizer (MSE-grid shrink search,
PERF_NOTES r4). This tool solves the head WITH the calibration data —
GPTQ error-feedback against the head-input Hessian, plain and guided
(logit-saliency row groups, the GuidedQuant objective applied to the
head itself) — and records every rung as a ``head4-*`` ppl row:

    fp32 body + W4A8 head,  head4-rtn | head4-msegrid | head4-gptq |
    head4-gptq-g{G}

All rows share A8 per-token activation fake-quant on the head input
(exactly what the serving kernel does), so the deltas isolate the weight
quantizer. Reference analog: the head is quantized by none of the
reference pipelines (AnyPrecisionForCausalLM keeps an fp16 head); this
ladder is the TPU-side extension that makes a 4-bit head quality-viable.
"""

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))
from train_lm import load_params, model_preset  # noqa: E402

logger = logging.getLogger("head_quant")


def capture_head_stats(params, cfg, tokens, groups=4, batch=8):
    """One pass over the calibration set -> (H [n, n], Hg [G, n, n],
    Xsq [n]) where H = X^T X of the head INPUT (final-norm output) and
    Hg[g] = X^T diag(s_g) X with s_g(t) = mean_{v in group g}
    (dL/dlogit_v(t))^2 — the closed-form logit gradient (softmax - onehot),
    no autodiff needed (the head's analog of calib/gradients.py saliency).

    Vocab rows are grouped contiguously (g = v // (V/G)), matching the
    reference's channel grouping (gradients.py:98-113).
    """
    import jax
    import jax.numpy as jnp
    from guidedquant_tpu.models import llama

    V, n = cfg.vocab_size, cfg.hidden_size
    N, S = tokens.shape
    rows_per = V // groups

    @jax.jit
    def batch_stats(p, toks):
        B = toks.shape[0]
        positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
        cos, sin, mask, _ = llama.layer_rope_mask(cfg, positions, S, S)
        x = llama.embed_tokens(p, toks, cfg, positions)

        def body(carry, lp):
            y, _ = llama.decoder_layer(lp, cfg, carry, cos, sin, mask)
            return y, None

        x, _ = jax.lax.scan(body, x, p["layers"])
        h = llama._norm(cfg, x, p["final_norm"],
                        p.get("final_norm_bias")).astype(jnp.float32)
        logits = jnp.einsum("bsk,vk->bsv", h, p["lm_head"].astype(jnp.float32))
        # next-token CE grad at the logits: (softmax - onehot)/S per token
        # (labels = toks shifted left; last position has no label -> 0)
        prob = jax.nn.softmax(logits, axis=-1)
        lbl = jnp.concatenate([toks[:, 1:], jnp.zeros((B, 1), toks.dtype)],
                              axis=1)
        g = prob - jax.nn.one_hot(lbl, V, dtype=jnp.float32)
        valid = jnp.concatenate(
            [jnp.ones((B, S - 1)), jnp.zeros((B, 1))], axis=1)
        g = g * valid[..., None] / S
        # group saliency s[t, g] = mean_v-in-group g^2
        s = jnp.mean(g.reshape(B, S, groups, rows_per) ** 2, axis=-1)
        hf = h.reshape(B * S, n)
        H = hf.T @ hf
        Hg = jnp.einsum("tn,tm,tg->gnm", hf, hf, s.reshape(B * S, groups))
        return H, Hg, jnp.sum(hf ** 2, axis=0)

    H = np.zeros((n, n), np.float64)
    Hg = np.zeros((groups, n, n), np.float64)
    Xsq = np.zeros((n,), np.float64)
    for i in range(0, N, batch):
        b = jax.device_get(batch_stats(params, jnp.asarray(tokens[i:i + batch])))
        H += np.asarray(b[0], np.float64)
        Hg += np.asarray(b[1], np.float64)
        Xsq += np.asarray(b[2], np.float64)
        logger.info("capture %d/%d", min(i + batch, N), N)
    return H, Hg, Xsq


def rtn_head(W, grid=16):
    """Per-row min-max asym affine grid (the r4 baseline at grid=16)."""
    lo = W.min(axis=1, keepdims=True)
    hi = W.max(axis=1, keepdims=True)
    s = np.maximum(hi - lo, 1e-12) / (grid - 1)
    codes = np.clip(np.round((W - lo) / s), 0, grid - 1)
    return codes * s + lo


def msegrid_head(W, grid=16, points=13):
    """Per-row shrink search on the (min, max) box minimizing MSE (the r4
    improved baseline: 13-point 0.70..1.00 shrink)."""
    best = None
    best_err = np.full((W.shape[0], 1), np.inf)
    lo0 = W.min(axis=1, keepdims=True)
    hi0 = W.max(axis=1, keepdims=True)
    for f in np.linspace(0.70, 1.0, points):
        lo, hi = lo0 * f, hi0 * f
        s = np.maximum(hi - lo, 1e-12) / (grid - 1)
        q = np.clip(np.round((W - lo) / s), 0, grid - 1) * s + lo
        err = ((q - W) ** 2).sum(axis=1, keepdims=True)
        take = err < best_err
        best = q if best is None else np.where(take, q, best)
        best_err = np.minimum(err, best_err)
    return best


def gptq_head(W, H, sym=False, mse=False, actorder=True, percdamp=0.01,
              bits=4):
    from guidedquant_tpu.solvers.spinquant.gptq import gptq_quantize
    from guidedquant_tpu.solvers.spinquant.quant import WeightQuantConfig
    cfg = WeightQuantConfig(bits=bits, perchannel=True, sym=sym, mse=mse)
    Q, _, _ = gptq_quantize(W.astype(np.float32), H.astype(np.float32),
                            cfg, blocksize=128, percdamp=percdamp,
                            actorder=actorder)
    return Q


def eval_head(params, cfg, Q, val_stream, seq, a8=True):
    """ppl with the fp32 body and the given (quantized, dense) head under
    per-token A8 input fake-quant (the serving kernel's activation path)."""
    import jax.numpy as jnp
    from guidedquant_tpu.evaluate.ppl import evaluate_ppl
    from guidedquant_tpu.nn.act_quant import ActQuantLinear
    head = ActQuantLinear(weight=jnp.asarray(Q, jnp.float32),
                          in_bits=8 if a8 else 16, in_sym=True)
    p = dict(params, lm_head=head)
    return float(evaluate_ppl(p, cfg, val_stream, ctx_len=seq))


def main():
    import faulthandler
    import signal
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s: %(message)s")
    faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps stacks
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="pyword-190m")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--corpus", default=None)
    p.add_argument("--results", default="results.json")
    p.add_argument("--cache_dir", default="cache/realmodel")
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--num_examples", type=int, default=128)
    p.add_argument("--val_mb", type=float, default=0.5)
    p.add_argument("--groups", type=int, default=4)
    p.add_argument("--configs", nargs="+",
                   default=["rtn", "msegrid", "gptq", "gptq-g4"])
    args = p.parse_args()
    word = args.model != "pybyte-27m"
    if args.ckpt is None:
        args.ckpt = ("cache/realmodel/ckpt_word.npz" if word
                     else "cache/realmodel/ckpt.npz")
    if args.corpus is None:
        args.corpus = ("cache/realmodel/corpus_word.npz" if word
                       else "cache/realmodel/corpus.npz")

    from guidedquant_tpu.evaluate.results import record_result, has_result

    cfg = model_preset(args.model, args.seq)
    params = load_params(args.ckpt)
    z = np.load(args.corpus)
    train, val = z["train"], z["val"]
    val_stream = val[:int(args.val_mb * 1024 * 1024)].astype(np.int32)
    rng = np.random.default_rng(1)
    starts = rng.integers(0, train.size - args.seq, size=args.num_examples)
    calib = train[starts[:, None] + np.arange(args.seq)].astype(np.int32)
    name = cfg.name
    W = np.asarray(params["lm_head"], np.float32)

    need_H = any("gptq" in c or c.startswith("lnq") for c in args.configs)
    H = Hg = None
    hpath = os.path.join(args.cache_dir, f"head_hessian_{name}.npz")
    if need_H:
        if os.path.exists(hpath):
            hz = np.load(hpath)
            H, Hg = hz["H"], hz["Hg"]
            logger.info("head Hessians loaded from %s", hpath)
        else:
            t0 = time.time()
            H, Hg, _ = capture_head_stats(params, cfg, calib,
                                          groups=args.groups)
            np.savez_compressed(hpath, H=H, Hg=Hg)
            logger.info("head Hessian capture: %.1f s", time.time() - t0)

    def lnq_head(Huse, family, iters=2):
        """LNQ alternating solve of the head (seed k-means weighted by the
        input second moment, then CD + exact WLS codebook refits within
        the family) — ``affine`` stays servable on the W4A8 affine
        kernel; ``free`` serves via the exact per-row-LUT kernel."""
        from guidedquant_tpu.solvers.seed import seed_and_upscale_module
        from guidedquant_tpu.solvers import lnq as lnq_solver
        Xsq = np.diag(H)  # H = sum X^T X -> diag is the column 2nd moment
        gw = np.ascontiguousarray(np.broadcast_to(
            np.maximum(Xsq, 1e-12)[None, :], W.shape))
        luts, labels = seed_and_upscale_module(W, gw, 4, 4)
        labels2, C, _log = lnq_solver.train_least_squares(
            W, labels[:, 0, :].astype(np.int32), luts[-1][:, 0, :],
            np.asarray(Huse, np.float32), num_iterations=iters,
            cd_cycles=4, codebook_family=family)
        return np.take_along_axis(C, labels2.astype(np.int64), axis=1)

    def run(key, solver, a8=True):
        row = f"head4-{key}"
        if has_result(args.results, name, "ppl", "pycorpus-val", row):
            print(f"{row}: cached", flush=True)
            return
        t0 = time.time()
        Q = solver()
        logger.info("%s solve: %.1f s, weight MSE %.3e", key,
                    time.time() - t0, float(((Q - W) ** 2).mean()))
        ppl = eval_head(params, cfg, Q, val_stream, args.seq, a8=a8)
        record_result(args.results, name, "ppl", "pycorpus-val", row,
                      float(ppl))
        print(f"{row} ppl: {ppl:.4f}", flush=True)

    for c in args.configs:
        if c.startswith("b") and "-" in c and c[1:c.index("-")].isdigit():
            # bits-parameterized affine rows, e.g. b5-gptq, b6-msegrid,
            # b5-rtn: the affine code-dot kernel has ~flat pass count at
            # every width 1-8, so a 5/6-bit head keeps the fast path while
            # shrinking the grid error the W4 ladder measured as the
            # entire ppl cost (head4-gptq-a16 == head4-gptq).
            b = int(c[1:c.index("-")])
            meth = c[c.index("-") + 1:]
            row = f"head{b}-{meth}"
            if meth == "rtn":
                sol = lambda: rtn_head(W, grid=2 ** b)  # noqa: E731
            elif meth == "msegrid":
                sol = lambda: msegrid_head(W, grid=2 ** b)  # noqa: E731
            elif meth == "gptq":
                sol = lambda: gptq_head(W, H, bits=b)  # noqa: E731
            else:
                raise SystemExit(f"unknown config {c}")

            def run_b(row=row, sol=sol):
                if has_result(args.results, name, "ppl", "pycorpus-val",
                              row):
                    print(f"{row}: cached", flush=True)
                    return
                Q = sol()
                ppl = eval_head(params, cfg, Q, val_stream, args.seq)
                record_result(args.results, name, "ppl", "pycorpus-val",
                              row, float(ppl))
                print(f"{row} ppl: {ppl:.4f}", flush=True)
            run_b()
        elif c == "rtn":
            run("rtn", lambda: rtn_head(W))
        elif c == "msegrid":
            run("msegrid", lambda: msegrid_head(W))
        elif c == "gptq":
            run("gptq", lambda: gptq_head(W, H))
        elif c == "gptq-a16":
            # W4-only ablation: same GPTQ weights, bf16 activations —
            # decomposes the A8 activation share of the head ppl cost
            run("gptq-a16", lambda: gptq_head(W, H), a8=False)
        elif c == "gptq-mse":
            run("gptq-mse", lambda: gptq_head(W, H, mse=True))
        elif c.startswith("gptq-g"):
            G = int(c.split("-g")[1])
            assert Hg.shape[0] == G, (Hg.shape, G)
            run(c, lambda: gptq_head(W, Hg))
        elif c.startswith("lnq-"):
            fam = c.split("-")[1]
            guided = c.endswith("-g4")
            Huse = Hg if guided else H[None]
            # free-family heads serve via the exact-poly kernel (bf16
            # activations) — record the config as served
            run(c, lambda: lnq_head(Huse, fam), a8=(fam == "affine"))
        else:
            raise SystemExit(f"unknown config {c}")

    with open(args.results) as f:
        res = json.load(f)
    rows = {k: v for k, v in
            res[name]["ppl"]["pycorpus-val"].items()
            if k.startswith("head") or k == "fp32"}
    print(json.dumps(rows, indent=1), flush=True)


if __name__ == "__main__":
    main()
