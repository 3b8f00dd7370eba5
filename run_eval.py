#!/usr/bin/env python
"""CLI: evaluate packed models (perplexity + optional lm-eval).

Analog of the reference's top-level ``run_eval.py``: scans
``cache/{packed,layerwise_packed,qtip_packed}`` for models, computes
WikiText-2/C4 perplexity at every supported bit-width, and merges results
into ``results.json`` (skip-if-present).
"""

import argparse
import os


def _load_model(model_dir, precision=None):
    import jax.numpy as jnp
    base = os.path.basename(model_dir)
    if base.startswith("qtip-"):
        from guidedquant_tpu.formats import qtip_format
        return qtip_format.load_packed(model_dir, dtype=jnp.float32)
    from guidedquant_tpu.formats.anyprec import load_packed
    return load_packed(model_dir, precision=precision, dtype=jnp.float32)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cache_dir", default="cache")
    p.add_argument("--output_file", default="results.json")
    p.add_argument("--datasets", nargs="+", default=["wikitext2"])
    p.add_argument("--ctx_len", type=int, default=2048)
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer for dataset tokenization")
    p.add_argument("--models", nargs="+", default=None,
                   help="explicit packed model dirs (else scan cache)")
    p.add_argument("--lm_eval", action="store_true",
                   help="also run the lm-eval zeroshot suite "
                        "(needs lm-eval + network for task data)")
    p.add_argument("--tasks", nargs="+", default=None,
                   help="lm-eval task list (default: the canonical 8-task "
                        "suite, reference run_eval.py:38-42)")
    args = p.parse_args()

    import numpy as np
    from guidedquant_tpu.calib.data import _load_texts
    from guidedquant_tpu.evaluate import evaluate_ppl
    from guidedquant_tpu.evaluate.results import record_result, has_result
    from guidedquant_tpu.utils.cache import load_json

    model_dirs = args.models or []
    if not model_dirs:
        for sub in ("packed", "layerwise_packed", "qtip_packed"):
            d = os.path.join(args.cache_dir, sub)
            if os.path.isdir(d):
                model_dirs += [os.path.join(d, m) for m in sorted(os.listdir(d))]

    from transformers import AutoTokenizer
    for mdir in model_dirs:
        name = os.path.basename(mdir)
        meta = load_json(os.path.join(mdir, "config.json"))
        sup = []
        if "anyprec" in meta:
            ap = meta["anyprec"]
            sup = list(range(ap["seed_precision"], ap["parent_precision"] + 1))
        else:
            sup = [None]
        for ds in args.datasets:
            tok = AutoTokenizer.from_pretrained(args.tokenizer) \
                if args.tokenizer else None
            texts = _load_texts(ds, "test" if ds == "wikitext2" else "validation")
            stream = np.asarray(tok("\n\n".join(texts))["input_ids"])
            for bits in sup:
                key = str(bits or "native")
                if has_result(args.output_file, name, "ppl", ds, key):
                    print(f"skip {name} {ds} {key}")
                    continue
                cfg, params = _load_model(mdir, precision=bits)
                ppl = evaluate_ppl(params, cfg, stream, ctx_len=args.ctx_len)
                record_result(args.output_file, name, "ppl", ds, key, ppl)
                print(f"{name} {ds} {key}: {ppl:.4f}")
        if args.lm_eval:
            from guidedquant_tpu.evaluate.lm_eval_bridge import run_lm_eval
            for bits in sup:
                key = str(bits or "native")
                if has_result(args.output_file, name, "lm-eval", "suite", key):
                    continue
                cfg, params = _load_model(mdir, precision=bits)
                tok = AutoTokenizer.from_pretrained(args.tokenizer) \
                    if args.tokenizer else None
                res = run_lm_eval(cfg, params, tok, tasks=args.tasks,
                                  max_length=args.ctx_len)
                record_result(args.output_file, name, "lm-eval", "suite",
                              key, res.get("results", res))


if __name__ == "__main__":
    main()
