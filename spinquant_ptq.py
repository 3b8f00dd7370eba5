#!/usr/bin/env python
"""CLI: SpinQuant W4A4(KV4) post-training quantization (+ optional rotation
learning).

Analog of the reference's ``spin_quant/ptq.py`` + ``optimize_rotation.py``.
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model")
    p.add_argument("--w_bits", type=int, default=4)
    p.add_argument("--a_bits", type=int, default=4)
    p.add_argument("--w_groupsize", type=int, default=-1)
    p.add_argument("--no_w_clip", action="store_true")
    p.add_argument("--a_clip_ratio", type=float, default=1.0)
    p.add_argument("--no_rotate", action="store_true")
    p.add_argument("--guided", action="store_true")
    p.add_argument("--num_groups", type=int, default=1)
    p.add_argument("--use_rtn", action="store_true")
    p.add_argument("--optimize_rotation_steps", type=int, default=0,
                   help="Cayley-SGD steps for R1/R2 before PTQ")
    p.add_argument("--rotation_lr", type=float, default=1.5)
    p.add_argument("--cache_dir", default="cache")
    p.add_argument("--dataset", default="wikitext2")
    p.add_argument("--seq_len", type=int, default=2048)
    p.add_argument("--num_examples", type=int, default=128)
    p.add_argument("--eval_ctx", type=int, default=2048)
    args = p.parse_args()

    import numpy as np
    from transformers import AutoTokenizer
    from guidedquant_tpu.models.hf_import import load_hf_model
    from guidedquant_tpu.calib.data import get_tokens, _load_texts
    from guidedquant_tpu.pipelines.quantize_spinquant import spinquant_ptq
    from guidedquant_tpu.evaluate import evaluate_ppl

    tokenizer = AutoTokenizer.from_pretrained(args.model)
    cfg, params = load_hf_model(args.model)

    R1 = R2 = None
    if args.optimize_rotation_steps:
        from guidedquant_tpu.solvers.spinquant.rotation import fuse_layer_norms
        from guidedquant_tpu.solvers.spinquant.optimize_rotation import (
            optimize_rotations)
        tokens = get_tokens(args.dataset, "train", tokenizer, args.seq_len,
                            args.num_examples)
        fused, fcfg = fuse_layer_norms(params, cfg)
        R1, R2, _ = optimize_rotations(
            fused, fcfg, tokens, steps=args.optimize_rotation_steps,
            lr=args.rotation_lr, w_bits=args.w_bits, a_bits=args.a_bits)

    qcfg, qparams = spinquant_ptq(
        args.model, cfg=cfg, params=params,
        w_bits=args.w_bits, a_bits=args.a_bits,
        w_groupsize=args.w_groupsize, w_clip=not args.no_w_clip,
        a_clip_ratio=args.a_clip_ratio,
        rotate=not args.no_rotate, R1=R1, R2=R2,
        guided=args.guided, num_groups=args.num_groups,
        use_rtn=args.use_rtn, cache_dir=args.cache_dir,
        dataset=args.dataset, seq_len=args.seq_len,
        num_examples=args.num_examples, tokenizer=tokenizer)

    texts = _load_texts("wikitext2", "test")
    stream = np.asarray(tokenizer("\n\n".join(texts))["input_ids"])
    ppl = evaluate_ppl(qparams, qcfg, stream, ctx_len=args.eval_ctx)
    print(f"wikitext2 ppl: {ppl:.4f}")


if __name__ == "__main__":
    main()
