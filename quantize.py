#!/usr/bin/env python
"""CLI: any-precision (SqueezeLLM seed + upscale) quantization.

Analog of the reference's top-level ``quantize.py``.
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model", help="HF model path or name")
    p.add_argument("--seed_precision", type=int, default=3)
    p.add_argument("--parent_precision", type=int, default=8)
    p.add_argument("--mode", default="pack",
                   choices=["tokens", "gradients", "quantize", "pack"])
    p.add_argument("--cache_dir", default="cache")
    p.add_argument("--dataset", default="c4")
    p.add_argument("--seq_len", type=int, default=512)
    p.add_argument("--num_examples", type=int, default=100)
    p.add_argument("--num_groups", type=int, default=None)
    args = p.parse_args()

    from transformers import AutoTokenizer
    from guidedquant_tpu.pipelines import any_precision_quantize

    tokenizer = AutoTokenizer.from_pretrained(args.model)
    out = any_precision_quantize(
        args.model, seed_precision=args.seed_precision,
        parent_precision=args.parent_precision, mode=args.mode,
        cache_dir=args.cache_dir, dataset=args.dataset,
        seq_len=args.seq_len, num_examples=args.num_examples,
        num_groups=args.num_groups, tokenizer=tokenizer)
    print(out)


if __name__ == "__main__":
    main()
