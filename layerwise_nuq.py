#!/usr/bin/env python
"""CLI: LNQ + GuidedQuant layerwise non-uniform quantization (flagship).

Analog of the reference's top-level ``layerwise_nuq.py``.
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model")
    p.add_argument("--seed_precision", type=int, default=3,
                   help="target bit-width")
    p.add_argument("--mode", default="pack",
                   choices=["tokens", "hessians", "quantize", "pack"])
    p.add_argument("--cache_dir", default="cache")
    p.add_argument("--dataset", default="c4")
    p.add_argument("--seq_len", type=int, default=512)
    p.add_argument("--num_examples", type=int, default=100)
    p.add_argument("--num_groups", type=int, default=1)
    p.add_argument("--num_iterations", type=int, default=3)
    p.add_argument("--cd_cycles", type=int, default=4)
    p.add_argument("--sub_qlayer", type=int, nargs=2, default=None)
    p.add_argument("--is_nosal", action="store_true")
    p.add_argument("--shared_shape_tile", type=int, default=None,
                   help="snap codebooks to the row-tile-shared-shape family "
                        "(enables the fast scalar-coefficient decode kernel)")
    p.add_argument("--codebook_family", default="free",
                   choices=["free", "affine"],
                   help="'affine' solves within the per-row uniform-grid "
                        "family (fastest TPU decode kernel: MXU code-dot "
                        "+ affine epilogue)")
    args = p.parse_args()

    from transformers import AutoTokenizer
    from guidedquant_tpu.pipelines import layerwise_nuq

    tokenizer = AutoTokenizer.from_pretrained(args.model)
    out = layerwise_nuq(
        args.model, seed_precision=args.seed_precision, mode=args.mode,
        cache_dir=args.cache_dir, dataset=args.dataset,
        seq_len=args.seq_len, num_examples=args.num_examples,
        num_groups=args.num_groups, num_iterations=args.num_iterations,
        cd_cycles=args.cd_cycles, sub_qlayer=args.sub_qlayer,
        is_nosal=args.is_nosal, shared_shape_tile=args.shared_shape_tile,
        codebook_family=args.codebook_family, tokenizer=tokenizer)
    print(out)


if __name__ == "__main__":
    main()
