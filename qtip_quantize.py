#!/usr/bin/env python
"""CLI: QTIP + GuidedQuant trellis quantization.

Analog of the reference's ``qtip/quantize_llama/quantize_finetune_llama.py``
driver (plus hfize) as a single command.
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model")
    p.add_argument("--K", type=int, default=2, help="bits per weight")
    p.add_argument("--L", type=int, default=16)
    p.add_argument("--V", type=int, default=2)
    p.add_argument("--tlut_bits", type=int, default=9)
    p.add_argument("--decode_mode", default="quantlut_sym",
                   choices=["quantlut_sym", "1mad", "2mad", "3inst", "lut"])
    p.add_argument("--td_x", type=int, default=16)
    p.add_argument("--td_y", type=int, default=16)
    p.add_argument("--ft_steps", type=int, default=0,
                   help="per-linear SU/SV finetune steps")
    p.add_argument("--mode", default="pack",
                   choices=["tokens", "hessians", "quantize", "pack"])
    p.add_argument("--cache_dir", default="cache")
    p.add_argument("--dataset", default="redpajama")
    p.add_argument("--seq_len", type=int, default=4096)
    p.add_argument("--num_examples", type=int, default=1024)
    p.add_argument("--num_groups", type=int, default=1)
    p.add_argument("--is_nosal", action="store_true")
    args = p.parse_args()

    from transformers import AutoTokenizer
    from guidedquant_tpu.pipelines.quantize_qtip import quantize_qtip

    tokenizer = AutoTokenizer.from_pretrained(args.model)
    out = quantize_qtip(
        args.model, K=args.K, L=args.L, V=args.V, tlut_bits=args.tlut_bits,
        decode_mode=args.decode_mode, td_x=args.td_x, td_y=args.td_y,
        ft_steps=args.ft_steps, mode=args.mode, cache_dir=args.cache_dir,
        dataset=args.dataset, seq_len=args.seq_len,
        num_examples=args.num_examples, num_groups=args.num_groups,
        is_nosal=args.is_nosal, tokenizer=tokenizer)
    print(out)


if __name__ == "__main__":
    main()
