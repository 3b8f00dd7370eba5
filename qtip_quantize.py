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
    p.add_argument("--e2e_steps", type=int, default=0,
                   help="whole-model SU/SV/tlut KD finetune steps after "
                        "packing (reference finetune_susv_e2e)")
    p.add_argument("--e2e_lr", type=float, default=1e-4)
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

    if args.e2e_steps and args.mode == "pack":
        import numpy as np
        import jax.numpy as jnp
        from guidedquant_tpu.formats import qtip_format
        from guidedquant_tpu.models.hf_import import load_hf_model
        from guidedquant_tpu.pipelines.qtip_e2e import (
            qtip_e2e_finetune, finalize_qtip_params)
        from guidedquant_tpu.solvers.qtip.codebook import BitshiftCodebook
        from guidedquant_tpu.calib import data as data_util

        qcfg, qparams = qtip_format.load_packed(out, dtype=jnp.float32)
        cb = BitshiftCodebook(L=args.L, K=args.K, V=args.V,
                              tlut_bits=args.tlut_bits,
                              decode_mode=args.decode_mode)
        _, teacher = load_hf_model(args.model)
        tokens = data_util.get_tokens(
            args.dataset, "train", tokenizer, args.seq_len,
            args.num_examples,
            save_path=f"{args.cache_dir}/tokens/e2e.npy")
        tuned, hist = qtip_e2e_finetune(
            qparams, qcfg, teacher, np.asarray(tokens), cb=cb,
            steps=args.e2e_steps, lr=args.e2e_lr)
        tuned = finalize_qtip_params(tuned, qcfg)
        print(f"e2e KD: {hist[0]:.5f} -> {hist[-1]:.5f}")


if __name__ == "__main__":
    main()
