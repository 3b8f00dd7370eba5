#!/usr/bin/env python
"""CLI: end-to-end KD finetune of a packed model (PV-tuning style).

Analog of the reference's top-level ``full_nuq.py`` (FSDP KD finetune);
here the distributed execution is GSPMD over the local mesh.
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base_model", required=True,
                   help="HF model (teacher + dense residuals)")
    p.add_argument("--quantized_model", required=True,
                   help="packed model dir (student)")
    p.add_argument("--bits", type=int, required=True)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--dataset", default="redpajama")
    p.add_argument("--seq_len", type=int, default=4096)
    p.add_argument("--num_examples", type=int, default=1024)
    p.add_argument("--output", default=None,
                   help="output packed dir (default: <quantized_model>-ft)")
    args = p.parse_args()

    import numpy as np
    import jax.numpy as jnp
    from transformers import AutoTokenizer
    from guidedquant_tpu.models.hf_import import load_hf_model
    from guidedquant_tpu.calib.data import get_tokens
    from guidedquant_tpu.formats.anyprec import load_packed, save_packed
    from guidedquant_tpu.pipelines.finetune_e2e import (
        full_nuq_finetune, repack_student)

    tokenizer = AutoTokenizer.from_pretrained(args.base_model)
    tcfg, teacher = load_hf_model(args.base_model)
    qcfg, qparams = load_packed(args.quantized_model,
                                precision=args.bits, dtype=jnp.float32,
                                kernel_layout=False)
    tokens = get_tokens(args.dataset, "train", tokenizer, args.seq_len,
                        args.num_examples)

    codes, luts, hist = full_nuq_finetune(
        qparams, qcfg, teacher, tokens, bits=args.bits,
        steps=args.steps, batch_size=args.batch_size, lr=args.lr)
    ft = repack_student(qparams, qcfg, codes, luts, bits=args.bits)

    out = args.output or (args.quantized_model.rstrip("/") + "-ft")
    # re-export through the packed format
    import jax
    qweights, lut_list = [], []
    for l in range(qcfg.num_layers):
        qweights.append({m: np.asarray(ft["layers"][m].qweight[l])
                         for m in qcfg.module_names})
        lut_list.append({args.bits: {
            m: np.asarray(ft["layers"][m].luts[args.bits][l])
            for m in qcfg.module_names}})
    save_packed(out, qcfg, ft, qweights, lut_list, args.bits, args.bits)
    print(f"final KL: {hist[-1]:.5f}; packed -> {out}")


if __name__ == "__main__":
    main()
