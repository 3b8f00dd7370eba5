#!/usr/bin/env python
"""CLI: generate text from a packed model on TPU with throughput metrics.

Analog of the reference's top-level ``inference_example.py``.
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_dir", help="packed model directory")
    p.add_argument("--prompt", default="Once upon a time")
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--precision", type=int, default=None)
    p.add_argument("--max_new_tokens", type=int, default=100)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--kv_bits", type=int, default=16)
    args = p.parse_args()

    import os

    import numpy as np
    from transformers import AutoTokenizer
    from guidedquant_tpu.serve import engine
    from guidedquant_tpu.serve.fuse import fuse_projections, fusable

    tok = AutoTokenizer.from_pretrained(args.tokenizer)
    if os.path.basename(args.model_dir).startswith("qtip-"):
        # QTIP trellis checkpoint (the reference's interactive_gen analog,
        # qtip/eval/interactive_gen.py); serves unfused like its no_fuse
        # converter.
        from guidedquant_tpu.formats import qtip_format
        cfg, params = qtip_format.load_packed(args.model_dir)
    else:
        from guidedquant_tpu.formats.anyprec import load_packed
        cfg, params = load_packed(args.model_dir, precision=args.precision)
    if fusable(params):
        params = fuse_projections(params)

    ids = np.asarray(tok(args.prompt)["input_ids"])[None]
    out, metrics = engine.generate(
        params, cfg, ids, args.max_new_tokens,
        temperature=args.temperature, kv_bits=args.kv_bits)
    print(tok.decode(out[0]))
    print(f"decode: {metrics['decode_tok_s']:.1f} tok/s "
          f"(prefill {metrics['prefill_s']*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
