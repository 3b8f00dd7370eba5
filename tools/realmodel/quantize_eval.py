"""End-to-end quantization quality validation on the real local checkpoint.

Runs the FULL flagship pipeline (tokens -> gradients/saliency -> guided
Hessians -> seed k-means -> LNQ -> pack) on the byte-LM trained by
train_lm.py, then evaluates held-out perplexity per bit-width / codebook
family and records everything into results.json — the analog of the
reference's WikiText-2 ppl regression ledger (``run_eval.py:44-122``).

Configs swept:
  fp32 baseline ppl
  {2,3,4}-bit LNQ "free" codebooks (the paper configuration)
  2-bit "affine" + "shared" families (quantifies the fast-kernel snap cost)
  2-bit unguided (is_nosal) ablation (guided-vs-unguided on a real model)
"""

import argparse
import faulthandler
import logging
import signal
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))
from train_lm import load_params, model_preset  # noqa: E402


def model_cfg(seq):
    return model_preset("pybyte-27m", seq)


def main():
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s: %(message)s")
    faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps stacks
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="pybyte-27m",
                   help="train_lm preset: pybyte-27m | pyword-190m")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--corpus", default=None)
    p.add_argument("--results", default="results.json")
    p.add_argument("--cache_dir", default="cache/realmodel")
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--num_examples", type=int, default=128)
    p.add_argument("--val_mb", type=float, default=0.5,
                   help="held-out bytes/tokens (M) to evaluate ppl on")
    p.add_argument("--configs", nargs="+", default=None,
                   help='subset like "2-free 2-affine 4-free nosal"')
    args = p.parse_args()
    word = args.model != "pybyte-27m"
    if args.ckpt is None:
        args.ckpt = ("cache/realmodel/ckpt_word.npz" if word
                     else "cache/realmodel/ckpt.npz")
    if args.corpus is None:
        args.corpus = ("cache/realmodel/corpus_word.npz" if word
                       else "cache/realmodel/corpus.npz")

    import jax.numpy as jnp
    from guidedquant_tpu.pipelines.quantize_lnq import layerwise_nuq
    from guidedquant_tpu.evaluate.ppl import evaluate_ppl
    from guidedquant_tpu.evaluate.results import record_result, has_result
    from guidedquant_tpu.formats.anyprec import load_packed

    cfg = model_preset(args.model, args.seq)
    params = load_params(args.ckpt)
    z = np.load(args.corpus)
    train, val = z["train"], z["val"]
    val_stream = val[:int(args.val_mb * 1024 * 1024)].astype(np.int32)

    rng = np.random.default_rng(1)
    starts = rng.integers(0, train.size - args.seq, size=args.num_examples)
    calib_tokens = train[starts[:, None] + np.arange(args.seq)].astype(np.int32)

    name = cfg.name
    if not has_result(args.results, name, "ppl", "pycorpus-val", "fp32"):
        ppl = evaluate_ppl(params, cfg, val_stream, ctx_len=args.seq)
        record_result(args.results, name, "ppl", "pycorpus-val", "fp32",
                      float(ppl))
        print(f"fp32 ppl/byte: {ppl:.4f}", flush=True)

    def run(bits, family, nosal=False, groups=1, act8=False):
        key = f"{bits}bit-{family}" + ("-nosal" if nosal else "")
        if act8:
            key += "-a8"  # int-domain W{b}A8 kernel path (i32 decode +
            # int8 MXU dot): ppl-validates exactly what the fast kernel
            # serves when activations are absmax-int8 quantized
            import jax
            assert jax.default_backend() in ("tpu", "axon"), (
                f"act8 requested on backend={jax.default_backend()!r}: "
                "supported_affine_w2a8 silently falls back to full-"
                "precision activations off-TPU, so the recorded row "
                "would mislabel fp activations as A8 — run on hardware")
        if groups != 1:
            key += f"-g{groups}"
        if has_result(args.results, name, "ppl", "pycorpus-val", key):
            print(f"{key}: cached", flush=True)
            return
        tile = 512 if family == "shared" else None
        packed = layerwise_nuq(
            name, cfg=cfg, params=params, seed_precision=bits,
            cache_dir=args.cache_dir, dataset="pycorpus",
            seq_len=args.seq, num_examples=args.num_examples,
            num_groups=groups, num_iterations=3, cd_cycles=4,
            is_nosal=nosal, shared_shape_tile=tile,
            codebook_family=family if family != "shared" else "free",
            tokens=calib_tokens)
        _qcfg, qparams = load_packed(packed, precision=bits,
                                     dtype=jnp.float32)
        if act8:
            from guidedquant_tpu.nn.linear import AnyPrecLinear, with_act8
            qparams = dict(qparams, layers={
                k: (with_act8(v) if isinstance(v, AnyPrecLinear) else v)
                for k, v in qparams["layers"].items()})
        ppl = evaluate_ppl(qparams, cfg, val_stream, ctx_len=args.seq)
        record_result(args.results, name, "ppl", "pycorpus-val", key,
                      float(ppl))
        print(f"{key} ppl/byte: {ppl:.4f}", flush=True)

    def run_qtip(K, groups=1, decode_mode="quantlut_sym", V=2,
                 stream_format="tile256"):
        """QTIP trellis VQ on the real checkpoint (guided Hessians).

        ``stream_format="column"`` with a compute codebook (tpu2u/2mad,
        V=1) is the *kernel-servable* configuration — the ppl recorded for
        it validates exactly what the fused Pallas kernel serves (VERDICT
        r2 next 1a: validate what you serve, serve what you validate).
        """
        key = f"{K}bit-qtip" + (f"-g{groups}" if groups != 1 else "")
        if stream_format == "column":
            key += f"-column-{decode_mode}"
        if has_result(args.results, name, "ppl", "pycorpus-val", key):
            print(f"{key}: cached", flush=True)
            return
        from guidedquant_tpu.pipelines.quantize_qtip import quantize_qtip
        from guidedquant_tpu.formats import qtip_format
        packed = quantize_qtip(
            name, cfg=cfg, params=params, K=K, V=V,
            decode_mode=decode_mode, stream_format=stream_format,
            cache_dir=args.cache_dir, dataset="pycorpus",
            seq_len=args.seq, num_examples=args.num_examples,
            num_groups=groups, tokens=calib_tokens)
        qcfg, qparams = qtip_format.load_packed(packed, dtype=jnp.float32)
        ppl = evaluate_ppl(qparams, qcfg, val_stream, ctx_len=args.seq)
        record_result(args.results, name, "ppl", "pycorpus-val", key,
                      float(ppl))
        print(f"{key} ppl/byte: {ppl:.4f}", flush=True)

    def _held_out_text_and_encode():
        """(text, encode) for the downstream task on this model family."""
        if word:
            from tokenizers import Tokenizer
            tok = Tokenizer.from_file("cache/realmodel/tokenizer_word.json")
            text = tok.decode(list(np.asarray(val[:400_000], np.int64)))
            return text, lambda s: tok.encode(s).ids
        text = bytes(np.asarray(val[:1_500_000], np.uint8)).decode("latin-1")
        return text, lambda s: list(s.encode("latin-1"))

    def run_downstream(spec, n_items=200, gen_items=50):
        """Identifier-completion accuracy (local lm-eval analog) for a
        quantized config or the fp32 baseline; records under
        ``downstream`` next to the ppl ledger (VERDICT r2 next 9)."""
        from guidedquant_tpu.evaluate.downstream import (
            evaluate_identifier_completion)
        if has_result(args.results, name, "downstream", "pycorpus-val",
                      spec):
            print(f"downstream {spec}: cached", flush=True)
            return
        if spec == "fp32":
            qparams, qcfg = params, cfg
        else:
            parts = spec.split("-")
            bits, family = int(parts[0]), parts[1]
            nosal = parts[-1] == "nosal"
            groups = 1  # e.g. ds-2-free-g4: guided with G saliency groups
            for t in parts[2:]:
                if t.startswith("g") and t[1:].isdigit():
                    groups = int(t[1:])
            tile = 512 if family == "shared" else None
            packed = layerwise_nuq(
                name, cfg=cfg, params=params, seed_precision=bits,
                cache_dir=args.cache_dir, dataset="pycorpus",
                seq_len=args.seq, num_examples=args.num_examples,
                num_groups=groups, num_iterations=3, cd_cycles=4,
                is_nosal=nosal, shared_shape_tile=tile,
                codebook_family=family if family != "shared" else "free",
                tokens=calib_tokens)
            _q, qparams = load_packed(packed, precision=bits,
                                      dtype=jnp.float32)
            qcfg = cfg
        text, encode = _held_out_text_and_encode()
        res = evaluate_identifier_completion(
            qcfg, qparams, text, encode, n_items=n_items,
            gen_items=gen_items, ctx_chars=448 if not word else 900,
            verbose=True)
        record_result(args.results, name, "downstream", "pycorpus-val",
                      spec, res)
        print(f"downstream {spec}: {json.dumps(res)}", flush=True)

    def run_spinquant(w_bits, a_bits, groups=1):
        """SpinQuant rotate + guided GPTQ W{w}A{a} on the real checkpoint."""
        key = (f"w{w_bits}a{a_bits}-spinquant"
               + (f"-g{groups}" if groups != 1 else ""))
        if has_result(args.results, name, "ppl", "pycorpus-val", key):
            print(f"{key}: cached", flush=True)
            return
        from guidedquant_tpu.pipelines.quantize_spinquant import spinquant_ptq
        qcfg, qparams = spinquant_ptq(
            name, cfg=cfg, params=params, w_bits=w_bits, a_bits=a_bits,
            rotate=True, guided=True, num_groups=groups,
            cache_dir=args.cache_dir, dataset="pycorpus",
            seq_len=args.seq, num_examples=args.num_examples,
            tokens=calib_tokens)
        ppl = evaluate_ppl(qparams, qcfg, val_stream, ctx_len=args.seq)
        record_result(args.results, name, "ppl", "pycorpus-val", key,
                      float(ppl))
        print(f"{key} ppl/byte: {ppl:.4f}", flush=True)

    def run_qtip_e2e(K=2, steps=150):
        """QTIP whole-model SU/SV/tlut E2E KD finetune (reference
        finetune_susv_e2e) on top of the packed trellis model."""
        key = f"{K}bit-qtip-e2e{steps}"
        if has_result(args.results, name, "ppl", "pycorpus-val", key):
            print(f"{key}: cached", flush=True)
            return
        from guidedquant_tpu.pipelines.quantize_qtip import quantize_qtip
        from guidedquant_tpu.pipelines.qtip_e2e import (
            qtip_e2e_finetune, finalize_qtip_params)
        from guidedquant_tpu.formats import qtip_format
        from guidedquant_tpu.solvers.qtip.codebook import BitshiftCodebook
        from guidedquant_tpu.utils import cache as cache_util
        packed = quantize_qtip(
            name, cfg=cfg, params=params, K=K,
            cache_dir=args.cache_dir, dataset="pycorpus",
            seq_len=args.seq, num_examples=args.num_examples,
            num_groups=1, tokens=calib_tokens)  # cached
        # rebuild the codebook from the checkpoint's own tlut (the packed
        # states were Viterbi-encoded against it)
        meta = cache_util.load_json(os.path.join(packed, "config.json"))
        qp_meta = meta["quip_params"]
        z = cache_util.load_npz_dict(os.path.join(packed, "model.npz"))
        cb = BitshiftCodebook(L=qp_meta["L"], K=qp_meta["K"],
                              V=qp_meta["V"],
                              tlut_bits=qp_meta["tlut_bits"],
                              decode_mode=qp_meta["decode_mode"],
                              tlut=z.get("tlut"))
        qcfg, qparams = qtip_format.load_packed(packed, dtype=jnp.float32,
                                                cb=cb)
        tuned, hist = qtip_e2e_finetune(qparams, qcfg, params, calib_tokens,
                                        cb=cb, steps=steps, batch_size=4,
                                        lr=1e-4)
        served = finalize_qtip_params(tuned, qcfg)
        ppl = evaluate_ppl(served, qcfg, val_stream, ctx_len=args.seq)
        record_result(args.results, name, "ppl", "pycorpus-val", key,
                      float(ppl))
        print(f"{key}: KL {hist[0]:.4f} -> {hist[-1]:.4f}, "
              f"ppl/byte {ppl:.4f}", flush=True)

    def run_kd(bits=2, steps=200):
        """full_nuq KD finetune of the packed model against the fp32
        teacher (PV-tuning analog, reference full_main.py:712-911), then
        held-out ppl of the repacked student."""
        key = f"{bits}bit-free-kd{steps}"
        if has_result(args.results, name, "ppl", "pycorpus-val", key):
            print(f"{key}: cached", flush=True)
            return
        from guidedquant_tpu.pipelines.finetune_e2e import (
            full_nuq_finetune, repack_student)
        packed = layerwise_nuq(
            name, cfg=cfg, params=params, seed_precision=bits,
            cache_dir=args.cache_dir, dataset="pycorpus",
            seq_len=args.seq, num_examples=args.num_examples,
            num_groups=1, num_iterations=3, cd_cycles=4,
            codebook_family="free", tokens=calib_tokens)  # cached
        _q, qparams = load_packed(packed, precision=bits,
                                  dtype=jnp.float32)
        codes, luts, hist = full_nuq_finetune(
            qparams, cfg, params, calib_tokens, bits=bits, steps=steps,
            batch_size=4, lr=1e-4)
        ft = repack_student(qparams, cfg, codes, luts, bits=bits)
        ppl = evaluate_ppl(ft, cfg, val_stream, ctx_len=args.seq)
        record_result(args.results, name, "ppl", "pycorpus-val", key,
                      float(ppl))
        print(f"{key}: KL {hist[0]:.4f} -> {hist[-1]:.4f}, "
              f"ppl/byte {ppl:.4f}", flush=True)

    wanted = args.configs or ["4-free", "3-free", "2-free", "2-affine",
                              "2-shared", "nosal"]
    for w in wanted:
        parts = w.split("-")
        if parts[0] == "ds":
            # downstream specs keep their suffixes (-gN parsed inside
            # run_downstream); popping them here would alias e.g.
            # ds-2-free-g4 onto the cached ds-2-free
            run_downstream("-".join(parts[1:]))
            continue
        groups = 1
        act8 = False
        if parts[-1] == "a8":  # e.g. 2-affine-a8: W{b}A8 kernel-path ppl
            act8 = True
            parts.pop()
        if parts[-1].startswith("g") and parts[-1][1:].isdigit():
            groups = int(parts.pop()[1:])
        if parts[0] == "kd":  # e.g. kd-2-200
            run_kd(int(parts[1]), int(parts[2]))
        elif parts[0] == "qtipe2e":  # e.g. qtipe2e-2-150
            run_qtip_e2e(int(parts[1]), int(parts[2]))
        elif parts[0] == "qtipcol":  # e.g. qtipcol-2-tpu2u, qtipcol-3-2mad
            run_qtip(int(parts[1]), groups, decode_mode=parts[2], V=1,
                     stream_format="column")
        elif parts[1:] == ["qtip"]:
            run_qtip(int(parts[0]), groups)
        elif parts[0] == "spinquant":  # e.g. spinquant-4-4
            run_spinquant(int(parts[1]), int(parts[2]), groups)
        elif parts[0] == "nosal":
            run(2, "free", nosal=True, groups=groups)
        else:
            run(int(parts[0]), parts[1], groups=groups, act8=act8)

    with open(args.results) as f:
        res = json.load(f)
    print(json.dumps(res.get(name, {}), indent=1), flush=True)


if __name__ == "__main__":
    main()
