"""Guidance diagnosis: measure the saliency spectrum and the guided-vs-
unguided Hessian alignment on the real checkpoints (VERDICT r3 next 7a).

The guided pipeline weights Hessian accumulation by per-group output
saliency (reference ``any_precision/quantization/gradients.py:98-113``,
``activations.py:393-584``). Guidance can only change the solution to the
extent that (a) saliency varies across tokens/groups and (b) the weighted
Hessian differs in *shape* (not scale) from the unweighted one. This tool
quantifies both:

  - token-CV: coefficient of variation of per-token saliency (g=1);
  - group-CV: CV across the G per-group mean saliencies (g=4);
  - H-align: cosine similarity of trace-normalized guided vs unguided
    Hessians per linear (1.0 => guidance is a pure rescale = vacuous).

Computes any missing saliency/Hessian caches via the standard pipeline
stages (layer-resumable). Run per model in its own process:

  timeout 3600 python tools/realmodel/saliency_spectrum.py pybyte-27m
  timeout 7200 python tools/realmodel/saliency_spectrum.py pyword-190m
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))
from train_lm import load_params, model_preset  # noqa: E402

MODEL = sys.argv[1] if len(sys.argv) > 1 else "pybyte-27m"
GROUPS = int(os.environ.get("SPEC_GROUPS", "4"))
SEQ, NEX = 512, 128
CACHE = "cache/realmodel"


def main():
    import logging
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s: %(message)s")
    from guidedquant_tpu.pipelines.quantize_lnq import layerwise_nuq
    from guidedquant_tpu.utils import cache as cache_util

    word = MODEL != "pybyte-27m"
    cfg = model_preset(MODEL, SEQ)
    params = load_params(f"{CACHE}/ckpt_word.npz" if word
                         else f"{CACHE}/ckpt.npz")
    z = np.load(f"{CACHE}/corpus_word.npz" if word else f"{CACHE}/corpus.npz")
    rng = np.random.default_rng(1)
    starts = rng.integers(0, z["train"].size - SEQ, size=NEX)
    tokens = z["train"][starts[:, None] + np.arange(SEQ)].astype(np.int32)

    # ensure caches exist: guided g1 + gG, and unguided (nosal) g1
    for groups, nosal in ((1, False), (GROUPS, False), (1, True)):
        layerwise_nuq(cfg.name, cfg=cfg, params=params, mode="hessians",
                      cache_dir=CACHE, dataset="pycorpus", seq_len=SEQ,
                      num_examples=NEX, num_groups=groups, is_nosal=nosal,
                      tokens=tokens)

    key = cache_util.dataset_key(cfg.name, "pycorpus", NEX, SEQ)
    sal1 = f"{CACHE}/saliency/{key}_g1"
    salG = f"{CACHE}/saliency/{key}_g{GROUPS}"
    hg = f"{CACHE}/hessians/{key}_g1"
    hn = f"{CACHE}/hessians/{key}_g1_nosal"

    report = {"model": cfg.name, "groups": GROUPS, "layers": {}}
    agg = {"token_cv": [], "group_cv": [], "h_align": []}
    for l in range(cfg.num_layers):
        s1 = cache_util.load_npz_dict(cache_util.layer_path(sal1, l))
        sG = cache_util.load_npz_dict(cache_util.layer_path(salG, l))
        Hg = cache_util.load_npz_dict(cache_util.layer_path(hg, l))
        Hn = cache_util.load_npz_dict(cache_util.layer_path(hn, l))
        row = {}
        for mod in s1:
            v1 = np.asarray(s1[mod], np.float64)[..., 0]  # [N, S]
            token_cv = float(v1.std() / max(v1.mean(), 1e-30))
            gmean = np.asarray(sG[mod], np.float64).reshape(-1, GROUPS
                                                            ).mean(0)  # [G]
            group_cv = float(gmean.std() / max(gmean.mean(), 1e-30))
            A = np.asarray(Hg[mod], np.float64).reshape(-1)
            B = np.asarray(Hn[mod], np.float64).reshape(-1)
            h_align = float(A @ B / max(np.linalg.norm(A)
                                        * np.linalg.norm(B), 1e-30))
            row[mod] = {"token_cv": round(token_cv, 4),
                        "group_cv": round(group_cv, 4),
                        "h_align": round(h_align, 6)}
            agg["token_cv"].append(token_cv)
            agg["group_cv"].append(group_cv)
            agg["h_align"].append(h_align)
        report["layers"][l] = row
        print(f"layer {l}: " + ", ".join(
            f"{m}: tokCV {r['token_cv']:.2f} grpCV {r['group_cv']:.3f} "
            f"Halign {r['h_align']:.4f}" for m, r in row.items()),
            flush=True)
    report["summary"] = {k: {"mean": round(float(np.mean(v)), 4),
                             "min": round(float(np.min(v)), 4),
                             "max": round(float(np.max(v)), 4)}
                         for k, v in agg.items()}
    out = f"{CACHE}/saliency_spectrum_{cfg.name}.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["summary"], indent=1), flush=True)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
