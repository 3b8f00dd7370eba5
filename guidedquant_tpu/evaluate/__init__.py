from .ppl import evaluate_ppl, evaluate_ppl_layerwise  # noqa: F401
