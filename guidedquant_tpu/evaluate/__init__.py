from .ppl import evaluate_ppl  # noqa: F401
