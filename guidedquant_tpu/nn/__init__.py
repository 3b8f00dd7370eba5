from .linear import AnyPrecLinear, apply_linear, dequantize_anyprec  # noqa: F401
