from . import quant, rotation, gptq  # noqa: F401
