from .quantize_scalar import any_precision_quantize  # noqa: F401
from .quantize_lnq import layerwise_nuq  # noqa: F401
