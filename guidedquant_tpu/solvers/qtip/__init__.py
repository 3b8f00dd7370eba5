from .codebook import BitshiftCodebook  # noqa: F401
from . import ldlq  # noqa: F401
