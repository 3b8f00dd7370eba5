from . import anyprec  # noqa: F401
