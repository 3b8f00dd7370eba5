from . import pack  # noqa: F401
