from . import kmeans1d, seed  # noqa: F401
