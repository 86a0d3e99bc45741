from . import nn, masks  # noqa: F401
