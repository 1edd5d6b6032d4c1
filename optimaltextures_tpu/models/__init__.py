from . import arch, weights  # noqa: F401
