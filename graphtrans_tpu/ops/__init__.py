from . import dense, scatter, segment  # noqa: F401
