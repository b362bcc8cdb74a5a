from . import spmm  # noqa: F401
