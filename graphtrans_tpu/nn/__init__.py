from . import conv, encoders, gnn, init, masked_transformer, norm, pooling, transformer  # noqa: F401
