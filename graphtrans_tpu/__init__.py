"""graphtrans_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for the
GraphTrans model family ("Representing Long-Range Context for Graph Neural
Networks with Global Attention", NeurIPS 2021).

Built from scratch against the behavior of the reference implementation
(ucbrise/graphtrans); the architecture here is idiomatic JAX: pure-functional
modules over parameter pytrees, one jit-compiled train step, static shapes via
size-bucketed padded graph batches, and `jax.sharding.Mesh` + shard_map for
multi-chip scale-out.
"""

__version__ = "0.1.0"
