"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding tests run without TPU hardware (the standard JAX multi-host
simulation trick).

Note: this image's sitecustomize registers the TPU backend at interpreter
startup and pins jax_platforms, so env vars alone don't switch platforms —
we update jax.config in-process and clear any initialized backends."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_random_graph(rng, n_nodes, n_edges, feat_dim=8, num_classes=2, int_feat=False):
    x = (
        rng.integers(0, 4, size=(n_nodes, feat_dim)).astype(np.int32)
        if int_feat
        else rng.standard_normal((n_nodes, feat_dim)).astype(np.float32)
    )
    edge_index = rng.integers(0, n_nodes, size=(2, n_edges)).astype(np.int64)
    return {
        "x": x,
        "edge_index": edge_index,
        "edge_attr": None,
        "y": np.array([rng.integers(0, num_classes)]),
    }
