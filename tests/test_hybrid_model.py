"""End-to-end hybrid flagship forward: node-sharded GNN stage (halo convs)
feeding the dense transformer stage via a psum'd scatter — the full
GraphTrans forward across the mesh, parity-checked against single-device."""

import jax
import jax.numpy as jnp
import numpy as np

from graphtrans_tpu.data.batch import collate
from graphtrans_tpu.data.synthetic import make_tu_dataset
from graphtrans_tpu.models import MODELS
from graphtrans_tpu.nn.encoders import LinearNodeEncoder, ZeroEdgeEncoder
from graphtrans_tpu.parallel.hybrid import make_hybrid_flagship_forward, shard_batch_for_hybrid
from tests.test_models import default_args


def test_hybrid_flagship_forward_matches_single(rng):
    graphs = make_tu_dataset(num_graphs=24, min_nodes=8, max_nodes=30, seed=11)
    batch = collate(graphs, 25, 512, 2048)
    args = default_args(gnn_type="gin", gnn_virtual_node=True, gnn_JK="cat",
                        gnn_dropout=0.0, transformer_dropout=0.0)
    model_cls = MODELS["gnn-transformer"]
    ref_model = model_cls.build(2, args, LinearNodeEncoder(16), ZeroEdgeEncoder)
    variables = ref_model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, None, False,
    )
    ref = np.asarray(ref_model.apply(variables, batch, None, False))

    for D in (2, 4):
        args.bn_axis_name = "data"
        args.graph_reduce_axis = "data"
        hyb_model = model_cls.build(2, args, LinearNodeEncoder(16), ZeroEdgeEncoder)
        local, part = shard_batch_for_hybrid(batch, D)
        fwd = make_hybrid_flagship_forward(hyb_model, part)
        got = np.asarray(fwd(variables, local))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5,
                                   err_msg=f"D={D}")
