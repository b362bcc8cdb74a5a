"""Training-DYNAMICS parity vs the torch twin (fast CI arm).

tools/train_parity.py is the full artifact (150-epoch, multi-seed); this test
pins the same lockstep machinery at CI scale: both frameworks train the
flagship (GIN-virtual JK=cat -> CLS transformer) from IDENTICAL weights on
IDENTICAL batches and the per-step losses must track — which pins AdamW bias
correction, weight decay placement, global-norm clip, the per-step cosine
schedule, and train-mode BatchNorm momentum/variance semantics all at once
(/root/reference/main.py:178-196, trainers/base_trainer.py:17-51,
trainers/flag_trainer.py:19-56). A systematic mismatch in any of these grows
monotonically and trips the tolerance within a few steps.
"""

import os
import sys

import numpy as np
import pytest

pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from train_parity import build_dataset, flagship_args, paired_run  # noqa: E402


def _run(flag, epochs, **hp_over):
    splits = build_dataset(60, seed=3)
    hp = flagship_args(batch_size=16, gnn_emb_dim=32, gnn_num_layer=2,
                       d_model=32, dim_feedforward=64, num_encoder_layers=2,
                       m=2, **hp_over)
    return paired_run(hp, splits, 2, 16, seed=0, epochs=epochs, flag=flag,
                      log=lambda *a: None)


def test_baseline_training_dynamics_match_torch():
    res = _run(flag=False, epochs=8)  # 8 epochs x 3 steps = 24 steps
    j = np.array(res["jax_step_losses"])
    t = np.array(res["torch_step_losses"])
    # optimizer/schedule/BN semantics: early steps near float precision
    np.testing.assert_allclose(j[:10], t[:10], rtol=2e-3, atol=2e-4)
    # f32 chaos stays bounded over the full horizon
    assert np.max(np.abs(j - t) / np.maximum(np.abs(t), 1e-8)) < 3e-2
    # both reached the same place
    assert abs(res["final"]["jax_train_acc"]
               - res["final"]["torch_train_acc"]) <= 0.05


def test_flag_training_dynamics_match_torch():
    """FLAG arm: shared initial perturbation, m-step sign ascent, grad
    accumulation across passes, BN updating every pass."""
    res = _run(flag=True, epochs=4)
    j = np.array(res["jax_step_losses"])
    t = np.array(res["torch_step_losses"])
    np.testing.assert_allclose(j[:8], t[:8], rtol=3e-3, atol=3e-4)
    assert np.max(np.abs(j - t) / np.maximum(np.abs(t), 1e-8)) < 3e-2


def test_training_dynamics_diverge_without_schedule_parity():
    """Sanity: the lockstep comparison actually has teeth — changing only the
    schedule on one side must trip the same tolerance the parity tests use."""
    res = _run(flag=False, epochs=4)
    base = np.array(res["jax_step_losses"])
    res2 = _run(flag=False, epochs=4, scheduler=None)
    off = np.array(res2["jax_step_losses"])
    assert np.max(np.abs(base - off)) > 1e-3
