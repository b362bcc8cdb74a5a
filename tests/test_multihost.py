"""Multi-HOST (multi-process) execution path (parallel/multihost.py).

The heavy test runs TWO REAL PROCESSES (jax.distributed.initialize over a
localhost TCP coordinator, Gloo CPU collectives, 2 local devices each)
through the user-facing CLI and asserts the per-epoch training losses equal
the single-process 4-shard DP run on the same data/seed — the DP math is
permutation-invariant over shards, so multi-process must reproduce
single-process numerics up to f32 reassociation. Reference scope: the
upstream has no distributed code at all (SURVEY.md §2.8); this is the DCN
scaling axis BASELINE.md names.

Light tests pin the loader's global-plan slicing invariants (every plan
collated exactly once across processes, equal group counts, degenerate-group
dropping) without spawning processes.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _cli(tmp, extra, local_devices=2, env_extra=None, timeout=420):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    if env_extra:
        env.update(env_extra)
    cmd = [sys.executable, os.path.join(REPO, "main.py"),
           "--dataset", "NCI1", "--model_type", "gnn-transformer",
           "--graph_pooling", "cls", "--scheduler", "cosine",
           "--gnn_num_layer", "2", "--gnn_emb_dim", "16",
           "--d_model", "16", "--num_encoder_layers", "1",
           "--dim_feedforward", "32", "--epochs", "2",
           "--runs", "1", "--batch_size", "4", "--seed", "7",
           "--synthetic_num_graphs", "64", "--start-eval", "0"] + extra
    return subprocess.Popen(cmd, env=env, cwd=tmp, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def _epoch_losses(root):
    """Collect per-epoch train losses from the run's metrics.jsonl."""
    out = {}
    for dirpath, _, files in os.walk(root):
        if "metrics.jsonl" in files:
            with open(os.path.join(dirpath, "metrics.jsonl")) as f:
                for line in f:
                    rec = json.loads(line)
                    if "train/loss-runs0" in rec:
                        out[rec["epoch"]] = rec["train/loss-runs0"]
    return out


def test_two_process_cli_matches_single_process_dp(tmp_path):
    """2 processes x 2 devices == 1 process x 4 shards, loss-for-loss."""
    sp_dir = tmp_path / "single"
    mh_dir = tmp_path / "multi"
    sp_dir.mkdir(), mh_dir.mkdir()

    port = _free_port()
    mh = [_cli(str(mh_dir),
               ["--multihost", "--dp_shards", "4",
                "--coordinator_address", f"localhost:{port}",
                "--num_processes", "2", "--process_id", str(pid)],
               local_devices=2)
          for pid in range(2)]
    sp = _cli(str(sp_dir), ["--dp_shards", "4"], local_devices=4)

    sp_out = sp.communicate(timeout=420)[0]
    mh_outs = [p.communicate(timeout=420)[0] for p in mh]
    assert sp.returncode == 0, sp_out[-3000:]
    for pid, (p, out) in enumerate(zip(mh, mh_outs)):
        assert p.returncode == 0, f"process {pid}:\n{out[-3000:]}"

    sp_losses = _epoch_losses(str(sp_dir))
    mh_losses = _epoch_losses(str(mh_dir))  # written by process 0 only
    assert set(sp_losses) == set(mh_losses) == {1, 2}
    for ep in sp_losses:
        np.testing.assert_allclose(mh_losses[ep], sp_losses[ep],
                                   rtol=2e-5, atol=1e-6)
    # primary-only side effects: exactly one process wrote checkpoints
    ckpts = [f for _, _, fs in os.walk(str(mh_dir)) for f in fs
             if f.endswith("model.ckpt")]
    assert ckpts, "primary process wrote no checkpoints"


def test_local_plan_slicing_covers_every_plan_once():
    """Union of per-process local plans == the global plan, exactly once,
    with equal per-process group counts (collective lockstep)."""
    from graphtrans_tpu.data.loader import GraphLoader
    from graphtrans_tpu.data.synthetic import make_tu_dataset

    graphs = make_tu_dataset(num_graphs=37, seed=0)
    ids_by_proc, n_batches = [], []
    for pid in range(2):
        loader = GraphLoader(graphs, 3, num_shards=4, process_count=2,
                             process_index=pid, shuffle=True, seed=11)
        got, count = [], 0
        for stacked in loader:
            count += 1
            assert stacked.graph_ids.shape[0] == 2  # L = 4/2 local shards
            ids = np.asarray(stacked.graph_ids)[np.asarray(stacked.graph_mask)]
            got.extend(ids.tolist())
        ids_by_proc.append(got)
        n_batches.append(count)
    assert n_batches[0] == n_batches[1]
    union = sorted(ids_by_proc[0] + ids_by_proc[1])
    assert len(union) == len(set(union)), "a graph was collated twice"

    # contract: exactly the graphs of every non-degenerate global plan group
    # (the multi-host loader DROPS globally-degenerate tail groups that the
    # single-process loader pads — collective lockstep safety)
    ref = GraphLoader(graphs, 3, num_shards=4, shuffle=True, seed=11)
    order = np.arange(len(graphs))
    np.random.default_rng(11).shuffle(order)  # epoch-0 shuffle of __iter__
    plans = ref._plan_chunks(order)
    expected = []
    for i in range(0, len(plans), 4):
        group = plans[i:i + 4]
        if sum(len(p) for p in group) > 1:
            expected.extend(int(g) for p in group for g in p)
    assert union == sorted(expected)


def test_local_plans_drop_globally_degenerate_groups():
    from graphtrans_tpu.data.loader import GraphLoader
    from graphtrans_tpu.data.synthetic import make_tu_dataset

    graphs = make_tu_dataset(num_graphs=9, seed=1)
    loaders = [GraphLoader(graphs, 1, num_shards=4, process_count=2,
                           process_index=pid, shuffle=False)
               for pid in range(2)]
    plans = [ld._plan_chunks(np.arange(len(graphs))) for ld in loaders]
    local = [ld._local_plans(p) for ld, p in zip(loaders, plans)]
    # 9 plans over groups of 4 -> tail group of 1 graph is globally
    # degenerate and must be dropped ON BOTH processes
    assert len(local[0]) == len(local[1]) == 4  # 2 groups x L=2
    kept = sorted(int(p[0]) for pl in local for p in pl if p is not None and len(p))
    assert len(kept) == 8  # the 9th graph's group was dropped everywhere
