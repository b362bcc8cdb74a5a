"""End-to-end driver tests: invoke main.main() programmatically (synthetic
datasets, CPU). Covers the full CLI surface: config loading, registry
staging, train/eval/checkpoint/resume, seq-head dataset, pretrained-GNN."""

import json
import os
import sys

import numpy as np
import pytest


def run_main(tmp_path, argv):
    import main as driver

    old = sys.argv
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        sys.argv = ["main.py"] + argv
        return driver.main()
    finally:
        sys.argv = old
        os.chdir(cwd)


SMALL = ["--gnn_num_layer", "2", "--gnn_emb_dim", "16", "--d_model", "16",
         "--num_encoder_layers", "1", "--dim_feedforward", "32",
         "--epochs", "2", "--runs", "1", "--batch_size", "16",
         "--synthetic_num_graphs", "50", "--start-eval", "0"]


def test_driver_nci1_e2e(tmp_path):
    val, test = run_main(tmp_path, [
        "--dataset", "NCI1", "--model_type", "gnn-transformer",
        "--graph_pooling", "cls", "--scheduler", "cosine"] + SMALL)
    assert 0.0 <= val <= 1.0
    exps = list((tmp_path / "exps").iterdir())
    assert exps, "no experiment dir written"
    run_dir = exps[0] / "0"
    assert (run_dir / "last_model.ckpt").exists()
    assert (run_dir / "best_model.ckpt").exists()
    metrics = (exps[0] / "metrics.jsonl").read_text().strip().splitlines()
    recs = [json.loads(l) for l in metrics]
    assert any("train/loss-runs0" in r for r in recs)


def test_driver_code2_seq_head(tmp_path):
    val, test = run_main(tmp_path, [
        "--dataset", "ogbg-code2", "--model_type", "gnn-transformer",
        "--graph_pooling", "cls", "--gnn_virtual_node", "--gnn_JK", "cat",
        "--num_vocab", "40"] + SMALL)
    assert 0.0 <= val <= 1.0


def test_driver_molpcba_plateau(tmp_path):
    val, test = run_main(tmp_path, [
        "--dataset", "ogbg-molpcba", "--model_type", "gnn-transformer",
        "--gnn_type", "gin", "--graph_pooling", "cls",
        "--scheduler", "plateau"] + SMALL)
    assert 0.0 <= val <= 1.0


def test_driver_pna(tmp_path):
    # pna registers no transformer flag group — plain GNN-side flags only
    args = ["--gnn_num_layer", "2", "--gnn_emb_dim", "16",
            "--epochs", "2", "--runs", "1", "--batch_size", "16",
            "--synthetic_num_graphs", "50", "--start-eval", "0"]
    val, test = run_main(tmp_path, [
        "--dataset", "ogbg-molpcba", "--model_type", "pna",
        "--graph_pooling", "mean"] + args)
    assert 0.0 <= val <= 1.0


def test_driver_pretrained_gnn(tmp_path):
    # 1) train a plain GNN (no transformer flag group) and keep its checkpoint
    gnn_small = ["--gnn_num_layer", "2", "--gnn_emb_dim", "16",
                 "--epochs", "2", "--runs", "1", "--batch_size", "16",
                 "--synthetic_num_graphs", "50", "--start-eval", "0"]
    run_main(tmp_path, ["--dataset", "NCI1", "--model_type", "gnn",
                        "--graph_pooling", "mean", "--seed", "7"] + gnn_small)
    exps = sorted((tmp_path / "exps").iterdir())
    ckpt = str(exps[0] / "0" / "best_model.ckpt")
    # 2) warm-start the flagship from it
    val, test = run_main(tmp_path, [
        "--dataset", "NCI1", "--model_type", "gnn-transformer",
        "--graph_pooling", "cls", "--pretrained_gnn", ckpt,
        "--freeze_gnn", "1", "--seed", "7"] + SMALL)
    assert 0.0 <= val <= 1.0


def test_driver_multiseed_resplit(tmp_path):
    """--runs 2 on a TU dataset: per-run re-split and mean/std aggregation."""
    val, test = run_main(tmp_path, [
        "--dataset", "NCI1", "--model_type", "gnn-transformer",
        "--graph_pooling", "cls", "--gnn_num_layer", "2",
        "--gnn_emb_dim", "16", "--d_model", "16", "--num_encoder_layers", "1",
        "--dim_feedforward", "32", "--epochs", "1", "--runs", "2",
        "--batch_size", "16", "--synthetic_num_graphs", "40",
        "--start-eval", "0", "--seed", "3"])
    assert 0.0 <= val <= 1.0


def test_driver_bf16(tmp_path):
    val, test = run_main(tmp_path, [
        "--dataset", "NCI1", "--model_type", "gnn-transformer",
        "--graph_pooling", "cls", "--precision", "bf16"] + SMALL)
    assert 0.0 <= val <= 1.0


def test_driver_molhiv_rocauc(tmp_path):
    val, test = run_main(tmp_path, [
        "--dataset", "ogbg-molhiv", "--model_type", "gnn-transformer",
        "--gnn_type", "gin", "--graph_pooling", "cls"] + SMALL)
    assert 0.0 <= val <= 1.0


def test_driver_transformer_gnn(tmp_path):
    val, test = run_main(tmp_path, [
        "--dataset", "NCI1", "--model_type", "transformer-gnn",
        "--graph_pooling", "mean", "--graph_input_dim", "16"] + SMALL)
    assert 0.0 <= val <= 1.0


def test_driver_hybrid_shards(tmp_path):
    """Node-sharded (halo-exchange) training via the CLI on the virtual mesh."""
    val, test = run_main(tmp_path, [
        "--dataset", "ogbg-molpcba", "--model_type", "gnn-transformer",
        "--gnn_type", "gin", "--gnn_virtual_node", "--graph_pooling", "cls",
        "--hybrid_shards", "4"] + SMALL)
    assert 0.0 <= val <= 1.0


def test_driver_hybrid_gcn(tmp_path):
    """GCN hybrid (host-precomputed degree normalization) trains via CLI."""
    val, test = run_main(tmp_path, [
        "--dataset", "NCI1", "--model_type", "gnn-transformer",
        "--gnn_type", "gcn", "--graph_pooling", "cls",
        "--hybrid_shards", "2"] + SMALL)
    assert 0.0 <= val <= 1.0


def test_driver_hybrid_rejects_unsupported_model(tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        run_main(tmp_path, [
            "--dataset", "NCI1", "--model_type", "transformer",
            "--hybrid_shards", "2"] + SMALL)


def test_driver_onecycle_and_eval_batch_size(tmp_path):
    val, test = run_main(tmp_path, [
        "--dataset", "NCI1", "--model_type", "gnn-transformer",
        "--graph_pooling", "cls", "--scheduler", "onecycle",
        "--max_lr", "0.003", "--eval_batch_size", "8"] + SMALL)
    assert 0.0 <= val <= 1.0


def test_driver_mol_feature_simple(tmp_path):
    val, test = run_main(tmp_path, [
        "--dataset", "ogbg-molpcba", "--model_type", "gnn-transformer",
        "--gnn_type", "gin", "--graph_pooling", "cls",
        "--feature", "simple"] + SMALL)
    assert 0.0 <= val <= 1.0


def test_driver_flag_with_dp(tmp_path):
    """FLAG adversarial trainer composed with shard_map data parallelism
    (the DP wrapper consumes any trainer's grad_fn)."""
    val, test = run_main(tmp_path, [
        "--dataset", "ogbg-molpcba", "--model_type", "gnn-transformer",
        "--gnn_type", "gin", "--graph_pooling", "cls",
        "--aug", "flag", "--dp_shards", "2"] + SMALL)
    assert 0.0 <= val <= 1.0


def test_driver_gspmd_tp_sp(tmp_path):
    """--tp_shards/--sp from the CLI: GSPMD dp×tp mesh with sequence-parallel
    transformer activations trains and evals end-to-end."""
    val, test = run_main(tmp_path, [
        "--dataset", "NCI1", "--model_type", "gnn-transformer",
        "--graph_pooling", "cls", "--scheduler", "cosine",
        "--dp_shards", "2", "--tp_shards", "2", "--sp"] + SMALL)
    assert 0.0 <= val <= 1.0


def test_driver_sp_requires_tp(tmp_path):
    with pytest.raises(SystemExit):
        run_main(tmp_path, [
            "--dataset", "NCI1", "--model_type", "gnn-transformer",
            "--sp"] + SMALL)


def test_driver_dp_with_dense_layout(tmp_path):
    """shard_map DP over stacked strided batches (dense fields stack on the
    shard axis; count-weighted reduction handles the tail)."""
    val, test = run_main(tmp_path, [
        "--dataset", "NCI1", "--model_type", "gnn-transformer",
        "--gnn_type", "gin", "--graph_pooling", "cls",
        "--dense_layout", "on", "--dp_shards", "2"] + SMALL)
    assert 0.0 <= val <= 1.0


def test_driver_flag_with_dense_layout(tmp_path):
    """FLAG adversarial training composes with the strided layout (perturb
    rides the strided node rows)."""
    val, test = run_main(tmp_path, [
        "--dataset", "NCI1", "--model_type", "gnn-transformer",
        "--gnn_type", "gin", "--graph_pooling", "cls", "--aug", "flag",
        "-m", "2", "--dense_layout", "on"] + SMALL)
    assert 0.0 <= val <= 1.0


def test_predict_writes_jsonl(tmp_path):
    """predict.py (the serving entry point the reference never had): train
    a tiny run, then batch-infer the test split from the best checkpoint
    and check the JSONL records."""
    import glob

    import predict as infer

    common = ["--dataset", "ogbg-molpcba", "--model_type", "gnn-transformer",
              "--gnn_type", "gin", "--graph_pooling", "cls"] + SMALL
    run_main(tmp_path, common)
    ckpts = glob.glob(str(tmp_path / "exps" / "*" / "0" / "best_model.ckpt"))
    assert ckpts, "training left no best checkpoint"

    out = tmp_path / "preds.jsonl"
    old = sys.argv
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        sys.argv = (["predict.py"] + common
                    + ["--checkpoint", ckpts[0], "--split", "test",
                       "--out", str(out)])
        infer.main()
    finally:
        sys.argv = old
        os.chdir(cwd)
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    assert recs and all("logits" in r and r["graph_id"] >= 0 for r in recs)
    # one logit vector per task (8 tasks in the synthetic molpcba fallback)
    assert len(recs[0]["logits"]) == 8
