"""CLI end-to-end on the real (fabricated) dataset path: reader ->
transforms -> loader -> train -> eval -> checkpoint."""

import json
import os

import numpy as np
import pytest
import yaml

from tests.test_data_pipeline import pascal_root  # fixture reuse


def test_cli_trains_on_real_dataset_path(pascal_root, tmp_path):
    from m3vit_tpu.cli.train import main

    env = {
        "root_dir": str(tmp_path / "runs"),
        "dataset_roots": {"PASCAL_MT": pascal_root},
    }
    env_file = tmp_path / "env.yml"
    env_file.write_text(yaml.safe_dump(env))

    exp = {
        "setup": "multi_task",
        "train_db_name": "PASCALContext",
        "val_db_name": "PASCALContext",
        "train_scale": [64, 64],
        "test_scale": [64, 64],
        "trBatch": 2,
        "valBatch": 2,
        "epochs": 1,
        "optimizer": "sgd",
        "optimizer_kwargs": {"lr": 0.01, "momentum": 0.9},
        "scheduler": "poly",
        "model": "baseline",
        "backbone": "VisionTransformer_moe",
        "backbone_kwargs": {
            "model_name": "tiny", "img_size": [64, 64], "patch_size": 16,
            "embed_dim": 64, "depth": 2, "num_heads": 4, "moe_mlp_ratio": 1,
        },
        "head": "VisionTransformerUpHead",
        "head_kwargs": {"embed_dim": 64, "img_size": [64, 64],
                        "patch_size": 16},
        "moe_experts": 8,
        "moe_top_k": 2,
        "multi_gate": True,
        "compute_dtype": "float32",
        "moe_capacity_factor": 4.0,
        "task_dictionary": {
            "include_semseg": True, "include_edge": True, "edge_w": 0.95,
        },
        "loss_kwargs": {"loss_weights": {"semseg": 1.0, "edge": 50.0}},
        "eval_interval": 1,
    }
    exp_file = tmp_path / "exp.yml"
    exp_file.write_text(yaml.safe_dump(exp))

    main([
        "--config_env", str(env_file), "--config_exp", str(exp_file),
        "--multi_gate", "--use_cv_loss", "--log_interval", "1",
        "--n_data", "1", "--n_expert", "1",
    ])

    out_dir = tmp_path / "runs" / "PASCALContext" / "tiny"
    assert (out_dir / "checkpoint").is_dir()
    assert (out_dir / "metrics.jsonl").is_file()
    recs = [json.loads(l) for l in open(out_dir / "metrics.jsonl")]
    # training losses and val metrics were logged
    assert any("train/total_loss" in r for r in recs)
    val = [r for r in recs if "val/semseg/mIoU" in r]
    assert val and np.isfinite(val[-1]["val/semseg/mIoU"])
    assert any("val/multi_task_performance" in r for r in val)
    # reference logger namespace parity (VERDICT r3 #6,
    # wandb_logger.py:134-399): per-task train losses, cv loss, lr, epoch,
    # canonical val names, MoE analysis aggregates, memory stats
    keys = set().union(*[set(r) for r in recs])
    for expect in ("train/loss_semseg", "train/loss_edge", "train/cv_loss",
                   "train/lr", "epoch", "val/semseg_mIoU", "val/edge_loss",
                   "analysis/gate_entropy_mean", "analysis/top1_prob_mean",
                   "analysis/dead_expert_ratio", "analysis/expert_load_cv",
                   "analysis/expert_load_hist/e0",
                   "moe/dropped_slot_fraction", "memory/host_rss_kb"):
        assert expect in keys, f"missing logging namespace key {expect}"


def test_cli_trains_with_seq_axis(pascal_root, tmp_path):
    """--n_seq: dp/sp/ep mesh end-to-end through the CLI (Ulysses attention
    + MoE tokens sharded over all three axes)."""
    from m3vit_tpu.cli.train import main

    env = {
        "root_dir": str(tmp_path / "runs"),
        "dataset_roots": {"PASCAL_MT": pascal_root},
    }
    env_file = tmp_path / "env.yml"
    env_file.write_text(yaml.safe_dump(env))
    exp = {
        "setup": "multi_task",
        "train_db_name": "PASCALContext",
        "val_db_name": "PASCALContext",
        "train_scale": [64, 64],
        "test_scale": [64, 64],
        "trBatch": 2,
        "valBatch": 2,
        "epochs": 1,
        "optimizer": "sgd",
        "optimizer_kwargs": {"lr": 0.01, "momentum": 0.9},
        "scheduler": "poly",
        "model": "baseline",
        "backbone": "VisionTransformer_moe",
        "backbone_kwargs": {
            "model_name": "tiny", "img_size": [64, 64], "patch_size": 16,
            "embed_dim": 64, "depth": 2, "num_heads": 4, "moe_mlp_ratio": 1,
        },
        "head": "VisionTransformerUpHead",
        "head_kwargs": {"embed_dim": 64, "img_size": [64, 64],
                        "patch_size": 16},
        "moe_experts": 8,
        "moe_top_k": 2,
        "multi_gate": True,
        "compute_dtype": "float32",
        "moe_capacity_factor": 4.0,
        "task_dictionary": {
            "include_semseg": True, "include_edge": True, "edge_w": 0.95,
        },
        "loss_kwargs": {"loss_weights": {"semseg": 1.0, "edge": 50.0}},
        "eval_interval": 1,
    }
    exp_file = tmp_path / "exp.yml"
    exp_file.write_text(yaml.safe_dump(exp))

    main([
        "--config_env", str(env_file), "--config_exp", str(exp_file),
        "--multi_gate", "--use_cv_loss", "--log_interval", "1",
        "--n_data", "1", "--n_seq", "2", "--n_expert", "1",
    ])

    out_dir = tmp_path / "runs" / "PASCALContext" / "tiny"
    recs = [json.loads(l) for l in open(out_dir / "metrics.jsonl")]
    losses = [r["train/total_loss"] for r in recs if "train/total_loss" in r]
    assert losses and all(np.isfinite(l) for l in losses)
    val = [r for r in recs if "val/semseg/mIoU" in r]
    assert val and np.isfinite(val[-1]["val/semseg/mIoU"])
