"""Pretraining subsystem smoke: DeiT-MoE recipe end-to-end on synthetic data,
the dense baseline, mixup/cutmix semantics, and the export-to-MTL bridge
(reference: pretrain/train.py + engine/ + export_to_mtl.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import serialization

from m3vit_tpu.pretrain.mixup import (
    mixup_cutmix,
    one_hot_smooth,
    soft_target_cross_entropy,
)


def _pretrain_args(tmp, extra=()):
    return [
        "--synthetic", "2", "--batch_size", "2", "--img_size", "32",
        "--num_classes", "7", "--embed_dim", "32", "--depth", "2",
        "--num_heads", "2", "--moe_experts", "4", "--moe_top_k", "2",
        "--epochs", "1", "--warmup_epochs", "0", "--log_interval", "1",
        "--output_dir", tmp, *extra,
    ]


def test_pretrain_moe_synthetic_and_export(tmp_path):
    from m3vit_tpu.pretrain.export_to_mtl import export
    from m3vit_tpu.pretrain.train import main

    out = str(tmp_path / "run")
    state = main(_pretrain_args(out))
    assert np.isfinite(
        float(jax.tree.leaves(state.params)[0].sum())
    )
    # checkpoints written (raw + EMA)
    assert os.path.isdir(os.path.join(out, "checkpoint"))
    assert os.path.isdir(os.path.join(out, "ema"))

    # export the EMA encoder with gate replication for a 3-task MTL model
    dst = str(tmp_path / "backbone.msgpack")
    export(os.path.join(out, "ema"), dst, num_tasks=3)
    raw = open(dst, "rb").read()
    tree = serialization.msgpack_restore(raw)

    def find_gates(t):
        for k, v in t.items():
            if k == "w_gate":
                yield v
            elif isinstance(v, dict):
                yield from find_gates(v)

    gates = list(find_gates(tree))
    assert gates, "exported tree has no gates"
    for g in gates:
        assert g.shape[0] == 3  # replicated per task
        np.testing.assert_array_equal(g[0], g[1])


def test_pretrain_dense_baseline(tmp_path):
    from m3vit_tpu.pretrain.train import main

    out = str(tmp_path / "dense")
    state = main(_pretrain_args(out, ("--dense",)))
    # dense baseline must have no expert banks
    names = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat = ["/".join(str(p) for p in path) for path, _ in names]
    assert not any("experts_w1" in f for f in flat)


def test_pretrain_resume(tmp_path):
    from m3vit_tpu.pretrain.train import main

    out = str(tmp_path / "resume")
    main(_pretrain_args(out))
    state2 = main(_pretrain_args(out, ("--resume", "--epochs", "2")))
    assert int(state2.step) == 4  # 2 epochs x 2 steps


def test_mixup_cutmix_targets_are_convex():
    rng = jax.random.key(0)
    imgs = jax.random.uniform(jax.random.key(1), (4, 16, 16, 3))
    labels = jnp.asarray([0, 1, 2, 3])
    mixed, targets = mixup_cutmix(rng, imgs, labels, num_classes=5,
                                  mixup_alpha=0.8, cutmix_alpha=1.0,
                                  smoothing=0.1)
    assert mixed.shape == imgs.shape and targets.shape == (4, 5)
    np.testing.assert_allclose(np.asarray(targets.sum(-1)), 1.0, atol=1e-5)
    assert float(targets.min()) >= 0.0
    # pixel values stay in the convex hull of the two source images
    assert float(mixed.min()) >= 0.0 and float(mixed.max()) <= 1.0


def test_soft_target_ce_matches_hard_ce_without_smoothing():
    logits = jax.random.normal(jax.random.key(2), (6, 9))
    labels = jnp.asarray([0, 3, 8, 1, 2, 2])
    soft = soft_target_cross_entropy(logits, one_hot_smooth(labels, 9, 0.0))
    logp = jax.nn.log_softmax(logits)
    hard = -logp[jnp.arange(6), labels].mean()
    np.testing.assert_allclose(float(soft), float(hard), rtol=1e-6)
