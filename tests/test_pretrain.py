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


# ---------------------------------------------------------------------------
# data parity: RASampler repeated aug, class inference, split, index cache
# (round-1 VERDICT item 6; reference pretrain/datasets/)
# ---------------------------------------------------------------------------


def _fabricated_imagefolder(root, n_classes=3, per_class=5, numeric=False,
                            size=40):
    from PIL import Image

    rng = np.random.RandomState(0)
    for c in range(n_classes):
        name = f"{c}_class{c}" if numeric else f"class_{chr(ord('z')-c)}"
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            arr = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"im{i}.png"))
    return root


def test_repeated_aug_order_semantics():
    """Mirror of RASampler (reference samplers.py:49-67, world_size 1):
    epoch-shuffled, each index repeated num_repeats times CONSECUTIVELY,
    truncated to floor(n/round_to)*round_to."""
    from m3vit_tpu.pretrain.data import repeated_aug_order

    order = repeated_aug_order(512, epoch=0, num_repeats=3, round_to=256)
    assert len(order) == 512  # floor(512/256)*256
    # consecutive triplets are the same image
    first = order.reshape(-1, 1)
    assert (order[0] == order[1] == order[2]) and (order[3] == order[4])
    # roughly 512/3 distinct images selected
    assert 160 <= len(np.unique(order)) <= 172
    # epoch reseeds the permutation
    assert not np.array_equal(order,
                              repeated_aug_order(512, 1, 3, round_to=256))
    # deterministic per epoch
    np.testing.assert_array_equal(
        order, repeated_aug_order(512, 0, 3, round_to=256))
    del first


def test_infer_class_mapping():
    from m3vit_tpu.pretrain.data import infer_class_mapping

    # HF-materialized numeric-prefix layout: prefix IS the label
    assert infer_class_mapping(["1_dog", "0_tench", "2_cat"]) == {
        "1_dog": 1, "0_tench": 0, "2_cat": 2}
    # plain names: alphabetical (torchvision rule)
    assert infer_class_mapping(["dog", "cat"]) == {"cat": 0, "dog": 1}
    # ambiguous (duplicate prefixes) falls back to alphabetical
    m = infer_class_mapping(["0_a", "0_b"])
    assert m == {"0_a": 0, "0_b": 1}


def test_imagefolder_numeric_labels_and_index_cache(tmp_path):
    from m3vit_tpu.pretrain.data import INDEX_CACHE, ImageFolder

    root = _fabricated_imagefolder(str(tmp_path), numeric=True)
    ds = ImageFolder(root, img_size=32)
    assert ds.class_to_idx == {"0_class0": 0, "1_class1": 1, "2_class2": 2}
    assert len(ds) == 15
    assert os.path.isfile(os.path.join(root, INDEX_CACHE))
    # second construction loads the cache and agrees exactly
    ds2 = ImageFolder(root, img_size=32)
    assert ds2.samples == ds.samples
    # adding a class dir invalidates the cache
    _fabricated_imagefolder(root, n_classes=4, numeric=True)
    ds3 = ImageFolder(root, img_size=32)
    assert len(ds3) == 20 and "3_class3" in ds3.class_to_idx


def test_iterate_epoch_worker_count_invariance(tmp_path):
    """Fork-pool and serial epoch iteration yield bitwise-identical batches
    (per-sample rng derived from seed/epoch/index on every path)."""
    import numpy as np

    from m3vit_tpu.pretrain.data import ImageFolder, iterate_epoch

    root = _fabricated_imagefolder(str(tmp_path), n_classes=2, per_class=6)
    ds = ImageFolder(root, img_size=32)
    serial = list(iterate_epoch(ds, 4, epoch=2, seed=5, num_workers=0))
    pooled = list(iterate_epoch(ds, 4, epoch=2, seed=5, num_workers=2))
    assert len(serial) == len(pooled) == 3
    for (ia, la), (ib, lb) in zip(serial, pooled):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)


def test_split_train_val_deterministic_and_disjoint(tmp_path):
    from m3vit_tpu.pretrain.data import ImageFolder, split_train_val

    root = _fabricated_imagefolder(str(tmp_path), n_classes=3, per_class=10)
    ds = ImageFolder(root, img_size=32)
    tr, va = split_train_val(ds, val_fraction=0.2, seed=0)
    tr2, va2 = split_train_val(ds, val_fraction=0.2, seed=0)
    assert (tr, va) == (tr2, va2)
    assert set(tr).isdisjoint(va)
    assert sorted(tr + va) == list(range(30))
    # per-class holdout: 2 of 10 per class
    labels = [ds.samples[i][1] for i in va]
    assert sorted(labels) == [0, 0, 1, 1, 2, 2]
    assert split_train_val(ds, 0.2, seed=1)[1] != va  # seed changes the draw


def test_pretrain_imagefolder_e2e_with_ema_eval(tmp_path, capsys):
    """Full recipe on a fabricated ImageFolder: repeated aug + deterministic
    holdout + per-epoch raw/EMA val accuracy + best-EMA checkpoint."""
    from m3vit_tpu.pretrain.train import main

    data = _fabricated_imagefolder(str(tmp_path / "data"), n_classes=3,
                                   per_class=6, size=40)
    out = str(tmp_path / "out")
    main([
        "--data_dir", data, "--batch_size", "3", "--img_size", "32",
        "--num_classes", "3", "--embed_dim", "32", "--depth", "2",
        "--num_heads", "2", "--moe_experts", "4", "--moe_top_k", "2",
        "--epochs", "1", "--warmup_epochs", "0", "--log_interval", "1",
        "--val_fraction", "0.2", "--output_dir", out,
    ])
    text = capsys.readouterr().out
    assert "val acc raw=" in text and "ema=" in text
    assert os.path.isdir(os.path.join(out, "best_ema"))
