"""Loss function tests vs independent torch oracles (NHWC on our side)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from m3vit_tpu.losses.functions import (
    balanced_bce_loss,
    bce_loss,
    depth_l1_loss,
    normals_l1_loss,
    softmax_ce_loss,
)
from m3vit_tpu.losses.schemes import multi_task_loss


def test_softmax_ce_ignore255():
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 8, 8, 5
    logits = rng.randn(B, H, W, C).astype(np.float32)
    label = rng.randint(0, C, (B, H, W, 1)).astype(np.float32)
    label[0, :4] = 255.0  # ignored region

    got = float(softmax_ce_loss(jnp.asarray(logits), jnp.asarray(label)))

    tlogits = torch.from_numpy(logits).permute(0, 3, 1, 2)
    tlabel = torch.from_numpy(label[..., 0]).long()
    expected = float(tF.nll_loss(tF.log_softmax(tlogits, 1), tlabel, ignore_index=255))
    assert got == pytest.approx(expected, rel=1e-5)


def _torch_balanced_bce(output, label, pos_weight=None):
    out = torch.from_numpy(output)
    lab = (torch.from_numpy(label) >= 0.5).float()
    if pos_weight is None:
        num_pos = lab.sum()
        num_total = float(lab.numel())
        w = (num_total - num_pos) / num_total
    else:
        w = torch.tensor(pos_weight)
    # elementwise -BCEWithLogits, the numerically-stable published HED form
    loss_val = -tF.binary_cross_entropy_with_logits(out, lab, reduction="none")
    loss_pos = -(lab * loss_val).sum()
    loss_neg = -((1 - lab) * loss_val).sum()
    return float((w * loss_pos + (1 - w) * loss_neg) / float(lab.numel()))


def test_balanced_bce_dynamic_weight():
    rng = np.random.RandomState(1)
    output = rng.randn(2, 16, 16, 1).astype(np.float32) * 3
    label = (rng.rand(2, 16, 16, 1) > 0.8).astype(np.float32)
    got = float(balanced_bce_loss(jnp.asarray(output), jnp.asarray(label)))
    assert got == pytest.approx(_torch_balanced_bce(output, label), rel=1e-4)


def test_balanced_bce_fixed_pos_weight():
    rng = np.random.RandomState(2)
    output = rng.randn(2, 16, 16, 1).astype(np.float32) * 3
    label = (rng.rand(2, 16, 16, 1) > 0.95).astype(np.float32)
    got = float(
        balanced_bce_loss(jnp.asarray(output), jnp.asarray(label), pos_weight=0.95)
    )
    assert got == pytest.approx(_torch_balanced_bce(output, label, 0.95), rel=1e-4)


def test_bce_loss():
    rng = np.random.RandomState(3)
    output = rng.randn(2, 8, 8, 1).astype(np.float32)
    label = (rng.rand(2, 8, 8, 1) > 0.5).astype(np.float32)
    got = float(bce_loss(jnp.asarray(output), jnp.asarray(label)))
    out = torch.from_numpy(output)
    lab = torch.from_numpy(label)
    expected = float(tF.binary_cross_entropy_with_logits(out, lab, reduction="mean"))
    assert got == pytest.approx(expected, rel=1e-5)


def test_depth_l1_masked():
    rng = np.random.RandomState(4)
    out = rng.rand(2, 8, 8, 1).astype(np.float32) * 10
    lab = rng.rand(2, 8, 8, 1).astype(np.float32) * 10
    lab[0, :3] = 255.0
    got = float(depth_l1_loss(jnp.asarray(out), jnp.asarray(lab)))
    mask = lab != 255.0
    expected = float(np.abs(out[mask] - lab[mask]).mean())
    assert got == pytest.approx(expected, rel=1e-5)


def test_normals_l1_normalized_masked():
    rng = np.random.RandomState(5)
    out = rng.randn(2, 8, 8, 3).astype(np.float32)
    lab = rng.randn(2, 8, 8, 3).astype(np.float32)
    lab[1, 4:] = 255.0
    got = float(normals_l1_loss(jnp.asarray(out), jnp.asarray(lab)))

    qn = np.linalg.norm(out, axis=-1, keepdims=True) + 1e-12
    out_n = out / qn
    mask = lab != 255.0
    n_valid = mask.sum()
    expected = float(np.abs(out_n[mask] - lab[mask]).sum() / max(n_valid, 1e-6))
    assert got == pytest.approx(expected, rel=1e-5)


def test_multi_task_loss_weighted_sum():
    rng = np.random.RandomState(6)
    B, H, W = 2, 8, 8
    pred = {
        "semseg": jnp.asarray(rng.randn(B, H, W, 5).astype(np.float32)),
        "edge": jnp.asarray(rng.randn(B, H, W, 1).astype(np.float32)),
    }
    gt = {
        "semseg": jnp.asarray(rng.randint(0, 5, (B, H, W, 1)).astype(np.float32)),
        "edge": jnp.asarray((rng.rand(B, H, W, 1) > 0.9).astype(np.float32)),
    }
    loss_fns = {
        "semseg": softmax_ce_loss,
        "edge": lambda o, l: balanced_bce_loss(o, l, pos_weight=0.95),
    }
    weights = {"semseg": 1.0, "edge": 50.0}
    out = multi_task_loss(pred, gt, ["semseg", "edge"], loss_fns, weights)
    expected = 1.0 * float(out["semseg"]) + 50.0 * float(out["edge"])
    assert float(out["total"]) == pytest.approx(expected, rel=1e-6)

    single = multi_task_loss(
        pred, gt, ["semseg", "edge"], loss_fns, weights, single_task="edge"
    )
    assert float(single["total"]) == pytest.approx(50.0 * float(single["edge"]), rel=1e-6)
    assert "semseg" not in single
