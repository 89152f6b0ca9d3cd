"""MTL-method model tests (cross-stitch, NDDR, MTAN, PAD-Net, MTI-Net)."""

import jax
import jax.numpy as jnp
import numpy as np

from m3vit_tpu.losses.functions import softmax_ce_loss
from m3vit_tpu.losses.schemes import mtinet_loss, padnet_loss
from m3vit_tpu.models.cnn_heads import DeepLabHead, HighResolutionHead
from m3vit_tpu.models.hrnet import hrnet_w18
from m3vit_tpu.models.mtl_methods import (
    MTAN,
    MTINet,
    NDDRCNN,
    CrossStitchNetwork,
    PADNet,
)
from m3vit_tpu.models.resnet import resnet18

TASKS = ["semseg", "depth"]
NUM_OUT = {"semseg": 5, "depth": 1}
IMG = 64


def heads_deeplab():
    return {t: DeepLabHead(num_classes=NUM_OUT[t]) for t in TASKS}


def _run(model, x):
    variables = model.init(jax.random.key(0), x, train=False)
    (out, cv, _), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(1)},
    )
    return out


def test_cross_stitch():
    model = CrossStitchNetwork(
        backbones={t: resnet18(dilated=True) for t in TASKS},
        heads=heads_deeplab(), tasks=TASKS,
        channels=[64, 128, 256, 512],
    )
    out = _run(model, jnp.ones((1, IMG, IMG, 3)))
    assert out["semseg"].shape == (1, IMG, IMG, 5)
    assert out["depth"].shape == (1, IMG, IMG, 1)


def test_nddr_cnn():
    model = NDDRCNN(
        backbones={t: resnet18(dilated=True) for t in TASKS},
        heads=heads_deeplab(), tasks=TASKS,
        channels=[64, 128, 256, 512],
    )
    out = _run(model, jnp.ones((1, IMG, IMG, 3)))
    assert out["semseg"].shape == (1, IMG, IMG, 5)


def test_mtan():
    model = MTAN(
        backbone=resnet18(dilated=True), heads=heads_deeplab(), tasks=TASKS,
        channels=[64, 128, 256, 512], downsample=(True, False, False, False),
    )
    out = _run(model, jnp.ones((1, IMG, IMG, 3)))
    assert out["semseg"].shape == (1, IMG, IMG, 5)


def test_padnet_and_loss():
    model = PADNet(
        backbone=resnet18(dilated=True), tasks=TASKS, auxilary_tasks=TASKS,
        num_outputs=NUM_OUT,
    )
    x = jnp.ones((1, IMG, IMG, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    (out, _, _), _ = model.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
    assert "initial_semseg" in out and out["semseg"].shape == (1, IMG, IMG, 5)

    gt = {
        "semseg": jnp.zeros((1, IMG, IMG, 1)),
        "depth": jnp.ones((1, IMG, IMG, 1)),
    }
    from m3vit_tpu.losses.functions import depth_l1_loss

    fns = {"semseg": softmax_ce_loss, "depth": depth_l1_loss}
    losses = padnet_loss(out, gt, TASKS, TASKS, fns, {"semseg": 1.0, "depth": 1.0})
    assert np.isfinite(float(losses["total"]))
    assert "deepsup_semseg" in losses


def test_mtinet_and_loss():
    heads = {t: HighResolutionHead(num_classes=NUM_OUT[t]) for t in TASKS}
    model = MTINet(
        backbone=hrnet_w18(), heads=heads, tasks=TASKS, auxilary_tasks=TASKS,
        num_outputs=NUM_OUT,
    )
    x = jnp.ones((1, IMG, IMG, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    (out, _, _), _ = model.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
    assert out["semseg"].shape == (1, IMG, IMG, 5)
    assert set(out["deep_supervision"].keys()) == {
        "scale_0", "scale_1", "scale_2", "scale_3"
    }

    gt = {
        "semseg": jnp.zeros((1, IMG, IMG, 1)),
        "depth": jnp.ones((1, IMG, IMG, 1)),
    }
    from m3vit_tpu.losses.functions import depth_l1_loss

    fns = {"semseg": softmax_ce_loss, "depth": depth_l1_loss}
    losses = mtinet_loss(out, gt, TASKS, TASKS, fns, {"semseg": 1.0, "depth": 1.0})
    assert np.isfinite(float(losses["total"]))
    assert "scale_3_depth" in losses
