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


def test_papnet_vit_multi_level():
    """papnet_new variant (reference mtl_methods/papnet_new.py:168-297):
    multi_level adds per-level 1x1-conv deep-supervision outputs
    level{1,2,3}_<task> in train mode only, and multi_task_loss consumes
    them with the reference's weight/4 scaling (loss_schemes.py:32-35)."""
    import flax.linen as nn

    from m3vit_tpu.losses.functions import depth_l1_loss
    from m3vit_tpu.losses.schemes import multi_task_loss
    from m3vit_tpu.models.mtl_methods import PAPNetViT

    class TokenBackbone(nn.Module):
        dim: int = 32

        @nn.compact
        def __call__(self, x, train=False):
            B = x.shape[0]
            f = jax.image.resize(x, (B, 4, 4, 3), "bilinear")
            f = nn.Dense(self.dim)(f)
            return f.reshape(B, 16, self.dim)

    def build(multi_level):
        return PAPNetViT(
            backbone=TokenBackbone(), tasks=TASKS, auxilary_tasks=TASKS,
            num_outputs=NUM_OUT, embed_dim=32, img_size=(IMG, IMG),
            patch_size=16, multi_level=multi_level,
        )

    x = jnp.ones((2, IMG, IMG, 3))
    plain = build(False)
    ml = build(True)

    v = ml.init(jax.random.key(0), x, train=True)
    assert f"output_layers1_semseg" in v["params"]
    (out, _, _), _ = ml.apply(v, x, train=True, mutable=["batch_stats"])
    for lvl in (1, 2, 3):
        for t in TASKS:
            assert out[f"level{lvl}_{t}"].shape == (2, IMG, IMG, NUM_OUT[t])
    # eval mode: no deep-supervision outputs
    out_eval, _, _ = ml.apply(v, x, train=False)
    assert not any(k.startswith("level") for k in out_eval)

    # multi_level=False: no level params, no level outputs (unchanged tree)
    vp = plain.init(jax.random.key(0), x, train=True)
    assert not any(k.startswith("output_layers") for k in vp["params"])

    # loss: every term (levels AND final) weighted by w/4
    gt = {"semseg": jnp.zeros((2, IMG, IMG, 1)),
          "depth": jnp.ones((2, IMG, IMG, 1))}
    fns = {"semseg": softmax_ce_loss, "depth": depth_l1_loss}
    w = {"semseg": 1.0, "depth": 2.0}
    losses = multi_task_loss(out, gt, TASKS, fns, w)
    expect = sum(
        0.25 * w[t] * float(losses[k])
        for t in TASKS
        for k in (f"level1_{t}", f"level2_{t}", f"level3_{t}", t)
    )
    np.testing.assert_allclose(float(losses["total"]), expect, rtol=1e-6)
    # without level keys the totals are unscaled
    out_no_lvl = {t: out[t] for t in TASKS}
    l2 = multi_task_loss(out_no_lvl, gt, TASKS, fns, w)
    expect2 = sum(w[t] * float(l2[t]) for t in TASKS)
    np.testing.assert_allclose(float(l2["total"]), expect2, rtol=1e-6)
