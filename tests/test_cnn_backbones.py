"""CNN backbone + head shape/sanity tests (main.py dense path equivalents)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3vit_tpu.models.cnn_heads import DeepLabHead, HighResolutionHead
from m3vit_tpu.models.hrnet import hrnet_w18
from m3vit_tpu.models.mobilenetv3 import MobileNetV3
from m3vit_tpu.models.resnet import resnet18, resnet50


def _init_apply(model, x, train=False):
    variables = model.init(jax.random.key(0), x, train=train)
    if train:
        out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
        return out
    return model.apply(variables, x)


def test_resnet18_stride_32():
    x = jnp.ones((1, 64, 64, 3))
    out = _init_apply(resnet18(), x)
    assert out.shape == (1, 2, 2, 512)


def test_resnet50_dilated_stride_8():
    x = jnp.ones((1, 64, 64, 3))
    out = _init_apply(resnet50(dilated=True), x)
    assert out.shape == (1, 8, 8, 2048)


def test_hrnet_w18_streams():
    x = jnp.ones((1, 64, 64, 3))
    outs = _init_apply(hrnet_w18(), x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 18), (1, 8, 8, 36), (1, 4, 4, 72), (1, 2, 2, 144)
    ]


def test_mobilenetv3_shapes():
    x = jnp.ones((1, 64, 64, 3))
    out = _init_apply(MobileNetV3(variant="large"), x)
    assert out.shape == (1, 2, 2, 960)
    out = _init_apply(MobileNetV3(variant="small"), x)
    assert out.shape == (1, 2, 2, 576)


def test_deeplab_head():
    x = jnp.ones((1, 8, 8, 512))
    head = DeepLabHead(num_classes=21)
    variables = head.init(jax.random.key(0), x, train=False)
    out = head.apply(variables, x)
    assert out.shape == (1, 8, 8, 21)


def test_hrnet_head_fuses_streams():
    xs = [jnp.ones((1, 16, 16, 18)), jnp.ones((1, 8, 8, 36)),
          jnp.ones((1, 4, 4, 72)), jnp.ones((1, 2, 2, 144))]
    head = HighResolutionHead(num_classes=7)
    variables = head.init(jax.random.key(0), xs, train=False)
    out = head.apply(variables, xs)
    assert out.shape == (1, 16, 16, 7)


def test_single_task_hrnet_semseg_model():
    """The 'HRNet-18 single-task semseg' CPU-runnable config (BASELINE.json)."""
    from m3vit_tpu.models.multitask import SingleTaskModel

    model = SingleTaskModel(
        backbone=hrnet_w18(), decoder=HighResolutionHead(num_classes=21),
        task="semseg",
    )
    x = jnp.ones((2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    (pred, cv, _), mut = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert pred["semseg"].shape == (2, 64, 64, 21)
    assert float(cv) == 0.0
