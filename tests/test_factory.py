"""Factory coverage: every reference model family builds and runs forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3vit_tpu.config import AttrDict
from m3vit_tpu.models.factory import build_model
from m3vit_tpu.tasks import parse_task_dictionary

IMG = 64


def make_p(model="baseline", backbone="VisionTransformer_moe",
           head="VisionTransformerUpHead", **extra):
    tasks, e = parse_task_dictionary(
        "NYUD", {"include_semseg": True, "include_depth": True}
    )
    p = AttrDict(
        {
            "setup": "multi_task",
            "model": model,
            "backbone": backbone,
            "head": head,
            "backbone_kwargs": {
                "img_size": [IMG, IMG], "patch_size": 16, "embed_dim": 64,
                "depth": 2, "num_heads": 4, "moe_mlp_ratio": 1, "dilated": True,
            },
            "head_kwargs": {"img_size": [IMG, IMG], "embed_dim": 64,
                            "patch_size": 16},
            "TASKS": tasks,
            "ALL_TASKS": tasks,
            "AUXILARY_TASKS": tasks,
            "TASK_NAMES": [t.name for t in tasks],
            "moe_experts": 8,
            "moe_top_k": 2,
            "compute_dtype": "float32",
            "moe_capacity_factor": 8.0,
        }
    )
    p.update(e)
    p.update(extra)
    return p


def _fwd(model, x, train=False):
    variables = model.init(
        {"params": jax.random.key(0), "gate_noise": jax.random.key(1),
         "dropout": jax.random.key(2)},
        x, train=False,
    )
    (out, cv, stats), _ = model.apply(
        variables, x, train=train, mutable=["batch_stats"],
        rngs={"gate_noise": jax.random.key(3), "dropout": jax.random.key(4)},
    )
    return out


@pytest.mark.parametrize("model_name", [
    "cross_stitch", "nddr_cnn", "mtan", "padnet", "mti_net", "papnet_vit",
    "jtrl",
])
def test_mtl_method_factory(model_name):
    head = "deeplab" if model_name in ("cross_stitch", "nddr_cnn", "mtan") \
        else "VisionTransformerUpHead"
    backbone = "resnet18" if model_name in (
        "cross_stitch", "nddr_cnn", "mtan", "padnet", "mti_net"
    ) else "VisionTransformer"
    p = make_p(model=model_name, backbone=backbone, head=head)
    model = build_model(p, mesh=None, expert_axis=None)
    out = _fwd(model, jnp.ones((1, IMG, IMG, 3)), train=True)
    assert out["semseg"].shape == (1, IMG, IMG, 40)
    assert out["depth"].shape == (1, IMG, IMG, 1)
    if model_name in ("padnet", "papnet_vit"):
        assert "initial_semseg" in out
    if model_name == "mti_net":
        assert "deep_supervision" in out


def test_token_backbone_factory():
    p = make_p(backbone="TokenVisionTransformer_moe", multi_gate=True,
               gate_task_specific_dim=16)
    model = build_model(p, mesh=None, expert_axis=None)
    out = _fwd(model, jnp.ones((1, IMG, IMG, 3)))
    assert out["semseg"].shape == (1, IMG, IMG, 40)


def test_mixture_baseline_factory():
    p = make_p(model="mixture_baseline", backbone="resnet50", head="deeplab")
    model = build_model(p, mesh=None, expert_axis=None)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.ones((1, IMG, IMG, 3)), train=False,
    )
    (out, cv, stats), _ = model.apply(
        variables, jnp.ones((1, IMG, IMG, 3)), train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.key(2)},
    )
    assert out["semseg"].shape == (1, IMG, IMG, 40)
    assert "gate_density" in stats
    # with all-ones gate init and positive embedding path, gates start dense
    assert 0.0 <= float(stats["gate_density"]) <= 1.0
    # single-task sparse pathway
    (out1, _, _), _ = model.apply(
        variables, jnp.ones((1, IMG, IMG, 3)), train=False,
        single_task="depth", mutable=["batch_stats"],
    )
    assert list(out1.keys()) == ["depth"]
