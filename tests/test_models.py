"""Model composition tests: ViT-MoE backbone, PUP head, MultiTaskModel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3vit_tpu.models import (
    MultiTaskModel,
    VisionTransformer,
    VisionTransformerMoE,
    VisionTransformerUpHead,
)

IMG = 64  # 4x4 patches at patch16 -> 17 tokens with cls


def tiny_moe_backbone(**kw):
    cfg = dict(
        img_size=(IMG, IMG), patch_size=16, embed_dim=64, depth=4, num_heads=4,
        moe_mlp_ratio=1.0, moe_experts=8, moe_top_k=2, multi_gate=True,
        num_tasks=2, capacity_factor=8.0, eval_capacity_factor=8.0,
        dtype=jnp.float32, use_checkpointing=False,
    )
    cfg.update(kw)
    return VisionTransformerMoE(**cfg)


def test_moe_backbone_shapes_and_cv_loss():
    model = tiny_moe_backbone()
    x = jnp.ones((2, IMG, IMG, 3))
    variables = model.init(
        {"params": jax.random.key(0), "gate_noise": jax.random.key(1)},
        x, task_id=jnp.asarray(0), train=True,
    )
    toks, cv, stats = model.apply(
        variables, x, task_id=jnp.asarray(0), train=True,
        rngs={"gate_noise": jax.random.key(2)},
    )
    assert toks.shape == (2, 17, 64)
    assert float(cv) > 0.0
    assert stats["expert_load_hist"].shape == (8,)
    # eval: no rngs needed, cv = 0
    toks_e, cv_e, _ = model.apply(variables, x, task_id=jnp.asarray(0), train=False)
    assert float(cv_e) == 0.0
    assert np.isfinite(np.asarray(toks_e)).all()


def test_moe_multigate_task_routing_differs():
    """Different task ids select different routers -> different outputs."""
    model = tiny_moe_backbone()
    x = jax.random.normal(jax.random.key(3), (2, IMG, IMG, 3))
    variables = model.init(
        {"params": jax.random.key(0), "gate_noise": jax.random.key(1)},
        x, task_id=jnp.asarray(0), train=True,
    )
    t0, _, _ = model.apply(variables, x, task_id=jnp.asarray(0), train=False)
    t1, _, _ = model.apply(variables, x, task_id=jnp.asarray(1), train=False)
    assert float(jnp.abs(t0 - t1).max()) > 1e-6


def test_moe_backbone_remat_grads():
    model = tiny_moe_backbone(use_checkpointing=True)
    x = jnp.ones((1, IMG, IMG, 3))
    variables = model.init(
        {"params": jax.random.key(0), "gate_noise": jax.random.key(1)},
        x, task_id=jnp.asarray(0), train=True,
    )

    def loss(params):
        toks, cv, _ = model.apply(
            {"params": params}, x, task_id=jnp.asarray(0), train=True,
            rngs={"gate_noise": jax.random.key(2)},
        )
        return jnp.mean(toks**2) + 0.01 * cv

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    total = sum(float(jnp.abs(x).sum()) for x in leaves)
    assert total > 0


def test_dense_vit_shapes():
    model = VisionTransformer(
        img_size=(IMG, IMG), patch_size=16, embed_dim=64, depth=2, num_heads=4,
        dtype=jnp.float32,
    )
    x = jnp.ones((2, IMG, IMG, 3))
    variables = model.init(jax.random.key(0), x)
    toks = model.apply(variables, x)
    assert toks.shape == (2, 17, 64)


def test_pup_head_upsamples_to_image():
    head = VisionTransformerUpHead(
        img_size=(IMG, IMG), patch_size=16, embed_dim=64, num_classes=5,
        dtype=jnp.float32,
    )
    toks = jnp.ones((2, 17, 64))
    variables = head.init(jax.random.key(0), toks, train=False)
    out, mut = head.apply(
        variables, toks, train=True, mutable=["batch_stats"]
    )
    assert out.shape == (2, IMG, IMG, 5)
    assert "batch_stats" in mut


def test_multitask_model_multigate():
    backbone = tiny_moe_backbone()
    decoders = {
        name: VisionTransformerUpHead(
            img_size=(IMG, IMG), patch_size=16, embed_dim=64, num_classes=c,
            dtype=jnp.float32,
        )
        for name, c in [("semseg", 5), ("edge", 1)]
    }
    model = MultiTaskModel(
        backbone=backbone, decoders=decoders, tasks=["semseg", "edge"],
        multi_gate=True,
    )
    x = jnp.ones((2, IMG, IMG, 3))
    variables = model.init(
        {"params": jax.random.key(0), "gate_noise": jax.random.key(1)},
        x, train=True,
    )
    (out, cv, stats), _ = model.apply(
        variables, x, train=True,
        rngs={"gate_noise": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    assert out["semseg"].shape == (2, IMG, IMG, 5)
    assert out["edge"].shape == (2, IMG, IMG, 1)
    assert float(cv) > 0

    # single-task forward computes only that head
    (out1, _, _), _ = model.apply(
        variables, x, train=False, single_task="edge", mutable=["batch_stats"]
    )
    assert list(out1.keys()) == ["edge"]


def test_remat_heads_matches_and_trains():
    """remat_heads is a pure execution strategy: identical outputs, grads for
    every head param, BatchNorm stats still update under the remat."""
    bb = tiny_moe_backbone(depth=2)
    tasks = ["semseg", "sal"]
    decs = {
        t: VisionTransformerUpHead(img_size=(IMG, IMG), embed_dim=64,
                                   num_classes=3)
        for t in tasks
    }
    m0 = MultiTaskModel(backbone=bb, decoders=decs, tasks=tasks,
                        multi_gate=True)
    m1 = MultiTaskModel(backbone=bb, decoders=decs, tasks=tasks,
                        multi_gate=True, remat_heads=True)
    x = jax.random.normal(jax.random.key(0), (2, IMG, IMG, 3))
    v = m0.init({"params": jax.random.key(1), "gate_noise": jax.random.key(2)},
                x, train=False)
    o0, _, _ = m0.apply(v, x, train=False)
    o1, _, _ = m1.apply(v, x, train=False)
    for t in tasks:
        np.testing.assert_allclose(np.asarray(o0[t]), np.asarray(o1[t]),
                                   atol=1e-6, err_msg=t)

    def loss(p):
        (out, cv, _), _ = m1.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, x, train=True,
            rngs={"gate_noise": jax.random.key(3)}, mutable=["batch_stats"],
        )
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in out.values())

    g = jax.grad(loss)(v["params"])
    for t in tasks:
        leaves = jax.tree.leaves(g[f"decoders_{t}"])
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0

    (_, _, _), upd = m1.apply(
        {"params": v["params"], "batch_stats": v["batch_stats"]}, x,
        train=True, rngs={"gate_noise": jax.random.key(4)},
        mutable=["batch_stats"],
    )
    # running stats moved away from init
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                        upd["batch_stats"], v["batch_stats"])
    assert sum(jax.tree.leaves(diff)) > 0
