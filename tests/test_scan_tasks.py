"""scan_tasks: weight-tied lax.scan over the multi-gate per-task backbone
passes (MultiTaskModel.scan_tasks).  Params are identical to the sequential
loop, so outputs and gradients must match exactly (deterministic gating)."""


import jax
import jax.numpy as jnp
import pytest

from m3vit_tpu.models.heads import VisionTransformerUpHead
from m3vit_tpu.models.multitask import MultiTaskModel
from m3vit_tpu.models.vit_moe import VisionTransformerMoE

TASKS = ["semseg", "sal"]


def _model(scan_tasks=False, scan_blocks=False, scan_tasks_remat=True):
    backbone = VisionTransformerMoE(
        img_size=(32, 32), patch_size=8, embed_dim=64, depth=4,
        num_heads=4, mlp_ratio=2.0, qkv_bias=True, moe_mlp_ratio=1.0,
        moe_experts=8, moe_top_k=2, vmoe_noisy_std=0.0,
        multi_gate=True, num_tasks=len(TASKS),
        capacity_factor=4.0, eval_capacity_factor=4.0,
        dtype=jnp.float32, use_checkpointing=False,
        scan_blocks=scan_blocks,
    )
    decoders = {
        t: VisionTransformerUpHead(
            img_size=(32, 32), patch_size=8, embed_dim=64,
            num_classes=c, dtype=jnp.float32)
        for t, c in zip(TASKS, (21, 1))
    }
    return MultiTaskModel(backbone=backbone, decoders=decoders, tasks=TASKS,
                          multi_gate=True, scan_tasks=scan_tasks,
                          scan_tasks_remat=scan_tasks_remat)


@pytest.fixture(scope="module")
def img():
    return jax.random.normal(jax.random.key(0), (2, 32, 32, 3))


def test_scan_tasks_matches_loop(img):
    loop = _model()
    scan = _model(scan_tasks=True)
    v = loop.init({"params": jax.random.key(1)}, img, train=False)
    o1, cv1, s1 = loop.apply(v, img, train=False)
    o2, cv2, s2 = scan.apply(v, img, train=False)  # same params: tied scan
    for t in TASKS:
        assert jnp.allclose(o1[t], o2[t], atol=1e-5), t
    assert jnp.allclose(cv1, cv2, atol=1e-6)
    for k in s1:
        assert jnp.allclose(s1[k], s2[k], atol=1e-5), k


def test_scan_tasks_matches_loop_gradients(img):
    loop = _model()
    scan = _model(scan_tasks=True)
    v = loop.init({"params": jax.random.key(2)}, img, train=False)

    def loss(m, p):
        (out, cv, _), _ = m.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, img, train=True,
            rngs={"gate_noise": jax.random.key(3)},
            mutable=["batch_stats"])
        return sum((o.astype(jnp.float32) ** 2).mean()
                   for o in out.values()) + 0.01 * cv

    l1, g1 = jax.value_and_grad(lambda p: loss(loop, p))(v["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(scan, p))(v["params"])
    assert jnp.allclose(l1, l2, atol=1e-5), (float(l1), float(l2))
    jax.tree.map(
        lambda a, b: None if jnp.allclose(a, b, atol=2e-4)
        else pytest.fail(f"grad mismatch {jnp.abs(a - b).max()}"),
        g1, g2)


def test_scan_tasks_remat_gradients_exact(img):
    """scan-of-remat (the default, which makes scan_tasks fit the flagship
    memory budget) must give bit-identical losses and matching grads vs the
    no-remat scan."""
    remat = _model(scan_tasks=True)
    plain = _model(scan_tasks=True, scan_tasks_remat=False)
    v = remat.init({"params": jax.random.key(5)}, img, train=False)

    def loss(m, p):
        (out, cv, _), _ = m.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, img, train=True,
            rngs={"gate_noise": jax.random.key(6)},
            mutable=["batch_stats"])
        return sum((o.astype(jnp.float32) ** 2).mean()
                   for o in out.values()) + 0.01 * cv

    l1, g1 = jax.value_and_grad(lambda p: loss(remat, p))(v["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(plain, p))(v["params"])
    assert l1 == l2, (float(l1), float(l2))
    jax.tree.map(
        lambda a, b: None if jnp.allclose(a, b, atol=2e-5)
        else pytest.fail(f"grad mismatch {jnp.abs(a - b).max()}"),
        g1, g2)


def test_scan_tasks_composes_with_scan_blocks(img):
    """Both scans on: params in blocks_scan layout, outputs match the
    double-loop model after layout conversion."""
    from m3vit_tpu.utils.scan_params import loop_to_scan

    loop = _model()
    both = _model(scan_tasks=True, scan_blocks=True)
    v = loop.init({"params": jax.random.key(4)}, img, train=False)
    vp = dict(v["params"])
    vp["backbone"] = loop_to_scan(v["params"]["backbone"], 4)
    o1, cv1, _ = loop.apply(v, img, train=False)
    o2, cv2, _ = both.apply(
        {"params": vp, "batch_stats": v["batch_stats"]}, img, train=False)
    for t in TASKS:
        assert jnp.allclose(o1[t], o2[t], atol=1e-5), t
    assert jnp.allclose(cv1, cv2, atol=1e-6)
