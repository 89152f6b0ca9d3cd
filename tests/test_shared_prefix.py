"""shared_prefix: run the task-independent prefix (patch embed + leading
dense blocks) once per step instead of once per task.  Multi-gate task
passes share ALL parameters and diverge only at the first per-task MoE gate
(reference models/models.py:299-320 runs the whole backbone per task), so
hoisting the prefix is exact numerics — outputs AND gradients must match the
sequential loop bit-for-bit modulo float reassociation."""


import jax
import jax.numpy as jnp
import pytest

from m3vit_tpu.models.heads import VisionTransformerUpHead
from m3vit_tpu.models.multitask import MultiTaskModel
from m3vit_tpu.models.vit_moe import VisionTransformerMoE

TASKS = ["semseg", "sal"]


def _model(shared_prefix=False, drop_rate=0.0, attn_drop_rate=0.0,
           drop_path_rate=0.0, use_checkpointing=False, mesh=None,
           expert_axis=None):
    backbone = VisionTransformerMoE(
        img_size=(32, 32), patch_size=8, embed_dim=64, depth=4,
        num_heads=4, mlp_ratio=2.0, qkv_bias=True, moe_mlp_ratio=1.0,
        moe_experts=8, moe_top_k=2, vmoe_noisy_std=0.0,
        multi_gate=True, num_tasks=len(TASKS),
        capacity_factor=4.0, eval_capacity_factor=4.0,
        drop_rate=drop_rate, attn_drop_rate=attn_drop_rate,
        drop_path_rate=drop_path_rate,
        mesh=mesh, expert_axis=expert_axis,
        dtype=jnp.float32, use_checkpointing=use_checkpointing,
    )
    decoders = {
        t: VisionTransformerUpHead(
            img_size=(32, 32), patch_size=8, embed_dim=64,
            num_classes=c, dtype=jnp.float32)
        for t, c in zip(TASKS, (21, 1))
    }
    return MultiTaskModel(backbone=backbone, decoders=decoders, tasks=TASKS,
                          multi_gate=True, shared_prefix=shared_prefix)


@pytest.fixture(scope="module")
def img():
    return jax.random.normal(jax.random.key(0), (2, 32, 32, 3))


def test_shared_prefix_matches_loop(img):
    loop = _model()
    shared = _model(shared_prefix=True)
    v = loop.init({"params": jax.random.key(1)}, img, train=False)
    o1, cv1, s1 = loop.apply(v, img, train=False)
    o2, cv2, s2 = shared.apply(v, img, train=False)  # same params
    for t in TASKS:
        assert jnp.allclose(o1[t], o2[t], atol=1e-5), t
    assert jnp.allclose(cv1, cv2, atol=1e-6)
    for k in s1:
        assert jnp.allclose(s1[k], s2[k], atol=1e-5), k


def test_shared_prefix_matches_loop_gradients(img):
    """The shared prefix's gradient is the sum of the task branches'
    cotangents — identical to the loop, where autodiff sums the shared
    parameters' contributions across the T passes."""
    loop = _model()
    shared = _model(shared_prefix=True)
    v = loop.init({"params": jax.random.key(2)}, img, train=False)

    def loss(m, p):
        (out, cv, _), _ = m.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, img, train=True,
            rngs={"gate_noise": jax.random.key(3)},
            mutable=["batch_stats"])
        return sum((o.astype(jnp.float32) ** 2).mean()
                   for o in out.values()) + 0.01 * cv

    l1, g1 = jax.value_and_grad(lambda p: loss(loop, p))(v["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(shared, p))(v["params"])
    assert jnp.allclose(l1, l2, atol=1e-5), (float(l1), float(l2))
    jax.tree.map(
        lambda a, b: None if jnp.allclose(a, b, atol=2e-4)
        else pytest.fail(f"grad mismatch {jnp.abs(a - b).max()}"),
        g1, g2)


def test_shared_prefix_rejects_train_dropout(img):
    """Sharing the prefix would share its train-time dropout draws across
    tasks — the backbone must refuse instead of silently changing the
    noise statistics."""
    shared = _model(shared_prefix=True, drop_rate=0.1)
    v = _model(drop_rate=0.1).init({"params": jax.random.key(4)}, img,
                                   train=False)
    with pytest.raises(AssertionError, match="dropout"):
        shared.apply(
            v, img, train=True,
            rngs={"gate_noise": jax.random.key(5),
                  "dropout": jax.random.key(6)},
            mutable=["batch_stats"])
    # eval is fine: dropout is inert
    out, _, _ = shared.apply(v, img, train=False)
    assert set(out) == set(TASKS)


def test_shared_prefix_drop_path_train_falls_back(img):
    """With drop_path_rate > 0 in train, the first MoE block's attention
    residual mask must stay per-task — shared_prefix keeps only the
    dpr=0 leading blocks shared and runs that block in full per task."""
    shared = _model(shared_prefix=True, drop_path_rate=0.2)
    v = shared.init({"params": jax.random.key(8)}, img, train=False)
    out, cv, _ = shared.apply(
        v, img, train=True,
        rngs={"gate_noise": jax.random.key(9),
              "dropout": jax.random.key(10)},
        mutable=["batch_stats"])[0]
    for t in TASKS:
        assert jnp.isfinite(out[t]).all(), t


def test_shared_prefix_matches_loop_with_remat(img):
    """use_checkpointing wraps blocks in nn.remat with the stage arg
    static; outputs must still match the loop exactly."""
    loop = _model(use_checkpointing=True)
    shared = _model(shared_prefix=True, use_checkpointing=True)
    v = loop.init({"params": jax.random.key(11)}, img, train=False)
    o1, cv1, _ = loop.apply(v, img, train=False)
    o2, cv2, _ = shared.apply(v, img, train=False)
    for t in TASKS:
        assert jnp.allclose(o1[t], o2[t], atol=1e-5), t
    assert jnp.allclose(cv1, cv2, atol=1e-6)


def test_shared_prefix_task_conditioned_matches_loop(img):
    """The task-conditioned shared-gate mode (gate_task_specific_dim > 0,
    reference models.py:215-287) also diverges only at the first gate —
    the task one-hot enters through the gate input alone — so its
    shared_prefix must be exact vs its sequential loop too."""
    from m3vit_tpu.models.multitask import TaskConditionedMultiTaskModel

    def _tc_model(shared_prefix=False):
        backbone = VisionTransformerMoE(
            img_size=(32, 32), patch_size=8, embed_dim=64, depth=4,
            num_heads=4, mlp_ratio=2.0, qkv_bias=True, moe_mlp_ratio=1.0,
            moe_experts=8, moe_top_k=2, vmoe_noisy_std=0.0,
            multi_gate=False, num_tasks=len(TASKS),
            gate_task_specific_dim=16,
            capacity_factor=4.0, eval_capacity_factor=4.0,
            dtype=jnp.float32, use_checkpointing=False,
        )
        decoders = {
            t: VisionTransformerUpHead(
                img_size=(32, 32), patch_size=8, embed_dim=64,
                num_classes=c, dtype=jnp.float32)
            for t, c in zip(TASKS, (21, 1))
        }
        return TaskConditionedMultiTaskModel(
            backbone=backbone, decoders=decoders, tasks=TASKS,
            shared_prefix=shared_prefix)

    loop = _tc_model()
    shared = _tc_model(shared_prefix=True)
    v = loop.init({"params": jax.random.key(12)}, img, train=False)
    o1, cv1, s1 = loop.apply(v, img, train=False)
    o2, cv2, s2 = shared.apply(v, img, train=False)
    for t in TASKS:
        assert jnp.allclose(o1[t], o2[t], atol=1e-5), t
    assert jnp.allclose(cv1, cv2, atol=1e-6)
    for k in s1:
        assert jnp.allclose(s1[k], s2[k], atol=1e-5), k
    # single_task stays on the per-task path
    o3, _, _ = shared.apply(v, img, train=False, single_task="sal")
    assert jnp.allclose(o1["sal"], o3["sal"], atol=1e-6)


def test_shared_prefix_single_task_unaffected(img):
    """single_task inference takes the per-task path regardless of the
    flag (the prefix split only exists for the all-task forward)."""
    loop = _model()
    shared = _model(shared_prefix=True)
    v = loop.init({"params": jax.random.key(7)}, img, train=False)
    o1, _, _ = loop.apply(v, img, train=False, single_task="semseg")
    o2, _, _ = shared.apply(v, img, train=False, single_task="semseg")
    assert jnp.allclose(o1["semseg"], o2["semseg"], atol=1e-6)


def test_shared_prefix_matches_loop_under_mesh(mesh8):
    """VERDICT r3 #4: shared_prefix exactness proven under the 8-device
    (data, expert) mesh, not just single-device.  Same params, same sharded
    batch: the shared-prefix forward must match the sequential loop under
    the SAME mesh (catches per-shard capacity / rng-folding divergence),
    and the mesh loop must match the single-device loop."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    img8 = jax.random.normal(jax.random.key(30), (8, 32, 32, 3))
    loop = _model()
    loop_m = _model(mesh=mesh8, expert_axis="expert")
    shared_m = _model(shared_prefix=True, mesh=mesh8, expert_axis="expert")
    v = loop.init({"params": jax.random.key(31)}, img8, train=False)
    imgs = jax.device_put(img8, NamedSharding(mesh8, P(("data", "expert"))))

    o0, cv0, _ = loop.apply(v, img8, train=False)
    o1, cv1, s1 = jax.jit(lambda v, x: loop_m.apply(v, x, train=False))(
        v, imgs)
    o2, cv2, s2 = jax.jit(lambda v, x: shared_m.apply(v, x, train=False))(
        v, imgs)
    for t in TASKS:
        assert jnp.allclose(o1[t], o2[t], atol=1e-5), t    # shared == loop
        assert jnp.allclose(o0[t], o1[t], atol=1e-5), t    # mesh == 1-dev
    assert jnp.allclose(cv1, cv2, atol=1e-6)
    assert jnp.allclose(cv0, cv1, atol=1e-6)
    for k in s1:
        assert jnp.allclose(s1[k], s2[k], atol=1e-5), k


def test_shared_prefix_train_grads_match_loop_under_mesh(mesh8):
    """Train-mode loss AND gradients of the shared-prefix pass under the
    mesh must match the sequential loop under the same mesh (gate_noise rng
    threaded; std=0 so routing is deterministic)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    img8 = jax.random.normal(jax.random.key(32), (8, 32, 32, 3))
    loop_m = _model(mesh=mesh8, expert_axis="expert")
    shared_m = _model(shared_prefix=True, mesh=mesh8, expert_axis="expert")
    v = loop_m.init({"params": jax.random.key(33)}, img8, train=False)
    imgs = jax.device_put(img8, NamedSharding(mesh8, P(("data", "expert"))))

    def loss(mod, p, x):
        (o, cv, _), _ = mod.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, x, train=True,
            rngs={"gate_noise": jax.random.key(34)},
            mutable=["batch_stats"])
        return sum((o[t].astype(jnp.float32) ** 2).mean()
                   for t in TASKS) + 0.01 * cv

    l1, g1 = jax.jit(jax.value_and_grad(
        lambda p: loss(loop_m, p, imgs)))(v["params"])
    l2, g2 = jax.jit(jax.value_and_grad(
        lambda p: loss(shared_m, p, imgs)))(v["params"])
    assert jnp.allclose(l1, l2, atol=1e-5), (float(l1), float(l2))
    jax.tree.map(
        lambda a, b: None if jnp.allclose(a, b, atol=2e-4)
        else pytest.fail(f"grad mismatch {jnp.abs(a - b).max()}"),
        g1, g2)
