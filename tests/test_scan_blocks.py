"""scan_blocks: lax.scan over (dense, MoE) block pairs.

The scan path must be numerically identical to the python block loop in
eval, gradient-identical with deterministic gating (noise std 0), and
expert-shardable on a mesh.  Layout conversion (utils.scan_params) must
round-trip the per-block storage format.
"""


import jax
import jax.numpy as jnp
import pytest

from m3vit_tpu.models.vit_moe import VisionTransformerMoE
from m3vit_tpu.utils.scan_params import loop_to_scan, scan_to_loop

DEPTH = 4


def _model(**kw):
    base = dict(
        img_size=(32, 32), patch_size=8, embed_dim=64, depth=DEPTH,
        num_heads=4, mlp_ratio=2.0, qkv_bias=True, moe_mlp_ratio=1.0,
        moe_experts=8, moe_top_k=2, vmoe_noisy_std=0.0,
        capacity_factor=4.0, eval_capacity_factor=4.0,
        dtype=jnp.float32, use_checkpointing=False,
    )
    base.update(kw)
    return VisionTransformerMoE(**base)


def _convert(loop_params):
    return {"params": loop_to_scan(loop_params["params"], DEPTH)}


@pytest.fixture(scope="module")
def img():
    return jax.random.normal(jax.random.key(0), (2, 32, 32, 3))


def test_scan_matches_loop_eval(img):
    loop = _model()
    scan = _model(scan_blocks=True)
    v = loop.init({"params": jax.random.key(1)}, img, train=False)
    vs = _convert(v)
    t1, cv1, s1 = loop.apply(v, img, train=False)
    t2, cv2, s2 = scan.apply(vs, img, train=False)
    assert jnp.allclose(t1, t2, atol=1e-5), float(jnp.abs(t1 - t2).max())
    assert jnp.allclose(cv1, cv2, atol=1e-6)
    for k in s1:
        assert jnp.allclose(s1[k], s2[k], atol=1e-5), k


def test_scan_param_shapes_and_roundtrip(img):
    scan = _model(scan_blocks=True)
    vs = scan.init({"params": jax.random.key(1)}, img, train=False)
    w1 = vs["params"]["blocks_scan"]["moe"]["mlp"]["experts_w1"]
    assert w1.shape[0] == DEPTH // 2  # stacked pair axis leads
    loop_p = scan_to_loop(vs["params"], DEPTH)
    assert f"block_{DEPTH - 1}" in loop_p and "blocks_scan" not in loop_p
    back = loop_to_scan(loop_p, DEPTH)
    jax.tree.map(
        lambda a, b: None if jnp.array_equal(a, b) else pytest.fail("leaf"),
        vs["params"], back)


def test_scan_matches_loop_gradients_multigate(img):
    loop = _model(multi_gate=True, num_tasks=3)
    scan = _model(multi_gate=True, num_tasks=3, scan_blocks=True)
    tid = jnp.asarray(1, jnp.int32)
    v = loop.init({"params": jax.random.key(2)}, img, task_id=tid,
                  train=False)
    vs = _convert(v)

    def loss_loop(p):
        t, cv, _ = loop.apply({"params": p}, img, task_id=tid, train=True,
                              rngs={"gate_noise": jax.random.key(3)})
        return (t.astype(jnp.float32) ** 2).mean() + 0.01 * cv

    def loss_scan(p):
        t, cv, _ = scan.apply({"params": p}, img, task_id=tid, train=True,
                              rngs={"gate_noise": jax.random.key(3)})
        return (t.astype(jnp.float32) ** 2).mean() + 0.01 * cv

    l1, g1 = jax.value_and_grad(loss_loop)(v["params"])
    l2, g2 = jax.value_and_grad(loss_scan)(vs["params"])
    assert jnp.allclose(l1, l2, atol=1e-5), (float(l1), float(l2))
    g2_loop = scan_to_loop(g2, DEPTH)
    jax.tree.map(
        lambda a, b: None if jnp.allclose(a, b, atol=2e-4)
        else pytest.fail(f"grad mismatch {jnp.abs(a - b).max()}"),
        g1, g2_loop)


def test_scan_remat_compiles_and_matches(img):
    scan = _model(scan_blocks=True)
    remat = _model(scan_blocks=True, use_checkpointing=True)
    vs = scan.init({"params": jax.random.key(4)}, img, train=False)

    def loss(m, p):
        t, cv, _ = m.apply({"params": p}, img, train=True,
                           rngs={"gate_noise": jax.random.key(5)})
        return (t.astype(jnp.float32) ** 2).mean() + 0.01 * cv

    l1, g1 = jax.value_and_grad(lambda p: loss(scan, p))(vs["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(remat, p))(vs["params"])
    assert jnp.allclose(l1, l2, atol=1e-6)
    jax.tree.map(
        lambda a, b: None if jnp.allclose(a, b, atol=1e-5)
        else pytest.fail("remat grad mismatch"),
        g1, g2)


def test_scan_rejects_drop_path(img):
    m = _model(scan_blocks=True, drop_path_rate=0.1)
    with pytest.raises(ValueError, match="drop_path"):
        m.init({"params": jax.random.key(0)}, img, train=False)


def test_scan_expert_parallel_matches_local(img, mesh8):
    """Scan + EP on the 8-device mesh == scan local (and therefore == loop)."""
    from m3vit_tpu.parallel.mesh import param_shardings

    local = _model(scan_blocks=True)
    ep = _model(scan_blocks=True, mesh=mesh8, expert_axis="expert")
    # token count (B * 17) must divide over the 8 mesh shards
    img = jax.random.normal(jax.random.key(7), (8, 32, 32, 3))
    v = local.init({"params": jax.random.key(6)}, img, train=False)
    t1, cv1, _ = local.apply(v, img, train=False)

    sh = param_shardings(v["params"], mesh8)
    w1 = sh["blocks_scan"]["moe"]["mlp"]["experts_w1"]
    assert "expert" in str(w1.spec) and w1.spec[0] is None, w1.spec
    vp = {"params": jax.device_put(v["params"], sh)}
    t2, cv2, _ = jax.jit(
        lambda vv: ep.apply(vv, img, train=False))(vp)
    assert jnp.allclose(t1, t2, atol=2e-4), float(jnp.abs(t1 - t2).max())
    assert jnp.allclose(cv1, cv2, atol=1e-5)
