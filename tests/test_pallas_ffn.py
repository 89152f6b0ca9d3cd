"""Fused expert-FFN kernel tests (interpret mode on CPU) vs einsum reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3vit_tpu.moe.dispatch import MoEFfnParams, expert_ffn_dense
from m3vit_tpu.ops.expert_ffn import fused_expert_ffn, make_pallas_ffn_fn


def make(rng, E, C, d, H):
    h = jnp.asarray(rng.randn(E, C, d).astype(np.float32))
    params = MoEFfnParams(
        w1=jnp.asarray(rng.randn(E, d, H).astype(np.float32) * 0.1),
        b1=jnp.asarray(rng.randn(E, H).astype(np.float32) * 0.1),
        w2=jnp.asarray(rng.randn(E, H, d).astype(np.float32) * 0.1),
        b2=jnp.asarray(rng.randn(E, d).astype(np.float32) * 0.1),
    )
    return h, params


def test_fused_matches_einsum():
    rng = np.random.RandomState(0)
    h, p = make(rng, 4, 16, 8, 8)
    ref = expert_ffn_dense(h, p, compute_dtype=jnp.float32)
    got = fused_expert_ffn(h, p.w1, p.b1, p.w2, p.b2, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_grads_match_einsum_grads():
    rng = np.random.RandomState(1)
    h, p = make(rng, 2, 8, 8, 16)

    def loss_fused(h, p):
        return jnp.sum(fused_expert_ffn(h, p.w1, p.b1, p.w2, p.b2, True) ** 2)

    def loss_ref(h, p):
        return jnp.sum(expert_ffn_dense(h, p, compute_dtype=jnp.float32) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(h, p)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(h, p)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-3)


def test_ffn_fn_hook_in_dispatch():
    from m3vit_tpu.moe.dispatch import moe_ffn_local

    rng = np.random.RandomState(2)
    T, d, H, E, K = 16, 8, 16, 4, 2
    x = jnp.asarray(rng.randn(T, d).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, E, (T, K)).astype(np.int32))
    gates = jnp.asarray(rng.rand(T, K).astype(np.float32))
    _, p = make(rng, E, 8, d, H)

    ref = moe_ffn_local(x, idx, gates, p, capacity=T * K,
                        compute_dtype=jnp.float32)
    got = moe_ffn_local(
        x, idx, gates, p, capacity=T * K, compute_dtype=jnp.float32,
        ffn_fn=make_pallas_ffn_fn(interpret=True),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.fixture
def force_interpret(monkeypatch):
    """CPU tests exercise the fused dense-MLP path via the interpret hook
    (production off-TPU behavior is a warn-once nn.Dense fallback)."""
    from m3vit_tpu.ops import expert_ffn

    monkeypatch.setattr(expert_ffn, "_FORCE_INTERPRET_FOR_TESTS", True)


def test_mlpblock_use_pallas_matches_dense_path(force_interpret):
    """The dense-block MLP's fused path (MlpBlock.use_pallas, E=1 reuse of
    the expert kernel) must match the nn.Dense/gelu path in outputs, grads,
    AND param-tree structure (checkpoints are path-compatible)."""
    from m3vit_tpu.models.vit import MlpBlock

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 12, 16).astype(np.float32))
    ref_mod = MlpBlock(hidden_dim=32, dtype=jnp.float32)
    fus_mod = MlpBlock(hidden_dim=32, dtype=jnp.float32, use_pallas=True)

    v_ref = ref_mod.init(jax.random.key(0), x)
    v_fus = fus_mod.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(v_ref) == \
        jax.tree_util.tree_structure(v_fus)
    for a, b in zip(jax.tree.leaves(v_ref), jax.tree.leaves(v_fus)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    out_ref = ref_mod.apply(v_ref, x)
    out_fus = fus_mod.apply(v_ref, x)
    np.testing.assert_allclose(np.asarray(out_fus), np.asarray(out_ref),
                               atol=2e-5, rtol=1e-5)

    def loss(fn, v, x):
        return jnp.sum(fn.apply(v, x) ** 2)

    g_ref = jax.grad(lambda v, x: loss(ref_mod, v, x), argnums=(0, 1))(v_ref, x)
    g_fus = jax.grad(lambda v, x: loss(fus_mod, v, x), argnums=(0, 1))(v_ref, x)
    for a, b in zip(jax.tree.leaves(g_fus), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-3)


def test_mlpblock_use_pallas_off_tpu_falls_back_to_dense(caplog):
    """Without the test hook, use_pallas=True on a non-TPU backend must use
    the nn.Dense path (identical numerics) and warn once — NOT silently run
    the Pallas interpreter (ADVICE r2)."""
    import logging

    from m3vit_tpu.models import vit as vit_mod
    from m3vit_tpu.models.vit import MlpBlock

    vit_mod._warn_dense_pallas_unavailable_once.cache_clear()
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 12, 16).astype(np.float32))
    ref_mod = MlpBlock(hidden_dim=32, dtype=jnp.float32)
    fus_mod = MlpBlock(hidden_dim=32, dtype=jnp.float32, use_pallas=True)
    v = ref_mod.init(jax.random.key(0), x)
    with caplog.at_level(logging.WARNING, logger="m3vit_tpu"):
        out = fus_mod.apply(v, x)
    assert any("use_pallas_dense_ffn" in r.message for r in caplog.records)
    # exact equality: it IS the Dense path
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(ref_mod.apply(v, x)))


def test_mlpblock_fused_under_multichip_mesh(force_interpret, mesh8):
    """ADVICE r2 (medium): on a >1-device mesh the fused MLP must run inside
    shard_map (a top-level pallas_call is unpartitionable under GSPMD).
    Checks output + grads vs the Dense path with batch sharded over the
    mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from m3vit_tpu.models.vit import MlpBlock

    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(8, 12, 16).astype(np.float32))
    ref_mod = MlpBlock(hidden_dim=32, dtype=jnp.float32)
    fus_mod = MlpBlock(hidden_dim=32, dtype=jnp.float32, use_pallas=True,
                       mesh=mesh8)
    v = ref_mod.init(jax.random.key(0), x)
    xs = jax.device_put(x, NamedSharding(mesh8, P(("data", "expert"))))

    out = jax.jit(fus_mod.apply)(v, xs)
    ref = ref_mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)

    def loss(mod, v, x):
        return jnp.sum(mod.apply(v, x) ** 2)

    g_fus = jax.jit(jax.grad(lambda v: loss(fus_mod, v, xs)))(v)
    g_ref = jax.grad(lambda v: loss(ref_mod, v, x))(v)
    for a, b in zip(jax.tree.leaves(g_fus), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-3)


def test_mlpblock_use_pallas_fallbacks(force_interpret):
    """Dropout-in-train and out_dim != in_dim must route through the
    einsum/Dense path (the kernel cannot express either)."""
    from m3vit_tpu.models.vit import MlpBlock

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 16).astype(np.float32))
    # out_dim != in_dim: fused path would emit in_dim-wide tokens
    mod = MlpBlock(hidden_dim=32, out_dim=24, dtype=jnp.float32,
                   use_pallas=True)
    v = mod.init(jax.random.key(0), x)
    assert mod.apply(v, x).shape == (1, 8, 24)
    # train-time dropout still works under the flag
    mod = MlpBlock(hidden_dim=32, drop=0.5, dtype=jnp.float32,
                   use_pallas=True)
    v = mod.init(jax.random.key(0), x)
    out = mod.apply(v, x, True, rngs={"dropout": jax.random.key(1)})
    assert out.shape == x.shape


def test_mlpblock_fused_mesh_indivisible_batch(force_interpret, mesh8):
    """ADVICE r3: B=4 on the 2x4 mesh takes fused_dense_mlp's
    replicated-spec shard_map fallback (batch not divisible by the mesh);
    its gradients must match the Dense path — shard_map transposition with
    check_vma=False could otherwise psum device-replicated cotangents
    (same guard as tests/test_ln_mlp.py's indivisible case)."""
    from m3vit_tpu.models.vit import MlpBlock

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(4, 12, 16).astype(np.float32))  # 4 % 8 != 0
    ref_mod = MlpBlock(hidden_dim=32, dtype=jnp.float32)
    fus_mod = MlpBlock(hidden_dim=32, dtype=jnp.float32, use_pallas=True,
                       mesh=mesh8)
    v = ref_mod.init(jax.random.key(0), x)

    out = jax.jit(fus_mod.apply)(v, x)
    ref = ref_mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)

    def loss(mod, v, x):
        return jnp.sum(mod.apply(v, x) ** 2)

    g_fus = jax.jit(jax.grad(lambda v: loss(fus_mod, v, x)))(v)
    g_ref = jax.grad(lambda v: loss(ref_mod, v, x))(v)
    for a, b in zip(jax.tree.leaves(g_fus), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-3)
