"""Fused LN+MLP+residual kernel (ops/ln_mlp.py) vs the unfused composition.

The kernel must reproduce  x + (gelu_exact(LN(x) @ w1 + b1) @ w2 + b2)
with f32 LN statistics / GEMM accumulation and the MLP output rounded to
the stream dtype before the residual add — i.e. exactly the unfused
LayerNorm -> ops/expert_ffn kernel -> residual-add composition it replaces
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3vit_tpu.ops.ln_mlp import fused_ln_mlp_residual

EPS = 1e-6


def unfused(x, gamma, beta, w1, b1, w2, b2, cd):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = (xc * jax.lax.rsqrt(var + EPS) * gamma + beta).astype(cd)
    a = jnp.dot(h, w1.astype(cd), preferred_element_type=jnp.float32) + b1
    a = 0.5 * a * (1.0 + jax.lax.erf(a / np.sqrt(2.0)))
    o = jnp.dot(a.astype(cd), w2.astype(cd),
                preferred_element_type=jnp.float32) + b2
    return x + o.astype(x.dtype)


def make(rng, S, d, H, dtype):
    x = jnp.asarray(rng.randn(S, d).astype(np.float32)).astype(dtype)
    gamma = jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.randn(d).astype(np.float32))
    w1 = jnp.asarray(rng.randn(d, H).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(H, d).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    return x, gamma, beta, w1, b1, w2, b2


@pytest.mark.parametrize("S", [256, 300])  # 300 exercises the row padding
def test_forward_matches_unfused_f32(S):
    rng = np.random.RandomState(0)
    args = make(rng, S, 16, 32, jnp.float32)
    ref = unfused(*args, jnp.float32)
    got = fused_ln_mlp_residual(*args, EPS, True)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)


def test_forward_matches_unfused_bf16_stream():
    """Flagship layout: bf16 stream + bf16 compute, f32 LN/accum inside."""
    rng = np.random.RandomState(1)
    x, gamma, beta, w1, b1, w2, b2 = make(rng, 300, 16, 32, jnp.bfloat16)
    cd = jnp.bfloat16
    ref = unfused(x, gamma, beta, w1, b1, w2, b2, cd)
    got = fused_ln_mlp_residual(x, gamma, beta, w1.astype(cd), b1,
                                w2.astype(cd), b2, EPS, True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05)


def test_grads_match_unfused():
    rng = np.random.RandomState(2)
    args = make(rng, 300, 16, 32, jnp.float32)

    def loss_fused(*a):
        return jnp.sum(fused_ln_mlp_residual(*a, EPS, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(unfused(*a, jnp.float32) ** 2)

    g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g2 = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-3)


@pytest.fixture
def force_interpret(monkeypatch):
    """CPU tests exercise the fused path via the interpret hook (production
    off-TPU behavior is a warn-once fallback to the unfused composition)."""
    from m3vit_tpu.ops import expert_ffn

    monkeypatch.setattr(expert_ffn, "_FORCE_INTERPRET_FOR_TESTS", True)


def test_denseblock_ln_mlp_matches_unfused(force_interpret):
    """DenseBlock.use_pallas_ln_mlp must match the default composition in
    outputs, grads, AND param-tree structure (checkpoint-compatible)."""
    from m3vit_tpu.models.vit import DenseBlock

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 12, 16).astype(np.float32))
    ref_mod = DenseBlock(num_heads=2, dtype=jnp.float32)
    fus_mod = DenseBlock(num_heads=2, dtype=jnp.float32,
                         use_pallas_ln_mlp=True)

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

    def loss(mod, v, x):
        return jnp.sum(mod.apply(v, x) ** 2)

    g_ref = jax.grad(lambda v, x: loss(ref_mod, v, x), argnums=(0, 1))(v_ref, x)
    g_fus = jax.grad(lambda v, x: loss(fus_mod, v, x), argnums=(0, 1))(v_ref, x)
    for a, b in zip(jax.tree.leaves(g_fus), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-3)


def test_denseblock_ln_mlp_falls_back_under_drop_path(force_interpret):
    """With drop-path active in train the fused residual cannot apply the
    stochastic-depth mask — the block must take the unfused composition
    (same params, same rng draws ⇒ identical outputs)."""
    from m3vit_tpu.models.vit import DenseBlock

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, 12, 16).astype(np.float32))
    ref_mod = DenseBlock(num_heads=2, dtype=jnp.float32, drop_path_rate=0.5)
    fus_mod = DenseBlock(num_heads=2, dtype=jnp.float32, drop_path_rate=0.5,
                         use_pallas_ln_mlp=True)
    v = ref_mod.init(jax.random.key(0), x)
    rngs = {"dropout": jax.random.key(7)}
    out_ref = ref_mod.apply(v, x, True, rngs=rngs)
    out_fus = fus_mod.apply(v, x, True, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_fus))


def test_denseblock_ln_mlp_under_multichip_mesh(force_interpret, mesh8):
    """On a >1-device mesh the fused LN+MLP+residual must run inside
    shard_map (a top-level pallas_call is unpartitionable under GSPMD)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from m3vit_tpu.models.vit import DenseBlock

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(8, 12, 16).astype(np.float32))
    ref_mod = DenseBlock(num_heads=2, dtype=jnp.float32)
    fus_mod = DenseBlock(num_heads=2, dtype=jnp.float32,
                         use_pallas_ln_mlp=True, mesh=mesh8)
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


def test_padded_rows_get_zero_grad_contribution():
    """Padding to 256-row multiples must not leak into dx or weight grads:
    compare S=300 against the same rows computed at S=256+44 split."""
    rng = np.random.RandomState(3)
    args = make(rng, 300, 16, 32, jnp.float32)

    def loss(*a):
        return jnp.sum(fused_ln_mlp_residual(*a, EPS, True) ** 2)

    g = jax.grad(loss, argnums=tuple(range(7)))(*args)

    def loss_ref(*a):
        return jnp.sum(unfused(*a, jnp.float32) ** 2)

    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    # weight grads sum over tokens — any padded-row leakage shows here
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-3)


def test_denseblock_ln_mlp_mesh_indivisible_batch(force_interpret, mesh8):
    """ADVICE r3: a batch indivisible by the mesh (B=4 on 2x4) takes the
    replicated-spec shard_map fallback; its gradients must still match the
    unfused path (shard_map transposition with check_vma=False can psum
    device-replicated cotangents, scaling grads by mesh size)."""
    from m3vit_tpu.models.vit import DenseBlock

    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(4, 12, 16).astype(np.float32))  # 4 % 8 != 0
    ref_mod = DenseBlock(num_heads=2, dtype=jnp.float32)
    fus_mod = DenseBlock(num_heads=2, dtype=jnp.float32,
                         use_pallas_ln_mlp=True, mesh=mesh8)
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
