"""Fused expert-FFN kernel tests (interpret mode on CPU) vs einsum reference."""

import jax
import jax.numpy as jnp
import numpy as np

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
