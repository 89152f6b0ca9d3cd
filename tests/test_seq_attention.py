"""Sequence-parallel (Ulysses) attention: exactness vs the dense form.

SURVEY §5 long-context requirement: the reference has no sequence axis
(naive O(N²) attention, ckpt/vision_transformer_moe.py:283-313); ours adds
one as a mesh axis.  These tests prove the sharded path is numerically the
dense path (same contraction per head, so near-bit-exact in f32).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3vit_tpu.parallel.mesh import batch_sharding, make_mesh
from m3vit_tpu.parallel.seq_attention import (
    _attend,
    seq_axis_size,
    ulysses_attention,
)


@pytest.fixture(scope="module")
def seq_mesh():
    """(data=2, seq=4, expert=1) mesh over the 8 virtual CPU devices."""
    return make_mesh(n_data=2, n_expert=1, n_seq=4)


def _qkv(key, B, N, H, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    shape = (B, N, H, d)
    return (jax.random.normal(kq, shape, dtype),
            jax.random.normal(kk, shape, dtype),
            jax.random.normal(kv, shape, dtype))


def test_seq_axis_size(seq_mesh):
    assert seq_axis_size(None) == 1
    assert seq_axis_size(seq_mesh) == 4
    assert seq_axis_size(make_mesh(n_data=2, n_expert=4)) == 1


def test_matches_dense_divisible(seq_mesh):
    B, N, H, d = 4, 32, 8, 16
    q, k, v = _qkv(jax.random.PRNGKey(0), B, N, H, d)
    scale = d ** -0.5
    with jax.default_matmul_precision("highest"):
        ref = _attend(q, k, v, scale, N, jnp.float32)
        out = ulysses_attention(
            q, k, v, mesh=seq_mesh, scale=scale, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_matches_dense_padded_tokens(seq_mesh):
    # N=29 does not divide seq=4: exercises zero-pad + key masking
    B, N, H, d = 2, 29, 4, 8
    q, k, v = _qkv(jax.random.PRNGKey(1), B, N, H, d)
    scale = d ** -0.5
    with jax.default_matmul_precision("highest"):
        ref = _attend(q, k, v, scale, N, jnp.float32)
        out = ulysses_attention(
            q, k, v, mesh=seq_mesh, scale=scale, compute_dtype=jnp.float32)
    assert out.shape == (B, N, H, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_dense(seq_mesh):
    B, N, H, d = 2, 16, 4, 8
    q, k, v = _qkv(jax.random.PRNGKey(2), B, N, H, d)
    scale = d ** -0.5

    def loss_dense(q, k, v):
        return jnp.sum(_attend(q, k, v, scale, N, jnp.float32) ** 2)

    def loss_seq(q, k, v):
        return jnp.sum(ulysses_attention(
            q, k, v, mesh=seq_mesh, scale=scale,
            compute_dtype=jnp.float32) ** 2)

    with jax.default_matmul_precision("highest"):
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        gs = jax.grad(loss_seq, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_under_jit_with_sharded_inputs(seq_mesh):
    B, N, H, d = 4, 24, 8, 16
    q, k, v = _qkv(jax.random.PRNGKey(3), B, N, H, d)
    scale = d ** -0.5

    fn = jax.jit(lambda q, k, v: ulysses_attention(
        q, k, v, mesh=seq_mesh, scale=scale, compute_dtype=jnp.float32))
    with jax.default_matmul_precision("highest"):
        out = fn(q, k, v)
        ref = _attend(q, k, v, scale, N, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_batch_sharding_excludes_seq(seq_mesh):
    spec = batch_sharding(seq_mesh).spec
    assert spec == jax.sharding.PartitionSpec(("data", "expert"))


def test_make_mesh_seq_axis_shapes():
    m = make_mesh(n_data=2, n_expert=1, n_seq=4)
    assert m.axis_names == ("data", "seq", "expert")
    assert dict(m.shape) == {"data": 2, "seq": 4, "expert": 1}
    # n_expert inferred: 8 // (1*2) = 4
    m2 = make_mesh(n_data=1, n_seq=2)
    assert dict(m2.shape) == {"data": 1, "seq": 2, "expert": 4}


def test_model_forward_matches_no_seq_mesh(seq_mesh):
    """Whole MoE backbone: seq-sharded attention == dense attention."""
    from m3vit_tpu.models.vit_moe import VisionTransformerMoE

    kw = dict(
        img_size=(32, 32), patch_size=8, embed_dim=32, depth=2, num_heads=4,
        mlp_ratio=2.0, moe_experts=4, moe_top_k=2, moe_mlp_ratio=2,
        dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 3))
    task_id = jnp.zeros((), jnp.int32)

    with jax.default_matmul_precision("highest"):
        m_dense = VisionTransformerMoE(**kw, mesh=None)
        params = m_dense.init(jax.random.PRNGKey(5), x, task_id, train=False)
        ref, _, _ = m_dense.apply(params, x, task_id, train=False)

        m_seq = VisionTransformerMoE(**kw, mesh=seq_mesh)
        out, _, _ = m_seq.apply(params, x, task_id, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
