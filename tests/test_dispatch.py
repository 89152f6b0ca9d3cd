"""MoE dispatch/combine tests vs a dense oracle, single-shard and expert-parallel."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3vit_tpu.moe.dispatch import (
    MoEFfnParams,
    compute_capacity,
    expert_ffn_dense,
    moe_ffn,
    moe_ffn_local,
    position_in_expert,
)


def dense_oracle(x, idx, gates, params):
    """Reference semantics: every token runs through each of its top-k experts
    (no capacity), outputs combined with raw gate scores."""
    gelu = functools.partial(jax.nn.gelu, approximate=False)
    T, d = x.shape
    K = idx.shape[1]
    outs = []
    for t in range(T):
        acc = np.zeros(d, np.float32)
        for k in range(K):
            e = int(idx[t, k])
            a = gelu(x[t].astype(np.float32) @ params.w1[e] + params.b1[e])
            o = np.asarray(a) @ params.w2[e] + params.b2[e]
            acc += float(gates[t, k]) * np.asarray(o)
        outs.append(acc)
    return np.stack(outs)


def make_params(rng, E, d, h):
    return MoEFfnParams(
        w1=jnp.asarray(rng.randn(E, d, h).astype(np.float32) * 0.1),
        b1=jnp.asarray(rng.randn(E, h).astype(np.float32) * 0.1),
        w2=jnp.asarray(rng.randn(E, h, d).astype(np.float32) * 0.1),
        b2=jnp.asarray(rng.randn(E, d).astype(np.float32) * 0.1),
    )


def test_position_in_expert():
    e = jnp.asarray([2, 0, 2, 1, 2, 0], jnp.int32)
    pos = np.asarray(position_in_expert(e, 3))
    np.testing.assert_array_equal(pos, [0, 0, 1, 0, 2, 1])


def test_local_matches_dense_oracle():
    rng = np.random.RandomState(0)
    T, d, h, E, K = 24, 16, 32, 4, 2
    x = jnp.asarray(rng.randn(T, d).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, E, (T, K)).astype(np.int32))
    gates = jnp.asarray(rng.rand(T, K).astype(np.float32))
    params = make_params(rng, E, d, h)

    out = moe_ffn_local(
        x, idx, gates, params, capacity=T * K, compute_dtype=jnp.float32
    )
    expected = dense_oracle(np.asarray(x), np.asarray(idx), np.asarray(gates), params)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_capacity_drop_zeroes_overflow():
    """Tokens routed beyond capacity contribute nothing (static-shape policy)."""
    rng = np.random.RandomState(1)
    T, d, h, E = 16, 8, 8, 2
    x = jnp.asarray(rng.randn(T, d).astype(np.float32))
    idx = jnp.zeros((T, 1), jnp.int32)  # all tokens to expert 0
    gates = jnp.ones((T, 1), jnp.float32)
    params = make_params(rng, E, d, h)
    cap = 8
    out = np.asarray(
        moe_ffn_local(x, idx, gates, params, capacity=cap, compute_dtype=jnp.float32)
    )
    # first `cap` tokens processed, rest exactly zero
    assert np.abs(out[cap:]).max() == 0.0
    assert np.abs(out[:cap]).max() > 0.0


def test_grads_flow_through_dispatch():
    rng = np.random.RandomState(2)
    T, d, h, E, K = 16, 8, 8, 4, 2
    x = jnp.asarray(rng.randn(T, d).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, E, (T, K)).astype(np.int32))
    gates = jnp.asarray(rng.rand(T, K).astype(np.float32))
    params = make_params(rng, E, d, h)

    def loss(p, xx, gg):
        return jnp.sum(
            moe_ffn_local(xx, idx, gg, p, capacity=T * K, compute_dtype=jnp.float32)
            ** 2
        )

    gp, gx, gg = jax.grad(loss, argnums=(0, 1, 2))(params, x, gates)
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(gp))
    assert np.abs(np.asarray(gx)).sum() > 0
    assert np.abs(np.asarray(gg)).sum() > 0
    # every expert that received tokens has nonzero w1 grad
    used = set(np.asarray(idx).flatten().tolist())
    for e in range(E):
        w1g = np.abs(np.asarray(gp.w1[e])).sum()
        assert (w1g > 0) == (e in used)


def test_expert_parallel_matches_local(mesh8):
    """EP over a 2x4 (data, expert) mesh == single-shard result, bit-for-bit
    modulo f32 summation order."""
    rng = np.random.RandomState(3)
    B, N, d, h, E, K = 8, 16, 16, 32, 8, 2
    x = jnp.asarray(rng.randn(B, N, d).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, E, (B, N, K)).astype(np.int32))
    gates = jnp.asarray(rng.rand(B, N, K).astype(np.float32))
    params = make_params(rng, E, d, h)

    ref = moe_ffn(
        x, idx, gates, params, capacity_factor=float(E), compute_dtype=jnp.float32
    )
    ep = jax.jit(
        lambda xx: moe_ffn(
            xx, idx, gates, params,
            mesh=mesh8, expert_axis="expert", batch_axes=("data", "expert"),
            capacity_factor=float(E), compute_dtype=jnp.float32,
        )
    )(x)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(ref), atol=1e-4)


def test_expert_parallel_grads(mesh8):
    rng = np.random.RandomState(4)
    B, N, d, h, E, K = 8, 8, 8, 16, 8, 2
    x = jnp.asarray(rng.randn(B, N, d).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, E, (B, N, K)).astype(np.int32))
    gates = jnp.asarray(rng.rand(B, N, K).astype(np.float32))
    params = make_params(rng, E, d, h)

    def loss_ep(p):
        return jnp.sum(
            moe_ffn(
                x, idx, gates, p,
                mesh=mesh8, expert_axis="expert",
                capacity_factor=float(E), compute_dtype=jnp.float32,
            )
            ** 2
        )

    def loss_local(p):
        return jnp.sum(
            moe_ffn(x, idx, gates, p, capacity_factor=float(E),
                    compute_dtype=jnp.float32) ** 2
        )

    g_ep = jax.jit(jax.grad(loss_ep))(params)
    g_local = jax.grad(loss_local)(params)
    for a, b in zip(jax.tree.leaves(g_ep), jax.tree.leaves(g_local)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


@pytest.mark.parametrize("chunks", [2, 4])
def test_a2a_chunked_exactness(mesh8, chunks):
    """Pipelined EP exchange (a2a_chunks>1) == monolithic exchange, outputs
    AND grads: identical rows/weights per expert, only the a2a is split."""
    rng = np.random.RandomState(5)
    B, N, d, h, E, K = 8, 16, 16, 32, 16, 2  # ep=4 -> E_local=4, chunks<=4
    x = jnp.asarray(rng.randn(B, N, d).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, E, (B, N, K)).astype(np.int32))
    gates = jnp.asarray(rng.rand(B, N, K).astype(np.float32))
    params = make_params(rng, E, d, h)

    def loss(p, xx, n_chunks):
        return jnp.sum(
            moe_ffn(
                xx, idx, gates, p,
                mesh=mesh8, expert_axis="expert",
                capacity_factor=float(E), compute_dtype=jnp.float32,
                a2a_chunks=n_chunks,
            ) ** 2
        )

    out1 = jax.jit(lambda xx: moe_ffn(
        x, idx, gates, params, mesh=mesh8, expert_axis="expert",
        capacity_factor=float(E), compute_dtype=jnp.float32,
        a2a_chunks=1))(x)
    outc = jax.jit(lambda xx: moe_ffn(
        x, idx, gates, params, mesh=mesh8, expert_axis="expert",
        capacity_factor=float(E), compute_dtype=jnp.float32,
        a2a_chunks=chunks))(x)
    np.testing.assert_array_equal(np.asarray(outc), np.asarray(out1))

    g1 = jax.jit(jax.grad(loss), static_argnums=2)(params, x, 1)
    gc = jax.jit(jax.grad(loss), static_argnums=2)(params, x, chunks)
    for a, b in zip(jax.tree.leaves(gc), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_a2a_chunks_nondivisible_falls_back():
    """n_chunks that doesn't divide E_local falls back to a divisor (no
    crash, same result) — exercised via the largest-divisor rule."""
    from m3vit_tpu.moe.dispatch import moe_ffn_expert_parallel  # noqa: F401
    # divisor logic is pure python; assert the rule directly
    for e_local, n, want in [(4, 3, 2), (4, 8, 4), (2, 3, 2), (6, 4, 3)]:
        got = max(c for c in range(1, min(n, e_local) + 1) if e_local % c == 0)
        assert got == want


def test_compute_capacity_static():
    assert compute_capacity(1024, 4, 16, 2.0) >= 512
    assert compute_capacity(1024, 4, 16, 2.0) % 8 == 0


def test_dispatch_plan_invariants():
    """src/dst are inverse permutations (modulo drops); w_slot carries gate
    scores; expert ids >= E (token-variant mask sentinel) never occupy
    capacity."""
    from m3vit_tpu.moe.dispatch import make_dispatch_plan

    rng = np.random.RandomState(3)
    S, E, C = 64, 4, 12
    flat_e = rng.randint(0, E + 1, S).astype(np.int32)  # E == masked sentinel
    scores = rng.rand(S).astype(np.float32)
    plan = make_dispatch_plan(
        jnp.asarray(flat_e), E, C, scores_flat=jnp.asarray(scores)
    )
    src, w, dst = (np.asarray(plan.src_flat), np.asarray(plan.w_slot),
                   np.asarray(plan.dst))

    for s in range(S):
        if flat_e[s] >= E:
            assert dst[s] == E * C  # masked -> dropped
            continue
        if dst[s] < E * C:
            assert dst[s] // C == flat_e[s]  # right expert bucket
            assert src[dst[s]] == s  # inverse mapping
            assert w[dst[s]] == scores[s]  # score rode the sort
    # every filled expert slot points back at a slot routed to that expert
    for j in range(E * C):
        if src[j] < S:
            assert flat_e[src[j]] == j // C
            assert dst[src[j]] == j
        else:
            assert w[j] == 0.0
    # per-expert occupancy == min(count, C), packed from slot 0
    for e in range(E):
        filled = sum(src[e * C:(e + 1) * C] < S)
        assert filled == min((flat_e == e).sum(), C)
        assert all(src[e * C + i] < S for i in range(filled))
