"""Stacked-stream MoE dispatch (moe_ffn_streams) vs per-stream moe_ffn.

The token variant (reference token/vision_transformer_moe.py:743-812) runs
one MoE dispatch per task; moe_ffn_streams folds the T per-task dispatches
of a block into ONE sort/gather/GEMM/combine with per-(stream, expert)
capacity buckets. These tests pin the contract: bitwise-identical outputs
and gradients to the per-stream loop, single-shard and expert-parallel,
including capacity drops and masked (non-compute) routing slots.
"""

import jax
import jax.numpy as jnp
import numpy as np

from m3vit_tpu.moe.dispatch import (
    MoEFfnParams,
    _stream_slot_ids,
    make_dispatch_plan,
    moe_ffn,
    moe_ffn_streams,
)


def make_params(rng, E, d, h):
    return MoEFfnParams(
        w1=jnp.asarray(rng.randn(E, d, h).astype(np.float32) * 0.1),
        b1=jnp.asarray(rng.randn(E, h).astype(np.float32) * 0.1),
        w2=jnp.asarray(rng.randn(E, h, d).astype(np.float32) * 0.1),
        b2=jnp.asarray(rng.randn(E, d).astype(np.float32) * 0.1),
    )


def make_inputs(seed, Ts, S, d, E, K, mask_frac=0.25):
    """Random streams with distinct top-k ids per token and a fraction of
    slots masked to the OOB sentinel E (the token variant's non-compute
    tokens)."""
    rng = np.random.RandomState(seed)
    x = rng.randn(Ts, S, d).astype(np.float32)
    logits = rng.randn(Ts, S, E).astype(np.float32)
    idx = np.argsort(-logits, axis=-1)[..., :K].astype(np.int32)
    gates = rng.rand(Ts, S, K).astype(np.float32)
    masked = rng.rand(Ts, S) < mask_frac
    idx = np.where(masked[..., None], E, idx)
    return jnp.asarray(x), jnp.asarray(idx), jnp.asarray(gates)


def run_loop(x, idx, gates, params, cf, mesh=None, **kw):
    outs = [
        moe_ffn(x[t], idx[t], gates[t], params, capacity_factor=cf,
                compute_dtype=jnp.float32, mesh=mesh, **kw)
        for t in range(x.shape[0])
    ]
    return jnp.stack(outs)


def test_stream_plan_identical_to_per_stream_plans():
    """The virtual-expert plan assigns every routing slot to EXACTLY the
    expert-buffer slot (expert, rank) the per-stream plans would — including
    which slots are dropped at tight capacity and which are masked."""
    Ts, S, E, K = 3, 64, 4, 2
    _, idx, gates = make_inputs(11, Ts, S, 4, E, K)
    idx_np = np.asarray(idx)
    g_np = np.asarray(gates)
    for cap in (8, 16, S):
        sid = jnp.repeat(jnp.arange(Ts, dtype=jnp.int32), S)
        v = _stream_slot_ids(jnp.asarray(idx_np.reshape(Ts * S, K)), sid,
                             E, Ts)
        plan_v = make_dispatch_plan(
            v.reshape(-1), E * Ts, cap,
            scores_flat=jnp.asarray(g_np.reshape(-1)))
        dst_v = np.asarray(plan_v.dst).reshape(Ts, S * K)
        w_v = np.asarray(plan_v.w_slot)
        for t in range(Ts):
            plan_t = make_dispatch_plan(
                jnp.asarray(idx_np[t].reshape(-1)), E, cap,
                scores_flat=jnp.asarray(g_np[t].reshape(-1)))
            dst_t = np.asarray(plan_t.dst)
            sent_v, sent_t = E * Ts * cap, E * cap
            dropped_v = dst_v[t] == sent_v
            np.testing.assert_array_equal(dropped_v, dst_t == sent_t)
            live = ~dropped_v
            q, rank = dst_v[t][live] // cap, dst_v[t][live] % cap
            np.testing.assert_array_equal(q % Ts, t)  # own stream's bucket
            np.testing.assert_array_equal((q // Ts) * cap + rank,
                                          dst_t[live])
            # gate weights ride the sort identically
            np.testing.assert_array_equal(
                w_v[dst_v[t][live]], np.asarray(plan_t.w_slot)[dst_t[live]])


def test_streams_match_per_stream_loop_tight_capacity():
    """Same math per row; float-level agreement at every capacity regime
    (GEMM group shapes differ, so last-ulp blocking noise is allowed —
    slot assignment exactness is pinned by the plan test above)."""
    rng = np.random.RandomState(0)
    Ts, S, d, h, E, K = 3, 64, 16, 32, 4, 2
    x, idx, gates = make_inputs(1, Ts, S, d, E, K)
    params = make_params(rng, E, d, h)
    for cf in (0.5, 1.0, float(E)):
        ref = np.asarray(run_loop(x, idx, gates, params, cf))
        out = np.asarray(
            moe_ffn_streams(x, idx, gates, params, capacity_factor=cf,
                            compute_dtype=jnp.float32))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
        # dropped/masked tokens are exactly zero in both
        np.testing.assert_array_equal(out == 0.0, ref == 0.0)


def test_streams_grads_match_loop():
    rng = np.random.RandomState(2)
    Ts, S, d, h, E, K = 2, 48, 8, 16, 4, 2
    x, idx, gates = make_inputs(3, Ts, S, d, E, K)
    params = make_params(rng, E, d, h)
    cf = 1.0  # drops active

    def loss_streams(p, xx, gg):
        return jnp.sum(
            moe_ffn_streams(xx, idx, gg, p, capacity_factor=cf,
                            compute_dtype=jnp.float32) ** 2)

    def loss_loop(p, xx, gg):
        return jnp.sum(run_loop(xx, idx, gg, p, cf) ** 2)

    gs = jax.grad(loss_streams, argnums=(0, 1, 2))(params, x, gates)
    gl = jax.grad(loss_loop, argnums=(0, 1, 2))(params, x, gates)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_streams_expert_parallel_matches_loop(mesh8):
    """Sharded streams == per-stream sharded calls == unsharded streams."""
    rng = np.random.RandomState(4)
    Ts, S, d, h, E, K = 3, 64, 16, 32, 8, 2
    x, idx, gates = make_inputs(5, Ts, S, d, E, K)
    params = make_params(rng, E, d, h)
    cf = 1.25

    ref_loop = run_loop(x, idx, gates, params, cf, mesh=mesh8,
                        expert_axis="expert",
                        batch_axes=("data", "expert"))
    out = jax.jit(
        lambda xx: moe_ffn_streams(
            xx, idx, gates, params, mesh=mesh8, expert_axis="expert",
            batch_axes=("data", "expert"), capacity_factor=cf,
            compute_dtype=jnp.float32)
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_loop),
                               rtol=1e-6, atol=1e-6)

    # and the sharded result matches the single-shard streams result with
    # the same per-(shard, stream, expert) capacity semantics by summation
    local = moe_ffn_streams(
        x.reshape(Ts, 8, S // 8, d).swapaxes(0, 1).reshape(Ts * S, d)
        .reshape(Ts * 8, S // 8, d),  # shard-major stream blocks
        idx.reshape(Ts, 8, S // 8, K).swapaxes(0, 1).reshape(Ts * 8,
                                                             S // 8, K),
        gates.reshape(Ts, 8, S // 8, K).swapaxes(0, 1).reshape(Ts * 8,
                                                               S // 8, K),
        params, capacity_factor=cf, compute_dtype=jnp.float32)
    local = (local.reshape(8, Ts, S // 8, d).swapaxes(0, 1)
             .reshape(Ts, S, d))
    np.testing.assert_allclose(np.asarray(local), np.asarray(ref_loop),
                               rtol=1e-6, atol=1e-6)


def test_streams_bf16_matches_loop():
    """The bf16 production mode agrees to bf16 resolution (row-independent
    GEMMs with f32 MXU accumulation; group shapes differ so last-ulp
    blocking noise is allowed)."""
    rng = np.random.RandomState(6)
    Ts, S, d, h, E, K = 3, 64, 16, 32, 4, 2
    x, idx, gates = make_inputs(7, Ts, S, d, E, K)
    params = make_params(rng, E, d, h)
    cf = 1.25
    ref = jnp.stack([
        moe_ffn(x[t], idx[t], gates[t], params, capacity_factor=cf,
                compute_dtype=jnp.bfloat16)
        for t in range(Ts)
    ]).astype(jnp.float32)
    out = moe_ffn_streams(x, idx, gates, params, capacity_factor=cf,
                          compute_dtype=jnp.bfloat16).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-3)
