"""No-drop capacity mode: provably never drops a routing slot.

The reference's fastmoe dispatch is ragged and never drops tokens
(ckpt/custom_moe_layer.py:263-265).  Our static capacity may; NO_DROP
(capacity == tokens-per-shard) is the smallest static capacity that cannot,
because top-k expert ids are distinct per token.  These tests pin:
  * the capacity arithmetic + config parsing,
  * bit-parity with the dense oracle under ADVERSARIAL routing (every token
    to one expert) locally and over an 8-device (data, expert) mesh,
  * the exact dropped_slot_fraction stat emitted by MoEMlp,
  * the eval-time guard that refuses to score a run that dropped slots.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3vit_tpu.moe.dispatch import (
    NO_DROP,
    compute_capacity,
    moe_ffn,
    parse_capacity_factor,
)

from tests.test_dispatch import dense_oracle, make_params


def test_parse_capacity_factor():
    assert parse_capacity_factor(1.25) == 1.25
    assert parse_capacity_factor("2.0") == 2.0
    assert parse_capacity_factor("nodrop") == NO_DROP
    assert parse_capacity_factor("NoDrop") == NO_DROP
    assert parse_capacity_factor("inf") == NO_DROP
    with pytest.raises(ValueError):
        parse_capacity_factor("bogus")


def test_nodrop_capacity_bounds():
    for T in (7, 64, 1025, 8200):
        cap = compute_capacity(T, 4, 16, NO_DROP)
        assert cap >= T and cap % 8 == 0
    # finite factors are clamped to the no-drop bound (anything above is
    # pure HBM waste: one expert can receive at most T slots per shard)
    assert compute_capacity(100, 4, 2, 100.0) == compute_capacity(100, 4, 2,
                                                                  NO_DROP)
    assert compute_capacity(1024, 4, 16, 2.0) == 520  # unclamped region


def test_nodrop_matches_oracle_adversarial_routing():
    """Every token to expert 0 with K=2 duplicated second choice: the worst
    case for capacity.  NO_DROP must still be bit-parity with the oracle."""
    rng = np.random.RandomState(0)
    T, d, h, E, K = 40, 16, 32, 4, 2
    x = jnp.asarray(rng.randn(T, d).astype(np.float32))
    idx = jnp.concatenate(
        [jnp.zeros((T, 1), jnp.int32), jnp.ones((T, 1), jnp.int32)], axis=1
    )
    gates = jnp.asarray(rng.rand(T, K).astype(np.float32))
    params = make_params(rng, E, d, h)

    out = moe_ffn(x, idx, gates, params, capacity_factor=NO_DROP,
                  compute_dtype=jnp.float32)
    expected = dense_oracle(np.asarray(x), np.asarray(idx),
                            np.asarray(gates), params)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_nodrop_expert_parallel_adversarial(mesh8):
    """All tokens of every shard route to one global expert; NO_DROP EP over
    the 2x4 mesh must equal the single-shard result."""
    rng = np.random.RandomState(1)
    B, N, d, h, E, K = 8, 16, 16, 32, 8, 2
    x = jnp.asarray(rng.randn(B, N, d).astype(np.float32))
    idx = jnp.broadcast_to(jnp.asarray([3, 5], jnp.int32), (B, N, K))
    gates = jnp.asarray(rng.rand(B, N, K).astype(np.float32))
    params = make_params(rng, E, d, h)

    ref = moe_ffn(x, idx, gates, params, capacity_factor=NO_DROP,
                  compute_dtype=jnp.float32)
    ep = jax.jit(
        lambda xx: moe_ffn(
            xx, idx, gates, params,
            mesh=mesh8, expert_axis="expert", batch_axes=("data", "expert"),
            capacity_factor=NO_DROP, compute_dtype=jnp.float32,
        )
    )(x)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(ref), atol=1e-4)


def _run_moe_mlp(capacity_factor, train, top_k=2, E=4, B=2, N=32, C=16):
    from m3vit_tpu.models.vit_moe import MoEMlp

    m = MoEMlp(
        num_experts=E, d_hidden=24, top_k=top_k, vmoe_noisy_std=0.0,
        capacity_factor=capacity_factor, eval_capacity_factor=capacity_factor,
        dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.key(0), (B, N, C), jnp.float32)
    variables = m.init(
        {"params": jax.random.key(1), "gate_noise": jax.random.key(2)},
        x, None, None, train,
    )
    out, gate, regu = m.apply(
        variables, x, None, None, train,
        rngs={"gate_noise": jax.random.key(3)},
    )
    return out, gate, regu, (B * N, top_k, E)


def test_dropped_slot_fraction_exact():
    """The stat equals the hand-computed overflow of the final routing ids
    against the dispatch capacity."""
    out, gate, regu, (T, K, E) = _run_moe_mlp(0.25, train=True)
    cap = compute_capacity(T, K, E, 0.25)
    hist = np.bincount(np.asarray(gate.top_k_indices).reshape(-1),
                       minlength=E)
    expected = np.maximum(hist - cap, 0).sum() / (T * K)
    got = float(regu["dropped_slot_fraction"])
    assert got == pytest.approx(expected, abs=1e-6)
    assert expected > 0  # cf=0.25 with K=2 must actually overflow
    assert float(regu["moe_stat_count"]) == 1.0


def test_nodrop_stat_is_zero():
    for train in (True, False):
        _, _, regu, _ = _run_moe_mlp(NO_DROP, train=train)
        assert float(regu["dropped_slot_fraction"]) == 0.0


def test_eval_drop_guard():
    from m3vit_tpu.evaluation.orchestrate import _DropGuard

    g = _DropGuard({})
    g.update({"dropped_slot_fraction": jnp.asarray(0.0)})
    g.check()  # zero drops: fine

    g = _DropGuard({})
    g.update({"dropped_slot_fraction": jnp.asarray(0.01)})
    with pytest.raises(RuntimeError, match="nodrop"):
        g.check()

    g = _DropGuard({"allow_eval_drops": True})
    g.update({"dropped_slot_fraction": jnp.asarray(0.01)})
    g.check()  # explicit override

    g = _DropGuard({})
    g.update({})  # dense model: no MoE stats
    g.check()


def test_eval_step_carries_stats():
    """make_eval_step(with_stats=True) surfaces the dropped-slot stat the
    CLI's _DropGuard consumes."""
    from m3vit_tpu.models.multitask import MultiTaskModel
    from m3vit_tpu.models.heads import VisionTransformerUpHead
    from m3vit_tpu.models.vit_moe import VisionTransformerMoE
    from m3vit_tpu.train.step import make_eval_step

    model = MultiTaskModel(
        backbone=VisionTransformerMoE(
            img_size=(32, 32), patch_size=16, embed_dim=32, depth=2,
            num_heads=2, moe_experts=4, moe_top_k=2, multi_gate=True,
            num_tasks=2, eval_capacity_factor=NO_DROP, dtype=jnp.float32,
            use_checkpointing=False,
        ),
        decoders={
            t: VisionTransformerUpHead(img_size=(32, 32), patch_size=16,
                                       embed_dim=32, num_classes=3,
                                       dtype=jnp.float32)
            for t in ("semseg", "sal")
        },
        tasks=["semseg", "sal"],
        multi_gate=True,
    )
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "gate_noise": jax.random.key(1)},
        img, train=False,
    )

    from typing import Any, NamedTuple

    class S(NamedTuple):
        params: Any
        batch_stats: Any

    step = make_eval_step(model, ["semseg", "sal"], with_stats=True)
    pred, stats = step(
        S(variables["params"], variables.get("batch_stats", {})),
        {"image": img},
    )
    assert set(pred) == {"semseg", "sal"}
    assert float(stats["dropped_slot_fraction"]) == 0.0
    assert float(stats["moe_stat_count"]) == 2.0  # 1 MoE block x 2 tasks
