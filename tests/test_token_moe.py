"""Token persistent-sharing variant tests."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from m3vit_tpu.models.heads import VisionTransformerUpHead
from m3vit_tpu.models.token_moe import (
    TokenMultiTaskModel,
    TokenVisionTransformerMoE,
    apply_shared_broadcast,
    sharing_regularization_loss,
    transition_stage,
)

IMG = 64


def test_transition_stage_semantics():
    T, B, N, C = 3, 1, 4, 2
    outs = jnp.arange(T * B * N * C, dtype=jnp.float32).reshape(T, B, N, C)
    # position 0: all 3 tasks agree; position 1: only one -> invalid;
    # position 2: two tasks; position 3: none
    g = jnp.asarray([
        [[0.9, 0.8, 0.7, 0.1]],
        [[0.8, 0.2, 0.0, 0.2]],
        [[0.7, 0.1, 0.9, 0.3]],
    ])
    mask, valid, shared_x, stats = transition_stage(outs, g, gamma=0.5)
    np.testing.assert_array_equal(np.asarray(valid[0]), [True, False, True, False])
    assert bool(mask[0, 0, 0]) and bool(mask[1, 0, 0]) and bool(mask[2, 0, 0])
    assert not bool(mask[1, 0, 2])  # task 1 didn't agree at position 2
    # soft mix at position 0: weights 0.9/0.8/0.7 normalized
    w = np.array([0.9, 0.8, 0.7])
    w = w / w.sum()
    expected = sum(w[t] * np.asarray(outs[t, 0, 0]) for t in range(3))
    np.testing.assert_allclose(np.asarray(shared_x[0, 0]), expected, rtol=1e-4)
    assert float(stats["shared_positions"]) == 2.0

    # broadcast overwrites only participating tasks
    outs2 = apply_shared_broadcast(outs, mask, shared_x)
    np.testing.assert_allclose(np.asarray(outs2[0, 0, 0]), expected, rtol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(outs2[1, 0, 2]), np.asarray(outs[1, 0, 2])
    )


def test_sharing_reg_loss():
    # concentrated sharing (all tasks at every shared position) -> 0 loss
    mask = jnp.zeros((3, 1, 8), bool).at[:, :, :4].set(True)
    assert float(sharing_regularization_loss(mask, 0.01)) == 0.0
    # diffuse: each position shared by only 2 of 3 tasks pairs scattered
    mask2 = jnp.zeros((3, 1, 8), bool)
    mask2 = mask2.at[0, 0, 0].set(True).at[1, 0, 0].set(True)
    mask2 = mask2.at[1, 0, 1].set(True).at[2, 0, 1].set(True)
    mask2 = mask2.at[0, 0, 2].set(True).at[2, 0, 2].set(True)
    # S=3, S_t = 2 each -> S^2=9 < 12 -> 0 ; make it diffuse enough
    val = float(sharing_regularization_loss(mask2, 1.0))
    assert val == 0.0  # 9 - 12 < 0
    mask3 = jnp.zeros((4, 1, 8), bool)
    for i in range(4):
        mask3 = mask3.at[i, 0, 2 * i].set(True)
        mask3 = mask3.at[(i + 1) % 4, 0, 2 * i].set(True)
    # S=4... S_t=2 each -> 16 - 16 = 0; edge case OK
    assert float(sharing_regularization_loss(mask3, 1.0)) == 0.0


def tiny_token_backbone(**kw):
    cfg = dict(
        img_size=(IMG, IMG), patch_size=16, embed_dim=64, depth=2, num_heads=4,
        moe_mlp_ratio=1.0, moe_experts=8, moe_top_k=2, multi_gate=True,
        num_tasks=2, gate_task_specific_dim=16, capacity_factor=8.0,
        eval_capacity_factor=8.0, dtype=jnp.float32, use_checkpointing=False,
    )
    cfg.update(kw)
    return TokenVisionTransformerMoE(**cfg)


def test_token_backbone_forward_and_grads():
    model = tiny_token_backbone()
    x = jax.random.normal(jax.random.key(0), (2, IMG, IMG, 3))
    v = model.init(
        {"params": jax.random.key(1), "gate_noise": jax.random.key(2)},
        x, train=True,
    )
    streams, aux, stats = model.apply(
        v, x, train=True, rngs={"gate_noise": jax.random.key(3)}
    )
    assert set(streams.keys()) == {0, 1}
    assert streams[0].shape == (2, 17, 64)
    assert np.isfinite(float(aux))
    assert "shared_positions" in stats

    def loss(params):
        s, aux, _ = model.apply(
            {"params": params}, x, train=True,
            rngs={"gate_noise": jax.random.key(3)},
        )
        return jnp.mean(s[0] ** 2) + jnp.mean(s[1] ** 2) + 0.01 * aux

    g = jax.grad(loss)(v["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
    # shareability predictor got gradients
    sp = g["block_0"]["share_pred"]["w_gate"]
    assert np.abs(np.asarray(sp)).sum() >= 0  # exists


def test_token_multitask_model():
    backbone = tiny_token_backbone()
    decoders = {
        name: VisionTransformerUpHead(
            img_size=(IMG, IMG), patch_size=16, embed_dim=64, num_classes=c,
            dtype=jnp.float32,
        )
        for name, c in [("semseg", 5), ("edge", 1)]
    }
    model = TokenMultiTaskModel(
        backbone=backbone, decoders=decoders, tasks=["semseg", "edge"]
    )
    x = jnp.ones((1, IMG, IMG, 3))
    v = model.init(
        {"params": jax.random.key(0), "gate_noise": jax.random.key(1)},
        x, train=False,
    )
    (out, aux, _), _ = model.apply(
        v, x, train=True, rngs={"gate_noise": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    assert out["semseg"].shape == (1, IMG, IMG, 5)
    assert out["edge"].shape == (1, IMG, IMG, 1)


def test_relation_conditioned_attention():
    from m3vit_tpu.models.relation_attention import TaskConditionedAttention

    T, B, N, D = 2, 1, 8, 32
    tca = TaskConditionedAttention(num_tasks=T, dim=D, num_heads=4,
                                   attn_num_experts=4, attn_expert_top_k=2,
                                   branch_embed_dim=8)
    outs = jax.random.normal(jax.random.key(0), (T, B, N, D))
    # positions 0-3 shared by both tasks
    mask = jnp.zeros((T, B, N), bool).at[:, :, :4].set(True)
    v = tca.init(jax.random.key(1), outs, mask)
    o = tca.apply(v, outs, mask)
    assert o.shape == (T, B, N, D)
    assert np.isfinite(np.asarray(o)).all()
    # no sharing: neutral branch fully masked, still finite
    o2 = tca.apply(v, outs, None)
    assert np.isfinite(np.asarray(o2)).all()
    # with identical shared inputs at shared positions, the two tasks' outputs
    # at shared positions are identical (single neutral computation)
    shared_outs = outs.at[1, :, :4].set(outs[0, :, :4])
    o3 = tca.apply(v, shared_outs, mask)
    np.testing.assert_allclose(np.asarray(o3[0, :, :4]),
                               np.asarray(o3[1, :, :4]), atol=1e-5)


def test_token_backbone_with_tca():
    model = tiny_token_backbone(use_task_conditioned_attn=True,
                                attn_num_experts=4, branch_embed_dim=8)
    x = jax.random.normal(jax.random.key(0), (1, IMG, IMG, 3))
    v = model.init(
        {"params": jax.random.key(1), "gate_noise": jax.random.key(2)},
        x, train=True,
    )
    assert "branch_embed" in v["params"]["block_0"]["attn"]
    streams, aux, _ = model.apply(
        v, x, train=True, rngs={"gate_noise": jax.random.key(3)}
    )
    assert np.isfinite(np.asarray(streams[0])).all()


def test_token_backbone_expert_parallel(mesh8):
    model = tiny_token_backbone(mesh=mesh8, expert_axis="expert")
    x = jax.random.normal(jax.random.key(0), (8, IMG, IMG, 3))
    v = model.init(
        {"params": jax.random.key(1), "gate_noise": jax.random.key(2)},
        x, train=False,
    )
    from m3vit_tpu.parallel.mesh import batch_sharding, param_shardings

    params = jax.device_put(v["params"], param_shardings(v["params"], mesh8))
    xs = jax.device_put(x, batch_sharding(mesh8))
    streams, aux, _ = jax.jit(
        lambda p, xx: model.apply({"params": p}, xx, train=False)
    )(params, xs)
    assert np.isfinite(np.asarray(streams[0])).all()
    # equal to the unsharded run
    local = tiny_token_backbone(batched_dispatch=True)
    s2, _, _ = local.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(streams[0]), np.asarray(s2[0]),
                               atol=2e-4)


def test_reuse_cache_semantics():
    """reuse_bits: first task in the reuse set computes a token's expert
    output and fills the cache; later tasks reuse it (reference token/
    vision_transformer_moe.py:673-812, where the plumbing is dead)."""
    model = tiny_token_backbone()
    x = jax.random.normal(jax.random.key(10), (2, IMG, IMG, 3))
    v = model.init(
        {"params": jax.random.key(11), "gate_noise": jax.random.key(12)},
        x, train=False,
    )
    base, _, st0 = model.apply(v, x, train=False)

    # explicit zero bitmask == no reuse at all
    zeros = jnp.zeros((2, 17), jnp.int32)
    same, _, st_z = model.apply(v, x, train=False, reuse_bits=zeros)
    for t in base:
        np.testing.assert_allclose(np.asarray(same[t]), np.asarray(base[t]),
                                   atol=1e-6)
    assert float(st_z["reused_tokens"]) == 0.0
    np.testing.assert_allclose(float(st_z["computed_tokens"]),
                               float(st0["computed_tokens"]))

    # all-tasks bitmask: task 0 computes + fills, task 1 reuses everything
    # that is task-specific in both streams
    allbits = jnp.full((2, 17), (1 << 2) - 1, jnp.int32)
    out, _, st = model.apply(v, x, train=False, reuse_bits=allbits)
    assert float(st["reused_tokens"]) > 0
    assert float(st["computed_tokens"]) < float(st0["computed_tokens"])
    # total coverage unchanged: every TS token either computed or reused
    np.testing.assert_allclose(
        float(st["computed_tokens"]) + float(st["reused_tokens"]),
        float(st0["computed_tokens"]),
    )
    for t in out:
        assert np.isfinite(np.asarray(out[t])).all()

    # gradients still flow with reuse active
    def loss(params):
        s, aux, _ = model.apply(
            {"params": params}, x, train=True, reuse_bits=allbits,
            rngs={"gate_noise": jax.random.key(13)},
        )
        return jnp.mean(s[0] ** 2) + jnp.mean(s[1] ** 2) + 0.01 * aux

    g = jax.grad(loss)(v["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_share_pred_temperature_schedule():
    """Schedule math matches the reference (common_config.py:927-957)."""
    import math

    from m3vit_tpu.train.optim import share_pred_temperature

    assert share_pred_temperature({}, 0) is None
    p = {"share_pred_temp_schedule": "cosine", "share_pred_temp_start": 1.5,
         "share_pred_temp_end": 0.5, "share_pred_temp_warmup_epochs": 5,
         "epochs": 100}
    assert share_pred_temperature(p, 0) == 1.5
    assert share_pred_temperature(p, 4) == 1.5  # warmup holds at start
    assert share_pred_temperature(p, 99) == pytest.approx(0.5, abs=1e-9)
    mid = share_pred_temperature(p, 52)  # progress = 0.5
    assert mid == pytest.approx(0.5 + 0.5 * (1.5 - 0.5)
                                * (1 + math.cos(math.pi * 47 / 94)), abs=1e-9)
    p["share_pred_temp_schedule"] = "linear"
    assert share_pred_temperature(p, 52) == pytest.approx(
        1.5 + (0.5 - 1.5) * 47 / 94, abs=1e-9)
    p["share_pred_temp_schedule"] = "bogus"
    with pytest.raises(ValueError):
        # (during warmup the reference returns t_start before validating the
        # schedule name — common_config.py:945-946 — so probe past warmup)
        share_pred_temperature(p, 52)


def test_share_temp_argument_changes_training_forward():
    """A traced temperature override must reach the gumbel softmax: extreme
    temperatures produce different sharing decisions at train time, and the
    same temperature matches the static default bitwise."""
    backbone = tiny_token_backbone()
    decoders = {
        name: VisionTransformerUpHead(
            img_size=(IMG, IMG), patch_size=16, embed_dim=64, num_classes=c,
            dtype=jnp.float32,
        )
        for name, c in [("semseg", 5), ("edge", 1)]
    }
    model = TokenMultiTaskModel(
        backbone=backbone, decoders=decoders, tasks=["semseg", "edge"]
    )
    x = jax.random.normal(jax.random.key(0), (1, IMG, IMG, 3))
    variables = model.init(
        {"params": jax.random.key(1), "gate_noise": jax.random.key(2)},
        x, train=False,
    )

    def run(temp):
        (pred, aux, _), _ = model.apply(
            variables, x, train=True,
            rngs={"gate_noise": jax.random.key(3)},
            mutable=["batch_stats"],
            share_temp=None if temp is None else jnp.float32(temp),
        )
        return pred, aux

    p_default, _ = run(None)  # static temperature field (1.0)
    p_same, _ = run(1.0)
    p_hot, _ = run(100.0)
    for t in p_default:
        np.testing.assert_array_equal(np.asarray(p_default[t]),
                                      np.asarray(p_same[t]))
    diffs = sum(
        float(np.abs(np.asarray(p_default[t]) - np.asarray(p_hot[t])).max())
        for t in p_default
    )
    assert diffs > 0, "temperature had no effect on the training forward"


def test_batched_dispatch_matches_loop():
    """The stacked-stream MoE dispatch (batched_dispatch=True, the default)
    reproduces the per-task loop: same forward streams, same aux loss, same
    gradients — the per-task noise draws and per-(task, expert) capacity
    buckets are preserved exactly (moe_ffn_streams)."""
    model_b = tiny_token_backbone(num_tasks=3, capacity_factor=1.25,
                                  batched_dispatch=True)
    model_l = tiny_token_backbone(num_tasks=3, capacity_factor=1.25,
                                  batched_dispatch=False)
    x = jax.random.normal(jax.random.key(0), (2, IMG, IMG, 3))
    v = model_b.init(
        {"params": jax.random.key(1), "gate_noise": jax.random.key(2)},
        x, train=True,
    )

    def run(model):
        def loss(params):
            s, aux, stats = model.apply(
                {"params": params}, x, train=True,
                rngs={"gate_noise": jax.random.key(3)},
            )
            return (sum(jnp.mean(s[t] ** 2) for t in s) + 0.01 * aux,
                    (s, stats))
        (val, (s, stats)), g = jax.value_and_grad(loss, has_aux=True)(
            v["params"])
        return val, s, stats, g

    val_b, s_b, st_b, g_b = run(model_b)
    val_l, s_l, st_l, g_l = run(model_l)
    for t in s_b:
        np.testing.assert_allclose(np.asarray(s_b[t]), np.asarray(s_l[t]),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(val_b), float(val_l), rtol=1e-6)
    np.testing.assert_allclose(float(st_b["computed_tokens"]),
                               float(st_l["computed_tokens"]))
    np.testing.assert_allclose(float(st_b["dropped_slot_fraction"]),
                               float(st_l["dropped_slot_fraction"]))
    for a, b in zip(jax.tree.leaves(g_b), jax.tree.leaves(g_l)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-6)


def test_batched_dispatch_expert_parallel_matches_local(mesh8):
    """Batched dispatch under an (data, expert) mesh == unsharded result."""
    model = tiny_token_backbone(mesh=mesh8, expert_axis="expert",
                                batched_dispatch=True)
    x = jax.random.normal(jax.random.key(0), (8, IMG, IMG, 3))
    v = model.init(
        {"params": jax.random.key(1), "gate_noise": jax.random.key(2)},
        x, train=False,
    )
    from m3vit_tpu.parallel.mesh import batch_sharding, param_shardings

    params = jax.device_put(v["params"], param_shardings(v["params"], mesh8))
    xs = jax.device_put(x, batch_sharding(mesh8))
    streams, _, _ = jax.jit(
        lambda p, xx: model.apply({"params": p}, xx, train=False)
    )(params, xs)
    local = tiny_token_backbone()
    s2, _, _ = local.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(streams[0]), np.asarray(s2[0]),
                               atol=2e-4)
