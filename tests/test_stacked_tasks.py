"""Stacked multi-gate fusion: one [T*B] backbone pass must reproduce the
sequential one-pass-per-task loop (reference models/models.py:299-320) —
same outputs, same per-task-summed cv loss, same aggregated stats."""

import jax
import jax.numpy as jnp
import numpy as np

from m3vit_tpu.models.multitask import MultiTaskModel
from m3vit_tpu.models.heads import VisionTransformerUpHead
from m3vit_tpu.models.vit_moe import VisionTransformerMoE
from m3vit_tpu.moe.gating import GateOutput, moe_aux_loss, noisy_vmoe_gate

IMG = 64
T = 3


def backbone(**kw):
    cfg = dict(
        img_size=(IMG, IMG), patch_size=16, embed_dim=64, depth=2, num_heads=4,
        moe_mlp_ratio=1.0, moe_experts=8, moe_top_k=2, multi_gate=True,
        num_tasks=T, capacity_factor=8.0, eval_capacity_factor=8.0,
        dtype=jnp.float32, use_checkpointing=False,
    )
    cfg.update(kw)
    return VisionTransformerMoE(**cfg)


def test_stacked_backbone_matches_sequential_eval():
    model = backbone()
    x = jax.random.normal(jax.random.key(0), (2, IMG, IMG, 3))
    v = model.init(
        {"params": jax.random.key(1), "gate_noise": jax.random.key(2)},
        x, task_id=jnp.asarray(0), train=False,
    )
    stacked, _, st_stats = model.apply(
        v, x, task_id=jnp.arange(T), train=False, stacked_tasks=True
    )
    assert stacked.shape[0] == T * 2
    per_task = stacked.reshape(T, 2, *stacked.shape[1:])
    agg = None
    for t in range(T):
        seq, _, st = model.apply(v, x, task_id=jnp.asarray(t), train=False)
        np.testing.assert_allclose(
            np.asarray(per_task[t]), np.asarray(seq), atol=2e-5,
            err_msg=f"task {t}",
        )
        agg = st if agg is None else jax.tree.map(lambda a, b: a + b, agg, st)
    # aggregated stats are token sums -> identical across the two forms
    np.testing.assert_allclose(
        np.asarray(st_stats["expert_load_hist"]),
        np.asarray(agg["expert_load_hist"]),
    )
    np.testing.assert_allclose(
        float(st_stats["gate_entropy_sum"]),
        float(agg["gate_entropy_sum"]), rtol=1e-5,
    )


def test_stacked_cv_loss_matches_sequential_sum():
    # noise_std=0 keeps train-mode routing deterministic: the segmented cv
    # must equal the sum of per-pass cv losses exactly
    model = backbone(vmoe_noisy_std=0.0)
    x = jax.random.normal(jax.random.key(3), (2, IMG, IMG, 3))
    v = model.init(
        {"params": jax.random.key(4), "gate_noise": jax.random.key(5)},
        x, task_id=jnp.asarray(0), train=False,
    )
    rngs = {"gate_noise": jax.random.key(6)}
    _, cv_stacked, _ = model.apply(
        v, x, task_id=jnp.arange(T), train=True, stacked_tasks=True,
        rngs=rngs,
    )
    cv_seq = 0.0
    for t in range(T):
        _, cv, _ = model.apply(v, x, task_id=jnp.asarray(t), train=True,
                               rngs=rngs)
        cv_seq += float(cv)
    np.testing.assert_allclose(float(cv_stacked), cv_seq, rtol=1e-5)


def test_stacked_cv_gradients_flow_to_every_gate():
    model = backbone(vmoe_noisy_std=0.0)
    x = jax.random.normal(jax.random.key(7), (2, IMG, IMG, 3))
    v = model.init(
        {"params": jax.random.key(8), "gate_noise": jax.random.key(9)},
        x, task_id=jnp.asarray(0), train=False,
    )

    def loss(params):
        _, cv, _ = model.apply(
            {"params": params}, x, task_id=jnp.arange(T), train=True,
            stacked_tasks=True, rngs={"gate_noise": jax.random.key(10)},
        )
        return cv

    g = jax.grad(loss)(v["params"])
    wg = np.asarray(g["block_1"]["mlp"]["w_gate"])  # [T, d, E]
    for t in range(T):
        assert np.abs(wg[t]).sum() > 0, f"no cv grad for task {t} gate"


def test_multitask_model_stacked_flag_end_to_end():
    tasks = ["semseg", "sal", "edge"]
    bb = backbone()
    decs = {
        t: VisionTransformerUpHead(img_size=(IMG, IMG), embed_dim=64,
                                   num_classes=c)
        for t, c in zip(tasks, [5, 1, 1])
    }
    m_seq = MultiTaskModel(backbone=bb, decoders=decs, tasks=tasks,
                           multi_gate=True)
    m_stk = MultiTaskModel(backbone=bb, decoders=decs, tasks=tasks,
                           multi_gate=True, stacked_tasks=True)
    x = jax.random.normal(jax.random.key(11), (2, IMG, IMG, 3))
    v = m_seq.init(
        {"params": jax.random.key(12), "gate_noise": jax.random.key(13)},
        x, train=False,
    )
    # identical parameter trees -> checkpoints interchangeable
    v2 = m_stk.init(
        {"params": jax.random.key(12), "gate_noise": jax.random.key(13)},
        x, train=False,
    )
    assert jax.tree.structure(v) == jax.tree.structure(v2)

    out_seq, _, _ = m_seq.apply(v, x, train=False)
    out_stk, _, _ = m_stk.apply(v, x, train=False)
    assert set(out_seq) == set(out_stk)
    for t in tasks:
        np.testing.assert_allclose(
            np.asarray(out_stk[t]), np.asarray(out_seq[t]), atol=2e-4,
            err_msg=t,
        )


def test_moe_aux_loss_segments_equals_per_segment_sum():
    rng = jax.random.key(14)
    k1, k2, k3 = jax.random.split(rng, 3)
    E, K, S, n = 8, 2, 3, 20
    x = jax.random.normal(k1, (S * n, 16))
    w = jax.random.normal(k2, (16, E)) * 0.1
    gate = noisy_vmoe_gate(x, w, top_k=K, noise_std=1.0, train=True, rng=k3)
    seg_loss = float(moe_aux_loss(gate, K, E, True, segments=S))
    total = 0.0
    for s in range(S):
        sl = slice(s * n, (s + 1) * n)
        sub = GateOutput(
            top_k_indices=gate.top_k_indices[sl],
            top_k_gates=gate.top_k_gates[sl],
            clean_logits=gate.clean_logits[sl],
            noisy_logits=gate.noisy_logits[sl],
            noise_stddev=gate.noise_stddev,
            top_logits=gate.top_logits[sl],
            gates=None,
        )
        total += float(moe_aux_loss(sub, K, E, True))
    np.testing.assert_allclose(seg_loss, total, rtol=1e-5)


def test_stacked_tasks_with_expert_parallel_mesh(mesh8):
    """The stacked [T*B] pass composes with the all_to_all expert-parallel
    shard_map (the production pod path): outputs match the unsharded stacked
    run and the stacked batch shards evenly over (data, expert)."""
    from m3vit_tpu.parallel.mesh import batch_sharding, param_shardings

    # input B must divide the 8-device mesh; T*B = 4*8 = 32 stacked rows
    Tn, B = 4, 8
    model = backbone(num_tasks=Tn, moe_experts=8)
    model_ep = backbone(num_tasks=Tn, moe_experts=8, mesh=mesh8,
                        expert_axis="expert")
    x = jax.random.normal(jax.random.key(20), (B, IMG, IMG, 3))
    v = model.init(
        {"params": jax.random.key(21), "gate_noise": jax.random.key(22)},
        x, task_id=jnp.asarray(0), train=False,
    )
    ref, _, _ = model.apply(v, x, task_id=jnp.arange(Tn), train=False,
                            stacked_tasks=True)

    shardings = param_shardings(v["params"], mesh8)
    v_sh = {"params": jax.device_put(v["params"], shardings)}
    x_sh = jax.device_put(x, batch_sharding(mesh8))

    @jax.jit
    def fwd(vv, xx):
        out, cv, _ = model_ep.apply(vv, xx, task_id=jnp.arange(Tn),
                                    train=False, stacked_tasks=True)
        return out, cv

    out, cv = fwd(v_sh, x_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
