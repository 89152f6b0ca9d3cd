"""End-to-end train-step tests: overfit a tiny MoE multi-task model, and run
the full sharded step on the virtual (data, expert) mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from m3vit_tpu.data.synthetic import synthetic_batch
from m3vit_tpu.losses.functions import loss_fn_for_task
from m3vit_tpu.models import MultiTaskModel, VisionTransformerMoE
from m3vit_tpu.models.heads import VisionTransformerUpHead
from m3vit_tpu.parallel.mesh import batch_sharding, shard_train_state
from m3vit_tpu.tasks import TaskSpec
from m3vit_tpu.train.optim import build_optimizer
from m3vit_tpu.train.state import create_train_state
from m3vit_tpu.train.step import make_eval_step, make_train_step

IMG = 32

TASKS = [
    TaskSpec("semseg", 5, "nearest", "nearest", "softmax_ce"),
    TaskSpec("edge", 1, "nearest", "linear", "balanced_bce"),
]
P_STUB = {"edge_w": 0.95}
LOSS_FNS = {t.name: loss_fn_for_task(t.name, P_STUB) for t in TASKS}
WEIGHTS = {"semseg": 1.0, "edge": 50.0}


def build_tiny_model(mesh=None, expert_axis=None):
    backbone = VisionTransformerMoE(
        img_size=(IMG, IMG), patch_size=16, embed_dim=64, depth=2, num_heads=4,
        moe_mlp_ratio=1.0, moe_experts=8, moe_top_k=2, multi_gate=True,
        num_tasks=len(TASKS), capacity_factor=8.0, eval_capacity_factor=8.0,
        dtype=jnp.float32, use_checkpointing=True, mesh=mesh,
        expert_axis=expert_axis,
    )
    decoders = {
        t.name: VisionTransformerUpHead(
            img_size=(IMG, IMG), patch_size=16, embed_dim=64,
            num_classes=t.num_output, dtype=jnp.float32,
        )
        for t in TASKS
    }
    return MultiTaskModel(
        backbone=backbone, decoders=decoders, tasks=[t.name for t in TASKS],
        multi_gate=True,
    )


def make_p():
    return {
        "optimizer": "sgd",
        "optimizer_kwargs": {"lr": 0.05, "momentum": 0.9, "weight_decay": 1e-4},
        "scheduler": "poly",
        "epochs": 10,
    }


def test_overfit_synthetic():
    model = build_tiny_model()
    batch = synthetic_batch(jax.random.key(0), TASKS, 2, (IMG, IMG))
    # random per-pixel labels are unlearnable through a 16x-upsampling head;
    # overfit a spatially-constant target instead
    batch["semseg"] = jnp.stack(
        [jnp.full((IMG, IMG, 1), 1.0), jnp.full((IMG, IMG, 1), 3.0)]
    )
    batch["edge"] = jnp.stack(
        [jnp.zeros((IMG, IMG, 1)), jnp.ones((IMG, IMG, 1))]
    )
    tx = build_optimizer(make_p(), steps_per_epoch=10)
    state = create_train_state(model, jax.random.key(1), batch, tx)
    step = make_train_step(model, [t.name for t in TASKS], LOSS_FNS, WEIGHTS,
                           cv_weight=0.01, donate=False)

    state, m0 = step(state, batch, jax.random.key(2))
    first = float(m0["loss_total"])
    for _ in range(25):
        state, m = step(state, batch, jax.random.key(2))
    last = float(m["loss_total"])
    assert np.isfinite(last)
    assert last < 0.7 * first, f"no overfit: {first} -> {last}"

    # eval produces all task outputs at image resolution
    eval_step = make_eval_step(model, [t.name for t in TASKS])
    pred = eval_step(state, batch)
    assert pred["semseg"].shape == (2, IMG, IMG, 5)
    assert pred["edge"].shape == (2, IMG, IMG, 1)


def test_sharded_train_step(mesh8):
    """Full train step with experts sharded over the mesh's expert axis and
    the batch over both axes."""
    model = build_tiny_model(mesh=mesh8, expert_axis="expert")
    batch = synthetic_batch(jax.random.key(0), TASKS, 8, (IMG, IMG))
    tx = build_optimizer(make_p(), steps_per_epoch=10)
    state = create_train_state(model, jax.random.key(1), batch, tx)
    state = shard_train_state(state, mesh8)

    bsh = batch_sharding(mesh8)
    batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}

    step = make_train_step(model, [t.name for t in TASKS], LOSS_FNS, WEIGHTS,
                           donate=False)
    state, m0 = step(state, batch, jax.random.key(2))
    l0 = float(m0["loss_total"])
    for _ in range(10):
        state, m = step(state, batch, jax.random.key(2))
    l1 = float(m["loss_total"])
    assert np.isfinite(l1) and l1 < l0

    # expert params actually live sharded over the expert axis
    w1 = state.params["backbone"]["block_1"]["mlp"]["experts_w1"]
    spec = w1.sharding.spec
    assert spec[0] == "expert", spec


def test_gradient_accumulation_equivalence():
    """optax.MultiSteps(k=2) over two half-batches == one full-batch step
    (for loss = mean over batch, SGD no-momentum)."""
    import optax

    from m3vit_tpu.losses.functions import softmax_ce_loss

    p = {"optimizer": "sgd", "optimizer_kwargs": {"lr": 0.1},
         "scheduler": "poly", "epochs": 100}
    model = build_tiny_model()
    batch = synthetic_batch(jax.random.key(0), TASKS, 4, (IMG, IMG))

    # full batch, no accumulation
    tx_full = build_optimizer(p, steps_per_epoch=1000)
    s_full = create_train_state(model, jax.random.key(1), batch, tx_full)
    step = make_train_step(model, [t.name for t in TASKS], LOSS_FNS, WEIGHTS,
                           donate=False)
    s_full2, _ = step(s_full, batch, jax.random.key(9))

    # accumulate over the SAME full batch twice (identical grads) -> same update
    p2 = dict(p, accumulation_steps=2)
    tx_acc = build_optimizer(p2, steps_per_epoch=1000)
    s_acc = create_train_state(model, jax.random.key(1), batch, tx_acc)
    step_acc = make_train_step(model, [t.name for t in TASKS], LOSS_FNS,
                               WEIGHTS, donate=False)
    # force identical rng per micro-step so grads match the full-batch step
    s_acc = s_acc.replace(step=s_full.step)
    s_acc1, _ = step_acc(s_acc, batch, jax.random.key(9))
    s_acc1 = s_acc1.replace(step=s_acc.step)  # same fold_in for microstep 2
    s_acc2, _ = step_acc(s_acc1, batch, jax.random.key(9))

    a = jax.tree.leaves(s_full2.params)
    b = jax.tree.leaves(s_acc2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_poly_schedule_epoch_constant():
    """LR constant within an epoch, poly-decayed across epochs
    (reference adjust_learning_rate, common_config.py:914-916)."""
    from m3vit_tpu.train.optim import poly_lr

    sched = poly_lr(0.01, epochs=10, steps_per_epoch=100)
    assert float(sched(0)) == float(sched(99))
    assert float(sched(100)) == float(sched(199))
    expected_e1 = 0.01 * (1 - 1 / 10) ** 0.9
    assert abs(float(sched(100)) - expected_e1) < 1e-9
    assert float(sched(900)) < float(sched(100))


def test_dropped_slot_fraction_stat():
    model = build_tiny_model()
    batch = synthetic_batch(jax.random.key(0), TASKS, 2, (IMG, IMG))
    variables = model.init(
        {"params": jax.random.key(1), "gate_noise": jax.random.key(2)},
        batch["image"], train=False,
    )
    (_, _, stats), _ = model.apply(
        variables, batch["image"], train=False, mutable=["batch_stats"]
    )
    frac = float(stats["dropped_slot_fraction"])
    # capacity_factor 8.0 in the tiny model -> nothing dropped
    assert frac == 0.0


def test_one_by_one_matches_joint_gradients():
    """--one_by_one: sum of per-task grads == the joint step's grads (exact
    with gate noise off; reference train_utils.py:370-421 equivalence)."""
    from m3vit_tpu.train.step import make_one_by_one_train_step

    backbone = VisionTransformerMoE(
        img_size=(IMG, IMG), patch_size=16, embed_dim=64, depth=2,
        num_heads=4, moe_mlp_ratio=1.0, moe_experts=8, moe_top_k=2,
        multi_gate=True, num_tasks=len(TASKS), capacity_factor=8.0,
        eval_capacity_factor=8.0, dtype=jnp.float32, use_checkpointing=False,
        vmoe_noisy_std=0.0,
    )
    decoders = {
        t.name: VisionTransformerUpHead(
            img_size=(IMG, IMG), patch_size=16, embed_dim=64,
            num_classes=t.num_output, dtype=jnp.float32,
        )
        for t in TASKS
    }
    model = MultiTaskModel(
        backbone=backbone, decoders=decoders,
        tasks=[t.name for t in TASKS], multi_gate=True,
    )
    batch = synthetic_batch(jax.random.key(0), TASKS, 2, (IMG, IMG))
    tx = build_optimizer(
        {"optimizer": "sgd",
         "optimizer_kwargs": {"lr": 0.01, "momentum": 0.9,
                              "weight_decay": 0.0},
         "scheduler": "poly", "epochs": 2},
        steps_per_epoch=2,
    )
    state = create_train_state(model, jax.random.key(1), batch, tx)
    rng = jax.random.key(2)

    # joint grads
    names = [t.name for t in TASKS]

    def joint_loss(params):
        (pred, cv, _), _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["image"], train=True,
            rngs={"gate_noise": jax.random.key(3),
                  "dropout": jax.random.key(4)},
            mutable=["batch_stats"],
        )
        total = 0.01 * cv
        for t in names:
            total = total + WEIGHTS[t] * LOSS_FNS[t](pred[t], batch[t])
        return total

    joint_grads = jax.grad(joint_loss)(state.params)

    grad_fns, apply_fn = make_one_by_one_train_step(
        model, names, LOSS_FNS, WEIGHTS, cv_weight=0.01
    )
    acc = None
    for t in names:
        g, m, bs = grad_fns[t](state, batch, rng)
        acc = g if acc is None else jax.tree.map(jnp.add, acc, g)
        assert np.isfinite(float(m["loss_total"]))

    flat_j = jax.tree_util.tree_leaves_with_path(joint_grads)
    flat_o = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(acc)
    )
    for path, vj in flat_j:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(flat_o[key]), np.asarray(vj), atol=5e-5,
            err_msg=key,
        )

    # apply_fn advances the state
    state2 = apply_fn(state, acc, {})
    assert int(state2.step) == 1


def test_analysis_metrics_and_gate_internals(monkeypatch):
    """analysis_metrics=True adds the reference's analysis namespace
    aggregates to the step metrics, and M3VIT_LOG_GATE_INTERNALS adds the
    full-distribution gate internals (reference noisy_gate_vmoe.py:209-244);
    the default step's metric tree is UNCHANGED (compile-cache safety)."""
    monkeypatch.setenv("M3VIT_LOG_GATE_INTERNALS", "1")
    model = build_tiny_model()
    batch = synthetic_batch(jax.random.key(0), TASKS, 2, (IMG, IMG))
    tx = build_optimizer(make_p(), steps_per_epoch=4)
    state = create_train_state(model, jax.random.key(1), batch, tx)

    step = make_train_step(model, [t.name for t in TASKS], LOSS_FNS, WEIGHTS,
                           donate=False, analysis_metrics=True)
    _, m = step(state, batch, jax.random.key(2))
    E = 8
    assert m["expert_load_hist"].shape == (E,)
    for k in ("gate_entropy_mean", "top1_prob_mean", "dead_expert_ratio",
              "expert_load_cv", "gate_full_entropy_mean", "gate_pmax_mean",
              "topk_group_count_mean"):
        assert np.isfinite(float(m[k])), k
    # full-softmax entropy >= sparse top-k entropy; pmax in (0, 1];
    # distinct groups within [1, K]
    assert float(m["gate_full_entropy_mean"]) >= \
        float(m["gate_entropy_mean"]) - 1e-6
    assert 0.0 < float(m["gate_pmax_mean"]) <= 1.0
    assert 1.0 <= float(m["topk_group_count_mean"]) <= 2.0

    # default step: no analysis keys (bench program stays byte-identical)
    monkeypatch.delenv("M3VIT_LOG_GATE_INTERNALS")
    step_plain = make_train_step(model, [t.name for t in TASKS], LOSS_FNS,
                                 WEIGHTS, donate=False)
    _, mp = step_plain(state, batch, jax.random.key(2))
    assert "gate_entropy_mean" not in mp and "expert_load_hist" not in mp
