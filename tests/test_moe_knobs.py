"""Research-knob tests: expert masking, pruning surgery, task expert windows,
sem-forced routing, score pruning."""

import jax
import jax.numpy as jnp
import numpy as np

from m3vit_tpu.models.vit_moe import (
    VisionTransformerMoE,
    build_sem_force_routing,
    patch_majority_labels,
)
from m3vit_tpu.moe.gating import noisy_vmoe_gate
from m3vit_tpu.moe.pruning import prune_experts_in_params, select_top_experts

IMG = 64


def tiny(**kw):
    cfg = dict(
        img_size=(IMG, IMG), patch_size=16, embed_dim=64, depth=2, num_heads=4,
        moe_mlp_ratio=1.0, moe_experts=8, moe_top_k=2, multi_gate=True,
        num_tasks=2, capacity_factor=8.0, eval_capacity_factor=8.0,
        dtype=jnp.float32, use_checkpointing=False,
    )
    cfg.update(kw)
    return VisionTransformerMoE(**cfg)


def _init(model, x, **kw):
    return model.init(
        {"params": jax.random.key(0), "gate_noise": jax.random.key(1)},
        x, task_id=jnp.asarray(0), train=False, **kw,
    )


def test_expert_mask_restricts_routing():
    x = jax.random.normal(jax.random.key(0), (64, 8))
    w = jax.random.normal(jax.random.key(1), (8, 8))
    mask = jnp.asarray([True, False, True, False, True, False, True, False])
    g = noisy_vmoe_gate(x, w, top_k=2, noise_std=1.0, train=False,
                        expert_mask=mask)
    used = np.unique(np.asarray(g.top_k_indices))
    assert set(used.tolist()) <= {0, 2, 4, 6}


def test_expert_mask_through_backbone():
    model = tiny()
    x = jax.random.normal(jax.random.key(2), (1, IMG, IMG, 3))
    v = _init(model, x)
    mask = jnp.zeros(8, bool).at[:2].set(True)
    out, _, stats = model.apply(v, x, task_id=jnp.asarray(0), train=False,
                                expert_mask=mask)
    hist = np.asarray(stats["expert_load_hist"])
    assert hist[2:].sum() == 0 and hist[:2].sum() > 0


def test_prune_params_surgery_matches_masked_model():
    """Slicing experts+gate columns == masking, for tokens routed within the
    kept set."""
    model8 = tiny()
    x = jax.random.normal(jax.random.key(3), (1, IMG, IMG, 3))
    v8 = _init(model8, x)
    keep = np.array([0, 1, 2, 5])
    mask = jnp.zeros(8, bool).at[jnp.asarray(keep)].set(True)
    out_masked, _, _ = model8.apply(v8, x, task_id=jnp.asarray(0),
                                    train=False, expert_mask=mask)

    params4 = prune_experts_in_params(
        v8["params"], {"block_1": keep}
    )
    model4 = tiny(moe_experts=4)
    out_pruned, _, _ = model4.apply({"params": params4}, x,
                                    task_id=jnp.asarray(0), train=False)
    np.testing.assert_allclose(np.asarray(out_pruned), np.asarray(out_masked),
                               atol=1e-4)


def test_select_top_experts():
    usage = [np.array([0.1, 0.5, 0.05, 0.35])]
    sel = select_top_experts(usage, keep=2)
    np.testing.assert_array_equal(sel[0], [1, 3])


def test_regu_experts_fromtask_windows():
    model = tiny(regu_experts_fromtask=True, num_experts_pertask=4,
                 multi_gate=False, num_tasks=2)
    x = jax.random.normal(jax.random.key(4), (1, IMG, IMG, 3))
    v = _init(model, x)
    # task 0 -> experts [0,4); task 1 -> offset 0 + int(1*(8-4)/1)=4 -> [4,8)
    _, _, s0 = model.apply(v, x, task_id=jnp.asarray(0), train=False)
    _, _, s1 = model.apply(v, x, task_id=jnp.asarray(1), train=False)
    h0 = np.asarray(s0["expert_load_hist"])
    h1 = np.asarray(s1["expert_load_hist"])
    # stats histograms are windowed (size 4); routing itself is offset —
    # verify windows are disjoint by checking the gate stats shapes
    assert h0.shape == (4,) and h1.shape == (4,)


def test_expert_prune_threshold():
    model = tiny(expert_prune=True, prune_threshold=0.99)
    x = jax.random.normal(jax.random.key(5), (1, IMG, IMG, 3))
    v = _init(model, x)
    out, _, _ = model.apply(v, x, task_id=jnp.asarray(0), train=False)
    # with threshold ~1.0 every score zeroes out -> MoE blocks contribute 0,
    # output still finite (residual path)
    assert np.isfinite(np.asarray(out)).all()


def test_patch_majority_labels():
    sem = np.full((1, 32, 32), 255, np.float32)
    sem[0, :16, :16] = 3  # patch (0,0) all class 3
    sem[0, :16, 16:] = np.tile([1, 2], (16, 8))  # 50/50 -> above 40% for both
    labels = np.asarray(patch_majority_labels(jnp.asarray(sem), 16))
    assert labels[0, 0, 0] == 3
    assert labels[0, 1, 0] == 255  # all-ignore patch


def test_build_sem_force_routing():
    patch = jnp.asarray([[3, 255, 17]])  # class 3 -> group 3; 17 -> group 1
    idx, mask = build_sem_force_routing(patch, top_k=2, num_prefix=1)
    assert idx.shape == (1, 4, 2) and mask.shape == (1, 4)
    assert not bool(mask[0, 0])  # cls token never forced
    assert bool(mask[0, 1]) and not bool(mask[0, 2]) and bool(mask[0, 3])
    np.testing.assert_array_equal(np.asarray(idx[0, 1]), [6, 7])
    np.testing.assert_array_equal(np.asarray(idx[0, 3]), [2, 3])


def test_sem_force_through_backbone():
    model = tiny(sem_force=True, multi_gate=False, num_tasks=2)
    x = jax.random.normal(jax.random.key(6), (1, IMG, IMG, 3))
    sem = jnp.zeros((1, IMG, IMG), jnp.float32)  # all class 0 -> group 0
    v = _init(model, x, sem=sem)
    out, _, stats = model.apply(v, x, task_id=jnp.asarray(0), train=False,
                                sem=sem)
    assert np.isfinite(np.asarray(out)).all()


def test_regu_sem_and_subimage_losses():
    model = tiny(regu_sem=True, regu_subimage=True, multi_gate=False,
                 num_tasks=2)
    x = jax.random.normal(jax.random.key(7), (1, IMG, IMG, 3))
    sem = jnp.zeros((1, IMG, IMG), jnp.float32)
    v = _init(model, x, sem=sem)
    _, _, stats = model.apply(
        v, x, task_id=jnp.asarray(0), train=True, sem=sem,
        rngs={"gate_noise": jax.random.key(8)},
    )
    assert "semregu_loss" in stats and "regu_subimage_loss" in stats
    assert np.isfinite(float(stats["semregu_loss"]))
    # 4x4 patch grid < 5x5 subimage window -> loss degenerates to 0
    assert float(stats["regu_subimage_loss"]) == 0.0

    # non-degenerate subimage loss on a 10x10 grid
    from m3vit_tpu.models.vit_moe import _regu_subimage_loss

    logits = jax.random.normal(jax.random.key(9), (2, 100, 8))
    val = float(_regu_subimage_loss(logits, 5))
    assert np.isfinite(val) and val > 0.0

    # losses are differentiable wrt gate params
    def loss(params):
        _, _, st = model.apply(
            {"params": params}, x, task_id=jnp.asarray(0), train=True,
            sem=sem, rngs={"gate_noise": jax.random.key(8)},
        )
        return st["semregu_loss"] + st["regu_subimage_loss"]

    g = jax.grad(loss)(v["params"])
    wg = np.abs(np.asarray(g["block_1"]["mlp"]["w_gate"])).sum()
    assert np.isfinite(wg)


def test_regu_experts_window_narrowing_matches_reference():
    """E=16, npt=8, T=3 -> starts [0,4,12]; task 2's window overflows E and
    must NARROW to experts [12,16) exactly like the reference's torch slice
    (noisy_gate_vmoe.py:88), never route out of range."""
    model = tiny(moe_experts=16, regu_experts_fromtask=True,
                 num_experts_pertask=8, multi_gate=False, num_tasks=3)
    x = jax.random.normal(jax.random.key(10), (1, IMG, IMG, 3))
    v = _init(model, x)

    # capture routing by instrumenting through stats of each task
    for tid, allowed in [(0, set(range(0, 8))), (1, set(range(4, 12))),
                         (2, set(range(12, 16)))]:
        # run and make sure output is finite and nonzero MoE contribution
        out, _, stats = model.apply(v, x, task_id=jnp.asarray(tid),
                                    train=False)
        assert np.isfinite(np.asarray(out)).all()
        hist = np.asarray(stats["expert_load_hist"])  # size npt window
        # all tokens routed (top_k=2 -> total = 2 * n_tokens); nothing dropped
        assert hist.sum() == 2 * 17
        if tid == 2:
            # narrowed window: only the last E-start=4 columns usable
            assert hist[:4].sum() == 0, hist


def test_regu_experts_train_mode_cv_loss():
    """Regression: the cv loss must handle the NARROWED gate width (npt < E)
    in train mode — statistics span the window, not moe_experts."""
    model = tiny(regu_experts_fromtask=True, num_experts_pertask=4,
                 multi_gate=True, num_tasks=2)
    x = jax.random.normal(jax.random.key(30), (1, IMG, IMG, 3))
    v = _init(model, x)
    _, cv, _ = model.apply(v, x, task_id=jnp.asarray(0), train=True,
                           rngs={"gate_noise": jax.random.key(31)})
    assert np.isfinite(float(cv)) and float(cv) >= 0.0

    def loss(params):
        _, cv, _ = model.apply({"params": params}, x, task_id=jnp.asarray(1),
                               train=True,
                               rngs={"gate_noise": jax.random.key(32)})
        return cv

    g = jax.grad(loss)(v["params"])
    assert np.isfinite(np.asarray(g["block_1"]["mlp"]["w_gate"])).all()
