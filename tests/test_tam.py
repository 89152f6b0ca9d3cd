"""TAM fusion tests: module shapes, head feature taps, model + loss wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from m3vit_tpu.losses.functions import loss_fn_for_task
from m3vit_tpu.losses.schemes import multi_task_loss
from m3vit_tpu.models import MultiTaskModel, VisionTransformerMoE
from m3vit_tpu.models.heads import VisionTransformerUpHead
from m3vit_tpu.models.tam import TamModule

IMG = 64
TASKS = ["semseg", "edge"]
NUM_OUT = {"semseg": 5, "edge": 1}


def test_tam_module_shapes():
    feats = {t: jnp.ones((2, 16, 16, 256)) for t in TASKS}
    tam = TamModule(tasks=tuple(TASKS), input_channels=256, num_outputs=NUM_OUT)
    variables = tam.init(jax.random.key(0), feats, train=False)
    out, _ = tam.apply(variables, feats, train=True, mutable=["batch_stats"])
    assert out["semseg"].shape == (2, 16, 16, 5)
    assert out["edge"].shape == (2, 16, 16, 1)


def test_head_returns_tam_features_in_train():
    head = VisionTransformerUpHead(
        img_size=(IMG, IMG), patch_size=16, embed_dim=64, num_classes=5,
        return_tam_features=True, dtype=jnp.float32,
    )
    toks = jnp.ones((1, 17, 64))
    variables = head.init(jax.random.key(0), toks, train=False)
    ret, _ = head.apply(variables, toks, train=True, mutable=["batch_stats"])
    pred, f0, f1, f2 = ret
    assert pred.shape == (1, IMG, IMG, 5)
    # features at 8x, 16x, 32x of the 4x4 token grid
    assert f0.shape == (1, 8, 8, 256)
    assert f1.shape == (1, 16, 16, 256)
    assert f2.shape == (1, 32, 32, 256)
    # eval path returns just the prediction
    pred_eval = head.apply(variables, toks, train=False)
    assert pred_eval.shape == (1, IMG, IMG, 5)


def test_multitask_model_with_tam_and_loss():
    backbone = VisionTransformerMoE(
        img_size=(IMG, IMG), patch_size=16, embed_dim=64, depth=2, num_heads=4,
        moe_mlp_ratio=1.0, moe_experts=8, moe_top_k=2, multi_gate=True,
        num_tasks=2, capacity_factor=8.0, dtype=jnp.float32,
        use_checkpointing=False,
    )
    decoders = {
        t: VisionTransformerUpHead(
            img_size=(IMG, IMG), patch_size=16, embed_dim=64,
            num_classes=NUM_OUT[t], return_tam_features=True,
            dtype=jnp.float32,
        )
        for t in TASKS
    }
    model = MultiTaskModel(
        backbone=backbone, decoders=decoders, tasks=TASKS, multi_gate=True,
        tam=True, tam_levels=(True, False, True), num_outputs=NUM_OUT,
    )
    x = jnp.ones((1, IMG, IMG, 3))
    variables = model.init(
        {"params": jax.random.key(0), "gate_noise": jax.random.key(1)},
        x, train=True,
    )
    (out, cv, _), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"gate_noise": jax.random.key(2)},
    )
    assert "tam_level0_semseg" in out and "tam_level2_edge" in out
    assert "tam_level1_semseg" not in out  # disabled level
    assert out["tam_level0_semseg"].shape == (1, IMG, IMG, 5)

    # loss scheme consumes the tam keys
    gt = {
        "semseg": jnp.zeros((1, IMG, IMG, 1)),
        "edge": jnp.zeros((1, IMG, IMG, 1)),
    }
    fns = {t: loss_fn_for_task(t, {"edge_w": 0.95}) for t in TASKS}
    losses = multi_task_loss(out, gt, TASKS, fns, {"semseg": 1.0, "edge": 50.0})
    assert "tam_level0_semseg" in losses
    assert np.isfinite(float(losses["total"]))

    # eval: no tam outputs
    (out_e, _, _), _ = model.apply(
        variables, x, train=False, mutable=["batch_stats"]
    )
    assert not any(k.startswith("tam_") for k in out_e)
