"""Reference rank-sharded checkpoint-directory import (round-3 VERDICT #3).

Fabricates a 2-rank ``{rank}.pth`` directory with the ACTUAL reference
``save_moe_model_to_dir`` / ``filter_state`` / ``read_specific_group_experts``
(utils/moe_utils.py:128-198, torch.distributed rank/barrier patched), then
round-trips it through ``load_reference_checkpoint`` and verifies (a) the
merged state dict is bitwise-identical to the world-size-1 truth, (b) the
merged weights drive our flax backbone to forward parity with the reference
model, and (c) ``validate_reference_moe_checkpoint`` enforces the
``meta.expert_format`` rules (moe_utils.py:34-106).
"""

import os
import sys
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from test_reference_parity import (  # noqa: E402  (tests dir on sys.path)
    _convert_backbone_sd,
    _load_reference_backbone_module,
)

REF_MOE_UTILS = "/root/reference/utils/moe_utils.py"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF_MOE_UTILS), reason="reference tree not mounted"
)

IMG, D, DEPTH, HEADS, E, K = 64, 64, 2, 4, 8, 2
WORLD = 2


def _load_reference_moe_utils():
    import importlib

    _load_reference_backbone_module()  # installs fmoe/timm stubs
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    return importlib.import_module("utils.moe_utils")


def _truth_model_and_sd(seed=5):
    vtm = _load_reference_backbone_module()
    torch.manual_seed(seed)
    ref = vtm.VisionTransformerMoE(
        model_name="tiny_shard", img_size=IMG, patch_size=16, embed_dim=D,
        depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0, qkv_bias=True,
        drop_rate=0.0, moe_mlp_ratio=1, moe_experts=E, moe_top_k=K,
        world_size=1, moe_gate_type="noisy_vmoe", vmoe_noisy_std=1.0,
        random_init=True, use_checkpointing=False,
    )
    ref.eval()
    return ref, ref.state_dict()


def _fabricate_rank_dir(tmp_path, full_sd):
    """Write the 2-rank reference-format directory with the actual reference
    save path: rank-local expert slices via read_specific_group_experts,
    rank>0 filtered to expert keys by save_moe_model_to_dir itself."""
    mu = _load_reference_moe_utils()
    ckpt_dir = str(tmp_path / "checkpoint.pth.tar")
    e_local = E // WORLD
    for rank in range(WORLD):
        local_sd = mu.read_specific_group_experts(
            {k: v.clone() for k, v in full_sd.items()}, rank, e_local
        )
        state = {
            "state_dict": local_sd,
            "epoch": 3,
            "meta": {"expert_format": "local" if WORLD > 1 else "global"},
            "args": {"world_size": WORLD, "moe_experts": E},
        }
        with mock.patch.object(torch.distributed, "get_rank",
                               lambda r=rank: r), \
             mock.patch.object(torch.distributed, "barrier", lambda: None):
            mu.save_moe_model_to_dir(state, ckpt_dir)
    return ckpt_dir


def test_sharded_dir_merge_is_exact(tmp_path):
    from m3vit_tpu.utils.torch_interop import load_reference_checkpoint

    _, full_sd = _truth_model_and_sd()
    ckpt_dir = _fabricate_rank_dir(tmp_path, full_sd)
    assert sorted(os.listdir(ckpt_dir)) == ["0.pth", "1.pth"]

    ckpt, merged = load_reference_checkpoint(ckpt_dir)
    assert ckpt["epoch"] == 3
    assert set(merged) == {k for k in full_sd}
    for k, v in full_sd.items():
        np.testing.assert_array_equal(
            merged[k], v.numpy(), err_msg=k
        )


def test_sharded_dir_roundtrip_forward_parity(tmp_path):
    """Merged directory -> converted params -> our backbone forward matches
    the reference model's forward (eval, deterministic routing)."""
    from m3vit_tpu.models.vit_moe import VisionTransformerMoE
    from m3vit_tpu.utils.torch_interop import (
        load_reference_checkpoint,
        merge_into,
        validate_reference_moe_checkpoint,
    )

    ref, full_sd = _truth_model_and_sd()
    ckpt_dir = _fabricate_rank_dir(tmp_path, full_sd)
    ckpt, merged_sd = load_reference_checkpoint(ckpt_dir)
    validate_reference_moe_checkpoint(ckpt, merged_sd, E, ckpt_dir)

    params = _convert_backbone_sd(merged_sd, DEPTH)
    ours = VisionTransformerMoE(
        img_size=(IMG, IMG), patch_size=16, embed_dim=D, depth=DEPTH,
        num_heads=HEADS, mlp_ratio=4.0, qkv_bias=True, moe_mlp_ratio=1.0,
        moe_experts=E, moe_top_k=K, capacity_factor=8.0,
        eval_capacity_factor=8.0, dtype=jnp.float32,
        multi_gate=False, num_tasks=0, use_checkpointing=False,
    )
    rng = np.random.RandomState(9)
    x = rng.randn(2, IMG, IMG, 3).astype(np.float32)
    template = ours.init(
        {"params": jax.random.key(0), "gate_noise": jax.random.key(1)},
        jnp.asarray(x), train=False,
    )["params"]
    merged, missing = merge_into(template, params)
    assert not missing, f"unconverted params: {missing}"

    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out, _, _ = ours.apply({"params": merged}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=5e-5)


def test_validate_expert_format_rules():
    from m3vit_tpu.utils.torch_interop import (
        validate_reference_moe_checkpoint,
    )

    sd = {"blocks.1.mlp.experts.htoh4.weight": np.zeros((E, 64, 64))}
    # meta global + matching dim0: ok
    validate_reference_moe_checkpoint({"meta": {"expert_format": "global"}},
                                      sd, E)
    # meta global + wrong dim0: raises
    with pytest.raises(ValueError, match="inconsistent"):
        validate_reference_moe_checkpoint(
            {"meta": {"expert_format": "global"}}, sd, 2 * E)
    # meta local: always raises
    with pytest.raises(ValueError, match="rank-local"):
        validate_reference_moe_checkpoint(
            {"meta": {"expert_format": "local"}}, sd, E)
    # no meta, args heuristic: dim0 * world == global -> rank-local shard
    with pytest.raises(ValueError, match="rank-local"):
        validate_reference_moe_checkpoint(
            {"args": {"world_size": 2, "moe_experts": 2 * E}}, sd, 2 * E)
    # no meta, matching dim0: ok
    validate_reference_moe_checkpoint({}, sd, E)
    # no meta, mismatched dim0: raises
    with pytest.raises(ValueError, match="Cannot verify"):
        validate_reference_moe_checkpoint({}, sd, 2 * E)
    # module.-prefixed keys (DDP save) are recognized too
    sd_pref = {"module.backbone.blocks.1.mlp.experts.h4toh.weight":
               np.zeros((E, 64, 64))}
    validate_reference_moe_checkpoint({}, sd_pref, E)
    # no expert tensors at all: nothing to validate
    validate_reference_moe_checkpoint({}, {"pos_embed": np.zeros((1, 5, 8))},
                                      E)


def test_single_file_checkpoint_still_loads(tmp_path):
    """A plain single-file save keeps working through the same entry point,
    and DDP 'module.' prefixes are stripped."""
    from m3vit_tpu.utils.torch_interop import load_reference_checkpoint

    path = str(tmp_path / "single.pth")
    torch.save({"state_dict": {"module.pos_embed": torch.arange(6.0)},
                "epoch": 7}, path)
    ckpt, sd = load_reference_checkpoint(path)
    assert ckpt["epoch"] == 7
    np.testing.assert_array_equal(sd["pos_embed"], np.arange(6.0))


def test_params_to_reference_sd_roundtrip():
    """The inverse converter (our params -> reference state dict) must
    round-trip bitwise through the forward converters, including multi-gate
    stacking, expert transposes, conv OIHW, and BN running stats."""
    from m3vit_tpu.models.heads import VisionTransformerUpHead
    from m3vit_tpu.models.multitask import MultiTaskModel
    from m3vit_tpu.models.vit_moe import VisionTransformerMoE
    from m3vit_tpu.utils.torch_interop import (
        params_to_reference_sd,
        reference_mtl_sd_to_params,
    )

    TASKS = ["semseg", "sal"]
    T = len(TASKS)
    backbone = VisionTransformerMoE(
        img_size=(IMG, IMG), patch_size=16, embed_dim=D, depth=DEPTH,
        num_heads=HEADS, mlp_ratio=4.0, qkv_bias=True, moe_mlp_ratio=1.0,
        moe_experts=E, moe_top_k=K, capacity_factor=8.0,
        eval_capacity_factor=8.0, dtype=jnp.float32,
        multi_gate=True, num_tasks=T,
    )
    decoders = {
        t: VisionTransformerUpHead(img_size=(IMG, IMG), patch_size=16,
                                   embed_dim=D, num_classes=c,
                                   dtype=jnp.float32)
        for t, c in zip(TASKS, (21, 1))
    }
    model = MultiTaskModel(backbone=backbone, decoders=decoders, tasks=TASKS,
                           multi_gate=True)
    x = np.zeros((1, IMG, IMG, 3), np.float32)
    v = model.init(
        {"params": jax.random.key(3), "gate_noise": jax.random.key(4)},
        jnp.asarray(x), train=True,
    )
    sd = params_to_reference_sd(v["params"], v.get("batch_stats"), TASKS,
                                multi_gate_tasks=T)
    back_p, back_bs = reference_mtl_sd_to_params(sd, TASKS, DEPTH,
                                                 multi_gate_tasks=T)

    def assert_tree_equal(a, b, path=""):
        if isinstance(a, dict):
            assert set(a) == set(b), (path, set(a) ^ set(b))
            for k in a:
                assert_tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=path)

    assert_tree_equal(v["params"], back_p)
    for t in TASKS:
        assert_tree_equal(v["batch_stats"][f"decoders_{t}"],
                          back_bs[f"decoders_{t}"], t)


def test_export_reference_ckpt_cli(tmp_path):
    """scripts/export_reference_ckpt.py: our Orbax checkpoint -> reference
    .pth (global) AND {rank}.pth dir.  The global file must strict-load into
    the ACTUAL reference backbone (every key matched) and reproduce our
    model's forward; the sharded dir must re-import bitwise."""
    import yaml

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import export_reference_ckpt

    from m3vit_tpu.config import create_config
    from m3vit_tpu.data.synthetic import synthetic_batch
    from m3vit_tpu.models.factory import build_model
    from m3vit_tpu.train.optim import build_optimizer
    from m3vit_tpu.train.state import create_train_state
    from m3vit_tpu.utils.checkpoint import save_checkpoint
    from m3vit_tpu.utils.torch_interop import (
        load_reference_checkpoint,
        reference_mtl_sd_to_params,
    )

    exp = {
        "setup": "multi_task",
        "train_db_name": "PASCALContext",
        "val_db_name": "PASCALContext",
        "train_scale": [IMG, IMG], "test_scale": [IMG, IMG],
        "trBatch": 1, "valBatch": 1, "epochs": 1,
        "optimizer": "sgd", "optimizer_kwargs": {"lr": 0.01},
        "scheduler": "poly",
        "model": "baseline",
        "backbone": "VisionTransformer_moe",
        "backbone_kwargs": {
            "model_name": "tiny_export", "img_size": [IMG, IMG],
            "patch_size": 16, "embed_dim": D, "depth": DEPTH,
            "num_heads": HEADS, "moe_mlp_ratio": 1, "mlp_ratio": 4,
        },
        "head": "VisionTransformerUpHead",
        "head_kwargs": {"embed_dim": D, "img_size": [IMG, IMG],
                        "patch_size": 16},
        "moe_experts": E, "moe_top_k": K, "multi_gate": False,
        "compute_dtype": "float32", "moe_capacity_factor": 8.0,
        "task_dictionary": {"include_semseg": True, "include_edge": True,
                            "edge_w": 0.95},
        "loss_kwargs": {"loss_weights": {"semseg": 1.0, "edge": 50.0}},
    }
    exp_file = tmp_path / "exp.yml"
    exp_file.write_text(yaml.safe_dump(exp))

    # build + save a state through the production path
    p = create_config(None, str(exp_file), make_dirs=False)
    model = build_model(p, mesh=None)
    batch = synthetic_batch(jax.random.key(0), p["TASKS"], 1, (IMG, IMG))
    tx = build_optimizer(p, steps_per_epoch=1)
    state = create_train_state(model, jax.random.key(7), batch, tx)
    ckp_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckp_dir, state, 0, {"epoch": 0})

    # ---- single global file ----
    out_pth = str(tmp_path / "mtl_global.pth")
    export_reference_ckpt.main([
        "--config_exp", str(exp_file), "--ckp", ckp_dir, "--out", out_pth,
    ])
    ckpt = torch.load(out_pth, map_location="cpu", weights_only=False)
    assert ckpt["meta"]["expert_format"] == "global"

    # strict-load the backbone into the ACTUAL reference model
    vtm = _load_reference_backbone_module()
    ref = vtm.VisionTransformerMoE(
        model_name="tiny_export", img_size=IMG, patch_size=16, embed_dim=D,
        depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0, qkv_bias=True,
        drop_rate=0.0, moe_mlp_ratio=1, moe_experts=E, moe_top_k=K,
        world_size=1, moe_gate_type="noisy_vmoe", vmoe_noisy_std=1.0,
        random_init=True, use_checkpointing=False,
    )
    bb_sd = {k[len("backbone."):]: v
             for k, v in ckpt["state_dict"].items()
             if k.startswith("backbone.")}
    missing, unexpected = ref.load_state_dict(bb_sd, strict=False)
    assert not unexpected, f"keys the reference does not know: {unexpected}"
    assert not missing, f"reference keys we did not export: {missing}"
    ref.eval()
    x = np.random.RandomState(3).randn(2, IMG, IMG, 3).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours_bb = model.backbone
    out, _, _ = ours_bb.apply(
        {"params": state.params["backbone"]}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=5e-5)

    # ---- 2-rank sharded dir: bitwise re-import ----
    out_dir = str(tmp_path / "mtl_sharded.pth.tar")
    export_reference_ckpt.main([
        "--config_exp", str(exp_file), "--ckp", ckp_dir, "--out", out_dir,
        "--ranks", "2",
    ])
    _, merged = load_reference_checkpoint(out_dir)
    tasks = [t.name for t in p["TASKS"]]
    back_p, back_bs = reference_mtl_sd_to_params(merged, tasks, DEPTH)
    flat_a = jax.tree_util.tree_leaves_with_path(state.params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back_p))
    for path, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v, np.float32),
                                      np.asarray(flat_b[path], np.float32),
                                      err_msg=str(path))
