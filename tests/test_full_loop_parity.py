"""Full-loop cross-framework METRIC parity on fabricated data (VERDICT r2 #1).

The trajectory tests prove 20 isolated SGD steps match; this test proves the
WHOLE loop composes: both frameworks read the SAME fabricated PASCAL_MT tree
from disk, train multi-epoch from converted identical weights with identical
batch order, write predictions to disk with their own save protocols, score
them with their own from-disk evaluators, and the final task metrics + Δm
must agree within the 0.5% budget.

Reference stack actually executed here:
  * data/pascal_context.py PASCALContext + custom_transforms + collate_mil
  * models.models.MultiTaskModel (ckpt MoE backbone, fastmoe stubbed)
  * losses.loss_schemes.MultiTaskLoss + get_loss-equivalent criteria
    (utils/common_config.py:780-825) + 0.01 * cv loss
    (train_fastmoe.py:118, train/train_utils.py:429-447)
  * coupled-WD SGD + per-epoch poly LR (utils/common_config.py:904-925)
  * evaluation/evaluate_utils.py save_model_predictions (:276-358) and
    eval_all_results (:361-429) with the real per-task from-disk scorers

Skipped when the reference tree is not mounted.
"""

import importlib
import json
import os
import sys

import cv2
import numpy as np
import pytest
import scipy.io as sio
import torch
from PIL import Image

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "evaluation")),
    reason="reference tree not mounted",
)

import jax  # noqa: E402  (conftest pins CPU + 8 virtual devices)
import jax.numpy as jnp  # noqa: E402

from tests.test_data_pipeline import _make_parts_mat  # noqa: E402
from tests.test_reference_parity import (  # noqa: E402
    _convert_backbone_sd,
    _install_mmcv_stub,
    _load_reference_backbone_module,
)
from tests.test_reference_parity import (  # noqa: E402
    _convert_pup_head_sd,
)

# ---------------------------------------------------------------------------
# fabricated PASCAL_MT tree: 4 images, per-image original sizes, all 5 tasks;
# image index 2 has NO person (exercises the human-parts skip protocol,
# reference eval_human_parts.py:37-40)
# ---------------------------------------------------------------------------

IDS = ["2010_000001", "2010_000002", "2010_000003", "2010_000004"]
SIZES = [(48, 64), (56, 40), (40, 48), (64, 56)]  # (H, W) originals
IMG = 64  # train/test scale
TASKS = ["semseg", "human_parts", "sal", "normals", "edge"]
N_CLS = {"semseg": 21, "human_parts": 7, "sal": 1, "normals": 3, "edge": 1}
WEIGHTS = {"semseg": 1.0, "human_parts": 2.0, "sal": 5.0, "normals": 10.0,
           "edge": 50.0}
EDGE_W = 0.95
B, EPOCHS = 2, 3
LR, MOM, WD, CVW = 0.003, 0.9, 1e-4, 0.01


def _blocky(rng, h, w, n_cls, block=8):
    """Spatially coherent random label map (metrics stay non-degenerate)."""
    small = rng.randint(0, n_cls, ((h + block - 1) // block,
                                   (w + block - 1) // block))
    return np.kron(small, np.ones((block, block), small.dtype))[:h, :w]


@pytest.fixture(scope="module")
def fab_tree(tmp_path_factory):
    parent = tmp_path_factory.mktemp("dbroot")
    root = parent / "PASCAL_MT"
    rng = np.random.RandomState(0)
    for d in ["JPEGImages", "pascal-context/trainval", "human_parts",
              "semseg/pascal-context", "normals_distill", "sal_distill",
              "ImageSets/Context", "ImageSets/Parts"]:
        os.makedirs(root / d)

    for i, (im_id, (h, w)) in enumerate(zip(IDS, SIZES)):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(img).save(root / "JPEGImages" / f"{im_id}.jpg")
        # context LabelMap: blocky classes; 3 is normals-valid, 5 is not
        label_map = np.where(_blocky(rng, h, w, 2) > 0, 3, 5).astype(np.uint16)
        sio.savemat(root / "pascal-context" / "trainval" / f"{im_id}.mat",
                    {"LabelMap": label_map})
        inst = np.zeros((h, w), bool)
        inst[h // 4:3 * h // 4, w // 4:3 * w // 4] = True
        part = np.zeros((h, w), bool)
        part[h // 4:h // 2, w // 4:3 * w // 4] = True
        if i != 2:  # image 2 has no person
            _make_parts_mat(root / "human_parts" / f"{im_id}.mat", inst, part)
        else:
            # .mat must exist (ctor asserts) but contains no person object
            _make_parts_mat(root / "human_parts" / f"{im_id}.mat",
                            np.zeros((h, w), bool), np.zeros((h, w), bool))
        sem = _blocky(rng, h, w, N_CLS["semseg"]).astype(np.uint8)
        sem[rng.rand(h, w) < 0.05] = 255
        Image.fromarray(sem).save(
            root / "semseg" / "pascal-context" / f"{im_id}.png")
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            root / "normals_distill" / f"{im_id}.png")
        sal = (255 * (_blocky(rng, h, w, 2) > 0)).astype(np.uint8)
        Image.fromarray(sal).save(root / "sal_distill" / f"{im_id}.png")

    for split in ("train", "val"):
        with open(root / "ImageSets" / "Context" / f"{split}.txt", "w") as f:
            f.write("\n".join(IDS))
        parts = {im_id: ([15, 3] if i != 2 else [3])
                 for i, im_id in enumerate(IDS)}
        with open(root / "ImageSets" / "Parts" / f"{split}.txt", "w") as f:
            json.dump(parts, f)
    # marker so the reference ctor's _download() early-returns
    (parent / "PASCAL_MT.tgz").touch()
    return str(parent), str(root)


# ---------------------------------------------------------------------------
# reference plumbing
# ---------------------------------------------------------------------------


class _RefTasks:
    pass


class _RefP(dict):
    """Minimal stand-in for the reference's easydict config (easydict is not
    installed here); evaluate_utils accesses both p['k'] and p.k."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


_CV2 = {"nearest": cv2.INTER_NEAREST, "linear": cv2.INTER_LINEAR,
        "cubic": cv2.INTER_CUBIC}


def _setup_reference(fab_tree):
    """Point the reference's MyPath at the fabricated tree BEFORE importing
    its data modules (the dataset ctor's default root binds at import)."""
    parent, root = fab_tree
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if "skimage" not in sys.modules:
        # skimage is not installed here; the reference only uses
        # skimage.morphology.thin for the edge GT (pascal_context.py:19,294).
        # Our pure-numpy Zhang-Suen implementation was written to match it,
        # so BOTH frameworks thin edges identically in this test (the edge
        # task still exercises loss/training parity end-to-end).
        import types as _types

        from m3vit_tpu.data.pascal_context import zhang_suen_thin

        sk = _types.ModuleType("skimage")
        morph = _types.ModuleType("skimage.morphology")
        morph.thin = lambda a: zhang_suen_thin(np.asarray(a)).astype(bool)
        sk.morphology = morph
        sys.modules["skimage"] = sk
        sys.modules["skimage.morphology"] = morph
    if "torchvision" not in sys.modules:
        # torchvision is not installed; the reference only uses
        # transforms.ToTensor (uint8 HWC -> f32 CHW / 255) and
        # transforms.Normalize (custom_transforms.py:277,311)
        import types as _types

        class _ToTensor:
            def __call__(self, a):
                t = torch.from_numpy(np.ascontiguousarray(
                    np.asarray(a).transpose(2, 0, 1)))
                return t.float().div(255.0) if t.dtype == torch.uint8 \
                    else t.float()

        class _Normalize:
            def __init__(self, mean, std):
                self.mean = torch.tensor(mean).view(-1, 1, 1)
                self.std = torch.tensor(std).view(-1, 1, 1)

            def __call__(self, t):
                return (t - self.mean) / self.std

        tv = _types.ModuleType("torchvision")
        tfm = _types.ModuleType("torchvision.transforms")
        tfm.ToTensor = _ToTensor
        tfm.Normalize = _Normalize
        tv.transforms = tfm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tfm
    from utils.mypath import MyPath

    MyPath.set_path_config({"db_root_dir": parent,
                            "dataset_roots": {"PASCAL_MT": root}})
    for mod in ("data.pascal_context", "data.custom_transforms"):
        if mod in sys.modules:
            importlib.reload(sys.modules[mod])


def _ref_transforms():
    """The reference's deterministic (val-style) transform stack, used for
    BOTH train and val so the two frameworks see identical batches
    (utils/common_config.py:616-630 minus the random aug)."""
    import data.custom_transforms as ctr

    flagvals = {"image": cv2.INTER_CUBIC, "semseg": cv2.INTER_NEAREST,
                "human_parts": cv2.INTER_NEAREST, "sal": cv2.INTER_NEAREST,
                "normals": cv2.INTER_CUBIC, "edge": cv2.INTER_NEAREST}
    res = {k: (IMG, IMG) for k in flagvals}
    steps = [
        ctr.FixedResize(resolutions=res, flagvals=flagvals),
        ctr.AddIgnoreRegions(), ctr.ToTensor(),
        ctr.Normalize([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    ]

    def compose(sample):
        for s in steps:
            sample = s(sample)
        return sample

    return compose


def _build_ref_model(vtm, T):
    """Flagship-semantics model at tiny scale (multi-gate ckpt MoE backbone +
    per-task PUP heads), exactly like the trajectory tests."""
    import importlib as il

    _install_mmcv_stub()
    vuh = il.import_module("models.heads.vit_up_head")
    ref_models = il.import_module("models.models")

    d, depth, heads, E, K = 64, 2, 4, 8, 2
    torch.manual_seed(17)
    backbone = vtm.VisionTransformerMoE(
        model_name="tiny_fullloop", img_size=IMG, patch_size=16, embed_dim=d,
        depth=depth, num_heads=heads, mlp_ratio=4.0, qkv_bias=True,
        drop_rate=0.0, moe_mlp_ratio=1, moe_experts=E, moe_top_k=K,
        world_size=1, moe_gate_type="noisy_vmoe", vmoe_noisy_std=0.0,
        random_init=True, use_checkpointing=True,
        multi_gate=True, gate_dim=d + T,
    )
    decoders = torch.nn.ModuleDict({
        t: vuh.VisionTransformerUpHead(
            img_size=(IMG, IMG), patch_size=16, embed_dim=d, num_conv=4,
            num_upsampe_layer=4, p={}, in_channels=d, channels=256,
            num_classes=N_CLS[t],
        ) for t in TASKS
    })
    p_ref = {"multi_gate": True, "use_cv_loss": True,
             "use_checkpointing": True}
    model = ref_models.MultiTaskModel(backbone, decoders, TASKS, p=p_ref)
    model.train()
    # widen gate-logit margins (see trajectory test: near-tie top-k flips
    # under f32 drift make the comparison chaotic otherwise)
    with torch.no_grad():
        for name, prm in model.named_parameters():
            if name.endswith("w_gate"):
                prm.mul_(4.0)
    return model, (d, depth, heads, E, K)


def _ref_criterion():
    """get_loss / get_criterion construction (common_config.py:780-825)."""
    ref_schemes = importlib.import_module("losses.loss_schemes")
    ref_lossfn = importlib.import_module("losses.loss_functions")
    fns = torch.nn.ModuleDict({
        "semseg": ref_lossfn.SoftMaxwithLoss(),
        "human_parts": ref_lossfn.SoftMaxwithLoss(),
        "sal": ref_lossfn.BalancedCrossEntropyLoss(size_average=True),
        "normals": ref_lossfn.NormalsLoss(normalize=True, size_average=True,
                                          norm=1),
        "edge": ref_lossfn.BalancedCrossEntropyLoss(size_average=True,
                                                    pos_weight=EDGE_W),
    })
    return ref_schemes.MultiTaskLoss(TASKS, fns, dict(WEIGHTS),
                                     multi_level=False, p={})


# ---------------------------------------------------------------------------
# our plumbing
# ---------------------------------------------------------------------------


def _our_p(root, save_dir):
    from m3vit_tpu.config import AttrDict
    from m3vit_tpu.tasks import parse_task_dictionary

    tasks, extra = parse_task_dictionary(
        "PASCALContext",
        {"include_semseg": True, "include_human_parts": True,
         "include_sal": True, "include_normals": True, "include_edge": True,
         "edge_w": EDGE_W},
    )
    p = AttrDict({
        "train_db_name": "PASCALContext", "val_db_name": "PASCALContext",
        "TASKS": tasks, "ALL_TASKS": tasks,
        "TASK_NAMES": [t.name for t in tasks],
        "train_scale": (IMG, IMG), "test_scale": (IMG, IMG),
        "db_paths": {"PASCAL_MT": root},
        "setup": "multi_task", "save_dir": save_dir,
        "overfit": False, "eval_edge_odsF": False,
    })
    p.update(extra)
    return p


def _our_transforms(p):
    """Deterministic stack mirroring _ref_transforms (our val stack)."""
    from m3vit_tpu.data.transforms import get_transformations

    return get_transformations(p)[1]  # FixedResize + AddIgnoreRegions + ToArrays


def _build_our_model(dims, T):
    from m3vit_tpu.models.heads import VisionTransformerUpHead
    from m3vit_tpu.models.multitask import MultiTaskModel
    from m3vit_tpu.models.vit_moe import VisionTransformerMoE

    d, depth, heads, E, K = dims
    backbone = VisionTransformerMoE(
        img_size=(IMG, IMG), patch_size=16, embed_dim=d, depth=depth,
        num_heads=heads, mlp_ratio=4.0, qkv_bias=True, moe_mlp_ratio=1.0,
        moe_experts=E, moe_top_k=K, capacity_factor=8.0,
        eval_capacity_factor=8.0, dtype=jnp.float32, vmoe_noisy_std=0.0,
        multi_gate=True, num_tasks=T, use_checkpointing=True,
        use_pallas_ffn=False,
    )
    decoders = {
        t: VisionTransformerUpHead(
            img_size=(IMG, IMG), patch_size=16, embed_dim=d,
            num_classes=N_CLS[t], dtype=jnp.float32,
        ) for t in TASKS
    }
    return MultiTaskModel(backbone=backbone, decoders=decoders, tasks=TASKS,
                          multi_gate=True)


def _torch_batch_to_numpy(batch):
    """Reference NCHW torch batch -> comparable NHWC numpy dict."""
    out = {}
    for k, v in batch.items():
        if k == "meta":
            continue
        a = v.numpy()
        out[k] = a.transpose(0, 2, 3, 1) if a.ndim == 4 else a
    return out


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_full_loop_metric_parity(fab_tree, tmp_path, monkeypatch):
    parent, root = fab_tree
    _setup_reference(fab_tree)
    vtm = _load_reference_backbone_module()
    from torch.utils.data import DataLoader

    from data.pascal_context import PASCALContext as RefPascal
    from utils.custom_collate import collate_mil

    T = len(TASKS)

    # ---------------- reference: data -------------------------------------
    tf = _ref_transforms()
    ref_train_ds = RefPascal(
        root=root, download=False, split=["train"], transform=tf,
        retname=True, do_edge=True, do_human_parts=True, do_semseg=True,
        do_normals=True, do_sal=True)
    ref_val_ds = RefPascal(
        root=root, download=False, split="val", transform=tf, retname=True,
        do_edge=True, do_human_parts=True, do_semseg=True, do_normals=True,
        do_sal=True)
    ref_train_loader = DataLoader(ref_train_ds, batch_size=B, shuffle=False,
                                  collate_fn=collate_mil, num_workers=0)
    ref_val_loader = DataLoader(ref_val_ds, batch_size=B, shuffle=False,
                                drop_last=False, collate_fn=collate_mil,
                                num_workers=0)

    # ---------------- ours: data ------------------------------------------
    from m3vit_tpu.data.loader import EpochLoader, get_dataset

    p = _our_p(root, str(tmp_path / "ours"))
    ts = _our_transforms(p)
    our_train_ds = get_dataset(p, "train", ts)
    our_val_ds = get_dataset(p, "val", ts)
    our_train_loader = EpochLoader(our_train_ds, batch_size=B, shuffle=False,
                                   drop_last=True, num_workers=1)
    our_val_loader = EpochLoader(our_val_ds, batch_size=B, shuffle=False,
                                 drop_last=False, num_workers=1)

    # ---------------- data parity: identical batches ----------------------
    ref_batches = list(ref_train_loader)
    our_batches = list(our_train_loader.epoch(0))
    assert len(ref_batches) == len(our_batches)
    for rb, ob in zip(ref_batches, our_batches):
        rn = _torch_batch_to_numpy(rb)
        for k in ["image"] + TASKS:
            got = np.asarray(ob[k], np.float32)
            want = np.asarray(rn[k], np.float32)
            if got.ndim == 3:
                got = got[..., None]
            if want.ndim == 3:
                want = want[..., None]
            np.testing.assert_allclose(
                got, want, atol=1e-5, rtol=1e-5,
                err_msg=f"data pipelines diverge on '{k}'")

    # ---------------- models from identical weights -----------------------
    ref_model, dims = _build_ref_model(vtm, T)
    d, depth, heads, E, K = dims
    criterion = _ref_criterion()
    opt = torch.optim.SGD(ref_model.parameters(), lr=LR, momentum=MOM,
                          weight_decay=WD)
    sd = {k: v.detach().numpy().copy()
          for k, v in ref_model.state_dict().items()}

    from m3vit_tpu.losses.functions import loss_fn_for_task
    from m3vit_tpu.train.optim import build_optimizer
    from m3vit_tpu.train.state import TrainState
    from m3vit_tpu.train.step import make_eval_step, make_train_step
    from m3vit_tpu.utils.torch_interop import merge_into

    model = _build_our_model(dims, T)
    bb_params = _convert_backbone_sd(
        {k[len("backbone."):]: v for k, v in sd.items()
         if k.startswith("backbone.")}, depth, multi_gate_tasks=T)
    params = {"backbone": bb_params}
    bstats = {}
    for t in TASKS:
        hp, hb = _convert_pup_head_sd(sd, f"decoders.{t}.")
        params[f"decoders_{t}"] = hp
        bstats[f"decoders_{t}"] = hb

    img0 = np.asarray(our_batches[0]["image"], np.float32)
    template = model.init(
        {"params": jax.random.key(0), "gate_noise": jax.random.key(1),
         "dropout": jax.random.key(2)},
        jnp.asarray(img0), train=True)
    merged, missing = merge_into(template["params"], params)
    assert not missing, f"unconverted params: {missing}"

    spe = len(our_batches)
    p_opt = {"optimizer": "sgd",
             "optimizer_kwargs": {"lr": LR, "momentum": MOM,
                                  "weight_decay": WD},
             "scheduler": "poly", "epochs": EPOCHS}
    tx = build_optimizer(p_opt, steps_per_epoch=spe)
    state = TrainState.create(
        apply_fn=model.apply, params=merged, tx=tx,
        batch_stats=merge_into(template["batch_stats"], bstats)[0])
    loss_fns = {t: loss_fn_for_task(t, p) for t in TASKS}
    step = make_train_step(model, TASKS, loss_fns, WEIGHTS, cv_weight=CVW,
                           donate=False)

    # ---------------- train both, identical epochs/batches ----------------
    ref_hist, our_hist = [], []
    gstep = 0
    for epoch in range(EPOCHS):
        # reference adjust_learning_rate poly (common_config.py:915-917)
        lr_e = LR * (1.0 - epoch / EPOCHS) ** 0.9
        for g in opt.param_groups:
            g["lr"] = lr_e
        for rb in ref_train_loader:
            images = rb["image"]
            targets = {t: rb[t] for t in TASKS}
            out, cv = ref_model(images)
            loss_dict = criterion(out, targets)
            total = loss_dict["total"] + CVW * cv
            opt.zero_grad(set_to_none=True)
            total.backward()
            opt.step()
            ref_hist.append(
                {"total": float(total),
                 **{t: float(loss_dict[t]) for t in TASKS}})
        for ob in our_train_loader.epoch(epoch):
            jb = {k: jnp.asarray(np.asarray(v, np.float32))
                  for k, v in ob.items() if k != "meta"}
            state, m = step(state, jb, jax.random.key(1000 + gstep))
            our_hist.append(
                {"total": float(m["loss_total_with_cv"]),
                 **{t: float(m[f"loss_{t}"]) for t in TASKS}})
            gstep += 1

    for i, (r, o) in enumerate(zip(ref_hist, our_hist)):
        for k in ["total"] + TASKS:
            rel = abs(r[k] - o[k]) / max(abs(r[k]), 1e-6)
            assert rel <= 2e-3, (
                f"step {i} loss '{k}' diverged: ref={r[k]:.6f} "
                f"ours={o[k]:.6f} rel={rel:.2e}\nref={ref_hist}\n"
                f"ours={our_hist}")

    # ---------------- reference: save predictions + eval from disk --------
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.cuda, "empty_cache", lambda: None)
    from evaluation.evaluate_utils import eval_all_results
    from evaluation.evaluate_utils import (
        save_model_predictions as ref_save_predictions,
    )

    ref_tasks = _RefTasks()
    ref_tasks.NAMES = list(TASKS)
    ref_tasks.INFER_FLAGVALS = {
        t.name: _CV2[t.infer_flagval] for t in p["TASKS"]}
    p_ref = _RefP({
        "save_dir": str(tmp_path / "ref"), "TASKS": ref_tasks,
        "setup": "multi_task", "train_db_name": "PASCALContext",
        "val_db_name": "PASCALContext", "overfit": False,
    })
    ref_model.eval()
    with torch.no_grad():
        ref_save_predictions(p_ref, ref_val_loader, ref_model, None)
    ref_res = eval_all_results(p_ref)

    # ---------------- ours: save predictions + eval from disk -------------
    from m3vit_tpu.evaluation.orchestrate import (
        eval_saved_predictions,
        save_model_predictions,
    )

    eval_step = make_eval_step(model, TASKS, with_stats=True)
    save_dir = save_model_predictions(p, eval_step, state,
                                      our_val_loader.epoch(0))
    raw_ds = get_dataset(p, "val", None)
    our_res = eval_saved_predictions(p, save_dir, raw_ds)

    # ---------------- the 0.5% budget --------------------------------------
    def close(a, b, task, metric, budget=0.005, rel=False):
        delta = abs(a - b) / (max(abs(b), 1e-9) if rel else 1.0)
        assert delta <= budget, (
            f"{task}.{metric}: ours={a:.6f} ref={b:.6f} "
            f"{'rel ' if rel else ''}delta={delta:.4f} > {budget}\n"
            f"ours={our_res}\nref={ref_res}")

    close(our_res["semseg"]["mIoU"], ref_res["semseg"]["mIoU"],
          "semseg", "mIoU")
    close(our_res["human_parts"]["mIoU"], ref_res["human_parts"]["mIoU"],
          "human_parts", "mIoU")
    close(our_res["sal"]["mIoU"], ref_res["sal"]["mIoU"], "sal", "mIoU")
    close(our_res["sal"]["maxF"], ref_res["sal"]["maxF"], "sal", "maxF")
    close(our_res["normals"]["mean"], ref_res["normals"]["mean"],
          "normals", "mean", rel=True)
    close(our_res["multi_task_performance"],
          ref_res["multi_task_performance"], "multi_task", "Δm")

    # ---------------- scorer cross-check: our evaluator on THEIR files ----
    cross = eval_saved_predictions(p, p_ref["save_dir"], raw_ds)
    close(cross["semseg"]["mIoU"], ref_res["semseg"]["mIoU"],
          "cross-semseg", "mIoU", budget=1e-6)
    close(cross["human_parts"]["mIoU"], ref_res["human_parts"]["mIoU"],
          "cross-human_parts", "mIoU", budget=1e-6)
    close(cross["sal"]["mIoU"], ref_res["sal"]["mIoU"],
          "cross-sal", "mIoU", budget=1e-6)
    close(cross["normals"]["mean"], ref_res["normals"]["mean"],
          "cross-normals", "mean", budget=1e-5, rel=True)
