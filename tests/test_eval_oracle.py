"""Oracle tests: our evaluation stack vs the ACTUAL reference scorers.

VERDICT r2 #2: every model component is weight-copied-parity-tested against
the reference, but the meters were only checked against hand-computed
expectations.  Here we execute the reference's own meter classes
(/root/reference/evaluation/eval_{semseg,human_parts,normals,depth,sal,edge}.py)
and get_output (/root/reference/utils/utils.py:60-79) on identical fabricated
predictions/GT and assert our meters return the same numbers exactly (to f64
accumulation noise), plus a folder-level pass through the reference's
eval_*(loader, folder) file readers on a prediction dir written by OUR
save_model_predictions.

Skipped when the reference tree is not mounted.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest
import torch

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "evaluation")),
    reason="reference tree not mounted",
)


def _load_ref(name: str):
    """Import /root/reference/evaluation/eval_<name>.py read-only."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    path = os.path.join(REF_ROOT, "evaluation", f"eval_{name}.py")
    spec = importlib.util.spec_from_file_location(f"ref_eval_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _rng(seed=0):
    return np.random.RandomState(seed)


# ---------------------------------------------------------------- meters


def test_semseg_meter_oracle():
    """reference eval_semseg.py:86-147 (SemsegMeter, 21 classes, valid=!=255)."""
    ref = _load_ref("semseg").SemsegMeter("PASCALContext")
    from m3vit_tpu.evaluation.meters import SemsegMeter

    ours = SemsegMeter("PASCALContext")
    r = _rng(0)
    for _ in range(3):
        gt = r.randint(0, 21, (2, 37, 53)).astype(np.int64)
        gt[r.rand(*gt.shape) < 0.1] = 255
        pred = r.randint(0, 21, gt.shape).astype(np.int64)
        ref.update(torch.from_numpy(pred), torch.from_numpy(gt))
        ours.update(pred, gt)
    a = ref.get_score(verbose=False)
    b = ours.get_score()
    np.testing.assert_allclose(b["jaccards_all_categs"],
                               a["jaccards_all_categs"], rtol=0, atol=0)
    assert b["mIoU"] == pytest.approx(a["mIoU"], abs=0)


def test_human_parts_meter_oracle():
    """reference eval_human_parts.py:78-122 (7 classes incl. background)."""
    ref = _load_ref("human_parts").HumanPartsMeter("PASCALContext")
    from m3vit_tpu.evaluation.meters import HumanPartsMeter

    ours = HumanPartsMeter("PASCALContext")
    r = _rng(1)
    for _ in range(2):
        gt = r.randint(0, 7, (1, 41, 31)).astype(np.int64)
        gt[r.rand(*gt.shape) < 0.15] = 255
        pred = r.randint(0, 7, gt.shape).astype(np.int64)
        ref.update(torch.from_numpy(pred), torch.from_numpy(gt))
        ours.update(pred, gt)
    a = ref.get_score()
    b = ours.get_score()
    np.testing.assert_allclose(b["jaccards_all_categs"],
                               a["jaccards_all_categs"], rtol=0, atol=0)


def test_normals_meter_oracle():
    """reference eval_normals.py:66-110: pred [B,H,W,3] in [0,255] scale,
    gt unit normals with 255-invalid pixels; angular-degree stats."""
    ref = _load_ref("normals").NormalsMeter()
    from m3vit_tpu.evaluation.meters import NormalsMeter

    ours = NormalsMeter()
    r = _rng(2)
    for _ in range(2):
        B, H, W = 2, 19, 23
        gt = r.randn(B, H, W, 3).astype(np.float32)
        gt /= np.linalg.norm(gt, axis=-1, keepdims=True) + 1e-12
        invalid = r.rand(B, H, W) < 0.2
        gt[invalid] = 255.0
        # predictions in get_output's [0,255] convention
        pv = r.randn(B, H, W, 3).astype(np.float32)
        pv /= np.linalg.norm(pv, axis=-1, keepdims=True) + 1e-12
        pred = (pv + 1.0) * 255.0 / 2.0
        # reference takes pred NHWC (permutes internally), gt NCHW
        ref.update(torch.from_numpy(pred.copy()),
                   torch.from_numpy(gt.transpose(0, 3, 1, 2).copy()))
        ours.update(pred, gt)
    a = ref.get_score(verbose=False)
    b = ours.get_score()
    for k in ("mean", "rmse", "11.25", "22.5", "30"):
        assert b[k] == pytest.approx(a[k], rel=1e-6), k


def test_depth_meter_oracle():
    """reference eval_depth.py:61-95: accumulated rmse/log_rmse over valid
    (gt != 255) pixels."""
    ref = _load_ref("depth").DepthMeter()
    from m3vit_tpu.evaluation.meters import DepthMeter

    ours = DepthMeter()
    r = _rng(3)
    for _ in range(3):
        gt = (r.rand(1, 29, 33) * 9.0 + 0.5).astype(np.float32)
        gt[r.rand(*gt.shape) < 0.1] = 255.0
        pred = (r.rand(*gt.shape) * 9.0 + 0.1).astype(np.float32)
        ref.update(torch.from_numpy(pred), torch.from_numpy(gt))
        ours.update(pred, gt)
    a = ref.get_score(verbose=False)
    b = ours.get_score()
    assert b["rmse"] == pytest.approx(a["rmse"], rel=1e-6)
    assert b["log_rmse"] == pytest.approx(a["log_rmse"], rel=1e-6)


def test_saliency_meter_oracle():
    """reference eval_sal.py:68-130: 15-threshold sweep, per-image jaccard +
    precision/recall, maxF of threshold-averaged P/R."""
    ref = _load_ref("sal").SaliencyMeter()
    from m3vit_tpu.evaluation.meters import SaliencyMeter

    ours = SaliencyMeter()
    r = _rng(4)
    for _ in range(2):
        B, H, W = 2, 27, 25
        gt = (r.rand(B, H, W) > 0.5).astype(np.float32)
        pred = (r.rand(B, H, W) * 255.0).astype(np.float32)
        ref.update(torch.from_numpy(pred.copy()), torch.from_numpy(gt.copy()))
        ours.update(pred, gt)
    a = ref.get_score(verbose=False)
    b = ours.get_score()
    np.testing.assert_allclose(b["mIoUs"], a["mIoUs"], rtol=1e-6)
    assert b["mIoU"] == pytest.approx(a["mIoU"], rel=1e-6)
    assert b["maxF"] == pytest.approx(a["maxF"], rel=1e-6)


def test_edge_meter_oracle():
    """reference eval_edge.py:14-40: balanced BCE on [0,255]/255 'logits'."""
    ref = _load_ref("edge").EdgeMeter(pos_weight=0.95)
    from m3vit_tpu.evaluation.meters import EdgeMeter

    ours = EdgeMeter(pos_weight=0.95)
    r = _rng(5)
    for _ in range(3):
        gt = (r.rand(1, 21, 23) > 0.8).astype(np.float32)
        pred = (r.rand(*gt.shape) * 255.0).astype(np.float32)
        ref.update(torch.from_numpy(pred.copy()), torch.from_numpy(gt.copy()))
        ours.update(pred, gt)
    a = ref.get_score(verbose=False)
    b = ours.get_score()
    assert b["loss"] == pytest.approx(a["loss"], rel=1e-5)


# ------------------------------------------------------------- get_output


def test_get_output_oracle():
    """reference utils/utils.py:60-79 vs m3vit_tpu.evaluation.outputs
    (theirs NCHW in / NHWC-ish out, ours NHWC throughout)."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from utils.utils import get_output as ref_get_output

    from m3vit_tpu.evaluation.outputs import get_output

    r = _rng(6)
    B, H, W = 2, 9, 11
    chans = {"semseg": 21, "human_parts": 7, "normals": 3, "edge": 1,
             "sal": 1, "depth": 1}
    for task, C in chans.items():
        x = r.randn(B, H, W, C).astype(np.float32) * 3.0
        ref_out = ref_get_output(
            torch.from_numpy(x.transpose(0, 3, 1, 2).copy()), task)
        ours = get_output(x, task)
        np.testing.assert_allclose(
            np.asarray(ours, np.float64),
            ref_out.numpy().squeeze().astype(np.float64)
            if task in ("edge", "sal")
            else ref_out.numpy().astype(np.float64).reshape(ours.shape),
            rtol=1e-5, atol=1e-4, err_msg=task,
        )


# ----------------------------------------------- folder-level (file readers)


class _FabDataset:
    """Minimal dataset/loader facade for both frameworks' folder scorers."""

    def __init__(self, samples):
        self.samples = samples
        self.im_ids = [s["meta"]["image"] for s in samples]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]

    def __iter__(self):
        return iter(self.samples)


def _fab_samples(r, n=3):
    """Fabricated GT at per-image original sizes (reference protocol scores
    at original resolution)."""
    samples = []
    for i in range(n):
        H, W = int(r.randint(24, 40)), int(r.randint(24, 40))
        semseg = r.randint(0, 21, (H, W)).astype(np.float32)
        semseg[r.rand(H, W) < 0.1] = 255.0
        sal = (r.rand(H, W) > 0.5).astype(np.float32)
        nrm = r.randn(H, W, 3).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-12
        samples.append({
            "meta": {"image": f"im_{i:04d}", "im_size": (H, W)},
            "semseg": semseg,
            "sal": sal,
            "normals": nrm,
        })
    return samples


def test_folder_eval_oracle(tmp_path):
    """Write a prediction dir with OUR save_model_predictions, then score it
    with the reference's file-reading eval_semseg/eval_sal/eval_normals
    (loader, folder) functions AND our eval_saved_predictions — the numbers
    must agree (reference: eval_semseg.py:36-81, eval_sal.py:26-57,
    eval_normals.py:24-66)."""
    r = _rng(7)
    samples = _fab_samples(r)
    ds = _FabDataset(samples)

    from m3vit_tpu.evaluation.orchestrate import (
        eval_saved_predictions,
        save_model_predictions,
    )

    # identity eval_step: the "model" predicts logits whose get_output equals
    # a known prediction per image; batches of 1 at original resolution
    preds = {}
    batches = []
    for s in samples:
        H, W = s["meta"]["im_size"]
        sem_logit = r.randn(1, H, W, 21).astype(np.float32) * 2.0
        sal_logit = r.randn(1, H, W, 1).astype(np.float32) * 2.0
        nrm_raw = r.randn(1, H, W, 3).astype(np.float32)
        preds[s["meta"]["image"]] = {
            "semseg": sem_logit, "sal": sal_logit, "normals": nrm_raw,
        }
        batches.append({
            "meta": [s["meta"]],
            "image": np.zeros((1, H, W, 3), np.float32),
            "semseg": s["semseg"][None],
            "sal": s["sal"][None],
            "normals": s["normals"][None],
        })

    class _Tasks:
        def __init__(self, name, flag):
            self.name = name
            self.infer_flagval = flag

    p = {
        "TASK_NAMES": ["semseg", "sal", "normals"],
        "TASKS": [_Tasks("semseg", "nearest"), _Tasks("sal", "linear"),
                  _Tasks("normals", "linear")],
        "train_db_name": "PASCALContext",
        "save_dir": str(tmp_path),
        "setup": "multi_task",
        "eval_edge_odsF": False,
    }

    class _Loader:
        def __iter__(self):
            return iter(batches)

    def step(state, arrays):
        # match by shape-stored id: arrays carry exactly one image
        img_id = None
        for s in samples:
            if arrays["semseg"].shape[1:3] == s["semseg"].shape:
                if np.array_equal(arrays["semseg"][0], s["semseg"]):
                    img_id = s["meta"]["image"]
                    break
        assert img_id is not None
        return preds[img_id]

    save_dir = save_model_predictions(p, step, state=None,
                                      val_loader=_Loader())
    ours = eval_saved_predictions(p, save_dir, ds)

    ref_semseg = _load_ref("semseg").eval_semseg(
        ds, os.path.join(save_dir, "semseg"), n_classes=20, has_bg=True)
    ref_sal = _load_ref("sal").eval_sal(
        ds, os.path.join(save_dir, "sal"), mask_thres=np.linspace(0.2, 0.9, 15))
    ref_normals = _load_ref("normals").eval_normals(
        ds, os.path.join(save_dir, "normals"))

    np.testing.assert_allclose(ours["semseg"]["jaccards_all_categs"],
                               ref_semseg["jaccards_all_categs"], rtol=0)
    assert ours["semseg"]["mIoU"] == pytest.approx(ref_semseg["mIoU"], abs=0)
    assert ours["sal"]["mIoU"] == pytest.approx(ref_sal["mIoU"], rel=1e-6)
    assert ours["sal"]["maxF"] == pytest.approx(ref_sal["maxF"], rel=1e-6)
    # folder eval normalizes the stored uint8 normals on read; meters share
    # the pixel set exactly, angles match to PNG-quantization-free readback
    assert ours["normals"]["mean"] == pytest.approx(ref_normals["mean"],
                                                    rel=1e-5)
    assert ours["normals"]["11.25"] == pytest.approx(ref_normals["11.25"],
                                                     rel=1e-6)
