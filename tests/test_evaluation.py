"""Metric/meter tests vs hand-computed values."""

import numpy as np
import pytest

from m3vit_tpu.evaluation.meters import (
    DepthMeter,
    EdgeMeter,
    HumanPartsMeter,
    NormalsMeter,
    PerformanceMeter,
    SaliencyMeter,
    SemsegMeter,
    calculate_multi_task_performance,
    jaccard,
    single_task_reference_dict,
)
from m3vit_tpu.evaluation.outputs import get_output


def test_jaccard_empty_is_one():
    assert jaccard(np.zeros((4, 4)), np.zeros((4, 4))) == 1.0
    assert jaccard(np.ones((4, 4)), np.ones((4, 4))) == 1.0
    assert jaccard(np.ones((4, 4)), np.zeros((4, 4))) == 0.0


def test_semseg_meter_simple():
    m = SemsegMeter("CityScapes")  # 7 classes
    gt = np.array([[0, 1, 2, 255]])
    pred = np.array([[0, 1, 3, 3]])
    m.update(pred, gt)
    s = m.get_score()
    jac = s["jaccards_all_categs"]
    assert jac[0] == 1.0 and jac[1] == 1.0
    assert jac[2] == 0.0  # fn for class 2
    assert jac[3] == 0.0  # fp for class 3 (on valid pixel only)
    # 255 pixel fully ignored
    assert m.tp.sum() == 2 and m.fp.sum() == 1 and m.fn.sum() == 1


def test_human_parts_meter_has_7_classes():
    m = HumanPartsMeter()
    assert m.n_classes == 7


def test_normals_meter_exact_angles():
    m = NormalsMeter()
    # gt = +x everywhere; pred = +x (0 deg) and +y (90 deg)
    gt = np.zeros((1, 1, 2, 3), np.float32)
    gt[..., 0] = 1.0
    pred_unit = np.zeros((1, 1, 2, 3), np.float32)
    pred_unit[0, 0, 0] = [1, 0, 0]
    pred_unit[0, 0, 1] = [0, 1, 0]
    pred255 = (pred_unit + 1.0) * 255.0 / 2.0
    m.update(pred255, gt)
    s = m.get_score()
    assert s["mean"] == pytest.approx(45.0, abs=1e-4)
    assert s["rmse"] == pytest.approx((90.0**2 / 2) ** 0.5, abs=1e-4)
    assert s["11.25"] == pytest.approx(50.0)


def test_depth_meter():
    m = DepthMeter()
    gt = np.array([[1.0, 2.0, 255.0]])
    pred = np.array([[1.5, 2.0, 9.9]])
    m.update(pred, gt)
    s = m.get_score()
    assert s["rmse"] == pytest.approx((0.25 / 2) ** 0.5)
    assert s["log_rmse"] == pytest.approx(((np.log(1.0) - np.log(1.5)) ** 2 / 2) ** 0.5)


def test_saliency_meter_perfect():
    m = SaliencyMeter()
    gt = np.zeros((1, 8, 8))
    gt[0, :4] = 1.0
    pred = gt * 255.0
    m.update(pred, gt)
    s = m.get_score()
    assert s["mIoU"] == pytest.approx(1.0)
    assert s["maxF"] == pytest.approx(1.0, abs=1e-6)


def test_edge_meter_runs():
    m = EdgeMeter(pos_weight=0.95)
    gt = (np.random.RandomState(0).rand(2, 8, 8) > 0.9).astype(np.float32)
    pred = np.random.RandomState(1).rand(2, 8, 8) * 255
    m.update(pred, gt)
    assert np.isfinite(m.get_score()["loss"])


def test_get_output_semantics():
    logits = np.random.RandomState(0).randn(2, 4, 4, 5).astype(np.float32)
    assert get_output(logits, "semseg").shape == (2, 4, 4)
    nrm = get_output(np.random.RandomState(1).randn(2, 4, 4, 3), "normals")
    assert nrm.min() >= 0 and nrm.max() <= 255
    # unit norm after unscaling
    v = 2 * nrm / 255 - 1
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    e = get_output(np.zeros((1, 4, 4, 1)), "edge")
    np.testing.assert_allclose(e, 127.5)


def test_delta_m_pascal():
    stl = single_task_reference_dict(
        "PASCALContext", ["semseg", "human_parts", "sal", "normals"]
    )
    eval_dict = {
        "semseg": {"mIoU": 0.662 * 1.1},
        "human_parts": {"mIoU": 0.599},
        "sal": {"mIoU": 0.663},
        "normals": {"mean": 13.9},
    }
    dm = calculate_multi_task_performance(eval_dict, stl)
    assert dm == pytest.approx(0.1 / 4)


def test_performance_meter_roundtrip():
    p = {"train_db_name": "PASCALContext", "TASK_NAMES": ["semseg", "edge"],
         "edge_w": 0.95}
    pm = PerformanceMeter(p)
    pred = {
        "semseg": np.zeros((1, 4, 4)),
        "edge": np.full((1, 4, 4), 255.0),
    }
    gt = {"semseg": np.zeros((1, 4, 4)), "edge": np.ones((1, 4, 4))}
    pm.update(pred, gt)
    s = pm.get_score()
    assert s["semseg"]["mIoU"] > 0
    assert "loss" in s["edge"]
    # partial update (single-task eval path)
    pm.update({"semseg": np.zeros((1, 4, 4))}, gt)


def test_save_and_score_roundtrip(tmp_path):
    """save_model_predictions -> eval_saved_predictions protocol roundtrip."""
    import jax
    import jax.numpy as jnp

    from m3vit_tpu.evaluation.orchestrate import (
        eval_saved_predictions,
        save_model_predictions,
    )

    H = W = 32
    tasks = ["semseg", "depth"]
    p = {"train_db_name": "NYUD", "val_db_name": "NYUD", "setup": "multi_task",
         "TASK_NAMES": tasks, "save_dir": str(tmp_path),
         "TASKS": __import__("m3vit_tpu.tasks", fromlist=["x"]).parse_task_dictionary(
             "NYUD", {"include_semseg": True, "include_depth": True})[0]}

    rng = np.random.RandomState(0)
    sem_logits = rng.randn(1, H, W, 40).astype(np.float32)
    depth_pred = (rng.rand(1, H, W, 1) * 5).astype(np.float32)
    gt_sem = rng.randint(0, 40, (1, H, W, 1)).astype(np.float32)
    gt_depth = (rng.rand(1, H, W, 1) * 5).astype(np.float32)

    class FakeDS:
        im_ids = ["img0"]

        def __len__(self):
            return 1

        def __getitem__(self, i):
            return {"semseg": gt_sem[0], "depth": gt_depth[0]}

    def eval_step(state, batch):
        return {"semseg": jnp.asarray(sem_logits),
                "depth": jnp.asarray(depth_pred)}

    batches = [{"image": np.zeros((1, H, W, 3), np.float32),
                "semseg": gt_sem, "depth": gt_depth,
                "meta": [{"image": "img0", "im_size": (H, W)}]}]
    save_model_predictions(p, eval_step, None, batches)
    import os

    assert os.path.isfile(tmp_path / "semseg" / "img0.png")
    assert os.path.isfile(tmp_path / "depth" / "img0.mat")

    res = eval_saved_predictions(p, str(tmp_path), FakeDS())
    assert 0 <= res["semseg"]["mIoU"] <= 1
    assert np.isfinite(res["depth"]["rmse"])
    assert "multi_task_performance" in res

    # the scored mIoU equals scoring the argmax directly
    from m3vit_tpu.evaluation.meters import SemsegMeter

    m = SemsegMeter("NYUD")
    m.update(sem_logits.argmax(-1), gt_sem[..., 0])
    direct = m.get_score()["mIoU"]
    assert res["semseg"]["mIoU"] == pytest.approx(direct)
