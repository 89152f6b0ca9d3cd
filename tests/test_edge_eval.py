"""Boundary odsF evaluator tests."""

import numpy as np
import pytest

from m3vit_tpu.evaluation.edge_eval import _match_counts, evaluate_boundaries


def _line_map(h, w, row):
    m = np.zeros((h, w), np.float32)
    m[row] = 1.0
    return m


def test_match_counts_exact():
    gt = _line_map(16, 16, 8) > 0
    mp, tp, mg, tg = _match_counts(gt, gt, max_dist_px=1.0)
    assert mp == tp == mg == tg == 16


def test_match_counts_within_tolerance():
    pred = _line_map(16, 16, 8) > 0
    gt = _line_map(16, 16, 9) > 0  # off by one row
    mp, _, mg, _ = _match_counts(pred, gt, max_dist_px=1.5)
    assert mp == 16 and mg == 16
    mp2, _, _, _ = _match_counts(pred, gt, max_dist_px=0.5)
    assert mp2 == 0


def test_perfect_prediction_ods_1():
    gt = _line_map(32, 32, 10)
    res = evaluate_boundaries([gt], [gt], thresholds=5, apply_thinning=False)
    assert res["odsF"] == pytest.approx(1.0)
    assert res["oisF"] == pytest.approx(1.0)


def test_probability_sweep_picks_best_threshold():
    gt = _line_map(32, 32, 10)
    # prediction: true line at strength 0.9, spurious line at 0.3
    pred = gt * 0.9 + _line_map(32, 32, 25) * 0.3
    res = evaluate_boundaries([pred], [gt], thresholds=9, apply_thinning=False)
    # best threshold should sit above 0.3 to drop the spurious line
    assert res["ods_threshold"] > 0.3
    assert res["odsF"] == pytest.approx(1.0, abs=1e-6)
    # a low threshold would have precision 0.5
    assert min(res["f_curve"]) < 0.75


def test_empty_prediction():
    gt = _line_map(16, 16, 4)
    res = evaluate_boundaries([np.zeros((16, 16), np.float32)], [gt],
                              thresholds=3, apply_thinning=False)
    assert res["odsF"] == 0.0
