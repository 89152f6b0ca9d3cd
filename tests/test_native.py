"""Native C++ eval kernel tests vs the Python reference implementations."""

import time

import numpy as np
import pytest

from m3vit_tpu import native
from m3vit_tpu.data.pascal_context import zhang_suen_thin


@pytest.mark.skipif(not native.native_available(), reason="no g++ toolchain")
def test_native_thin_matches_python():
    rng = np.random.RandomState(0)
    img = np.zeros((48, 48), bool)
    img[10:20, 5:40] = True
    img[30:34, 8:30] = True
    expected = zhang_suen_thin(img.copy())
    got = native.thin(img.copy())
    np.testing.assert_array_equal(got, expected)


@pytest.mark.skipif(not native.native_available(), reason="no g++ toolchain")
def test_native_match_counts():
    pred = np.zeros((32, 32), bool)
    gt = np.zeros((32, 32), bool)
    pred[10] = True
    gt[11] = True  # one row off
    m, n_pred, mg, n_gt = native.match_boundaries(pred, gt, 1.5)
    assert n_pred == 32 and n_gt == 32 and m == 32
    m0, _, _, _ = native.match_boundaries(pred, gt, 0.5)
    assert m0 == 0


@pytest.mark.skipif(not native.native_available(), reason="no g++ toolchain")
def test_native_thin_speed():
    img = np.zeros((512, 512), bool)
    img[::7] = True
    img[:, ::11] = True

    def best_of(fn, n=3):
        # min-of-n: timing under full-suite CPU contention is noisy and a
        # single descheduled run flipped this assert once
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(img.copy())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    assert best_of(native.thin) < best_of(zhang_suen_thin)  # typically 10-100x


@pytest.mark.skipif(not native.native_available(), reason="no g++ toolchain")
def test_edge_eval_uses_native_consistently():
    from m3vit_tpu.evaluation.edge_eval import evaluate_boundaries

    gt = np.zeros((64, 64), np.float32)
    gt[20] = 1.0
    res = evaluate_boundaries([gt], [gt], thresholds=5, apply_thinning=True)
    assert res["odsF"] == pytest.approx(1.0)
