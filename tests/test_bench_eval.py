"""Tests for the accuracy evaluator."""

import numpy as np

from stereovision_tpu.bench.evaluate import bad_n


def test_bad_n_basic():
    gt = np.array([[10.0, 20.0, 0.0], [5.0, 5.0, 5.0]])
    pred = np.array([[10.0, 25.0, 7.0], [5.0, 0.0, 8.9]])
    r = bad_n(pred, gt, n=3.0)
    # both-valid pixels: (0,0) ok, (0,1) err 5 -> bad, (1,0) ok, (1,2) 3.9 bad
    assert abs(r.bad3_both - 2 / 4) < 1e-9
    assert r.coverage_ref == 5 / 6


def test_bad_n_custom_valid_masks():
    gt = np.array([[1.0, 2.0]])
    pred = np.array([[-10.0, 2.0]])
    r = bad_n(np.maximum(pred, 0), gt, 3.0,
              pred_valid=pred >= 0, gt_valid=gt > 0)
    assert r.bad3_both == 0.0
    assert r.coverage_ours == 0.5
