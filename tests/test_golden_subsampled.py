"""Subsampled-mode end-to-end regression against the reference's committed
golden disparity maps (VERDICT r2 missing #3 / next-step #6).

The reference's subsampled mode (elas.h:83-85, elas.cpp:713-726) computes
disparity on every 2nd row/column; there are no subsampled goldens in the
reference repo, so the half-lattice output is nearest-upsampled back to
full resolution and compared against the SAME full-res goldens with a
documented, looser envelope: upsampling alone introduces ~1-2 px of edge
error, so bad3 (both valid) is bounded at 2% (vs 0.5% full-res) and the
coverage deltas at ~2x the full-res bounds (measured values in
docs/PERFORMANCE.md accuracy table; full-res envelope in test_golden.py).
"""

import os.path as osp

import numpy as np
import pytest

from stereovision_tpu.io.pgm import load_pgm
from stereovision_tpu.params import robotics_params
from stereovision_tpu.models.elas import ElasEngine

from conftest import REFERENCE_ROOT

PROFILE_DIR = osp.join(REFERENCE_ROOT, "datasets", "profile")
PAIRS = ["aloe", "cones", "raindeer", "urban1", "urban2", "urban3", "urban4"]


@pytest.mark.slow
@pytest.mark.parametrize("name", PAIRS)
def test_profile_golden_subsampled(name):
    base = osp.join(PROFILE_DIR, f"{name}_left.pgm")
    if not osp.exists(base):
        pytest.skip("reference datasets not available")
    L = load_pgm(base)
    R = load_pgm(osp.join(PROFILE_DIR, f"{name}_right.pgm"))
    gold = load_pgm(osp.join(PROFILE_DIR,
                             f"{name}_left_disp.pgm")).astype(np.float64)

    p = robotics_params(postprocess_only_left=False, subsampling=True)
    eng = ElasEngine(p, width=L.shape[1], height=L.shape[0])
    D1, _ = eng.process(L, R)
    D1 = np.asarray(D1)

    # nearest-upsample the half lattice (even rows/cols) to full res;
    # odd trailing rows/cols replicate the last lattice line
    H, W = L.shape
    up = np.repeat(np.repeat(D1, 2, axis=0), 2, axis=1)
    up = np.pad(up, ((0, max(0, H - up.shape[0])),
                     (0, max(0, W - up.shape[1]))), mode="edge")[:H, :W]

    ours_true = np.maximum(up, 0)
    confident = (up > 1) & (gold > 1)
    scale = np.median(gold[confident] / np.maximum(ours_true[confident],
                                                   1e-6))
    gold_true = gold / scale

    gv, ov = gold > 0, up >= 0
    both = gv & ov
    bad3_both = ((np.abs(ours_true - gold_true) > 3) & both).sum() / both.sum()
    gold_only = (gv & ~ov).mean()
    ours_only = (ov & ~gv).mean()

    # Per-pair thresholds = measured value + ~30-50% margin (measured on
    # this build: bad3 0.004-0.015 except urban3 0.057; gold_only
    # 0.011-0.069; ours_only 0.016-0.099; total-coverage deficit <= 4.3pp
    # on urban2).  urban3's fine fence structure genuinely aliases at the
    # half lattice — the reference's subsampled output would too.
    bad3_max = {"urban3": 0.08}.get(name, 0.02)
    assert bad3_both < bad3_max, \
        f"{name}: bad3 (both valid) too high: {bad3_both}"
    gold_only_max = {"urban1": 0.07, "urban2": 0.09, "urban3": 0.09}.get(
        name, 0.04)
    assert gold_only < gold_only_max, \
        f"{name}: missing coverage vs golden: {gold_only}"
    ours_only_max = {"cones": 0.13, "urban1": 0.11, "urban4": 0.11}.get(
        name, 0.09)
    assert ours_only < ours_only_max, \
        f"{name}: unexpected extra coverage: {ours_only}"
    assert ov.mean() > gv.mean() - 0.06, \
        f"{name}: total coverage below golden: {ov.mean()} vs {gv.mean()}"
