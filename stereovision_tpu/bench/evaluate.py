"""Accuracy evaluation: bad-Npx disparity error metrics.

The reference reports KITTI bad-3px only in its paper (nothing in-repo,
SURVEY.md §4); this module adds the missing evaluator:
  * against the bundled golden disparity maps (datasets/profile/*_disp.pgm)
  * against KITTI-2015 ground-truth disparity PNGs (uint16, disp*256)
"""

from __future__ import annotations

import dataclasses
import glob
import os.path as osp
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class Bad3Result:
    name: str
    bad3_both: float       # fraction > 3px where both valid
    coverage_ours: float
    coverage_ref: float
    mean_abs_err: float


def bad_n(pred: np.ndarray, gt: np.ndarray, n: float = 3.0,
          pred_valid=None, gt_valid=None) -> Bad3Result:
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    pv = pred_valid if pred_valid is not None else pred > 0
    gv = gt_valid if gt_valid is not None else gt > 0
    both = pv & gv
    if both.sum() == 0:
        return Bad3Result("", 1.0, pv.mean(), gv.mean(), float("inf"))
    err = np.abs(pred - gt)
    return Bad3Result(
        "", float(((err > n) & both).sum() / both.sum()),
        float(pv.mean()), float(gv.mean()),
        float(err[both].mean()))


def evaluate_profile_goldens(profile_dir: str,
                             pairs: Optional[List[str]] = None,
                             use_pallas: bool = False) -> List[Bad3Result]:
    """Run the pipeline on the bundled golden pairs and compare to the
    committed *_disp.pgm outputs (producer: reference runProfiling,
    stereo_vision.cpp:690-755 — ROBOTICS preset, both images)."""
    from ..io.pgm import load_pgm
    from ..params import robotics_params
    from ..models.elas import ElasEngine

    results = []
    p = robotics_params(postprocess_only_left=False)
    names = pairs or sorted(
        osp.basename(f)[:-len("_left.pgm")]
        for f in glob.glob(osp.join(profile_dir, "*_left.pgm")))
    for name in names:
        L = load_pgm(osp.join(profile_dir, f"{name}_left.pgm"))
        R = load_pgm(osp.join(profile_dir, f"{name}_right.pgm"))
        gold = load_pgm(osp.join(profile_dir,
                                 f"{name}_left_disp.pgm")).astype(np.float64)
        eng = ElasEngine(p, width=L.shape[1], height=L.shape[0],
                         use_pallas=use_pallas)
        D1, D2 = eng.process(L, R)
        D1, D2 = np.asarray(D1), np.asarray(D2)
        # The goldens are normalized by the producing run's GLOBAL max
        # disparity (runProfiling, stereo_vision.cpp:723-737), so a single
        # outlier pixel shifts the whole scale.  Recover the golden's
        # disparity scale robustly (median ratio over confidently valid
        # pixels) instead of assuming our max equals theirs.
        ours_true = np.maximum(D1, 0)
        both = (D1 > 1) & (gold > 1)
        scale = np.median(gold[both] / np.maximum(ours_true[both], 1e-6))
        gold_true = gold / max(scale, 1e-9)
        r = bad_n(ours_true, gold_true, n=3.0,
                  pred_valid=D1 >= 0, gt_valid=gold > 0)
        r.name = name
        results.append(r)
    return results


def evaluate_kitti2015(root: str, engine, n_frames: int = 20,
                       split: str = "training") -> Bad3Result:
    """bad-3px against KITTI-2015 disp_noc_0 ground truth (uint16 PNGs,
    value = disparity * 256).  `engine` is a StereoEngine whose size
    matches the dataset (1242x375)."""
    import cv2
    lefts = sorted(glob.glob(osp.join(root, split, "image_2", "*_10.png")))
    acc_bad = acc_n = 0
    cov_o = cov_g = mae = 0.0
    count = 0
    for lf in lefts[:n_frames]:
        rf = lf.replace("image_2", "image_3")
        gf = lf.replace("image_2", "disp_noc_0")
        if not (osp.exists(rf) and osp.exists(gf)):
            continue
        L = cv2.resize(cv2.imread(lf), (engine.width, engine.height))
        R = cv2.resize(cv2.imread(rf), (engine.width, engine.height))
        gt16 = cv2.imread(gf, cv2.IMREAD_UNCHANGED)
        gt = cv2.resize(gt16, (engine.width, engine.height),
                        interpolation=cv2.INTER_NEAREST)
        gt = gt.astype(np.float64) / 256.0
        # rescale GT disparity for the engine resolution
        gt *= engine.width / gt16.shape[1]
        out = engine.process_frame(L, R)
        pred = np.asarray(out["disparity"]).astype(np.float64)
        r = bad_n(np.maximum(pred, 0), gt, 3.0,
                  pred_valid=pred >= 0, gt_valid=gt > 0)
        both = (pred >= 0) & (gt > 0)
        acc_bad += r.bad3_both * both.sum()
        acc_n += both.sum()
        cov_o += r.coverage_ours
        cov_g += r.coverage_ref
        mae += r.mean_abs_err
        count += 1
    if count == 0:
        raise RuntimeError(f"no KITTI-2015 {split} frames under {root}")
    return Bad3Result("kitti2015", acc_bad / max(acc_n, 1),
                      cov_o / count, cov_g / count, mae / count)
