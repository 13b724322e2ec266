"""Tests for the detector and tracker models."""

import io
import os

import numpy as np
import pytest

from stereovision_tpu.models.bayesian import BayesianTracker, Detection
from stereovision_tpu.models.yolo import (YoloV4Tiny, builtin_yolov4_tiny_cfg,
                                          parse_darknet_cfg, _nms)


class TestYolo:
    def test_builtin_architecture_param_count(self):
        m = YoloV4Tiny(builtin_yolov4_tiny_cfg())
        n = sum(c.w.size + c.b.size for c in m.params.values())
        # yolov4-tiny has ~6.05M parameters
        assert abs(n - 6_053_502) < 1000

    def test_cfg_parser_roundtrip(self, tmp_path):
        cfg = tmp_path / "t.cfg"
        cfg.write_text("""
[net]
width=416
height=416
channels=3
# comment
[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky
""")
        s = parse_darknet_cfg(str(cfg))
        assert s[0]["type"] == "net" and s[0]["width"] == "416"
        assert s[1]["filters"] == "16"

    def test_forward_shapes(self):
        m = YoloV4Tiny(builtin_yolov4_tiny_cfg())
        frame = np.zeros((100, 200, 3), np.uint8)
        dets = m.detect(frame)  # random weights: just must not crash
        assert isinstance(dets, list)

    def test_weights_roundtrip(self, tmp_path):
        """Synthesize a darknet .weights blob for the built-in architecture,
        load it, verify deterministic forward."""
        m = YoloV4Tiny(builtin_yolov4_tiny_cfg())
        rng = np.random.default_rng(0)
        chunks = [np.array([0, 2, 0], np.int32).tobytes(),
                  np.array([0], np.int64).tobytes()]
        for i, l in enumerate(m.layers):
            if l["type"] != "convolutional":
                continue
            k, _, c_in, f = m.params[i].w.shape
            if l.get("batch_normalize") == "1":
                chunks.append(rng.normal(0, 0.02, 2 * f).astype(
                    np.float32).tobytes())              # bn_b, bn_g
                chunks.append(np.zeros(f, np.float32).tobytes())   # mean
                chunks.append(np.ones(f, np.float32).tobytes())    # var
            else:
                chunks.append(np.zeros(f, np.float32).tobytes())
            chunks.append(rng.normal(0, 0.02, f * c_in * k * k).astype(
                np.float32).tobytes())
        wfile = tmp_path / "w.weights"
        wfile.write_bytes(b"".join(chunks))
        m.load_darknet_weights(str(wfile))
        frame = (np.ones((64, 64, 3)) * 127).astype(np.uint8)
        dets1 = m.detect(frame, conf_threshold=0.0)
        dets2 = m.detect(frame, conf_threshold=0.0)
        assert len(dets1) == len(dets2)

    def test_nms(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 10, 10], [50, 50, 10, 10]],
                         np.float32)
        scores = np.array([0.9, 0.8, 0.7])
        keep = _nms(boxes, scores, 0.4)
        assert keep == [0, 2]


class TestBayesianTracker:
    def test_constant_velocity_prediction(self):
        tr = BayesianTracker()
        for f in range(6):
            tr.append([Detection(x=100 + 10 * f, y=50)])
            preds = tr.get_predicted_boxes()
        # after the ring buffer fills, prediction extrapolates +dx
        assert preds[0].x > 140
        assert preds[0].w == 10 and preds[0].name == "P"

    def test_nearest_matching(self):
        tr = BayesianTracker()
        tr.append([Detection(x=0, y=0), Detection(x=500, y=500)])
        tr.append([Detection(x=505, y=505), Detection(x=5, y=5)])
        recent = (tr.top - 1) % tr.hist
        # track 0 stays near origin, track 1 near (500,500)
        assert tr.x[0, recent] == 5
        assert tr.x[1, recent] == 505

    def test_unmatched_goes_to_slot0(self):
        # reference quirk: unused_id always returns 0 (bayesian.cpp:19-25)
        tr = BayesianTracker()
        tr.append([Detection(x=100, y=100)])
        tr.append([Detection(x=900, y=900)])   # too far -> slot 0
        recent = (tr.top - 1) % tr.hist
        assert tr.x[0, recent] == 900

    def test_error_tracking(self):
        tr = BayesianTracker()
        for f in range(8):
            tr.append([Detection(x=10 * f, y=0)])
            tr.get_predicted_boxes()
        assert tr.mean_error >= 0.0
