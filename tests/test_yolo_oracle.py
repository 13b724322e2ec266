"""Differential validation of the JAX darknet detector.

Genuine pretrained yolov4-tiny weights are not fetchable in this
environment (no egress; the reference repo ships only the cfg — its
.weights blob is absent there too).  Instead this validates every part of
the pipeline that real weights would exercise, against an INDEPENDENT
torch implementation of darknet built directly from the cfg sections:

  * the .weights binary layout (header, per-layer [bn or bias] + OIHW)
  * batch-norm folding math (the torch oracle applies BN explicitly,
    un-folded, eps=1e-5 — darknet's batch_normalize semantics)
  * conv stride/padding, leaky relu, maxpool, nearest upsample,
    route concat + grouped-split topology
  * the yolo-head decode (sigmoid xy with scale_x_y, exp wh anchors,
    obj * class scoring; reference consumer: detector.cpp:42-65)

Disagreement anywhere in the net would blow up the decoded outputs, so
an element-wise match on the final (N, 85) rows is a strong end-to-end
check of the loader + forward + decode.
"""

import os.path as osp

import numpy as np
import pytest

from stereovision_tpu.models.yolo import (
    YoloV4Tiny, builtin_yolov4_tiny_cfg)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def synth_weights(path, sections, rng):
    """Write a random darknet-layout .weights for the given cfg sections."""
    chunks = [np.array([0, 2, 5], np.int32).tobytes(),
              np.array([0], np.int64).tobytes()]
    c_in = int(sections[0].get("channels", 3))
    chans = []
    for i, l in enumerate(sections[1:]):
        t = l["type"]
        if t == "convolutional":
            k, f = int(l["size"]), int(l["filters"])
            if l.get("batch_normalize") == "1":
                bn_b = rng.normal(0, 0.5, f).astype(np.float32)
                bn_g = rng.normal(1, 0.3, f).astype(np.float32)
                bn_m = rng.normal(0, 0.5, f).astype(np.float32)
                bn_v = (np.abs(rng.normal(1, 0.3, f)) + 0.25).astype(np.float32)
                chunks += [bn_b.tobytes(), bn_g.tobytes(),
                           bn_m.tobytes(), bn_v.tobytes()]
            else:
                chunks.append(rng.normal(0, 0.5, f).astype(np.float32)
                              .tobytes())
            w = rng.normal(0, 1.0 / np.sqrt(k * k * c_in),
                           (f, c_in, k, k)).astype(np.float32)
            chunks.append(w.tobytes())
            c = f
        elif t == "route":
            refs = [int(x) for x in l["layers"].split(",")]
            refs = [r if r >= 0 else i + r for r in refs]
            c = sum(chans[r] for r in refs)
            if "groups" in l:
                c //= int(l["groups"])
        else:
            c = chans[i - 1] if i else c_in
        chans.append(c)
        c_in = c
    with open(path, "wb") as fh:
        fh.write(b"".join(chunks))


class TorchDarknet:
    """Independent darknet forward: reads the same .weights file, applies
    batch norm explicitly (no folding), NCHW torch ops throughout."""

    def __init__(self, sections, weights_path):
        self.net = sections[0]
        self.layers = sections[1:]
        self.size = int(self.net.get("width", 608))
        with open(weights_path, "rb") as f:
            np.fromfile(f, np.int32, 3)
            np.fromfile(f, np.int64, 1)
            buf = np.fromfile(f, np.float32)
        self.params = {}
        pos = 0
        c_in = int(self.net.get("channels", 3))
        chans = []
        for i, l in enumerate(self.layers):
            t = l["type"]
            if t == "convolutional":
                k, f = int(l["size"]), int(l["filters"])
                p = {}
                if l.get("batch_normalize") == "1":
                    for name in ("bn_b", "bn_g", "bn_m", "bn_v"):
                        p[name] = torch.from_numpy(
                            buf[pos:pos + f].copy())
                        pos += f
                else:
                    p["bias"] = torch.from_numpy(buf[pos:pos + f].copy())
                    pos += f
                n = f * c_in * k * k
                p["w"] = torch.from_numpy(
                    buf[pos:pos + n].copy()).reshape(f, c_in, k, k)
                pos += n
                self.params[i] = p
                c = f
            elif t == "route":
                refs = [int(x) for x in l["layers"].split(",")]
                refs = [r if r >= 0 else i + r for r in refs]
                c = sum(chans[r] for r in refs)
                if "groups" in l:
                    c //= int(l["groups"])
            else:
                c = chans[i - 1] if i else c_in
            chans.append(c)
            c_in = c
        assert pos == len(buf), (pos, len(buf))

    @torch.no_grad()
    def forward(self, x):
        """x: (1, 3, S, S) float tensor.  Returns decoded (N, 5+nc) rows."""
        acts, outs = [], []
        for i, l in enumerate(self.layers):
            t = l["type"]
            if t == "convolutional":
                p = self.params[i]
                k, s = int(l["size"]), int(l["stride"])
                pad = k // 2 if l.get("pad") == "1" else 0
                x = F.conv2d(x, p["w"], None, stride=s, padding=pad)
                if "bn_g" in p:
                    x = (x - p["bn_m"][None, :, None, None]) / torch.sqrt(
                        p["bn_v"][None, :, None, None] + 1e-5)
                    x = x * p["bn_g"][None, :, None, None] \
                        + p["bn_b"][None, :, None, None]
                else:
                    x = x + p["bias"][None, :, None, None]
                if l["activation"] == "leaky":
                    x = F.leaky_relu(x, 0.1)
            elif t == "maxpool":
                x = F.max_pool2d(x, int(l["size"]), int(l["stride"]))
            elif t == "upsample":
                x = F.interpolate(x, scale_factor=int(l["stride"]),
                                  mode="nearest")
            elif t == "route":
                refs = [int(r) for r in l["layers"].split(",")]
                refs = [r if r >= 0 else i + r for r in refs]
                x = torch.cat([acts[r] for r in refs], dim=1) \
                    if len(refs) > 1 else acts[refs[0]]
                if "groups" in l:
                    g, gid = int(l["groups"]), int(l["group_id"])
                    cs = x.shape[1] // g
                    x = x[:, gid * cs:(gid + 1) * cs]
            elif t == "yolo":
                outs.append(self._decode(x, l))
            acts.append(x)
        return torch.cat(outs, dim=0).numpy()

    def _decode(self, x, l):
        _, _, gh, gw = x.shape
        anchors = np.array([float(a) for a in
                            l["anchors"].replace(" ", "").split(",")]
                           ).reshape(-1, 2)
        mask = [int(m) for m in l["mask"].split(",")]
        na, nc = len(mask), int(l.get("classes", 80))
        sxy = float(l.get("scale_x_y", 1.0))
        # NCHW -> (gh, gw, na, 5+nc): channel dim is na*(5+nc) with the
        # anchor as the OUTER factor (darknet layout)
        v = x[0].reshape(na, 5 + nc, gh, gw).permute(2, 3, 0, 1)
        cy, cx = torch.meshgrid(torch.arange(gh, dtype=torch.float32),
                                torch.arange(gw, dtype=torch.float32),
                                indexing="ij")
        txy = torch.sigmoid(v[..., 0:2]) * sxy - 0.5 * (sxy - 1.0)
        bx = (txy[..., 0] + cx[..., None]) / gw
        by = (txy[..., 1] + cy[..., None]) / gh
        aw = torch.tensor([anchors[m][0] for m in mask],
                          dtype=torch.float32)
        ah = torch.tensor([anchors[m][1] for m in mask],
                          dtype=torch.float32)
        bw = torch.exp(v[..., 2]) * aw / self.size
        bh = torch.exp(v[..., 3]) * ah / self.size
        obj = torch.sigmoid(v[..., 4])
        cls = torch.sigmoid(v[..., 5:]) * obj[..., None]
        rows = torch.cat([torch.stack([bx, by, bw, bh, obj], dim=-1), cls],
                         dim=-1)
        return rows.reshape(-1, 5 + nc)


def small_cfg(size=160):
    """A reduced v4-tiny-style cfg (same layer vocabulary incl. grouped
    routes and both heads) small enough for a fast CPU test."""
    cfg = builtin_yolov4_tiny_cfg()
    cfg[0] = dict(cfg[0], width=str(size), height=str(size))
    return cfg


class TestYoloOracle:
    def _build(self, tmp_path, size):
        rng = np.random.default_rng(7)
        sections = small_cfg(size)
        wpath = str(tmp_path / "synth.weights")
        synth_weights(wpath, sections, rng)
        ours = YoloV4Tiny(sections)
        ours.load_darknet_weights(wpath)
        ref = TorchDarknet(sections, wpath)
        return ours, ref

    def test_forward_matches_torch_oracle(self, tmp_path):
        size = 160
        ours, ref = self._build(tmp_path, size)
        rng = np.random.default_rng(11)
        img = rng.random((size, size, 3), np.float32)

        import jax.numpy as jnp
        outs = [np.asarray(o)[0] for o in ours._fwd(jnp.asarray(img[None]))]
        mine = np.concatenate(outs, axis=0)
        theirs = ref.forward(torch.from_numpy(
            img.transpose(2, 0, 1)[None].copy()))

        assert mine.shape == theirs.shape
        # decoded rows: boxes are normalized [0,1]-ish, scores in [0,1]
        np.testing.assert_allclose(mine, theirs, rtol=2e-3, atol=2e-4)

    def test_real_frame_detections_match(self, tmp_path):
        """Full detect() path on a real KITTI frame: preprocessing
        (resize, BGR->RGB, /255 — blobFromImage semantics,
        detector.cpp:31) + forward + per-class threshold/NMS, vs the
        oracle fed through identical preprocessing."""
        frame_path = ("/root/reference/datasets/kitti_mini/image_02/data/"
                      "0000000000.png")
        if not osp.exists(frame_path):
            pytest.skip("kitti_mini not available")
        import cv2
        frame = cv2.imread(frame_path)
        size = 160
        ours, ref = self._build(tmp_path, size)

        dets = ours.detect(frame, conf_threshold=0.3)
        # oracle: same preprocessing contract
        rgb = np.ascontiguousarray(frame[..., ::-1])
        img = cv2.resize(rgb, (size, size)).astype(np.float32) / 255.0
        rows = ref.forward(torch.from_numpy(
            img.transpose(2, 0, 1)[None].copy()))
        # per-class max score must agree => same candidate sets
        fh, fw = frame.shape[:2]
        n_above = int((rows[:, 5:] >= 0.3).sum())
        assert len(dets) > 0 and n_above > 0
        for d in dets:
            # every reported detection corresponds to an oracle row above
            # threshold for that class at (nearly) the same box
            c = ref_class = None
            for ci in range(80):
                if ours.class_names[ci] == d.name:
                    c = ci
                    break
            assert c is not None
            sel = rows[:, 5 + c] >= 0.3
            boxes = np.stack([
                rows[sel, 0] * fw - rows[sel, 2] * fw / 2,
                rows[sel, 1] * fh - rows[sel, 3] * fh / 2,
                rows[sel, 2] * fw, rows[sel, 3] * fh], axis=1)
            err = np.abs(boxes - [d.x, d.y, d.w, d.h]).sum(1)
            assert err.min() < 4.0, (d, err.min())

    def test_opencv_dnn_detection_parity(self, tmp_path):
        """Validate detect() against OpenCV-DNN — the inference engine the
        reference actually uses (detector.cpp:29-133: readNetFromDarknet +
        blobFromImage + per-class NMSBoxes).

        cv2 5.x removed the darknet importer, so the same network (same
        synthetic .weights, BN folded independently from the torch oracle's
        raw tensors) is fed to cv2 through a hand-rolled ONNX graph
        (tests/onnx_minimal.py); the test then replicates the reference's
        exact consumer chain — cv2.dnn.blobFromImage preprocessing, cv2
        engine forward, detector.cpp's per-class threshold + NMSBoxes —
        and asserts box parity (IoU > 0.9, same classes, same counts)
        with our detect() on a real KITTI frame."""
        frame_path = ("/root/reference/datasets/kitti_mini/image_02/data/"
                      "0000000000.png")
        if not osp.exists(frame_path):
            pytest.skip("kitti_mini not available")
        import cv2
        if not hasattr(cv2.dnn, "readNetFromONNX"):
            pytest.skip("cv2.dnn without ONNX importer")
        from onnx_minimal import export_darknet

        size, conf_thr, nms_thr = 160, 0.3, 0.4
        sections = small_cfg(size)
        rng = np.random.default_rng(7)
        wpath = str(tmp_path / "synth.weights")
        synth_weights(wpath, sections, rng)
        tref = TorchDarknet(sections, wpath)
        onnx_path = str(tmp_path / "net.onnx")
        heads = export_darknet(sections, tref.params, size, onnx_path)

        net = cv2.dnn.readNetFromONNX(onnx_path)
        frame = cv2.imread(frame_path)
        fh, fw = frame.shape[:2]
        # reference preprocessing: detector.cpp:31 (0.00392 = 1/255,
        # swapRB, no crop)
        blob = cv2.dnn.blobFromImage(frame, 1 / 255.0, (size, size),
                                     (0, 0, 0), True, False)
        net.setInput(blob)
        feats = net.forward([h[0] for h in heads])

        # independent numpy decode of the raw heads (the piece cv2's
        # darknet Region layer used to do; math from the yolo cfg spec)
        rows = []
        yolo_ls = [l for l in sections[1:] if l["type"] == "yolo"]
        for f, l in zip(feats, yolo_ls):
            anchors = np.array([float(a) for a in
                                l["anchors"].replace(" ", "").split(",")]
                               ).reshape(-1, 2)
            mask = [int(m) for m in l["mask"].split(",")]
            na, nc = len(mask), int(l.get("classes", 80))
            sxy = float(l.get("scale_x_y", 1.0))
            _, _, gh, gw = f.shape

            def sig(z):
                return 1.0 / (1.0 + np.exp(-z))
            v = f[0].reshape(na, 5 + nc, gh, gw).transpose(2, 3, 0, 1)
            cy, cx = np.mgrid[0:gh, 0:gw].astype(np.float32)
            txy = sig(v[..., 0:2]) * sxy - 0.5 * (sxy - 1.0)
            bx = (txy[..., 0] + cx[..., None]) / gw
            by = (txy[..., 1] + cy[..., None]) / gh
            aw = np.array([anchors[m][0] for m in mask], np.float32)
            ah = np.array([anchors[m][1] for m in mask], np.float32)
            bw = np.exp(v[..., 2]) * aw / size
            bh = np.exp(v[..., 3]) * ah / size
            obj = sig(v[..., 4])
            cls = sig(v[..., 5:]) * obj[..., None]
            rows.append(np.concatenate(
                [np.stack([bx, by, bw, bh, obj], -1), cls],
                -1).reshape(-1, 5 + nc))
        rows = np.concatenate(rows, axis=0)

        # reference consumer (detector.cpp:46-66): per-class candidate
        # collection at the confidence threshold, then per-class NMSBoxes
        ref_dets = []
        for c in range(80):
            keep = rows[:, 5 + c] >= conf_thr
            if not keep.any():
                continue
            r = rows[keep]
            s = rows[keep, 5 + c].astype(np.float32)
            boxes = [[int(x * fw - w * fw / 2), int(y * fh - h * fh / 2),
                      int(w * fw), int(h * fh)]
                     for x, y, w, h in r[:, :4]]
            idx = cv2.dnn.NMSBoxes(boxes, s, 0.0, nms_thr)
            for i in np.asarray(idx).reshape(-1):
                ref_dets.append((c, boxes[int(i)], float(s[int(i)])))

        ours = YoloV4Tiny(sections)
        ours.load_darknet_weights(wpath)
        dets = ours.detect(frame, conf_threshold=conf_thr,
                           nms_threshold=nms_thr)

        assert len(ref_dets) > 0, "degenerate test: no cv2-side detections"
        assert len(dets) == len(ref_dets), (dets, ref_dets)

        def iou(a, b):
            ax1, ay1, aw, ah = a
            bx1, by1, bw_, bh_ = b
            ix = max(0, min(ax1 + aw, bx1 + bw_) - max(ax1, bx1))
            iy = max(0, min(ay1 + ah, by1 + bh_) - max(ay1, by1))
            inter = ix * iy
            return inter / max(aw * ah + bw_ * bh_ - inter, 1)

        for c, box, score in ref_dets:
            name = ours.class_names[c]
            matches = [d for d in dets if d.name == name
                       and iou((d.x, d.y, d.w, d.h), box) > 0.9]
            assert matches, (name, box, dets)
            assert abs(matches[0].conf - score) < 1e-3

    def test_weights_loader_rejects_size_mismatch(self, tmp_path):
        sections = small_cfg(160)
        rng = np.random.default_rng(0)
        wpath = str(tmp_path / "bad.weights")
        synth_weights(wpath, sections, rng)
        with open(wpath, "ab") as f:
            f.write(np.zeros(10, np.float32).tobytes())
        m = YoloV4Tiny(sections)
        with pytest.raises(ValueError):
            m.load_darknet_weights(wpath)
