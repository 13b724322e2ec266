"""IO round-trips, visualization exports, CLI smoke tests."""

import os
import os.path as osp

import numpy as np
import pytest


class TestPgm:
    def test_roundtrip(self, tmp_path):
        from stereovision_tpu.io.pgm import load_pgm, save_pgm
        img = np.random.default_rng(0).integers(
            0, 255, (37, 53), dtype=np.uint8)
        path = str(tmp_path / "t.pgm")
        save_pgm(img, path)
        assert np.array_equal(load_pgm(path), img)

    def test_comment_header(self, tmp_path):
        from stereovision_tpu.io.pgm import load_pgm
        path = str(tmp_path / "c.pgm")
        with open(path, "wb") as f:
            f.write(b"P5\n# a comment\n4 2\n255\n" + bytes(8))
        assert load_pgm(path).shape == (2, 4)


class TestKitti:
    def test_raw_sequence(self, tmp_path):
        from stereovision_tpu.io.kitti import KittiRawSequence
        import cv2
        for cam in ("image_02", "image_03"):
            d = tmp_path / cam / "data"
            d.mkdir(parents=True)
            for i in range(3):
                img = np.full((30, 40, 3), i * 10, np.uint8)
                cv2.imwrite(str(d / f"{i:010d}.png"), img)
        seq = KittiRawSequence(str(tmp_path), width=20, height=15)
        assert len(seq) == 3
        l, r = seq[1]
        assert l.shape == (15, 20, 3)
        assert len(list(seq.frames())) == 3


class TestViz:
    def test_top_view(self):
        from stereovision_tpu.viz import points_to_top_view
        pts = np.array([[1.0, 2.0, 0.0], [5.0, -3.0, 1.0],
                        [100.0, 0.0, 0.0]])  # last one out of range
        img = points_to_top_view(pts, (-10, 10), (-10, 10), (-2, 2), scale=2)
        assert img.dtype == np.uint8
        assert (img > 0).sum() == 2

    def test_ply_export(self, tmp_path):
        from stereovision_tpu.viz import save_ply
        pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
        path = str(tmp_path / "c.ply")
        save_ply(pts, path)
        text = open(path).read()
        assert "element vertex 50" in text
        # 7 header lines (ply/format/element/3 props/end_header) + points
        assert len(text.strip().split("\n")) == 7 + 50

    def test_colorize(self):
        from stereovision_tpu.viz import colorize_disparity
        d = np.arange(256, dtype=np.uint8).reshape(16, 16)
        c = colorize_disparity(d)
        assert c.shape == (16, 16, 3)
        assert (c[0, 0] == 0).all()  # invalid -> black


class TestCli:
    def test_parser_reference_flags(self):
        from stereovision_tpu.cli import build_parser
        args = build_parser().parse_args(
            ["-k", "/tmp/x", "-s", "1", "-f", "2.0", "-e", "2"])
        assert args.kitti == "/tmp/x"
        assert args.subsampling == 1
        assert args.scale == 2.0

    @pytest.mark.slow
    def test_profile_mode(self, tmp_path):
        """-P golden-producer on a small synthetic pair."""
        from stereovision_tpu.io.pgm import save_pgm, load_pgm
        from stereovision_tpu.cli import main
        rng = np.random.default_rng(0)
        L = rng.integers(0, 255, (80, 120), dtype=np.uint8)
        R = np.roll(L, -6, axis=1)
        src = tmp_path / "profile"
        src.mkdir()
        save_pgm(L, str(src / "tiny_left.pgm"))
        save_pgm(R, str(src / "tiny_right.pgm"))
        out = tmp_path / "out"
        rc = main(["-P", "--profile_dir", str(src), "--out_dir", str(out)])
        assert rc == 0
        disp = load_pgm(str(out / "tiny_left_disp.pgm"))
        assert disp.shape == (80, 120)
        assert disp.max() > 0


class TestPackagedData:
    """Packaged calibration rigs + YOLO class list (reference data/ parity)."""

    PKG = osp.join(osp.dirname(osp.abspath(__file__)), "..",
                   "stereovision_tpu", "data")
    RIGS = ["Kitti_Color", "amrl_jackal_webcam_stereo", "custom",
            "kitti_2011_09_26", "kitti_for_color", "kitti_for_grayscale",
            "kitti_gaoxiang12_2017"]

    @pytest.mark.parametrize("rig", RIGS)
    def test_calibration_loads_and_rectifies(self, rig):
        from stereovision_tpu.io.calibration import (
            load_calibration, rectification_from_yaml)
        path = osp.join(self.PKG, "calibration", rig + ".yml")
        c = load_calibration(path)
        for k in ("K1", "K2", "D1", "D2", "R", "T", "XR", "XT"):
            assert k in c, f"{rig} missing {k}"
        assert c["K1"].shape == (3, 3) and c["R"].shape == (3, 3)
        rect = rectification_from_yaml(path, 640, 480, compute_maps=True)
        assert np.isfinite(rect.Q).all() and rect.Q[3, 2] != 0
        assert rect.lmap.shape == (480, 640, 2)
        # rig values must round-trip the reference originals bit-exactly
        ref = osp.join("/root/reference/data/calibration")
        for f in os.listdir(ref):
            if osp.splitext(f)[0] == rig:
                rc = load_calibration(osp.join(ref, f))
                for k, v in rc.items():
                    # shape conventions differ (we store vectors flat)
                    assert np.array_equal(
                        np.asarray(c[k], np.float64).reshape(-1),
                        np.asarray(v, np.float64).reshape(-1)), (rig, k)

    def test_classes_file(self):
        path = osp.join(self.PKG, "yolo", "classes.txt")
        names = [l.strip() for l in open(path) if l.strip()]
        assert len(names) == 80 and names[0] == "person" and "car" in names
        from stereovision_tpu.models.yolo import YoloV4Tiny
        m = YoloV4Tiny.from_files()
        assert m.class_names == names

    def test_live_engine_non_kitti_rig(self):
        """Engine init + one frame on the AMRL Jackal webcam rig (640x480),
        the live-mode path with a packaged non-KITTI calibration."""
        from stereovision_tpu.engine import StereoEngine
        calib = osp.join(self.PKG, "calibration",
                         "amrl_jackal_webcam_stereo.yml")
        eng = StereoEngine(calib, 320, 240)
        r = np.random.default_rng(3)
        L = r.integers(0, 255, (240, 320, 3), dtype=np.uint8)
        R = np.roll(L, 4, axis=1)
        out = eng.process_frame(L, R)
        assert out["dmap"].shape == (240, 320)
        pc = np.asarray(out["points"])
        assert pc.shape == (240 * 320, 3)
        # points at valid-disparity pixels must be finite (invalid pixels
        # reproject to inf through Q, as in the reference)
        valid = np.asarray(out["dmap"]).reshape(-1) > 0
        assert valid.any() and np.isfinite(pc[valid]).all()


class TestDisplayFlags:
    def test_parser_display_flags(self):
        from stereovision_tpu.cli import build_parser
        args = build_parser().parse_args(["-k", "/tmp/x", "--view3d",
                                          "--record", "/tmp/r"])
        assert args.view3d and args.record == "/tmp/r"
        assert not args.display          # implied at runtime, not parse time

    @pytest.mark.slow
    def test_record_mode_writes_viewer_frames(self, tmp_path):
        """Full CLI with --record on a downscaled KITTI loop (headless):
        the viewer must spool detections/disparity/cloud PNGs."""
        kitti = "/root/reference/datasets/kitti_mini"
        if not osp.isdir(kitti):
            pytest.skip("kitti_mini not available")
        from stereovision_tpu.cli import main
        rec = tmp_path / "rec"
        rc = main(["-k", kitti, "--frames", "1", "-f", "4.0",
                   "--view3d", "--record", str(rec)])
        assert rc == 0
        names = {p.name.split("_")[0] for p in rec.iterdir()}
        assert {"detections", "disparity", "cloud"} <= names

    def test_packaged_yolo_cfg_roundtrip(self):
        """data/yolo/yolov4-tiny.cfg must parse to exactly the builtin
        topology (the file is emitted from it)."""
        from stereovision_tpu.models.yolo import (
            builtin_yolov4_tiny_cfg, parse_darknet_cfg)
        path = osp.join(TestPackagedData.PKG, "yolo", "yolov4-tiny.cfg")
        assert parse_darknet_cfg(path) == builtin_yolov4_tiny_cfg()
