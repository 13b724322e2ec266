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
