"""Live-visualization subsystem: overlays, camera, 3D renderer, viewer loop
(reference surfaces: graphing.h viewer, detector.cpp drawPred + FPS text,
stereo_vision.cpp Detections/Disparity windows)."""

import numpy as np
import pytest

from stereovision_tpu.viz_live import (
    Camera, LiveViewer, PointCloudRenderer, draw_detections, tracker_cubes)
from stereovision_tpu.models.bayesian import Detection


def _det(x=10, y=20, w=30, h=15, name="car", conf=0.9):
    return Detection(name=name, x=x, y=y, w=w, h=h, conf=conf,
                     r=1.0, g=0.5, b=0.0)


class TestOverlays:
    def test_draw_detections_burns_pixels(self):
        frame = np.zeros((100, 120, 3), np.uint8)
        out = draw_detections(frame, [_det()], fps=12.5)
        assert out.shape == frame.shape
        assert (out != frame).any()
        assert (frame == 0).all()            # input untouched
        # bottom box edge pixels carry the detection color (BGR of
        # r=1,g=.5,b=0); the top edge is under the label background
        assert out[35, 25].tolist() == [0, 127, 255]

    def test_fps_only(self):
        frame = np.zeros((60, 200, 3), np.uint8)
        out = draw_detections(frame, [], fps=30.0)
        assert (out[:, :, 1] > 0).any()      # green FPS text


class TestCamera:
    def test_default_looks_forward(self):
        cam = Camera()
        np.testing.assert_allclose(cam.forward(), [0, 0, 1], atol=1e-12)

    def test_wasd_moves(self):
        cam = Camera()
        z0 = cam.z
        assert cam.handle_key("w")
        assert cam.z > z0
        x0 = cam.x
        assert cam.handle_key("d")
        assert cam.x > x0
        y0 = cam.y
        assert cam.handle_key("r")
        assert cam.y < y0                     # up = -y (image frame)

    def test_yaw_changes_forward(self):
        cam = Camera()
        for _ in range(10):
            cam.handle_key("right")
        f = cam.forward()
        assert abs(f[0]) > 0.1                # rotated toward +x
        assert cam.handle_key("?") is False   # unknown key

    def test_pitch_clamped(self):
        cam = Camera()
        for _ in range(200):
            cam.handle_key("up")
        assert -1.5 <= cam.pitch <= 1.5


class TestRenderer:
    def test_points_rendered(self):
        r = PointCloudRenderer(160, 120)
        cam = Camera(z=-5.0)
        pts = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        img = r.render(pts, cam)
        assert img.shape == (120, 160, 3)
        assert (img > 12).any()               # points brighter than bg

    def test_zbuffer_near_wins(self):
        r = PointCloudRenderer(64, 64)
        cam = Camera(z=-5.0)
        # two points projecting to the same pixel; near one is white-ish,
        # far one given explicit colors
        pts = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 10.0]])
        colors = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
        img = r.render(pts, cam, colors=colors)
        assert img[32, 32].tolist() == [255, 0, 0]

    def test_nonfinite_and_behind_camera_skipped(self):
        r = PointCloudRenderer(64, 64)
        cam = Camera(z=-5.0)
        pts = np.array([[np.inf, 0, 0], [np.nan, 1, 1], [0, 0, -50.0]])
        img = r.render(pts, cam, draw_rings=False)
        assert (img == 12).all()              # nothing drawn

    def test_range_rings(self):
        """Ground-plane range rings (graphing.h:139-170): red circles at
        radius 1..9 m on y=0 plus a green origin marker, on by default."""
        r = PointCloudRenderer(128, 128)
        cam = Camera(y=-3.0, z=-5.0, pitch=0.4)
        img = r.render(np.zeros((0, 3)), cam)
        red = (img[..., 2] == 255) & (img[..., 0] == 0) & (img[..., 1] == 0)
        green = (img[..., 1] == 255) & (img[..., 2] == 0)
        assert red.sum() > 100                # ring points rasterized
        assert green.any()                    # origin marker
        off = r.render(np.zeros((0, 3)), cam, draw_rings=False)
        assert (off == 12).all()

    def test_cube_wireframe(self):
        r = PointCloudRenderer(128, 128)
        cam = Camera(z=-6.0)
        img = r.render(np.zeros((0, 3)), cam,
                       cubes=[{"center": (0, 0, 0), "size": (2, 2, 2),
                               "color": (0, 255, 255)}])
        ys, xs = np.nonzero((img[..., 1] == 255) & (img[..., 2] == 255))
        assert len(ys) > 20                   # edges rasterized

    def test_tracker_cubes(self):
        class Obj:
            name = "car"
        class Trk:
            objects = [Obj(), Obj()]
        cubes = tracker_cubes(Trk(), positions=np.array([[0, 0, 5.0],
                                                         [1, 1, 8.0]]))
        assert len(cubes) == 2
        assert cubes[1]["center"] == (1.0, 1.0, 8.0)
        assert cubes[0]["label"] == "car"


class TestLiveViewer:
    def _fake_out(self, h=48, w=64):
        dmap = np.zeros((h, w), np.uint8)
        dmap[h // 2:, :] = 128
        pts = np.random.default_rng(0).normal(0, 1, (h * w, 3))
        pts[:, 2] = np.abs(pts[:, 2]) + 2
        return {"dmap": dmap, "points": pts}

    def test_headless_show_renders_all_windows(self, monkeypatch, tmp_path):
        # force the headless path regardless of the test host
        v = LiveViewer(view3d=True, width=96, height=64,
                       record_dir=str(tmp_path))
        v._display = False
        left = np.full((48, 64, 3), 40, np.uint8)
        rendered = v.show(self._fake_out(), left, [_det(x=5, y=5, w=10,
                                                        h=10)], fps=9.0)
        assert set(rendered) == {"detections", "disparity", "cloud"}
        assert rendered["cloud"].shape == (64, 96, 3)
        # recorded artifacts exist for every window
        files = sorted(p.name for p in tmp_path.iterdir())
        assert len(files) == 3 and files[0].startswith("cloud_000000")

    def test_camera_motion_applies_between_frames(self):
        v = LiveViewer(view3d=True, width=64, height=64)
        v._display = False
        out = self._fake_out(32, 32)
        left = np.zeros((32, 32, 3), np.uint8)
        a = v.show(out, left)["cloud"]
        v.cam.handle_key("w")
        v.cam.handle_key("w")
        b = v.show(out, left)["cloud"]
        assert (a != b).any()
