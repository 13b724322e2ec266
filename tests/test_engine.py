"""Engine-level tests: full pipeline on synthetic scenes (CPU), subsampling
mode, streaming/batched paths, reprojection, calibration."""

import os.path as osp

import numpy as np
import jax.numpy as jnp
import pytest

from stereovision_tpu.params import robotics_params
from stereovision_tpu.models.elas import ElasEngine

CALIB = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                 "stereovision_tpu", "data", "kitti_2011_09_26.yml")


def _shifted_scene(h=120, w=160, d=7, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.integers(0, 255, (h, w), dtype=np.uint8)
    R = np.roll(L, -d, axis=1)
    return L, R


class TestPipeline:
    def test_full_pipeline_shifted_scene(self):
        L, R = _shifted_scene()
        p = robotics_params(postprocess_only_left=False, disp_max=63)
        eng = ElasEngine(p, width=160, height=120)
        D1, D2 = eng.process(L, R)
        D1 = np.asarray(D1)
        valid = D1 >= 0
        assert valid.mean() > 0.5
        assert (D1[valid] == 7).mean() > 0.99

    def test_subsampling_mode(self):
        L, R = _shifted_scene(h=144, w=192)
        p = robotics_params(postprocess_only_left=False, disp_max=63,
                            subsampling=True)
        eng = ElasEngine(p, width=192, height=144)
        D1, D2 = eng.process(L, R)
        D1 = np.asarray(D1)
        assert D1.shape == (72, 96)
        valid = D1 >= 0
        assert valid.mean() > 0.4
        assert (D1[valid] == 7).mean() > 0.99

    def test_process_jit_pure_callback(self):
        L, R = _shifted_scene()
        p = robotics_params(postprocess_only_left=False, disp_max=63)
        eng = ElasEngine(p, width=160, height=120)
        D1a, _ = eng.process(L, R)
        D1b, _ = eng.process_jit(jnp.asarray(L), jnp.asarray(R))
        assert np.array_equal(np.asarray(D1a), np.asarray(D1b))


class TestStereoEngine:
    @pytest.fixture(scope="class")
    def engine(self):
        from stereovision_tpu.engine import StereoEngine
        from stereovision_tpu.params import robotics_params
        return StereoEngine(CALIB, 160, 120, use_pallas=False,
                            params=robotics_params(disp_max=63))

    def test_process_frame(self, engine):
        L, R = _shifted_scene()
        Lc = np.stack([L] * 3, -1)
        Rc = np.stack([R] * 3, -1)
        out = engine.process_frame(Lc, Rc)
        assert out["dmap"].shape == (120, 160)
        assert out["points"].shape == (120 * 160, 3)
        # display disparity = 4x true disparity, saturated uint8
        dm = out["dmap"]
        assert dm.dtype == np.uint8
        assert (dm[dm > 0] == 28).mean() > 0.9  # 7 * 4

    def test_stream_matches_blocking(self, engine):
        L, R = _shifted_scene()
        Lc = np.stack([L] * 3, -1)
        Rc = np.stack([R] * 3, -1)
        blocking = engine.process_frame(Lc, Rc)
        frames = [(Lc, Rc)] * 3
        outs = list(engine.stream(iter(frames)))
        assert len(outs) == 3
        for o in outs:
            assert np.array_equal(o["dmap"], blocking["dmap"])

    def test_stream_batched(self, engine):
        L, R = _shifted_scene()
        Lc = np.stack([L] * 3, -1)
        Rc = np.stack([R] * 3, -1)
        blocking = engine.process_frame(Lc, Rc)
        outs = list(engine.stream_batched(iter([(Lc, Rc)] * 5), batch=2))
        assert len(outs) == 5
        for o in outs:
            assert np.array_equal(np.asarray(o["dmap"]), blocking["dmap"])

    def test_stream_batched_fused(self, engine):
        """The single-dispatch fused mode (stage A -> pure_callback host
        geometry -> tail in ONE jitted call) matches the blocking path."""
        L, R = _shifted_scene()
        Lc = np.stack([L] * 3, -1)
        Rc = np.stack([R] * 3, -1)
        blocking = engine.process_frame(Lc, Rc)
        outs = list(engine.stream_batched(iter([(Lc, Rc)] * 5), batch=2,
                                          fused=True))
        assert len(outs) == 5
        for o in outs:
            assert np.array_equal(np.asarray(o["dmap"]), blocking["dmap"])

    def test_lifecycle_close_releases_workers(self):
        """close() must shut down the stream executors and host pool so
        long-running/looped use does not leak threads or processes
        (reference clean(), stereo_vision.cpp:105-114)."""
        import threading
        from stereovision_tpu.engine import StereoEngine
        from stereovision_tpu.params import robotics_params
        L, R = _shifted_scene()
        Lc = np.stack([L] * 3, -1)
        Rc = np.stack([R] * 3, -1)
        before = threading.active_count()
        with StereoEngine(CALIB, 160, 120, use_pallas=False,
                          params=robotics_params(disp_max=63)) as eng:
            outs = list(eng.stream_batched(iter([(Lc, Rc)] * 3), batch=2,
                                           host_workers="thread"))
            assert len(outs) == 3
            assert eng._executors is not None
        assert eng._executors is None
        assert eng.elas._host_pool is None
        # executor threads are joined by shutdown(wait=True)
        assert threading.active_count() <= before + 1

    def test_worker_warnings_surface_parent_side(self):
        """Warnings raised inside host_mid_standalone (support thinning,
        span overflow) must be captured and re-emitted by the batched
        path."""
        from stereovision_tpu.models.elas import host_mid_standalone
        from stereovision_tpu.params import robotics_params
        p = robotics_params(disp_max=63)
        # dense grid -> many support points; tiny n_max forces thinning
        rng = np.random.default_rng(0)
        d_can = rng.integers(0, 60, (24, 32)).astype(np.float32)
        g = host_mid_standalone(d_can, p, width=160, height=120,
                                n_max=64, t_max=200, s_max=64,
                                host_filters=False)
        assert any("thinned" in w for w in g["warnings"])

    def test_object_positions(self, engine):
        pts = np.zeros((120 * 160, 3), np.float32)
        pts[:, 2] = 5.0
        boxes = np.array([[10, 10, 20, 20]], np.int32)
        pos = engine.object_positions(pts, boxes)
        assert np.allclose(pos[0, 2], 5.0)


class TestReproject:
    def test_q_reprojection(self):
        from stereovision_tpu.ops.reproject import reproject
        Q = np.array([[1, 0, 0, -100.0],
                      [0, 1, 0, -50.0],
                      [0, 0, 0, 400.0],
                      [0, 0, 2.0, 0.0]])
        d = np.full((4, 6), 8.0, np.float32)
        pts = np.asarray(reproject(jnp.asarray(d), Q))
        # W = 2*d = 16 -> Z = 400/16 = 25
        assert np.allclose(pts[..., 2], 25.0)
        assert np.allclose(pts[0, 0, 0], -100.0 / 16.0)

    def test_robot_transform(self):
        from stereovision_tpu.ops.reproject import apply_robot_transform
        pts = jnp.asarray(np.ones((2, 2, 3), np.float32))
        XR = np.eye(3) * 2.0
        XT = np.array([1.0, 0.0, -1.0])
        out = np.asarray(apply_robot_transform(pts, XR, XT))
        assert np.allclose(out, [3.0, 2.0, 1.0])


class TestCalibration:
    def test_yaml_parse_both_formats(self):
        from stereovision_tpu.io.calibration import load_calibration
        c = load_calibration(CALIB)
        assert c["K1"].shape == (3, 3)
        assert abs(c["K1"][0, 0] - 984.2439) < 1e-3
        assert c["R"].shape == (3, 3)
        assert c["T"].size == 3

    def test_rectification_q_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        from stereovision_tpu.io.calibration import (
            load_calibration, _stereo_rectify_np, stereo_rectify)
        c = load_calibration(CALIB)
        size = (1242, 375)
        ours = _stereo_rectify_np(c["K1"], c["D1"], c["K2"], c["D2"], size,
                                  c["R"], c["T"], size, False)
        ref = stereo_rectify(c["K1"], c["D1"], c["K2"], c["D2"], size,
                             c["R"], c["T"])
        # The fallback does not reproduce cv2's alpha=0 ROI scaling, but the
        # baseline term must agree in magnitude (depth scale) and the focal
        # must be in the right range.
        assert np.allclose(abs(ours.Q[3, 2]), abs(ref.Q[3, 2]), rtol=1e-3)
        assert abs(ours.Q[2, 3] - ref.Q[2, 3]) / ref.Q[2, 3] < 0.1
