"""Unit tests: each dense op against its independent NumPy oracle
(tests/oracle.py) on random inputs — the per-stage numeric coverage the
reference never had (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereovision_tpu.params import robotics_params, middlebury_params
from stereovision_tpu.ops.filters import sobel3x3, sobel3x3_np
from stereovision_tpu.ops.descriptor import (compute_descriptor,
                                             compute_descriptor_np)
from stereovision_tpu.ops import postprocess as post
from stereovision_tpu.ops import support as S

import oracle


def _rand_img(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 255, (h, w), dtype=np.uint8)


def _rand_disp(h, w, seed=0, valid_frac=0.8, dmax=60):
    r = np.random.default_rng(seed)
    d = r.integers(0, dmax, (h, w)).astype(np.float32)
    # correlated validity patches so segments/gaps exist
    d[r.random((h, w)) > valid_frac] = -10
    d[r.random((h, w)) > 0.97] = -1
    return d


class TestFilters:
    def test_sobel3x3_matches_oracle(self):
        img = _rand_img(64, 96, 1)
        du, dv = sobel3x3(jnp.asarray(img))
        du_np, dv_np = sobel3x3_np(img)
        # interior agreement (borders are never consumed downstream)
        assert np.array_equal(np.asarray(du)[1:-1, 1:-1], du_np[1:-1, 1:-1])
        assert np.array_equal(np.asarray(dv)[1:-1, 1:-1], dv_np[1:-1, 1:-1])

    def test_sobel_range(self):
        img = _rand_img(32, 48, 2)
        du, dv = sobel3x3(jnp.asarray(img))
        assert np.asarray(du).dtype == np.uint8
        # flat image -> 128 everywhere
        flat = np.full((32, 48), 77, np.uint8)
        du, dv = sobel3x3(jnp.asarray(flat))
        assert np.all(np.asarray(du)[2:-2, 2:-2] == 128)


class TestDescriptor:
    def test_matches_oracle(self):
        img = _rand_img(48, 64, 3)
        d = np.asarray(compute_descriptor(jnp.asarray(img)))
        d_np = compute_descriptor_np(img)
        assert np.array_equal(d, d_np)

    def test_zero_outside_valid(self):
        img = _rand_img(40, 40, 4)
        d = np.asarray(compute_descriptor(jnp.asarray(img)))
        assert np.all(d[:, :3, :] == 0)
        assert np.all(d[:, :, -3:] == 0)


class TestSupportMatching:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_raw_grid_matches_oracle(self, seed):
        p = robotics_params(disp_max=47)
        h, w = 72, 96
        # structured pair: textured left, right = shifted with varying shift
        L = _rand_img(h, w, seed)
        R = np.empty_like(L)
        for v in range(h):
            shift = 6 + (v // 24) * 3
            R[:, :] = np.roll(L, -6, axis=1)
            R[v, :] = np.roll(L[v, :], -shift)
        dL = compute_descriptor(jnp.asarray(L))
        dR = compute_descriptor(jnp.asarray(R))
        mine = np.asarray(S.support_matches(dL, dR, p, apply_filters=False))
        ref = oracle.support_grid(compute_descriptor_np(L),
                                  compute_descriptor_np(R), p, w, h)
        assert np.array_equal(mine, ref)

    def test_sequential_filters_native_vs_python(self):
        from stereovision_tpu.hostlib import raster
        p = robotics_params()
        r = np.random.default_rng(5)
        d = r.integers(-1, 30, (40, 50)).astype(np.int16)
        if raster.get_lib() is None:
            pytest.skip("native hostlib unavailable")
        native = raster.filter_support_sequential(d, p)
        python = raster._filter_support_np(d.copy(), p)
        assert np.array_equal(native, python)


class TestPostprocess:
    def test_lr_check(self):
        p = robotics_params()
        D1 = _rand_disp(30, 40, 6)
        D2 = _rand_disp(30, 40, 7)
        o1, o2 = oracle.lr_check(D1, D2, p)
        m1, m2 = post.lr_consistency_check(jnp.asarray(D1), jnp.asarray(D2), p)
        assert np.array_equal(np.asarray(m1), o1)
        assert np.array_equal(np.asarray(m2), o2)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_speckle_removal(self, seed):
        p = robotics_params(speckle_size=12)
        D = _rand_disp(32, 40, seed, valid_frac=0.7, dmax=8)
        o = oracle.remove_small_segments(D, p)
        m = np.asarray(post.remove_small_segments(jnp.asarray(D), p))
        assert np.array_equal(m, o)

    def test_speckle_snake(self):
        # adversarial: long thin snake segment must not be falsely removed
        p = robotics_params(speckle_size=50)
        D = np.full((20, 60), -10.0, np.float32)
        # serpentine path of constant disparity, length > 50
        path_len = 0
        for i in range(0, 20, 2):
            D[i, :] = 5.0
            if i + 1 < 20:
                D[i + 1, -1 if (i // 2) % 2 == 0 else 0] = 5.0
            path_len += 60
        o = oracle.remove_small_segments(D, p)
        m = np.asarray(post.remove_small_segments(jnp.asarray(D), p))
        assert np.array_equal(m, o)
        assert (m == 5.0).sum() > 0  # snake survived

    @pytest.mark.parametrize("preset", ["robotics", "middlebury"])
    def test_gap_interpolation(self, preset):
        p = (robotics_params() if preset == "robotics"
             else middlebury_params())
        D = _rand_disp(24, 30, 8, valid_frac=0.6)
        o = oracle.gap_interpolation(D, p)
        m = np.asarray(post.gap_interpolation(jnp.asarray(D), p))
        np.testing.assert_allclose(m, o, atol=1e-5)

    def test_adaptive_mean(self):
        p = robotics_params()
        D = _rand_disp(26, 34, 9, valid_frac=0.85, dmax=12)
        o = oracle.adaptive_mean(D, p)
        m = np.asarray(post.adaptive_mean(jnp.asarray(D), p))
        np.testing.assert_allclose(m, o, atol=1e-4)

    def test_median(self):
        p = middlebury_params()
        D = _rand_disp(24, 28, 10, valid_frac=0.9, dmax=20)
        o = oracle.median_filter(D, p)
        m = np.asarray(post.median_filter(jnp.asarray(D), p))
        np.testing.assert_allclose(m, o, atol=1e-5)


class TestPlaneFit:
    """Device plane fit (exact-int Cramer, ops.planes.fit_plane_tables) vs
    the host f64 oracle (ops.planes.fit_planes)."""

    def _geometry(self, seed=0, n=200, w=1242, h=375):
        import numpy as np
        from stereovision_tpu.ops.planes import (
            add_corner_support_points, triangulate)
        r = np.random.default_rng(seed)
        pts = np.stack([r.integers(0, w, n), r.integers(0, h, n),
                        r.integers(0, 256, n)], axis=1).astype(np.int32)
        pts = add_corner_support_points(pts, w, h)
        return pts, triangulate(pts, False), triangulate(pts, True)

    def test_matches_host_oracle(self):
        import numpy as np
        import jax.numpy as jnp
        from stereovision_tpu.ops.planes import fit_planes, fit_plane_tables
        pts, tris_l, tris_r = self._geometry()
        for tris in (tris_l, tris_r):
            hl, hr = fit_planes(pts, tris)
            dl, dr = fit_plane_tables(jnp.asarray(pts), jnp.asarray(tris))
            dl, dr = np.asarray(dl), np.asarray(dr)
            # a, b are f32 ratios of exact ints; the host f64 LU path can
            # land 1 ulp away (and TPU f32 division is reciprocal-based)
            np.testing.assert_allclose(dl[:, :2], hl[:, :2], rtol=3e-7,
                                       atol=1e-9)
            np.testing.assert_allclose(dr[:, :2], hr[:, :2], rtol=3e-7,
                                       atol=1e-9)
            np.testing.assert_allclose(dl[:, 3], hr[:, 0], rtol=3e-7,
                                       atol=1e-9)
            # c reconstructed in f32: tiny fp divergence allowed
            np.testing.assert_allclose(dl[:, 2], hl[:, 2], atol=2e-3)
            np.testing.assert_allclose(dr[:, 2], hr[:, 2], atol=2e-3)

    def test_padding_rows_zero(self):
        import numpy as np
        import jax.numpy as jnp
        from stereovision_tpu.ops.planes import fit_plane_tables
        pts, tris_l, _ = self._geometry(seed=1)
        padded = np.full((len(tris_l) + 7, 3), -1, np.int16)
        padded[:len(tris_l)] = tris_l
        dl, dr = fit_plane_tables(jnp.asarray(pts), jnp.asarray(padded))
        assert np.asarray(dl)[len(tris_l):].sum() == 0
        assert np.asarray(dr)[len(tris_l):].sum() == 0

    def test_degenerate_collinear_zero(self):
        import numpy as np
        import jax.numpy as jnp
        from stereovision_tpu.ops.planes import fit_plane_tables
        pts = np.array([[0, 0, 5], [10, 0, 7], [20, 0, 9]], np.int32)
        tris = np.array([[0, 1, 2]], np.int32)
        dl, dr = fit_plane_tables(jnp.asarray(pts), jnp.asarray(tris))
        assert np.asarray(dl).sum() == 0 and np.asarray(dr).sum() == 0
