"""Host-side geometry: support-point extraction, Delaunay triangulation,
per-triangle plane fits, and triangle-id rasterization.

This is the only irregular, data-dependent part of the pipeline and is tiny
(O(#support points) ~ thousands), so it runs on the host — either as pure
NumPy/SciPy here, or through the optional C++ rasterizer in
stereovision_tpu/hostlib (see csrc/svtpu_host.cpp).  Everything it produces
for the device is fixed-shape: padded support arrays, padded triangle plane
tables, and a dense per-pixel triangle-id map.

Reference equivalents:
  computeDelaunayTriangulation  src/serial_includes/elas/elas.cpp:442-501
  computeDisparityPlanes        elas.cpp:503-575
  addCornerSupportPoints        elas.cpp:235-264
  triangle rasterization loop   elas.cpp:839-941 (scanline, corners sorted
                                by u; later triangles overwrite earlier ones
                                on shared edges)
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    from scipy.spatial import Delaunay as _Delaunay
except Exception:  # pragma: no cover
    _Delaunay = None

from ..params import ElasParams


def support_points_from_grid(d_can: np.ndarray, step: int) -> np.ndarray:
    """Dense candidate grid -> (N, 3) int32 [u, v, d] support points, in the
    reference's u-major emission order (elas.cpp:424-428)."""
    Hc, Wc = d_can.shape
    pts = []
    du = np.asarray(d_can)
    uc_idx, vc_idx = np.meshgrid(np.arange(Wc), np.arange(Hc), indexing="ij")
    dT = du.T  # (Wc, Hc) so iteration order matches u-major
    mask = dT >= 0
    us = (uc_idx[mask] * step).astype(np.int32)
    vs = (vc_idx[mask] * step).astype(np.int32)
    ds = dT[mask].astype(np.int32)
    return np.stack([us, vs, ds], axis=1).astype(np.int32)


def add_corner_support_points(pts: np.ndarray, width: int,
                              height: int) -> np.ndarray:
    """Append 6 border points with nearest-neighbour disparities
    (reference elas.cpp:235-264)."""
    border = np.array(
        [[0, 0, 0], [0, height - 1, 0], [width - 1, 0, 0],
         [width - 1, height - 1, 0]], dtype=np.int64)
    if len(pts):
        for i in range(4):
            du = border[i, 0] - pts[:, 0].astype(np.int64)
            dv = border[i, 1] - pts[:, 1].astype(np.int64)
            j = np.argmin(du * du + dv * dv)
            border[i, 2] = pts[j, 2]
    extra = np.array(
        [[border[2, 0] + border[2, 2], border[2, 1], border[2, 2]],
         [border[3, 0] + border[3, 2], border[3, 1], border[3, 2]]],
        dtype=np.int64)
    allb = np.concatenate([border, extra], axis=0).astype(np.int32)
    return np.concatenate([pts, allb], axis=0) if len(pts) else allb


def triangulate(pts: np.ndarray, right_image: bool) -> np.ndarray:
    """Delaunay triangulation of support points; for the right image the
    points are projected to (u - d, v) (reference elas.cpp:451-461).
    Returns (T, 3) int32 corner indices.

    Note: the reference uses Shewchuk's Triangle; SciPy uses Qhull.  On
    co-circular point sets (the regular candidate lattice) the two may pick
    different diagonals — the affected pixels sit on triangle borders where
    both planes interpolate the same support disparities, so the effect is
    below the bad-3px comparison tolerance.
    """
    if _Delaunay is None:
        raise RuntimeError("scipy is required for Delaunay triangulation")
    if right_image:
        xy = np.stack([pts[:, 0] - pts[:, 2], pts[:, 1]], 1).astype(np.float64)
    else:
        xy = pts[:, :2].astype(np.float64)
    if len(xy) < 3:
        return np.zeros((0, 3), np.int32)
    try:
        tri = _Delaunay(xy)
    except Exception:
        return np.zeros((0, 3), np.int32)
    return tri.simplices.astype(np.int32)


def fit_planes(pts: np.ndarray, tris: np.ndarray) -> Tuple[np.ndarray,
                                                           np.ndarray]:
    """Per-triangle disparity planes for both images.

    Solves [u v 1] @ (a,b,c) = d with left u and with right u - d
    (reference elas.cpp:503-575).  Singular systems yield (0,0,0).
    Returns (planes_left (T,3) f32, planes_right (T,3) f32).
    """
    if len(tris) == 0:
        z = np.zeros((0, 3), np.float32)
        return z, z
    P = pts[tris]                       # (T, 3, 3) [u, v, d]
    d = P[..., 2].astype(np.float64)    # (T, 3)
    ones = np.ones_like(d)

    def solve(ucoord):
        A = np.stack([ucoord, P[..., 1].astype(np.float64), ones], axis=-1)
        det = np.linalg.det(A)
        ok = np.abs(det) > 1e-12
        Asafe = np.where(ok[:, None, None], A, np.eye(3)[None])
        x = np.linalg.solve(Asafe, d[..., None])[..., 0]
        return np.where(ok[:, None], x, 0.0).astype(np.float32)

    left = solve(P[..., 0].astype(np.float64))
    right = solve((P[..., 0] - P[..., 2]).astype(np.float64))
    return left, right


def fit_plane_tables(pts, tris):
    """Device-side plane fit: (N, 3) int support points [u, v, d] +
    (T, 3) int triangle vertex indices -> (T, 4) f32 table
    [a, b, c, a_other] (the layout ops.matching consumes).

    Shipping vertex indices (int16, 6 B/triangle) instead of precomputed
    plane tables (f32, 16 B/triangle) cuts the per-frame geometry H2D by
    ~2.5x; the fit itself is exact integer Cramer in vertex-0-translated
    coordinates: every product fits 24 bits, so det/numerators are
    bit-exact integers and a, b are f32 ratios within 1 ulp of the host
    f64 path (fit_planes above).  c is reconstructed as d0 - a*u0 - b*v0
    in f32 (|error| ~1e-4, far below the prior-window granularity).  Negative index rows (padding) yield all-zero planes,
    matching the host zero padding.  Reference: computeDisparityPlanes,
    elas.cpp:503-575.
    """
    import jax.numpy as jnp
    tris = tris.astype(jnp.int32)
    P = jnp.take(pts.astype(jnp.int32), jnp.maximum(tris, 0), axis=0)
    u, v, d = P[..., 0], P[..., 1], P[..., 2]

    def solve2(uc):
        # translate by vertex 0: rows [uc'_i, v'_i] @ (a, b) = d_i - d_0
        u1, u2 = uc[..., 1] - uc[..., 0], uc[..., 2] - uc[..., 0]
        v1, v2 = v[..., 1] - v[..., 0], v[..., 2] - v[..., 0]
        d1, d2 = d[..., 1] - d[..., 0], d[..., 2] - d[..., 0]
        det = u1 * v2 - u2 * v1                     # exact int32
        ok = det != 0
        detf = jnp.where(ok, det, 1).astype(jnp.float32)
        a = jnp.where(ok, (d1 * v2 - d2 * v1).astype(jnp.float32) / detf, 0.0)
        b = jnp.where(ok, (u1 * d2 - u2 * d1).astype(jnp.float32) / detf, 0.0)
        c = jnp.where(ok, d[..., 0].astype(jnp.float32)
                      - a * uc[..., 0].astype(jnp.float32)
                      - b * v[..., 0].astype(jnp.float32), 0.0)
        return a, b, c

    al, bl, cl = solve2(u)
    ar, br, cr = solve2(u - d)
    valid = (tris[..., 0] >= 0).astype(jnp.float32)[..., None]
    left = jnp.stack([al, bl, cl, ar], axis=-1) * valid
    right = jnp.stack([ar, br, cr, al], axis=-1) * valid
    return left, right


def rasterize_tri_ids(pts: np.ndarray, tris: np.ndarray, right_image: bool,
                      width: int, height: int) -> np.ndarray:
    """Scanline-rasterize triangle ids into a dense (H, W) int32 map
    (-1 = no triangle), matching the reference's pixel-visit semantics
    (elas.cpp:854-941): corners sorted by ascending u; for each integer u
    in [corner0.u, corner2.u), v spans between the AC line and the AB/BC
    line, lower bound inclusive, upper exclusive; later triangles overwrite.

    Pure NumPy implementation (per-triangle vectorized); the C++ hostlib
    provides a faster drop-in (hostlib.raster.rasterize).
    """
    tri_id = np.full((height, width), -1, np.int32)
    if len(tris) == 0:
        return tri_id
    u_all = pts[:, 0].astype(np.float32)
    if right_image:
        u_all = u_all - pts[:, 2].astype(np.float32)
    v_all = pts[:, 1].astype(np.float32)

    for i, (c1, c2, c3) in enumerate(tris):
        tu = np.array([u_all[c1], u_all[c2], u_all[c3]])
        tv = np.array([v_all[c1], v_all[c2], v_all[c3]])
        order = np.argsort(tu, kind="stable")
        tu, tv = tu[order], tv[order]
        A_u, B_u, C_u = tu
        A_v, B_v, C_v = tv
        AB_a = (A_v - B_v) / (A_u - B_u) if int(A_u) != int(B_u) else 0.0
        AC_a = (A_v - C_v) / (A_u - C_u) if int(A_u) != int(C_u) else 0.0
        BC_a = (B_v - C_v) / (B_u - C_u) if int(B_u) != int(C_u) else 0.0
        AB_b = A_v - AB_a * A_u
        AC_b = A_v - AC_a * A_u
        BC_b = B_v - BC_a * B_u

        for (lo, hi, a2, b2) in ((A_u, B_u, AB_a, AB_b),
                                 (B_u, C_u, BC_a, BC_b)):
            if int(lo) == int(hi):
                continue
            u0 = max(int(lo), 0)
            u1 = min(int(hi), width)
            if u1 <= u0:
                continue
            us = np.arange(u0, u1, dtype=np.float32)
            v1 = (AC_a * us + AC_b).astype(np.int32)
            v2 = (a2 * us + b2).astype(np.int32)
            vlo = np.minimum(v1, v2)
            vhi = np.maximum(v1, v2)
            for k, u in enumerate(range(u0, u1)):
                a, b = int(vlo[k]), int(vhi[k])
                a = max(a, 0)
                b = min(b, height)
                if b > a:
                    tri_id[a:b, u] = i
    return tri_id


def host_geometry(d_can: np.ndarray, p: ElasParams, width: int, height: int,
                  rasterize=None, n_cap: Optional[int] = None):
    """Full host-side middle stage: support grid -> geometry products.

    n_cap: optional hard cap on support points (the engine's static pad
    size).  Overflow is thinned UNIFORMLY before triangulation, so every
    downstream product (triangles, planes, rasterization, grid) stays
    consistent with the shipped point list — a tail truncation after
    triangulation would leave triangle vertex indices dangling past the
    device-side pts pad.

    Returns dict with:
      pts          (N,3) int32 support points (with corners if add_corners)
      tris_l/r     (T,3) int32 triangle vertex indices (per-image Delaunay)
      planes_l     (T,4) f32: a,b,c of the left plane + a of the right plane
      planes_r     (T,4) f32: a,b,c of the right plane + a of the left plane
      tri_id_l/r   (H,W) int32 triangle-id maps

    The engine ships pts + tris to the device and fits the plane tables
    there (fit_plane_tables); the host planes_l/r here remain the f64
    oracle used by op-level tests.
    """
    step = p.step
    pts = support_points_from_grid(np.asarray(d_can), step)
    margin = 6 if p.add_corners else 0   # corner slots only when appended
    if n_cap is not None and len(pts) > n_cap - margin:
        import warnings
        keep = n_cap - margin
        warnings.warn("support points thinned: %d -> %d (n_max=%d)"
                      % (len(pts), keep, n_cap))
        pts = pts[np.arange(keep) * len(pts) // keep]
    if p.add_corners:
        pts = add_corner_support_points(pts, width, height)
    rfn = rasterize or rasterize_tri_ids
    out = {"pts": pts}
    for right, tag in ((False, "l"), (True, "r")):
        tris = triangulate(pts, right)
        pl, pr = fit_planes(pts, tris)
        if right:
            planes = np.concatenate([pr, pl[:, :1]], axis=1)
        else:
            planes = np.concatenate([pl, pr[:, :1]], axis=1)
        out["tris_" + tag] = tris
        out["planes_" + tag] = planes.astype(np.float32)
        out["tri_id_" + tag] = rfn(pts, tris, right, width, height)
    return out
