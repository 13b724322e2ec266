"""End-to-end MIDDLEBURY preset vs the NumPy oracle.

The reference's committed profile goldens are ROBOTICS-produced, so the
MIDDLEBURY-only code paths have no golden coverage — this test runs a
small synthetic scene through the full engine with middlebury_params()
and asserts agreement with the composed stage oracles, exercising:

  corner support points        reference elas.cpp:235-264 (addCorner-
                               SupportPoints; feeds the triangulation)
  border extrapolation         elas.cpp:1126-1294 (gapInterpolation's
                               add_corners branches)
  separable median filter      elas.cpp:1496-1559 (MIDDLEBURY-only)
"""

import numpy as np
import jax.numpy as jnp

from stereovision_tpu.params import middlebury_params
from stereovision_tpu.models.elas import ElasEngine
from stereovision_tpu.ops.descriptor import compute_descriptor_np
from stereovision_tpu.ops.grid import build_grid_mask
from stereovision_tpu.ops.spans import expand_tri_spans
from stereovision_tpu.ops.planes import fit_plane_tables

import oracle


def _oracle_dense(g, L, R, p, w, h, right):
    """Per-pixel findMatch oracle over the engine's shipped geometry
    (same pattern as test_matching, both image directions)."""
    tag = "r" if right else "l"
    tri = np.asarray(expand_tri_spans(jnp.asarray(g["tri_" + tag]), w))
    left_t, right_t = fit_plane_tables(jnp.asarray(g["pts"]),
                                       jnp.asarray(g["tris_" + tag]))
    planes = np.asarray(right_t if right else left_t)
    grid = np.asarray(build_grid_mask(jnp.asarray(g["pts"]), p, w, h,
                                      right_image=right))
    dL = compute_descriptor_np(L)
    dR = compute_descriptor_np(R)
    P = p.prior_table()
    ref = np.full((h, w), -10.0, np.float32)
    for v in range(h):
        for u in range(w):
            t = tri[v, u]
            if t < 0:
                continue
            a, b, c, a_o = planes[t]
            valid_plane = abs(a) < 0.7 and abs(a_o) < 0.7
            cell = grid[:, v // p.grid_size, u // p.grid_size]
            glist = np.where(cell)[0]
            r = oracle.find_match(u, v, (a, b, c), valid_plane, glist,
                                  dL, dR, P, p.plane_radius, right,
                                  p, w, h, 1)
            if r is not None:
                ref[v, u] = r
    return ref


def test_middlebury_end_to_end_matches_oracle():
    # speckle_size shrunk so segments survive at this scene size (the
    # speckle stage is preset-independent and oracle-covered elsewhere)
    p = middlebury_params(disp_max=31, speckle_size=40)
    h, w = 64, 96
    rng = np.random.default_rng(7)
    L = rng.integers(0, 255, (h, w), dtype=np.uint8)
    R = np.empty_like(L)
    for v in range(h):
        R[v] = np.roll(L[v], -(4 + v // 16))

    eng = ElasEngine(p, width=w, height=h)
    desc1, desc2, d_can = eng._stage_support(jnp.asarray(L), jnp.asarray(R))
    g = eng.host_mid(np.asarray(d_can))

    # the 6 corner/edge points are appended after the lattice points
    # (elas.cpp:235-264): 4 image corners + 2 right-edge warps
    pts = g["pts"][g["pts"][:, 0] >= 0]
    corners = pts[-6:]
    assert {(0, 0), (0, h - 1), (w - 1, 0), (w - 1, h - 1)} <= {
        (int(x), int(y)) for x, y, _ in corners}

    # full engine pipeline (XLA path on CPU)
    D1e, D2e = eng.process(L, R)

    # composed stage oracles over the same geometry
    D1 = _oracle_dense(g, L, R, p, w, h, False)
    D2 = _oracle_dense(g, L, R, p, w, h, True)
    D1, D2 = oracle.lr_check(D1, D2, p)
    D1 = oracle.remove_small_segments(D1, p)
    D2 = oracle.remove_small_segments(D2, p)
    D1 = oracle.gap_interpolation(D1, p)      # incl. border extrapolation
    D2 = oracle.gap_interpolation(D2, p)
    D1 = oracle.median_filter(D1, p)          # MIDDLEBURY-only stage
    D2 = oracle.median_filter(D2, p)

    for mine, ref in ((D1e, D1), (D2e, D2)):
        mine = np.asarray(mine)
        # border extrapolation must have produced a fully-valid interior
        assert (mine >= 0).mean() > 0.9
        assert np.array_equal(mine < 0, ref < 0)
        np.testing.assert_allclose(mine[mine >= 0], ref[ref >= 0],
                                   atol=1e-4)
