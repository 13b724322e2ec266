"""Dense matching against the per-pixel oracle, using real host geometry."""

import numpy as np
import jax
import jax.numpy as jnp

from stereovision_tpu.params import robotics_params
from stereovision_tpu.ops.descriptor import (compute_descriptor,
                                             compute_descriptor_np)
from stereovision_tpu.ops.grid import build_grid_mask
from stereovision_tpu.ops.matching import compute_disparity
from stereovision_tpu.ops.spans import expand_tri_spans
from stereovision_tpu.models.elas import ElasEngine
from stereovision_tpu.ops.planes import fit_plane_tables

def plane_table(g, tag):
    """(T, 4) f32 plane table from the shipped vertex indices (the same
    fit the engine performs on device)."""
    left, right = fit_plane_tables(jnp.asarray(g["pts"]),
                                   jnp.asarray(g["tris_" + tag]))
    return left if tag == "l" else right

import oracle


def test_dense_matching_matches_oracle():
    p = robotics_params(disp_max=31)
    h, w = 64, 80
    rng = np.random.default_rng(2)
    L = rng.integers(0, 255, (h, w), dtype=np.uint8)
    R = np.empty_like(L)
    for v in range(h):
        R[v] = np.roll(L[v], -(5 + v // 16))

    eng = ElasEngine(p, width=w, height=h)
    desc1, desc2, d_can = eng._stage_support(jnp.asarray(L), jnp.asarray(R))
    g = eng.host_mid(np.asarray(d_can))
    tri_l = np.asarray(expand_tri_spans(jnp.asarray(g["tri_l"]), eng.Wo))

    grid_l = build_grid_mask(jnp.asarray(g["pts"]), p, w, h, False)
    mine = np.asarray(compute_disparity(
        desc1, desc2, jnp.asarray(tri_l), plane_table(g, "l"),
        grid_l, p, right_image=False))

    # oracle: per-pixel findMatch with the same tri/plane/grid inputs
    dL = compute_descriptor_np(L)
    dR = compute_descriptor_np(R)
    P = p.prior_table()
    radius = p.plane_radius
    grid_np = np.asarray(grid_l)      # (D, gh, gw)
    tri = tri_l
    planes = np.asarray(plane_table(g, "l"))
    ref = np.full((h, w), -10.0, np.float32)
    for v in range(h):
        for u in range(w):
            t = tri[v, u]
            if t < 0:
                continue
            a, b, c, a_o = planes[t]
            valid_plane = abs(a) < 0.7 and abs(a_o) < 0.7
            cell = grid_np[:, v // p.grid_size, u // p.grid_size]
            glist = np.where(cell)[0]
            r = oracle.find_match(u, v, (a, b, c), valid_plane, glist,
                                  dL, dR, P, radius, False, p, w, h, 1)
            if r is not None:
                ref[v, u] = r
    assert np.array_equal(mine, ref)
