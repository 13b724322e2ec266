"""Sparse support-point matching, reformulated as a dense disparity scan.

Reference semantics (src/serial_includes/elas/elas.cpp:266-440): for every
point on a `step`-pixel grid, scan all disparities, cost = SAD of the four
16-byte descriptors at (u±2, v±2), keep the best if it is unique
(best < thr * second_best), texture is high enough, and a backward match at
(u - d) agrees within lr_threshold.

TPU formulation: instead of per-point loops with SSE SAD, we compute — for
the candidate rows only — the full forward cost F_d(row, u) for every u, as
a `lax.fori_loop` over d of vectorized |A - shift(B, d)| reductions (VPU
work on (8,128) tiles).  One pass yields both directions, because the
backward cost is the same volume re-indexed:

    bwd(u', d) = sum SAD(descR[u'+ou], descL[u'+ou + d]) = fwd(u' + d, d)

so the right-image minima are tracked from roll(F_d, -d) in the same scan.
The support grid filters (inconsistent / redundant removal,
elas.cpp:152-233) are 2-D stencils over the small candidate grid; we use
snapshot (parallel) semantics like the reference's OpenMP build
(src/omp_includes/elas/elas.cpp:168,211).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..params import ElasParams
from .descriptor import texture_sum

_BIG = 2**30  # python int: safe trace-time constant (never device-committed)


def _sad_pair(a, b):
    """a, b: (16, 2, R, W) uint8 -> (R, W) int32 SAD over taps and row pair."""
    d = jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32))
    return jnp.sum(d, axis=(0, 1))


def support_matches(desc1: jnp.ndarray, desc2: jnp.ndarray,
                    p: ElasParams, apply_filters: bool = True,
                    true_height: int = 0) -> jnp.ndarray:
    """Dense support-point disparity grid.

    desc1, desc2: (16, H, W) uint8 descriptors.
    Returns D_can: (Hc, Wc) int16, -1 where invalid
    (Hc = ceil(H/step), Wc = ceil(W/step)).

    apply_filters=True runs the snapshot (data-parallel) support filters on
    device; with False the raw grid is returned and the host applies the
    reference-exact sequential filters (hostlib.filter_support_sequential) —
    the default engine path, since the reference's in-place scan-order
    cascade is inherently sequential.

    true_height: when descriptors carry bottom padding rows (row-sharded
    pipeline), the candidate grid and every row clamp use the TRUE height,
    so the output (Hc, Wc) is bit-identical to the unpadded computation
    (padding rows are never addressed: all row indices clamp below true_h).
    """
    _, H, W = desc1.shape
    H = true_height or H
    step = p.step
    Hc = -(-H // step)
    Wc = -(-W // step)
    dmax = p.disp_max

    # Candidate-row descriptor stacks at v = vc*step + ov, ov in {-2,+2}.
    vc = np.arange(Hc) * step
    rows = np.stack([np.clip(vc - 2, 0, H - 1),
                     np.clip(vc + 2, 0, H - 1)], axis=0)  # (2, Hc)
    A = desc1[:, rows, :]          # (16, 2, Hc, W)
    B = desc2[:, rows, :]

    # Left-pad B by dmax so that Bpad[..., dmax - d + u] == B[..., u - d].
    Bpad = jnp.pad(B, ((0, 0), (0, 0), (0, 0), (dmax, 0)))
    grid_cols = np.arange(Wc) * step                      # (Wc,)

    u_idx = jnp.arange(W, dtype=jnp.int32)

    # Column taps at u-2 / u+2 of the centre (clipped; clipped entries are
    # masked out by the border conditions below).
    gc_m2 = np.clip(grid_cols - 2, 0, W - 1)
    gc_p2 = np.clip(grid_cols + 2, 0, W - 1)

    def body(d, state):
        (f1e, f1d, f2e, f2d, b1e, b1d, b2e, b2d) = state
        Bd = jax.lax.dynamic_slice_in_dim(Bpad, dmax - d, W, axis=3)
        F = _sad_pair(A, Bd)                              # (Hc, W)

        # Forward (left image): candidate at u valid iff d <= u - 5
        # (disp_max_valid = min(disp_max, u - window - u_step),
        #  reference elas.cpp:318-321).  The cost of a support candidate is
        # the sum of the row-pair SAD at columns u-2 and u+2
        # (the four (u±2, v±2) descriptor blocks of elas.cpp:271-274).
        fvalid = grid_cols[None, :] >= d + 5
        Fg = jnp.where(fvalid, F[:, gc_m2] + F[:, gc_p2], _BIG)  # (Hc, Wc)
        better1 = Fg < f1e
        better2 = jnp.logical_and(~better1, Fg < f2e)
        f2e = jnp.where(better1, f1e, jnp.where(better2, Fg, f2e))
        f2d = jnp.where(better1, f1d, jnp.where(better2, d, f2d))
        f1e = jnp.where(better1, Fg, f1e)
        f1d = jnp.where(better1, d, f1d)

        # Backward (right image): bwd(u', d) = fwd column-pair cost at
        # u' + d, valid iff d <= W - u' - 5
        # (reference elas.cpp:322-323 with right_image).
        Fc = (jnp.pad(F, ((0, 0), (2, 0)))[:, :W]
              + jnp.pad(F, ((0, 0), (0, 2)))[:, 2:])      # Fc(u)=F(u-2)+F(u+2)
        Fcpad = jnp.pad(Fc, ((0, 0), (0, dmax)))
        G = jax.lax.dynamic_slice_in_dim(Fcpad, d, W, axis=1)
        gvalid = u_idx[None, :] <= W - d - 5
        Gm = jnp.where(gvalid, G, _BIG)
        b_better1 = Gm < b1e
        b_better2 = jnp.logical_and(~b_better1, Gm < b2e)
        b2e = jnp.where(b_better1, b1e, jnp.where(b_better2, Gm, b2e))
        b2d = jnp.where(b_better1, b1d, jnp.where(b_better2, d, b2d))
        b1e = jnp.where(b_better1, Gm, b1e)
        b1d = jnp.where(b_better1, d, b1d)
        return (f1e, f1d, f2e, f2d, b1e, b1d, b2e, b2d)

    init_g = (jnp.full((Hc, Wc), _BIG, jnp.int32),
              jnp.full((Hc, Wc), -1, jnp.int32),
              jnp.full((Hc, Wc), _BIG, jnp.int32),
              jnp.full((Hc, Wc), -1, jnp.int32))
    init_b = (jnp.full((Hc, W), _BIG, jnp.int32),
              jnp.full((Hc, W), -1, jnp.int32),
              jnp.full((Hc, W), _BIG, jnp.int32),
              jnp.full((Hc, W), -1, jnp.int32))
    state = jax.lax.fori_loop(max(p.disp_min, 0), dmax + 1, body,
                              init_g + init_b)
    d_can = finalize_support(state, desc1, desc2, p, H, W)
    if apply_filters:
        d_can = remove_inconsistent(d_can, p)
        d_can = remove_redundant(d_can, p, vertical=True)
        d_can = remove_redundant(d_can, p, vertical=False)
    return d_can


def finalize_support(state, desc1, desc2, p: ElasParams, H: int, W: int
                     ) -> jnp.ndarray:
    """Scan minima -> validated support grid: the validity masks,
    uniqueness ratios, and LR consistency of reference elas.cpp:266-440.

    state: (f1e, f1d, f2e, f2d) at grid columns (Hc, Wc) and
           (b1e, b1d, b2e, b2d) at all columns (Hc, W).
    Shared by the XLA scan above and the Pallas kernel
    (ops.pallas.support_pl), whose full-width forward minima are sliced
    to grid columns by its wrapper before calling this.
    """
    f1e, f1d, f2e, f2d, b1e, b1d, b2e, b2d = state
    step = p.step
    Hc = -(-H // step)
    dmax = p.disp_max
    vc = np.arange(Hc) * step
    grid_cols = np.arange(-(-W // step)) * step

    # Pixel-level validity masks (reference elas.cpp:279, 296-327).
    tex1 = texture_sum(desc1)
    tex2 = texture_sum(desc2)

    u_g = grid_cols[None, :]                               # (1, Wc)
    v_g = (np.arange(Hc) * step)[:, None]                  # (Hc, 1)
    border_ok_g = ((u_g >= 5) & (u_g <= W - 6)
                   & (v_g >= 5) & (v_g <= H - 6))
    range_ok_left = np.minimum(dmax, u_g - 5) - max(p.disp_min, 0) >= 10
    vc_clip = np.clip(vc, 0, H - 1)
    tex_ok_left = tex1[vc_clip, :][:, grid_cols] >= p.support_texture

    thr = jnp.float32(p.support_threshold)
    uniq_f = ((f1d >= 0) & (f2d >= 0)
              & (f1e.astype(jnp.float32) < thr * f2e.astype(jnp.float32)))
    d_fwd = jnp.where(uniq_f & border_ok_g
                      & range_ok_left & tex_ok_left, f1d, -1)

    # Backward map over all u' (for the consistency lookup at u - d).
    u_full = np.arange(W)[None, :]
    border_ok_b = (u_full >= 5) & (u_full <= W - 6)
    range_ok_right = np.minimum(dmax, W - u_full - 5) - max(p.disp_min, 0) >= 10
    tex_ok_right = tex2[vc_clip, :] >= p.support_texture
    v_ok = ((vc >= 5) & (vc <= H - 6))[:, None]
    uniq_b = ((b1d >= 0) & (b2d >= 0)
              & (b1e.astype(jnp.float32) < thr * b2e.astype(jnp.float32)))
    d_bwd = jnp.where(uniq_b & border_ok_b
                      & (range_ok_right & v_ok) & tex_ok_right,
                      b1d, -1)                             # (Hc, W)

    # Left/right consistency: d2 = d_bwd(u - d); accept if |d - d2| <= lr_thr
    # (reference elas.cpp:403-408).
    u2 = jnp.clip(grid_cols[None, :] - d_fwd, 0, W - 1)
    d2 = jnp.take_along_axis(d_bwd, u2, axis=1)
    ok = (d_fwd >= 0) & (d2 >= 0) & (jnp.abs(d_fwd - d2) <= p.lr_threshold)
    d_can = jnp.where(ok, d_fwd, -1).astype(jnp.int16)

    # Grid row/col 0 are never candidates (loops start at 1,
    # reference elas.cpp:394-396).
    edge = np.ones(d_can.shape, dtype=bool)
    edge[0, :] = False
    edge[:, 0] = False
    return jnp.where(edge, d_can, -1)


def _shift2d(x, dy, dx, fill):
    h, w = x.shape
    y0, x0 = max(dy, 0), max(dx, 0)
    xp = jnp.pad(x, ((max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0))),
                 constant_values=fill)
    return xp[y0:y0 + h, x0:x0 + w]


def remove_inconsistent(d_can: jnp.ndarray, p: ElasParams) -> jnp.ndarray:
    """Drop support points with fewer than incon_min_support neighbours (self
    included) of similar disparity in a +/-incon_window_size window
    (reference elas.cpp:152-176, snapshot semantics)."""
    w = p.incon_window_size
    d = d_can.astype(jnp.int32)
    supp = jnp.zeros_like(d)
    for dy in range(-w, w + 1):
        for dx in range(-w, w + 1):
            nb = _shift2d(d, dy, dx, -1)
            supp = supp + ((nb >= 0)
                           & (jnp.abs(d - nb) <= p.incon_threshold)
                           ).astype(jnp.int32)
    keep = (d < 0) | (supp >= p.incon_min_support)
    return jnp.where(keep, d_can, -1).astype(jnp.int16)


def remove_redundant(d_can: jnp.ndarray, p: ElasParams, vertical: bool,
                     redun_max_dist: int = 5,
                     redun_threshold: int = 1) -> jnp.ndarray:
    """Drop support points that have a similar-disparity neighbour within
    redun_max_dist cells in BOTH directions along an axis
    (reference elas.cpp:178-233, snapshot semantics)."""
    d = d_can.astype(jnp.int32)
    found = []
    for sgn in (-1, 1):
        f = jnp.zeros(d.shape, bool)
        for j in range(1, redun_max_dist + 1):
            dy, dx = (sgn * j, 0) if vertical else (0, sgn * j)
            nb = _shift2d(d, dy, dx, -1)
            f = f | ((nb >= 0) & (jnp.abs(d - nb) <= redun_threshold))
        found.append(f)
    redundant = (d >= 0) & found[0] & found[1]
    return jnp.where(redundant, -1, d_can).astype(jnp.int16)
