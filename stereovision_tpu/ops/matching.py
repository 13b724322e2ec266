"""Dense MAP disparity matching as a masked scan over the disparity axis.

Reference semantics (src/serial_includes/elas/elas.cpp:688-944): for each
pixel inside a triangle, candidates are (a) the grid cell's disparity list
excluding the plane window, evaluated with the raw 16-byte SAD, then (b) the
plane window [d_plane - r, d_plane + r], evaluated with SAD + negative-log
prior P[|d - d_plane|] (prior applied only when the plane is not too
slanted).  The minimum is strict, so ties resolve to the earliest candidate
in evaluation order: grid candidates (ascending d) before window candidates
(ascending d).

TPU formulation: one `lax.fori_loop` over d.  Each step computes the SAD
image |A - shift(B, d)| (pure VPU work), a per-pixel candidate mask from the
(D, gh, gw) grid mask + plane window, and folds a lexicographic key
  key = ((val + off) * 2 + in_window) * 512 + d
into a running minimum — which reproduces the reference's tie-breaking
exactly while staying a dense elementwise program.  The GPU reference
(src/parallel_includes/elas/elas_gpu.cu:17-150) approximates the same thing
one CUDA thread per pixel; here the whole image is one vectorized scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..params import ElasParams

_BIG = 2**30  # python int: safe trace-time constant


def compute_disparity(desc_self: jnp.ndarray, desc_other: jnp.ndarray,
                      tri_id: jnp.ndarray, planes: jnp.ndarray,
                      grid_mask: jnp.ndarray, p: ElasParams,
                      right_image: bool, true_height: int = 0,
                      pad_out_rows: int = 0) -> jnp.ndarray:
    """One matching pass (left or right reference image).

    desc_self/other: (16, H, W) uint8; tri_id: (H, W) int32 (-1 = none);
    planes: (T, 4) f32 rows [a, b, c, a_other]; grid_mask: (D, gh, gw) bool.
    Returns D: (Ho, Wo) float32 (-10 invalid), halved under subsampling.

    Row-sharded pipeline support (parallel/shard.py): descriptors may carry
    bottom padding rows (true_height = real image height) and the output
    may carry pad_out_rows extra rows so its row count divides the tile
    axis.  tri_id then arrives on the PADDED output lattice with -1 in the
    padding rows, which makes those rows -10 (has_tri gates every write);
    real rows are bit-identical to the unpadded computation (matching is
    row-local and every row clamp uses the true height).
    """
    _, H, W = desc_self.shape
    H = true_height or H
    Ho, Wo = p.out_shape(W, H)
    Ho_tot = Ho + pad_out_rows
    sub = 2 if p.subsampling else 1
    D = p.disp_num
    R = p.plane_radius
    P_tab = p.prior_table()
    off = int(max(512, 1 - int(P_tab.min())))

    v_full = np.arange(Ho_tot) * sub                 # (Ho_tot,)
    u_full = np.arange(Wo) * sub                     # (Wo,)
    line_rows = np.clip(v_full, 2, H - 3)            # reference elas.cpp:718

    A = desc_self[:, line_rows, :]                   # (16, Ho, W)
    B = desc_other[:, line_rows, :]
    Ai = A.astype(jnp.int32)
    # Pad B so a dynamic slice gives B[..., u -/+ d].
    if right_image:
        Bpad = jnp.pad(B, ((0, 0), (0, 0), (0, D)))  # B[..., u + d]
    else:
        Bpad = jnp.pad(B, ((0, 0), (0, 0), (D, 0)))  # B[..., u - d]

    # Per-pixel plane prior quantities (computed once, on the output
    # lattice).  tri_id arrives either full-lattice (H, W) or already on
    # the output lattice (Ho, Wo) (the span codec encodes the latter under
    # subsampling to shrink H2D).
    if tri_id.shape == (Ho_tot, Wo):
        tid = tri_id.astype(jnp.int32)
    else:
        assert pad_out_rows == 0, "padded mode needs lattice-shaped tri_id"
        tid = jax.lax.slice(tri_id, (0, 0), (H, W),
                            (sub, sub))[:Ho, :Wo].astype(jnp.int32)
    has_tri = tid >= 0
    pl = planes[jnp.clip(tid, 0)]                    # (Ho, Wo, 4)
    a, b, c, a_other = (pl[..., 0], pl[..., 1], pl[..., 2], pl[..., 3])
    uf = u_full.astype(np.float32)[None, :]
    vf = v_full.astype(np.float32)[:, None]
    d_plane = jnp.trunc(a * uf + b * vf + c).astype(jnp.int32)
    d_win_lo = jnp.maximum(d_plane - R, 0)
    d_win_hi = jnp.minimum(d_plane + R, D - 1)
    plane_valid = (jnp.abs(a) < 0.7) & (jnp.abs(a_other) < 0.7)

    # Expand the cell-level grid mask to per-pixel resolution ONCE
    # (uniform-repeat = broadcast+reshape, no gather), so the d-loop body
    # only needs a dynamic slice.  (D, gh, gw) -> (D, Ho, Wo) on the output
    # lattice.  TPU gathers are scalar-looped; keeping them out of the
    # 256-iteration loop is worth the (D*H*W)-bool HBM footprint (~120 MB
    # at KITTI size).
    gs = p.grid_size
    rows_needed = (Ho_tot - 1) * sub + 1
    gm = jnp.repeat(grid_mask, gs, axis=1)
    if gm.shape[1] < rows_needed:     # padded lattice beyond the cell grid
        gm = jnp.pad(gm, ((0, 0), (0, rows_needed - gm.shape[1]), (0, 0)))
    gm = gm[:, :rows_needed]
    gm = jnp.repeat(gm, gs, axis=2)[:, :, :W]
    gm_px = jax.lax.slice(gm, (0, 0, 0), (D, rows_needed, W),
                          (1, sub, sub))
    gm_px = gm_px[:, :Ho_tot, :Wo]

    u_out = u_full.astype(np.int32)[None, :]
    # LUT must be a jax array to be gathered with a traced index; created
    # under trace, it lowers to an embedded constant (no device round-trip).
    P_j = jnp.asarray(P_tab)

    def body(d, best):
        if right_image:
            Bd = jax.lax.dynamic_slice_in_dim(Bpad, d, W, axis=2)
        else:
            Bd = jax.lax.dynamic_slice_in_dim(Bpad, D - d, W, axis=2)
        E = jnp.sum(jnp.abs(Ai - Bd.astype(jnp.int32)), axis=0)
        if sub == 1:
            Eo = E                                            # (Ho_tot, W)
        else:
            Eo = jax.lax.slice(E, (0, 0), (Ho_tot, W), (1, sub))

        in_win = (d >= d_win_lo) & (d <= d_win_hi)
        gslice = jax.lax.dynamic_slice_in_dim(gm_px, d, 1, axis=0)[0]
        if right_image:
            u_warp = u_out + d
        else:
            u_warp = u_out - d
        warp_ok = (u_warp >= 2) & (u_warp <= W - 3)
        cand = ((gslice & ~in_win) | in_win) & warp_ok

        delta = jnp.clip(jnp.abs(d - d_plane), 0, D - 1)
        prior = jnp.where(in_win & plane_valid, P_j[delta], 0)
        val = Eo + prior
        key = ((val + off) * 2 + in_win.astype(jnp.int32)) * 512 + d
        return jnp.minimum(best, jnp.where(cand, key, _BIG))

    best = jax.lax.fori_loop(0, D, body,
                             jnp.full((Ho_tot, Wo), _BIG, jnp.int32))

    # Pixel-level gates (reference elas.cpp:713-736).
    tex = jnp.sum(jnp.abs(Ai - 128), axis=0)[:, u_full]
    u_ok = (u_out >= 2) & (u_out <= W - 3)
    ok = has_tri & u_ok & (tex >= p.match_texture) & (best < _BIG)
    d_best = jnp.mod(best, 512).astype(jnp.float32)
    # findMatch writes -1 when no candidate survived but the pixel was
    # visited; unvisited pixels keep the -10 initialization
    # (elas.cpp:797-800, 819-824).  Downstream treats both identically.
    visited = has_tri & u_ok & (tex >= p.match_texture)
    out = jnp.where(ok, d_best,
                    jnp.where(visited, jnp.float32(-1), jnp.float32(-10)))
    return out
