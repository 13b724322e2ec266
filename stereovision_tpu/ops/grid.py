"""Disparity candidate grid as a dense boolean mask.

The reference stores, per grid_size x grid_size image cell, a compacted list
[count, d0, d1, ...] of candidate disparities (createGrid,
src/serial_includes/elas/elas.cpp:577-653): each support point votes for
d-1..d+1 in its cell, followed by a 3x3 cell dilation.  Internally it builds
exactly a dense 0/1 mask before compaction (elas.cpp:583-628) — we keep the
mask form, (D, gh, gw) bool, which is what a masked dense argmin wants.

The reference's pointer-walk dilation wraps at row boundaries of the cell
grid (elas.cpp:613-628); we use a clean 2-D 3x3 dilation, which differs only
in edge cells fed from the wrong row — a strict improvement with effects far
below the comparison tolerance.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..params import ElasParams


def build_grid_mask(pts: jnp.ndarray, p: ElasParams, width: int, height: int,
                    right_image: bool) -> jnp.ndarray:
    """pts: (N, 3) int32 [u, v, d] support points, padded entries have d < 0.
    Returns (D, gh, gw) bool candidate mask (D = disp_max + 1)."""
    gw, gh = p.grid_dims(width, height)
    D = p.disp_num
    u = pts[:, 0].astype(jnp.int32)
    v = pts[:, 1].astype(jnp.int32)
    d = pts[:, 2].astype(jnp.int32)
    gs = p.grid_size
    if right_image:
        x = jnp.floor_divide(u - d, gs)
    else:
        x = jnp.floor_divide(u, gs)
    y = jnp.floor_divide(v, gs)
    # Invalid/padded points -> out-of-bounds scatter, dropped.
    x = jnp.where(d >= 0, x, -1)

    mask = jnp.zeros((D, gh, gw), dtype=jnp.bool_)
    for dd in (-1, 0, 1):
        di = jnp.clip(d + dd, 0, p.disp_max)
        mask = mask.at[di, y, x].set(True, mode="drop")
    return _dilate3x3(mask)


def _dilate3x3(mask: jnp.ndarray) -> jnp.ndarray:
    """3x3 OR-dilation over the last two (cell) axes."""
    m = mask
    # horizontal then vertical (separable OR)
    mh = m | jnp.pad(m, ((0, 0), (0, 0), (1, 0)))[:, :, :-1] \
           | jnp.pad(m, ((0, 0), (0, 0), (0, 1)))[:, :, 1:]
    mv = mh | jnp.pad(mh, ((0, 0), (1, 0), (0, 0)))[:, :-1, :] \
            | jnp.pad(mh, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]
    return mv


def cell_index_maps(p: ElasParams, width: int, height: int):
    """Static per-pixel cell row/col lookup tables (NumPy, trace-time)."""
    rows = (np.arange(height) // p.grid_size).astype(np.int32)
    cols = (np.arange(width) // p.grid_size).astype(np.int32)
    return rows, cols
