"""16-channel rhombus feature descriptor, dense TPU formulation.

The reference (src/common_includes/elas/descriptor.cpp:45-126) gathers, for
every pixel, 16 bytes sampled on a rhombus from the Sobel gradient images:
12 taps of du and 4 taps of dv.  We build the same descriptor as a dense
(16, H, W) array of shifted views — pure elementwise data movement that XLA
lays out on (8,128) VPU tiles; the channel axis is a small leading axis that
is unrolled, so no gather is ever emitted.

Tap layout (descriptor.cpp:74-92), as (dy, dx) offsets:
  du: (-2,0) (-1,-2) (-1,0) (-1,+2) (0,-1) (0,0) (0,0) (0,+1)
      (+1,-2) (+1,0) (+1,+2) (+2,0)
  dv: (-1,0) (0,-1) (0,+1) (+1,0)

Valid region: u in [3, W-3), v in [3, H-3); outside it the reference leaves
uninitialized memory (never consumed by the matcher) — we emit zeros.
Half-resolution mode computes only even rows (descriptor.cpp:50-57); we
compute all rows (the odd ones are simply never read by the subsampled
matcher), which keeps shapes static and tiles full.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .filters import sobel3x3, _pad_roll

# (channel_source, dy, dx); source 0 = du, 1 = dv
DESCRIPTOR_TAPS = (
    (0, -2, 0),
    (0, -1, -2),
    (0, -1, 0),
    (0, -1, 2),
    (0, 0, -1),
    (0, 0, 0),
    (0, 0, 0),
    (0, 0, 1),
    (0, 1, -2),
    (0, 1, 0),
    (0, 1, 2),
    (0, 2, 0),
    (1, -1, 0),
    (1, 0, -1),
    (1, 0, 1),
    (1, 1, 0),
)


def valid_mask(height: int, width: int):
    """Boolean (H, W) mask of pixels whose descriptor is defined."""
    v = np.zeros((height, width), dtype=bool)
    v[3:height - 3, 3:width - 3] = True
    return v


def compute_descriptor(img: jnp.ndarray,
                       true_height: int = 0) -> jnp.ndarray:
    """img: (H, W) uint8 -> descriptor (16, H, W) uint8 (zero outside the
    valid region).

    true_height: when the image carries padding rows at the bottom (the
    row-sharded pipeline pads H to a tile multiple so GSPMD can shard
    this op's glue — parallel/shard.py), the valid mask is taken from the
    TRUE height: rows >= true_height-3 zero out, so real rows are
    bit-identical to the unpadded computation (the valid region
    [3, true_h-3) never reads a padded row: sobel +-1 and taps +-2 reach
    at most true_h-2)."""
    du, dv = sobel3x3(img)
    grads = (du.astype(jnp.uint8), dv.astype(jnp.uint8))
    h, w = img.shape
    chans = []
    for src, dy, dx in DESCRIPTOR_TAPS:
        chans.append(_pad_roll(grads[src], dy, dx))
    desc = jnp.stack(chans, axis=0)
    mask = np.zeros((h, w), dtype=bool)
    mask[:true_height or h] = valid_mask(true_height or h, w)
    return jnp.where(jnp.asarray(mask)[None, :, :], desc, 0)


def texture_sum(desc: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel texture measure sum_k |desc_k - 128| (reference:
    elas.cpp:296-299 / 732-734).  desc: (16, H, W) -> (H, W) int32."""
    d = desc.astype(jnp.int32)
    return jnp.sum(jnp.abs(d - 128), axis=0)


def compute_descriptor_np(img: np.ndarray) -> np.ndarray:
    """NumPy oracle of compute_descriptor (tests)."""
    from .filters import sobel3x3_np

    du, dv = sobel3x3_np(img)
    grads = (du, dv)
    h, w = img.shape
    desc = np.zeros((16, h, w), dtype=np.uint8)
    vm = valid_mask(h, w)
    for k, (src, dy, dx) in enumerate(DESCRIPTOR_TAPS):
        g = grads[src]
        shifted = np.zeros_like(g)
        ys = slice(max(dy, 0), h + min(dy, 0))
        yd = slice(max(-dy, 0), h + min(-dy, 0))
        xs = slice(max(dx, 0), w + min(dx, 0))
        xd = slice(max(-dx, 0), w + min(-dx, 0))
        shifted[yd, xd] = g[ys, xs]
        desc[k] = np.where(vm, shifted, 0)
    return desc
