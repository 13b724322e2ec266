"""Sobel-family integer filters with the reference's exact fixed-point
semantics, expressed as dense JAX ops.

Reference semantics (src/common_includes/elas/filter.cpp):
  sobel3x3(in, out_v, out_h):
    temp_v(y,x) = in(y-1,x) + 2*in(y,x) + in(y+1,x)       [vertical 1,2,1]
    temp_h(y,x) = in(y-1,x) - in(y+1,x)                   [vertical 1,0,-1]
    out_v(y,x)  = sat(((temp_v(y,x-1) - temp_v(y,x+1)) >> 2) + 128)
    out_h(y,x)  = sat(((temp_h(y,x-1) + 2*temp_h(y,x) + temp_h(y,x+1)) >> 2) + 128)
  where >> is an arithmetic shift (floor division by 4) and sat() is the
  uint8 saturating pack.  out_v is the horizontal gradient ("du"), out_h the
  vertical gradient ("dv"); the (out_v, out_h) naming order follows
  filter.h:80.  Border rows/cols of the SSE version contain junk that is
  never consumed by the descriptor (taps stay in [1, n-2]); we produce
  zero-padded 'same' outputs which agree on every consumed position.

All arithmetic is int32 on the VPU; XLA fuses the whole stage into one
elementwise pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _sat_u8(x):
    return jnp.clip(x, 0, 255).astype(jnp.uint8)


def _shift_floor4(x):
    # Arithmetic shift right by 2 == floor division by 4 for int dtypes.
    return jnp.right_shift(x, 2)


def _pad_roll(x, dy: int, dx: int):
    """x shifted so that out(y, x) = in(y+dy, x+dx), zero padded."""
    h, w = x.shape[-2], x.shape[-1]
    y0, x0 = max(dy, 0), max(dx, 0)
    pad = [(0, 0)] * (x.ndim - 2) + [(max(-dy, 0), max(dy, 0)),
                                     (max(-dx, 0), max(dx, 0))]
    xp = jnp.pad(x, pad)
    return xp[..., y0:y0 + h, x0:x0 + w]


def sobel3x3(img: jnp.ndarray):
    """Return (du, dv) uint8 gradient images, reference fixed-point semantics.

    img: (..., H, W) uint8/integer image.
    du = horizontal gradient (left minus right), dv = vertical (up minus down),
    both scaled 1/4 (floor), offset +128, saturated to uint8.
    """
    x = img.astype(jnp.int32)
    up = _pad_roll(x, -1, 0)
    dn = _pad_roll(x, 1, 0)
    temp_v = up + 2 * x + dn          # [1,2,1] vertical
    temp_h = up - dn                  # [1,0,-1] vertical
    du = _shift_floor4(_pad_roll(temp_v, 0, -1) - _pad_roll(temp_v, 0, 1)) + 128
    dv = _shift_floor4(_pad_roll(temp_h, 0, -1) + 2 * temp_h
                       + _pad_roll(temp_h, 0, 1)) + 128
    return _sat_u8(du), _sat_u8(dv)


def sobel5x5(img: jnp.ndarray):
    """5x5 Sobel (reference: filter.cpp:426-434): column [1,4,6,4,1]/[1,2,0,-2,-1]
    then row [1,2,0,-2,-1]/[1,4,6,4,1], scaled 1/128, +128, saturated."""
    x = img.astype(jnp.int32)
    smooth_k = (1, 4, 6, 4, 1)
    deriv_k = (1, 2, 0, -2, -1)

    def col(kern):
        acc = jnp.zeros_like(x)
        for i, k in enumerate(kern):
            if k:
                acc = acc + k * _pad_roll(x, i - 2, 0)
        return acc

    def row(t, kern):
        acc = jnp.zeros_like(t)
        for i, k in enumerate(kern):
            if k:
                acc = acc + k * _pad_roll(t, 0, i - 2)
        return acc

    tv = col(smooth_k)   # vertical smoothing -> horizontal derivative output
    th = col(deriv_k)    # vertical derivative -> horizontal smoothing output
    du = jnp.right_shift(row(tv, deriv_k), 7) + 128
    dv = jnp.right_shift(row(th, smooth_k), 7) + 128
    return _sat_u8(du), _sat_u8(dv)


def blob5x5(img: jnp.ndarray) -> jnp.ndarray:
    """Blob filter (reference: filter.cpp:448-475): -1 ring, +2 inner 3x3 ring,
    +7 center (via +2*inner-box + 7*center - outer-box integral trick;
    equivalently center weight 2+7=9 minus...).  Returns int32 response with
    the same valid region semantics (borders zero)."""
    x = img.astype(jnp.int32)
    # Reference computes: -(sum 5x5 box) + 2*(sum inner 3x3 box) + 7*center
    box5 = jnp.zeros_like(x)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            box5 = box5 + _pad_roll(x, dy, dx)
    box3 = jnp.zeros_like(x)
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            box3 = box3 + _pad_roll(x, dy, dx)
    out = -box5 + 2 * box3 + 7 * x
    return out.astype(jnp.int32)


def checkerboard5x5(img: jnp.ndarray) -> jnp.ndarray:
    """Checkerboard filter (reference: filter.cpp:441-446):
    separable [1,1,0,-1,-1] x [1,1,0,-1,-1], int16 response."""
    x = img.astype(jnp.int32)
    kern = (1, 1, 0, -1, -1)
    tc = jnp.zeros_like(x)
    for i, k in enumerate(kern):
        if k:
            tc = tc + k * _pad_roll(x, i - 2, 0)
    out = jnp.zeros_like(x)
    for i, k in enumerate(kern):
        if k:
            out = out + k * _pad_roll(tc, 0, i - 2)
    return out.astype(jnp.int32)


def integral_image(img: jnp.ndarray) -> jnp.ndarray:
    """Inclusive 2-D prefix sum (reference: filter.cpp:49-66)."""
    x = img.astype(jnp.int32)
    return jnp.cumsum(jnp.cumsum(x, axis=-1), axis=-2)


# NumPy oracle versions (used by tests; straightforward re-derivations).

def sobel3x3_np(img: np.ndarray):
    x = img.astype(np.int64)
    h, w = x.shape

    def sh(a, dy, dx):
        out = np.zeros_like(a)
        ys = slice(max(dy, 0), h + min(dy, 0))
        yd = slice(max(-dy, 0), h + min(-dy, 0))
        xs = slice(max(dx, 0), w + min(dx, 0))
        xd = slice(max(-dx, 0), w + min(-dx, 0))
        out[yd, xd] = a[ys, xs]
        return out

    tv = sh(x, -1, 0) + 2 * x + sh(x, 1, 0)
    th = sh(x, -1, 0) - sh(x, 1, 0)
    du = (sh(tv, 0, -1) - sh(tv, 0, 1)) >> 2
    dv = (sh(th, 0, -1) + 2 * th + sh(th, 0, 1)) >> 2
    du = np.clip(du + 128, 0, 255).astype(np.uint8)
    dv = np.clip(dv + 128, 0, 255).astype(np.uint8)
    return du, dv
