"""Disparity -> 3-D point cloud reprojection through the Q matrix.

Reference (src/serial_includes/main/stereo_vision.cpp:222-280 and the CUDA
kernel src/parallel_includes/main/stereo_vision.cu:188-212): per pixel,
[X,Y,Z,W]^T = Q @ [u, v, d, 1]^T, divide by W.  Note the reference feeds the
*uint8 display disparity* (4x the true disparity, stereo_vision.cpp:316)
into Q — we reproduce that behaviour in the engine for parity and expose
`disparity_scale` to get metrically-correct clouds.

This is a trivially dense rank-1 update per channel — pure fused VPU work.
"""

from __future__ import annotations

import jax.numpy as jnp


def reproject(dmap: jnp.ndarray, Q) -> jnp.ndarray:
    """dmap: (H, W) disparity (any float/int dtype); Q: (4, 4).
    Returns points (H, W, 3) float32 in the left-camera frame."""
    H, W = dmap.shape
    Q = jnp.asarray(Q, jnp.float32)
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    d = dmap.astype(jnp.float32)

    def row(i):
        return Q[i, 0] * u + Q[i, 1] * v + Q[i, 2] * d + Q[i, 3]

    w = row(3)
    inv_w = 1.0 / w
    return jnp.stack([row(0) * inv_w, row(1) * inv_w, row(2) * inv_w],
                     axis=-1)


def apply_robot_transform(points: jnp.ndarray, XR, XT) -> jnp.ndarray:
    """p' = XR @ p + XT (reference stereo_vision.cu:208-211; the serial tree
    has this commented out at stereo_vision.cpp:251)."""
    XR = jnp.asarray(XR, jnp.float32)
    XT = jnp.asarray(XT, jnp.float32).reshape(3)
    return points @ XR.T + XT


def box_centroids(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Mean XYZ over each detection box (reference
    stereo_vision.cpp:261-277).  points: (H, W, 3); boxes: (B, 4) int32
    [x, y, w, h].  Returns (B, 3) float32 mean positions."""
    H, W, _ = points.shape
    u = jnp.arange(W)[None, :]
    v = jnp.arange(H)[:, None]
    outs = []
    for i in range(boxes.shape[0]):
        x, y, w, h = boxes[i, 0], boxes[i, 1], boxes[i, 2], boxes[i, 3]
        x0 = jnp.clip(x, 0, W - 1)
        x1 = jnp.clip(x + w, 0, W - 1)
        y0 = jnp.clip(y, 0, H - 1)
        y1 = jnp.clip(y + h, 0, H - 1)
        m = ((u >= x0) & (u < x1) & (v >= y0) & (v < y1)).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        outs.append(jnp.sum(points * m[..., None], axis=(0, 1)) / denom)
    return jnp.stack(outs) if outs else jnp.zeros((0, 3), jnp.float32)
