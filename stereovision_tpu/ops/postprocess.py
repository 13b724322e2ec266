"""Disparity post-processing: L/R consistency, speckle removal, gap
interpolation, adaptive mean (bilateral approximation), separable median.

Each stage is a dense re-formulation of the sequential reference code with
identical results on the deterministic parts:

  leftRightConsistencyCheck  src/serial_includes/elas/elas.cpp:946-1011
  removeSmallSegments        elas.cpp:1013-1124 (BFS flood fill ->
                             min-label propagation + pointer jumping)
  gapInterpolation           elas.cpp:1126-1294 (run scans -> prefix/suffix
                             index maxima)
  adaptiveMean               elas.cpp:1297-1494 (SSE ring buffer -> stencil)
  median                     elas.cpp:1496-1559 (separable 7-tap)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..params import ElasParams

_INVALID = -10.0


# ---------------------------------------------------------------------------
# L/R consistency check

def lr_consistency_check(D1, D2, p: ElasParams):
    """Invalidate pixels whose disparity disagrees with the other image's
    disparity at the warped location (reference elas.cpp:946-1011)."""
    H, W = D1.shape
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    scale = 0.5 if p.subsampling else 1.0

    def check(Da, Db, sign):
        uw = u + sign * Da * scale
        in_img = (Da >= 0) & (uw >= 0) & (uw < W)
        idx = jnp.clip(uw.astype(jnp.int32), 0, W - 1)
        db = jnp.take_along_axis(Db, idx, axis=1)
        bad = jnp.abs(db - Da) > p.lr_threshold
        return jnp.where(in_img & ~bad, Da, _INVALID)

    return check(D1, D2, -1.0), check(D2, D1, 1.0)


# ---------------------------------------------------------------------------
# Speckle removal (connected components on |Δd| <= sim edges)

def _neighbor_shift(x, dy, dx, fill):
    h, w = x.shape
    xp = jnp.pad(x, ((max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0))),
                 constant_values=fill)
    return xp[max(dy, 0):max(dy, 0) + h, max(dx, 0):max(dx, 0) + w]


def _segmented_min_scan(lab, connect_prev, axis, reverse):
    """Inclusive segmented min-scan of labels along `axis`.

    connect_prev[i] == True means element i is connected to element i-1
    (in scan direction), so the running minimum may flow across.

    Implemented with native cummin via segment re-keying: key =
    lab - SEG_STRIDE * segment_id makes every later segment's keys strictly
    smaller than anything earlier, so a plain cummin never leaks minima
    across segment boundaries; the label is recovered by adding the local
    segment offset back.  This is ~2-3x faster than a generic tuple
    associative_scan and keeps the CCL loop gather-free."""
    if reverse:
        lab_s = jnp.flip(lab, axis)
        conn = jnp.flip(connect_prev, axis)
    else:
        lab_s, conn = lab, connect_prev
    n = lab.size
    if n * (lab.shape[axis] + 1) < 2**31:
        start = (~conn).astype(jnp.int32)
        seg_id = jnp.cumsum(start, axis=axis)          # per-line segment index
        stride = jnp.int32(n + 1)
        key = lab_s - stride * seg_id
        kmin = jax.lax.cummin(key, axis=axis)
        out = kmin + stride * seg_id
    else:
        # re-keying would overflow int32: generic segmented scan
        startb = ~conn

        def op(a, b):
            av, af = a
            bv, bf = b
            return jnp.where(bf, bv, jnp.minimum(av, bv)), af | bf

        out, _ = jax.lax.associative_scan(op, (lab_s, startb), axis=axis)
    return jnp.flip(out, axis) if reverse else out


def remove_small_segments(D, p: ElasParams, max_iters: int = 0):
    """Remove connected segments (4-connectivity, |Δd| <= sim threshold)
    smaller than speckle_size pixels (reference elas.cpp:1013-1124).

    Connected-component labelling via iterated segmented min-scans: each
    round propagates the minimum label along maximal horizontal and
    vertical runs of connected pixels (forward + backward associative
    scans), inside a convergence-tested while_loop.  At the fixpoint every
    component carries its minimum linear index — same result as the
    reference's BFS, with only scans and elementwise ops on device.

    max_iters > 0 caps the label-propagation rounds (a speed knob: one
    round merges runs along an entire row+column staircase step, so k
    rounds resolve components with up to k bends; unconverged *large*
    serpentine components may be over-fragmented and removed).  0 = run to
    the exact fixpoint.
    """
    H, W = D.shape
    speckle = p.speckle_size
    if p.subsampling:
        speckle = int(math.sqrt(float(p.speckle_size)) * 2)

    valid = D >= 0
    # Connectivity (both endpoints valid, |Δd| <= sim; invalid pixels form
    # singletons, exactly as in the reference where the BFS from an invalid
    # pixel can never add a neighbour).
    def conn(dy, dx):
        nb = _neighbor_shift(D, dy, dx, -1e9)
        nb_valid = _neighbor_shift(valid, dy, dx, False)
        return (valid & nb_valid
                & (jnp.abs(D - nb) <= p.speckle_sim_threshold))

    conn_left = conn(0, -1)    # connected to (v, u-1)
    conn_right = conn(0, 1)
    conn_up = conn(-1, 0)
    conn_down = conn(1, 0)

    n = H * W
    init = jnp.arange(n, dtype=jnp.int32).reshape(H, W)

    rekey_ok = n * (max(H, W) + 1) < 2**31
    if rekey_ok:
        # Hoist the loop-invariant segment-offset keys (see
        # _segmented_min_scan): each scan in the loop is then just
        # subtract -> cummin -> add — about half the per-iteration cost.
        stride = jnp.int32(n + 1)

        def seg_offset(connp, axis, reverse):
            c = jnp.flip(connp, axis) if reverse else connp
            sid = jnp.cumsum((~c).astype(jnp.int32), axis=axis)
            return sid * stride

        offs = (seg_offset(conn_left, 1, False),
                seg_offset(conn_right, 1, True),
                seg_offset(conn_up, 0, False),
                seg_offset(conn_down, 0, True))

        def scan_dir(lab, off, axis, reverse):
            x = jnp.flip(lab, axis) if reverse else lab
            out = jax.lax.cummin(x - off, axis=axis) + off
            return jnp.flip(out, axis) if reverse else out

        def step(state):
            lab, _, it = state
            m = scan_dir(lab, offs[0], 1, False)
            m = scan_dir(m, offs[1], 1, True)
            m = scan_dir(m, offs[2], 0, False)
            m = scan_dir(m, offs[3], 0, True)
            return m, jnp.any(m != lab), it + 1
    else:
        def step(state):
            lab, _, it = state
            m = _segmented_min_scan(lab, conn_left, axis=1, reverse=False)
            m = _segmented_min_scan(m, conn_right, axis=1, reverse=True)
            m = _segmented_min_scan(m, conn_up, axis=0, reverse=False)
            m = _segmented_min_scan(m, conn_down, axis=0, reverse=True)
            return m, jnp.any(m != lab), it + 1

    def cond(state):
        changed = state[1]
        if max_iters > 0:
            return changed & (state[2] < max_iters)
        return changed

    lab, _, _ = jax.lax.while_loop(cond, step,
                                   (init, jnp.bool_(True), jnp.int32(0)))

    sizes = jnp.zeros((n,), jnp.int32).at[lab.reshape(-1)].add(1)
    seg_size = sizes[lab]
    # Every pixel below the size threshold becomes -10 — including invalid
    # pixels, which are singleton segments (the reference BFS starts from
    # every pixel, elas.cpp:1039-1116, so -1 codes also become -10).
    return jnp.where(seg_size < speckle, _INVALID, D)


# ---------------------------------------------------------------------------
# Gap interpolation

def _carry_scan(val, valid, axis, reverse):
    """Last-valid-value carry scan (gather-free replacement for indexing at
    the previous/next valid position): out[i] = val at the nearest valid
    position at-or-before i (after i when reverse).

    At this point of the pipeline disparities are integers or exact
    halves in [0, 256) (matching emits integers; row-pass fills average
    two of them), so (position, value) packs losslessly into one int32
    key — index-major — and a native cummax performs the segmented carry
    ~2x faster than a tuple associative_scan.  Values that don't fit the
    packing fall back to the generic scan."""
    n = val.shape[axis]

    def op(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, av), af | bf

    if val.dtype == jnp.float32 and n * 2048 < 2**31:
        # Contract: valid entries are k/2 with k in [0, 2048) — guaranteed
        # here because disp_num <= 512 and fills average two disparities.
        v2i = (val * 2.0).astype(jnp.int32)
        idx_shape = [1] * val.ndim
        idx_shape[axis] = n
        pos = jnp.arange(n, dtype=jnp.int32).reshape(idx_shape)
        if reverse:
            pos = jnp.flip(pos, axis)
        key = jnp.where(valid, pos * 2048 + v2i, -1)
        if reverse:
            kmax = jnp.flip(jax.lax.cummax(jnp.flip(key, axis), axis=axis),
                            axis)
        else:
            kmax = jax.lax.cummax(key, axis=axis)
        return jnp.where(kmax >= 0,
                         (kmax % 2048).astype(jnp.float32) * 0.5, val)

    out, _ = jax.lax.associative_scan(op, (val, valid), axis=axis,
                                      reverse=reverse)
    return out


def _gap_pass_rows(D, gap: int, add_corners: bool):
    """One row-direction pass of gapInterpolation (reference
    elas.cpp:1144-1216), vectorized over rows.  All neighbour lookups are
    expressed as carry scans — no gathers (TPU gathers are scalar loops)."""
    H, W = D.shape
    valid = D >= 0
    idx = jnp.arange(W, dtype=jnp.int32)[None, :]

    prev = jax.lax.cummax(jnp.where(valid, idx, -1), axis=1)
    nxt_rev = jax.lax.cummax(
        jnp.where(valid, W - 1 - idx, -1)[:, ::-1], axis=1)[:, ::-1]
    nxt = jnp.where(nxt_rev >= 0, W - 1 - nxt_rev, W)

    count = nxt - prev - 1
    can_fill = (~valid) & (prev >= 0) & (nxt < W) & (count >= 1) & (count <= gap)
    d1 = _carry_scan(D, valid, axis=1, reverse=False)
    d2 = _carry_scan(D, valid, axis=1, reverse=True)
    fill = jnp.where(jnp.abs(d1 - d2) < 3.0, 0.5 * (d1 + d2),
                     jnp.minimum(d1, d2))
    out = jnp.where(can_fill, fill, D)

    if add_corners:
        first = jnp.min(jnp.where(valid, idx, W), axis=1, keepdims=True)
        last = jnp.max(jnp.where(valid, idx, -1), axis=1, keepdims=True)
        d_first = d2[:, :1]    # next-valid value seen from column 0
        d_last = d1[:, -1:]    # last-valid value seen from the end
        left = (idx < first) & (idx >= first - gap) & (first < W)
        right = (idx > last) & (idx <= last + gap) & (last >= 0)
        out = jnp.where(left, d_first, out)
        out = jnp.where(right, d_last, out)
    return out


def gap_interpolation(D, p: ElasParams):
    """Row pass then column pass (reference elas.cpp:1126-1294)."""
    gap = p.ipol_gap_width
    if p.subsampling:
        gap = p.ipol_gap_width // 2 + 1
    out = _gap_pass_rows(D, gap, p.add_corners)
    out = _gap_pass_rows(out.T, gap, p.add_corners).T
    return out


# ---------------------------------------------------------------------------
# Adaptive mean (approximated bilateral)

def _adaptive_pass(x, offsets, axis: int, centre_lo: int, centre_hi_excl: int,
                   ortho_lo: int, ortho_hi_excl: int):
    """One directional pass: for centres in [centre_lo, centre_hi) along
    `axis` and orthogonal coordinate in [ortho_lo, ortho_hi), compute the
    adaptive mean over taps at centre+j for j in `offsets`; write only where
    the result is >= 0 (reference elas.cpp:1332-1485)."""
    H, W = x.shape
    wsum = jnp.zeros(x.shape, jnp.float32)
    fsum = jnp.zeros(x.shape, jnp.float32)
    for j in offsets:
        shift = (j, 0) if axis == 0 else (0, j)
        tap = _neighbor_shift(x, *shift, fill=-10.0)
        wgt = jnp.maximum(0.0, 4.0 - jnp.abs(tap - x))
        wsum = wsum + wgt
        fsum = fsum + wgt * tap
    d = fsum / jnp.maximum(wsum, 1e-20)
    write = (wsum > 0) & (d >= 0)

    ci = jnp.arange(H if axis == 0 else W)
    oi = jnp.arange(W if axis == 0 else H)
    c_ok = (ci >= centre_lo) & (ci < centre_hi_excl)
    o_ok = (oi >= ortho_lo) & (oi < ortho_hi_excl)
    region = (c_ok[:, None] & o_ok[None, :]) if axis == 0 \
        else (o_ok[:, None] & c_ok[None, :])
    written = region & write
    return jnp.where(written, d, x), written


def adaptive_mean(D, p: ElasParams, true_shape=None):
    """Separable approximated bilateral filter (reference elas.cpp:1297-1494).

    Full resolution: 8-tap window, offsets [-4..+3] around the centre,
    weights max(0, 4 - |tap - centre|); horizontal pass writes centres
    u in [4, W-4], rows v in [3, H-4]; the vertical pass consumes the
    horizontal result, centres v in [4, H-4], cols u in [3, W-4].
    Under subsampling the window is 4 taps, offsets [-2..+1], centres from 2.
    Unwritten positions keep their input values (the reference leaves them
    as uninitialized heap there — zero-information either way since they are
    border pixels; keeping the input is the deterministic choice).

    true_shape=(Ho, Wo): when D carries bottom padding rows (row-sharded
    pipeline), the write regions use the TRUE shape, so padding rows are
    untouched and real rows are bit-identical to the unpadded filter (all
    taps of a real centre read rows < Ho: vertical centres stop 4 short
    of the true bottom).
    """
    H, W = true_shape or D.shape
    Dc = jnp.where(D < 0, _INVALID, D)
    if p.subsampling:
        offs = range(-2, 2)
        tmp, _ = _adaptive_pass(Dc, offs, axis=1, centre_lo=2,
                                centre_hi_excl=W - 1, ortho_lo=3,
                                ortho_hi_excl=H - 3)
        val, written = _adaptive_pass(tmp, offs, axis=0, centre_lo=2,
                                      centre_hi_excl=H - 1, ortho_lo=3,
                                      ortho_hi_excl=W - 3)
    else:
        offs = range(-4, 4)
        tmp, _ = _adaptive_pass(Dc, offs, axis=1, centre_lo=4,
                                centre_hi_excl=W - 3, ortho_lo=3,
                                ortho_hi_excl=H - 3)
        val, written = _adaptive_pass(tmp, offs, axis=0, centre_lo=4,
                                      centre_hi_excl=H - 3, ortho_lo=3,
                                      ortho_hi_excl=W - 3)
    # The horizontal result only lives in the temp buffer; the final image
    # takes vertical-pass values where written and the ORIGINAL D elsewhere
    # (reference writes the vertical pass into D in place).
    return jnp.where(written, val, D)


# ---------------------------------------------------------------------------
# Separable median

def _median_taps(x, axis: int, fill):
    taps = []
    for j in range(-3, 4):
        shift = (j, 0) if axis == 0 else (0, j)
        taps.append(_neighbor_shift(x, *shift, fill=fill))
    stack = jnp.stack(taps, axis=0)
    return jnp.sort(stack, axis=0)[3]


def median_filter(D, p: ElasParams, true_shape=None):
    """Two-pass 7-tap separable median (reference elas.cpp:1496-1559).
    Pass 1 writes horizontal medians of D into a zero-initialized temp
    (only where D >= 0, only for u, v in [3, n-4]); pass 2 writes vertical
    medians of the temp back into D under the same conditions.
    true_shape: same padded-row contract as adaptive_mean."""
    H, W = true_shape or D.shape
    ui = jnp.arange(W)[None, :]
    vi = jnp.arange(D.shape[0])[:, None]
    region = (ui >= 3) & (ui < W - 3) & (vi >= 3) & (vi < H - 3)

    med_h = _median_taps(D, axis=1, fill=0.0)
    tmp = jnp.where(region, jnp.where(D >= 0, med_h, D), 0.0)

    med_v = _median_taps(tmp, axis=0, fill=0.0)
    out = jnp.where(region & (D >= 0), med_v, D)
    return out
