"""Run-length (span) codec for the per-pixel triangle-id maps.

The host geometry stage produces dense (H, W) triangle-id maps (the TPU-side
analogue of the reference's scanline rasterization, elas.cpp:839-941).
Shipping them dense costs ~1 MB/frame/image over the host<->device link; as
piecewise-constant row runs they are ~4x smaller (KITTI rows hold ~150 runs,
max ~210), and the dense map is reconstructed on device with a scatter plus
one log-depth associative forward-fill — exact, and far cheaper than the
transfer it replaces.

Encoding: (H, S, 3) uint8 of [gap, id_lo, id_hi] — 3 bytes/run:
  * gap     column delta from the previous run's start (the first run of
            every row starts at column 0, so its gap is 0); a source gap
            larger than 255 is split into filler runs that REPEAT the
            previous id with gap 255 (the repeated scatter is idempotent
            under the forward fill), so uint8 always suffices
  * id      little-endian uint16 triangle id; 0xFFFF encodes -1 (no
            triangle)
Rows are padded past their last real run with the same repeat-filler
(gap 255, previous id): the running start quickly leaves [0, W) and the
device scatter drops it, while any still-in-bounds filler writes a value
the forward fill would have produced anyway.  Decoding is
starts = cumsum(gaps); scatter ids at starts; forward-fill.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np

_UNSET = np.int32(-(2 ** 20))


def encode_tri_spans(tri: np.ndarray, s_max: int) -> np.ndarray:
    """Dense (H, W) int triangle-id map -> (H, s_max, 3) uint8 packed spans.

    Rows with more than s_max runs (including gap-split fillers) keep their
    first s_max (the previous id then persists over the dropped tail —
    approximate); s_max is sized with ~50% headroom over measured KITTI
    maxima so this does not trigger in practice, and a warning is emitted
    if it ever does.
    """
    tri = np.asarray(tri)
    # 0xFFFF is the -1 (no triangle) sentinel; any id >= 0xFFFF would alias
    # another id after the `& 0xFFFF` pack below.  Engines cap t_max well
    # under this, but fail loudly rather than corrupt silently.
    assert tri.max(initial=-1) < 0xFFFF, \
        "triangle id %d overflows the uint16 span codec" % int(tri.max())
    H, W = tri.shape
    change = np.empty((H, W), dtype=bool)
    change[:, 0] = True
    np.not_equal(tri[:, 1:], tri[:, :-1], out=change[:, 1:])
    counts = change.sum(axis=1)
    rows, cols = np.nonzero(change)           # row-major order
    offsets = np.cumsum(counts) - counts
    k = np.arange(rows.size) - offsets[rows]  # run index within row
    ids = tri[rows, cols].astype(np.int64)

    # gaps to the previous run's start (first run: col 0, gap 0)
    gaps = np.empty_like(cols)
    first = k == 0
    gaps[first] = cols[first]                 # == 0 by construction
    gaps[~first] = cols[~first] - cols[np.nonzero(~first)[0] - 1]
    # split gaps > 255 into repeat-fillers; the fillers PRECEDE their run,
    # so run k moves to k + (fillers of runs <= k in its row)
    n_ins = np.maximum(0, (gaps + 254) // 255 - 1)
    ins_incl = np.cumsum(n_ins)
    ins_excl = ins_incl - n_ins
    row_base = ins_excl[offsets[rows]] if rows.size else ins_excl
    k_new = k + (ins_incl - row_base)
    gaps_real = gaps - 255 * n_ins            # in [0, 255]

    new_counts = np.zeros(H, np.int64)
    if rows.size:
        np.add.at(new_counts, rows, 1 + n_ins)
    if new_counts.max(initial=0) > s_max:
        warnings.warn(
            "tri-span overflow: row has %d runs > s_max=%d; tail runs "
            "dropped (approximate)" % (int(new_counts.max()), s_max))

    # scatter real runs; filler slots (gap 255) repeat the preceding run's
    # id.  The padding tail's preceding run is simply the row's LAST run
    # (= tri[:, -1]), so initialize every slot with that; the rare
    # mid-row fillers of >255-column gaps are scattered explicitly.
    out_gap = np.full((H, s_max), 255, np.uint8)
    out_id = np.broadcast_to(tri[:, -1:].astype(np.int64),
                             (H, s_max)).copy()
    sel = k_new < s_max
    out_gap[rows[sel], k_new[sel]] = gaps_real[sel]
    out_id[rows[sel], k_new[sel]] = ids[sel]
    big = np.nonzero(n_ins > 0)[0]            # flat run indices (never k=0)
    if big.size:
        n = n_ins[big]
        rep = np.repeat(big, n)
        # slot offsets 1..n within each filler group, placed just before
        # the run they split
        offs = np.arange(rep.size) - np.repeat(np.cumsum(n) - n, n)
        kf = np.repeat(k_new[big] - n, n) + offs
        fsel = kf < s_max
        out_gap[np.repeat(rows[big], n)[fsel], kf[fsel]] = 255
        out_id[np.repeat(rows[big], n)[fsel], kf[fsel]] = ids[rep[fsel] - 1]

    u16 = (out_id & 0xFFFF).astype(np.uint16)  # -1 -> 0xFFFF
    packed = np.empty((H, s_max, 3), np.uint8)
    packed[..., 0] = out_gap
    packed[..., 1] = u16 & 0xFF
    packed[..., 2] = u16 >> 8
    return packed


def expand_tri_spans(spans: jnp.ndarray, width: int) -> jnp.ndarray:
    """(..., H, S, 3) uint8 packed spans -> (..., H, width) int16 dense map
    (device).

    Cumulative-sum the gaps into start columns, scatter each run's id at
    its start (out-of-range starts — the padding tail — are dropped), then
    forward-fill along the row with an associative scan (combine = "right
    operand if set")."""
    gaps = spans[..., 0].astype(jnp.int32)
    v = spans[..., 1].astype(jnp.int32) + 256 * spans[..., 2].astype(jnp.int32)
    ids = jnp.where(v == 0xFFFF, -1, v)
    starts = jnp.cumsum(gaps, axis=-1)
    H = spans.shape[-3]
    lead = spans.shape[:-3]
    dense = jnp.full(lead + (H, width), _UNSET, jnp.int32)
    row_idx = jnp.arange(H, dtype=jnp.int32)[:, None]
    if lead:
        # one batch axis supported (vmap handles deeper nesting)
        b_idx = jnp.arange(lead[0], dtype=jnp.int32)[:, None, None]
        dense = dense.at[b_idx, row_idx[None], starts].set(ids, mode="drop")
    else:
        dense = dense.at[row_idx, starts].set(ids, mode="drop")
    filled = jax.lax.associative_scan(
        lambda a, b: jnp.where(b == _UNSET, a, b), dense, axis=-1)
    return filled.astype(jnp.int16)
