"""Pallas TPU kernel for the support-point matching scan (hot kernel #2).

Same semantics as ops.support.support_matches (reference
computeSupportMatches / computeMatchingDisparity,
src/serial_includes/elas/elas.cpp:266-440), but the 256-step disparity
scan runs inside one kernel with the candidate-row descriptor stripes
resident in VMEM.  The XLA formulation re-slices the row stacks through
HBM every iteration of a 256-step while-loop; here each 8-row stripe is
read once and the loop is pure VPU work.

Key moves:
  * one SAD serves both directions (bwd(u', d) = fwd(u' + d, d), see
    ops.support docstring) — the backward minima are tracked from a
    1-plane dynamic roll of the forward cost;
  * the disparity shift is applied INCREMENTALLY: the shifted B stripe is
    a loop carry rotated by one lane per step (static-shift roll), instead
    of a 32-plane dynamic rotate per step;
  * rotation wrap-around only touches positions masked out by the border /
    validity conditions applied in ops.support.finalize_support (shared
    with the XLA path), so wrapped lanes never affect valid outputs.

Inputs prepared by the wrapper (i32, padded):
  A  (32, Hcp, Wp)  left candidate-row descriptor stack (16 taps x 2 rows)
  B0 (32, Hcp, Wp)  right stack pre-shifted to the scan's first disparity
Output:
  (8, Hcp, Wp) i32: f1e,f1d,f2e,f2d (full width; wrapper slices grid
  columns) and b1e,b1d,b2e,b2d.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...params import ElasParams
from ...parallel import ctx as mesh_ctx
from ..support import (finalize_support, remove_inconsistent,
                       remove_redundant)

_BIG = np.int32(2 ** 30)

BH = 8


def _kernel(A_ref, B_ref, out_ref, *, d_lo, d_hi, W, batched=False,
            chunk=0):
    nlead = int(batched) + (1 if chunk else 0)
    A = A_ref[(0,) * nlead]
    C0 = B_ref[(0,) * nlead]
    Wp = A.shape[-1]
    u = jax.lax.broadcasted_iota(jnp.int32, (BH, Wp), 1)
    if chunk:
        # column-chunked mode for very wide frames: this window covers
        # global columns [c*chunk - ext, ...) (ext = d_hi + 2 halo); see
        # support_matches.  Validity masks must use GLOBAL u.
        c = pl.program_id(1 if batched else 0)
        u = u + c * chunk - (d_hi + 2)

    def body(d, carry):
        (C, f1e, f1d, f2e, f2d, b1e, b1d, b2e, b2d) = carry
        # C(u) == B(u - d); SAD over the 32 descriptor planes.
        F = jnp.sum(jnp.abs(A - C), axis=0)                  # (BH, Wp)
        # Support-candidate cost = row-pair SAD at u-2 and u+2
        # (the four (u±2, v±2) blocks of elas.cpp:271-274).  Rolls must be
        # non-negative: -s becomes Wp - s (mod Wp for the dynamic case).
        Fg = pltpu.roll(F, 2, axis=1) + pltpu.roll(F, Wp - 2, axis=1)

        # forward (left image): valid iff u >= d + 5 (elas.cpp:318-321)
        Fm = jnp.where(u >= d + 5, Fg, _BIG)
        better1 = Fm < f1e
        better2 = jnp.logical_and(~better1, Fm < f2e)
        f2e = jnp.where(better1, f1e, jnp.where(better2, Fm, f2e))
        f2d = jnp.where(better1, f1d, jnp.where(better2, d, f2d))
        f1e = jnp.where(better1, Fm, f1e)
        f1d = jnp.where(better1, d, f1d)

        # backward (right image): bwd(u, d) = Fg(u + d), valid iff
        # u <= W - d - 5 (elas.cpp:322-323 with right_image)
        G = pltpu.roll(Fg, jnp.mod(-d, Wp), axis=1)
        Gm = jnp.where(u <= W - d - 5, G, _BIG)
        bb1 = Gm < b1e
        bb2 = jnp.logical_and(~bb1, Gm < b2e)
        b2e = jnp.where(bb1, b1e, jnp.where(bb2, Gm, b2e))
        b2d = jnp.where(bb1, b1d, jnp.where(bb2, d, b2d))
        b1e = jnp.where(bb1, Gm, b1e)
        b1d = jnp.where(bb1, d, b1d)

        # advance the shifted stripe: C(u) <- C(u-1) == B(u - (d+1))
        C = pltpu.roll(C, 1, axis=2)
        return (C, f1e, f1d, f2e, f2d, b1e, b1d, b2e, b2d)

    big = jnp.full((BH, Wp), _BIG, jnp.int32)
    neg = jnp.full((BH, Wp), -1, jnp.int32)
    out = jax.lax.fori_loop(d_lo, d_hi + 1, body,
                            (C0, big, neg, big, neg, big, neg, big, neg))
    for k in range(8):
        out_ref[(0,) * nlead + (k,)] = out[k + 1]


def _round_up(x, m):
    return (x + m - 1) // m * m


def _scan_pallas_call(shapes, d_lo: int, d_hi: int, W: int, batch: int = 0,
                      chunk: int = 0, nchunk: int = 1):
    """chunk > 0 adds a column-chunk grid dimension: inputs/outputs carry a
    leading (nchunk,) axis of overlapping windows (see support_matches)."""
    Hcp, Wp = shapes
    batched = batch > 0
    kern = functools.partial(_kernel, d_lo=d_lo, d_hi=d_hi, W=W,
                             batched=batched, chunk=chunk)
    lead = (batch,) if batched else ()
    if chunk:
        lead = lead + (nchunk,)
    nlead = len(lead)
    grid = lead + (Hcp // BH,)

    def bs(block, imap):
        return pl.BlockSpec(
            (1,) * nlead + block,
            lambda *ids: tuple(ids[:nlead]) + imap(ids[nlead]),
            memory_space=pltpu.VMEM)

    D = d_hi - d_lo + 1
    vol = Hcp * Wp * max(batch, 1) * max(nchunk, 1)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bs((32, BH, Wp), lambda i: (0, i, 0)),
                  bs((32, BH, Wp), lambda i: (0, i, 0))],
        out_specs=bs((8, BH, Wp), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct(lead + (8, Hcp, Wp), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=3 * 33 * D * vol,
            bytes_accessed=2 * 32 * 4 * vol,
            transcendentals=0),
        interpret=jax.default_backend() == "cpu",
    )


def _support_scan(A, B0, d_lo: int, d_hi: int, W: int,
                  chunk: int = 0) -> jnp.ndarray:
    """Run the Pallas scan.  A, B0: (32, Hcp, Wp) i32 — or, in chunked mode
    (chunk > 0), ([nchunk,] 32, Hcp, Wkp) stacks of overlapping column
    windows.  Returns the (…, 8, Hcp, Wp) minima stack.  vmap dispatches
    one batched call with an explicit leading grid dimension (vmapping
    pallas_call directly is unreliable on this toolchain, see matching_pl).
    Under an active parallel.ctx mesh the call is shard_map'ed — candidate-
    row stripes are independent, so they shard over 'tile' with no halo."""
    from jax.sharding import PartitionSpec as P
    Hcp, Wp = A.shape[-2:]
    nchunk = A.shape[0] if chunk else 1
    chunk_ax = (None,) if chunk else ()
    n_t = mesh_ctx.row_multiple()
    loc = (Hcp // n_t, Wp)

    def specs(batched):
        _, s_ax, t_ax = mesh_ctx.current()
        lead = (s_ax,) if batched else ()
        s = P(*lead, *chunk_ax, None, t_ax, None)
        return (s, s), s

    @jax.custom_batching.custom_vmap
    def scan(A, B0):
        call = _scan_pallas_call(loc, d_lo, d_hi, W, chunk=chunk,
                                 nchunk=nchunk)
        if mesh_ctx.current() is None:
            return call(A, B0)
        in_s, out_s = specs(False)
        return mesh_ctx.shard_kernel(call, in_s, out_s, A, B0)

    @scan.def_vmap
    def scan_vmap(axis_size, in_batched, A, B0):
        args = []
        for x, b in zip((A, B0), in_batched):
            if not b:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            args.append(x)
        call = _scan_pallas_call(loc, d_lo, d_hi, W,
                                 batch=mesh_ctx.batch_split(axis_size),
                                 chunk=chunk, nchunk=nchunk)
        if mesh_ctx.current() is None:
            return call(*args), True
        in_s, out_s = specs(True)
        return mesh_ctx.shard_kernel(call, in_s, out_s, *args), True

    return scan(A, B0)


# Full-width row stripes above this lane width exceed the ~16 MB VMEM
# budget (measured: Wp=2560 requests 18.2 MB); wider frames run the
# column-chunked mode.  Module constants so tests can exercise the chunked
# path at small sizes.
_MAX_FULL_W = 1920
_CHUNK_W = 1024
# The chunked mode is bit-exact in interpret mode (tests) but faults the
# TPU worker at 2484x750 on the current toolchain (3/3 runs, r3 —
# docs/KNOWN_ISSUES.md); until root-caused it is opt-in on hardware
# (SV_CHUNK_SUPPORT=1) and wide frames take the XLA formulation.
def _chunk_enabled():
    import os
    return (jax.default_backend() == "cpu"
            or os.environ.get("SV_CHUNK_SUPPORT", "0") == "1")


def support_matches(desc1: jnp.ndarray, desc2: jnp.ndarray,
                    p: ElasParams, apply_filters: bool = True,
                    true_height: int = 0) -> jnp.ndarray:
    """Drop-in replacement for ops.support.support_matches using the Pallas
    scan kernel (same outputs).

    The kernel keeps full-width 32-plane row stripes in VMEM; very wide
    frames (scale < ~0.7, W > ~1900) exceed the ~16 MB scoped budget, so
    they run in COLUMN-CHUNKED mode: overlapping windows of _CHUNK_W output
    columns + a (d_hi + 2)-column halo on each side (forward matching reads
    B(u - d ± 2); backward reads A(u + d ± 2) via bwd(u, d) = fwd(u + d, d))
    are stacked on a leading chunk grid dimension, and the wrapper stitches
    the window interiors back together — bit-identical to the full-width
    scan."""
    _, H, W = desc1.shape
    # bottom-padded descriptors (row-sharded pipeline): all row math uses
    # the true height, so padding rows are never addressed — bit-identical
    # to the unpadded computation (see ops.support.support_matches)
    H = true_height or H
    step = p.step
    Hc = -(-H // step)
    d_lo = max(p.disp_min, 0)
    d_hi = p.disp_max

    vc = np.arange(Hc) * step
    rows = np.stack([np.clip(vc - 2, 0, H - 1),
                     np.clip(vc + 2, 0, H - 1)], axis=0)    # (2, Hc)
    A = desc1[:, rows, :].astype(jnp.int32).reshape(32, Hc, W)
    B = desc2[:, rows, :].astype(jnp.int32).reshape(32, Hc, W)
    if d_lo > 0:
        # pre-shift so the kernel's carry starts at B(u - d_lo)
        B = jnp.pad(B, ((0, 0), (0, 0), (d_lo, 0)))[:, :, :W]

    Hcp = _round_up(Hc, BH * mesh_ctx.row_multiple())
    if _round_up(W, 128) > _MAX_FULL_W and not _chunk_enabled():
        from ..support import support_matches as _xla_support
        return _xla_support(desc1, desc2, p, apply_filters=apply_filters,
                            true_height=true_height)
    if _round_up(W, 128) > _MAX_FULL_W:
        CW = _CHUNK_W
        ext = d_hi + 2
        Wkp = _round_up(CW + 2 * ext, 128)
        nchunk = -(-W // CW)
        plen = (nchunk - 1) * CW + Wkp
        pad3 = ((0, 0), (0, Hcp - Hc), (ext, plen - ext - W))
        A_p = jnp.pad(A, pad3)
        B_p = jnp.pad(B, pad3)

        def windows(x):
            return jnp.stack([jax.lax.slice_in_dim(x, c * CW, c * CW + Wkp,
                                                   axis=2)
                              for c in range(nchunk)])
        o = _support_scan(windows(A_p), windows(B_p), d_lo, d_hi, W,
                          chunk=CW)
        out = jnp.concatenate([o[c, :, :, ext:ext + CW]
                               for c in range(nchunk)], axis=-1)[:, :, :W]
    else:
        Wp = _round_up(W, 128)
        pad = ((0, 0), (0, Hcp - Hc), (0, Wp - W))
        out = _support_scan(jnp.pad(A, pad), jnp.pad(B, pad), d_lo, d_hi, W)

    grid_cols = np.arange(-(-W // step)) * step
    f = out[:4, :Hc, :W]
    state = (f[0][:, grid_cols], f[1][:, grid_cols],
             f[2][:, grid_cols], f[3][:, grid_cols],
             out[4, :Hc, :W], out[5, :Hc, :W],
             out[6, :Hc, :W], out[7, :Hc, :W])
    d_can = finalize_support(state, desc1, desc2, p, H, W)
    if apply_filters:
        d_can = remove_inconsistent(d_can, p)
        d_can = remove_redundant(d_can, p, vertical=True)
        d_can = remove_redundant(d_can, p, vertical=False)
    return d_can
