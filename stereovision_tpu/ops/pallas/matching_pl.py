"""Pallas TPU kernel for the dense MAP matching scan (hot kernel #1).

Same semantics as ops.matching.compute_disparity (reference findMatch /
computeDisparity, src/serial_includes/elas/elas.cpp:688-944), but the
disparity loop runs inside one kernel with the descriptor row-stripes
resident in VMEM — the XLA formulation re-shifts a 30 MB array through HBM
every one of the 256 iterations (lane-granular dynamic slices), which
measured ~970 ms/pass on v5e; here each (8,128) pixel block reads its A
block and B row-stripe once and does pure VPU work.

Inputs prepared by the XLA wrapper (all padded to (8,128)-aligned shapes):
  A        (16, Hp, Wp)  i32  reference-image descriptors, reordered so
                              A[4j+k] = desc[4k+j] (matches packed-B bytes)
  B planes (4, Hp, Wp + front + BW) i32
                              other-image descriptors with 4 descriptor
                              bytes packed per int32 (byte j of plane k is
                              desc[4k+j]); packing shrinks the per-d
                              dynamic lane roll — the kernel's dominant
                              non-SAD cost — by 4x.  `front` is the left
                              zero-padding (D full-res, D//2 subsampled)
                              and the extra BW on the right keeps the
                              aligned 2*BW rotate-window in bounds.
  gm_bits  (D//32, Hp, Wp) i32 packed per-pixel candidate mask words
  d_lo/d_hi (Hp, Wp) i32      plane window bounds
  d_plane  (Hp, Wp) i32       plane prior centre
  pvalid   (Hp, Wp) i32       1 where the plane prior applies
Output:
  key      (Hp, Wp) i32       lexicographic min key (see ops.matching)

Subsampled mode (reference elas.h:83-85, elas.cpp:713-726) runs NATIVELY at
half column width: the output lattice is the even full-res columns u = 2x,
and B is split into even/odd column planes so that the warped column
  u - d = 2x - d  ->  even plane at x - (d>>1)        (d even)
                      odd  plane at x - (d>>1) - 1    (d odd)
  u + d = 2x + d  ->  even plane at x + (d>>1)        (d even)
                      odd  plane at x + (d>>1)        (d odd)
The per-block active-disparity lists are split by parity so each plane gets
a static inner loop; total kernel work halves vs the old full-width scan.
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

_BIG = np.int32(2**30)

BH = 8     # sublane block (pixel rows)
BW = 128   # lane block (pixel cols)


def _kernel(*refs, D, W, Wp, front, off, right_image, prior, radius,
            batched=False, sub=False):
    if sub:
        (A_ref, Be_ref, Bo_ref, gm_ref, dlo_ref, dhi_ref, dpl_ref, pv_ref,
         acte_ref, acto_ref, out_ref) = refs
        # (B plane, its active list, left-pass extra column shift)
        loops = ((Be_ref, acte_ref, 0), (Bo_ref, acto_ref, 1))
    else:
        (A_ref, B_ref, gm_ref, dlo_ref, dhi_ref, dpl_ref, pv_ref,
         act_ref, out_ref) = refs
        loops = ((B_ref, act_ref, 0),)

    j = pl.program_id(2 if batched else 1)
    u0 = j * BW
    u = u0 + jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 1)

    if batched:
        # every ref carries a leading size-1 batch block
        A = A_ref[0]                          # (16, BH, BW) i32
        dlo = dlo_ref[0]
        dhi = dhi_ref[0]
        dpl = dpl_ref[0]
        pv = pv_ref[0] != 0
    else:
        A = A_ref[...]
        dlo = dlo_ref[...]
        dhi = dhi_ref[...]
        dpl = dpl_ref[...]
        pv = pv_ref[...] != 0

    def compute(d, acc, B_ref, ladj):
        # B columns warped by d, out of the stripe padded by `front`:
        #   left:  start = front + u0 - shift   (shift = d, or d>>1 [+1 odd])
        #   right: start = u0 + shift
        # Mosaic requires lane-aligned vector loads, so load an aligned
        # 2*BW window and rotate the unaligned remainder into place.
        shift = (d >> 1) if sub else d
        if right_image:
            start = u0 + shift
        else:
            start = front + u0 - shift - ladj
        base = pl.multiple_of((start >> 7) << 7, 128)
        rem = start - base
        if batched:
            win = B_ref[0, :, :, pl.ds(base, 2 * BW)]
        else:
            win = B_ref[:, :, pl.ds(base, 2 * BW)]
        Bd = pltpu.roll(win, -rem, axis=2)[:, :, :BW]     # (4, BH, BW) packed
        e = jnp.zeros((BH, BW), jnp.int32)
        for byte in range(4):
            Bb = jnp.bitwise_and(
                jax.lax.shift_right_logical(Bd, 8 * byte), 255)
            e = e + jnp.sum(jnp.abs(A[4 * byte:4 * byte + 4] - Bb), axis=0)

        in_win = (d >= dlo) & (d <= dhi)
        if batched:
            word = gm_ref[0, d >> 5, :, :]
        else:
            word = gm_ref[d >> 5, :, :]
        gbit = jnp.bitwise_and(
            jax.lax.shift_right_logical(word, jnp.bitwise_and(d, 31)), 1) == 1
        u_fr = 2 * u if sub else u            # full-res column coordinate
        if right_image:
            u_warp = u_fr + d
        else:
            u_warp = u_fr - d
        warp_ok = (u_warp >= 2) & (u_warp <= W - 3)
        cand = ((gbit & ~in_win) | in_win) & warp_ok

        delta = jnp.abs(d - dpl)
        pr = jnp.zeros((BH, BW), jnp.int32)
        for dd in range(radius + 1):
            pr = jnp.where(delta == dd, np.int32(prior[dd]), pr)
        pr = jnp.where(in_win & pv, pr, 0)

        key = ((e + pr + off) * 2 + in_win.astype(jnp.int32)) * 512 + d
        return jnp.minimum(acc, jnp.where(cand, key, _BIG))

    # Sparse-d skip: the XLA prep extracts each block's compact list of
    # active disparities (union of its grid-cell candidates and plane
    # windows) into SMEM; the loop runs only over that list — typical
    # KITTI blocks activate <40 of 256 disparities, and a full
    # 256-iteration cond scan costs more in loop scaffolding than the
    # active bodies do in vector work.
    result = jnp.full((BH, BW), _BIG, jnp.int32)
    for B_ref, act_ref, ladj in loops:
        def body(t, acc, B_ref=B_ref, act_ref=act_ref, ladj=ladj):
            if batched:
                d = act_ref[0, 0, j, t]
            else:
                d = act_ref[0, j, t]
            return compute(d, acc, B_ref, ladj)

        if batched:
            n_act = act_ref[0, 0, j, D]
        else:
            n_act = act_ref[0, j, D]
        result = jax.lax.fori_loop(0, n_act, body, result)
    if batched:
        out_ref[0] = result
    else:
        out_ref[...] = result


def _round_up(x, m):
    return (x + m - 1) // m * m


def _scan_pallas_call(shapes, p: ElasParams, W: int, right_image: bool,
                      batch: int = 0):
    """Build the pallas_call for given (Hp, Wp); batch > 0 adds an explicit
    leading batch grid dimension (used by the custom_vmap rule — vmapping
    the pallas_call directly proved unreliable on this toolchain)."""
    Hp, Wp = shapes
    D = p.disp_num
    sub = p.subsampling
    front = D // 2 if sub else D
    P_tab = p.prior_table()
    off = int(max(512, 1 - int(P_tab.min())))
    radius = p.plane_radius
    prior = tuple(int(P_tab[i]) for i in range(radius + 1))
    batched = batch > 0

    kern = functools.partial(
        _kernel, D=D, W=W, Wp=Wp, front=front, off=off,
        right_image=right_image, prior=prior, radius=radius,
        batched=batched, sub=sub)

    if batched:
        grid = (batch, Hp // BH, Wp // BW)

        def bs(block, imap, space=pltpu.VMEM):
            return pl.BlockSpec((1,) + block,
                                lambda b, i, j: (b,) + imap(i, j),
                                memory_space=space)
    else:
        grid = (Hp // BH, Wp // BW)

        def bs(block, imap, space=pltpu.VMEM):
            return pl.BlockSpec(block, imap, memory_space=space)

    def spec2():
        return bs((BH, BW), lambda i, j: (i, j))

    def b_spec():
        return bs((4, BH, Wp + front + BW), lambda i, j: (0, i, 0))

    def act_spec():
        # SMEM blocks need their last two dims equal to the array's, so
        # each row-stripe gets its full (nbj, D+1) active-list table
        # (D disparity slots + trailing count) and the kernel indexes it
        # with program_id(j).
        return bs((1, Wp // BW, D + 1), lambda i, j: (i, 0, 0), pltpu.SMEM)

    n_b = 2 if sub else 1
    in_specs = ([bs((16, BH, BW), lambda i, j: (0, i, j))]
                + [b_spec() for _ in range(n_b)]
                + [bs((D // 32, BH, BW), lambda i, j: (0, i, j)),
                   spec2(), spec2(), spec2(), spec2()]
                + [act_spec() for _ in range(n_b)])

    # Cost hint: the kernel visits only each block's compact active list;
    # KITTI scenes activate ~25% of D, so scale the dense-loop flop count
    # (upper bound would be the full D).  Bytes: the A block (16 i32
    # planes) + the 4 packed-i32 B planes re-read per active d.
    act_frac = 0.25
    flops = int(3 * 17 * D * act_frac * Hp * Wp) * max(batch, 1)
    bytes_acc = (16 * 4 * Hp * Wp
                 + int(4 * 4 * D * act_frac) * Hp * Wp) * max(batch, 1)
    lead = (batch,) if batched else ()
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=spec2(),
        out_shape=jax.ShapeDtypeStruct(lead + (Hp, Wp), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_acc, transcendentals=0),
        interpret=jax.default_backend() == "cpu",
    )


def _shard_specs(p: ElasParams, batched: bool):
    """PartitionSpecs for the kernel's global inputs/output under an active
    mesh context: batch -> 'stream', (8-row) blocks -> 'tile'.  Every
    (8, 128) block only touches its own row-stripe, so row sharding needs
    no halo."""
    from jax.sharding import PartitionSpec as P
    _, s_ax, t_ax = mesh_ctx.current()
    lead = (s_ax,) if batched else ()
    n_b = 2 if p.subsampling else 1
    in_specs = ([P(*lead, None, t_ax, None)]              # A
                + [P(*lead, None, t_ax, None)] * n_b      # B planes
                + [P(*lead, None, t_ax, None)]            # gm_bits
                + [P(*lead, t_ax, None)] * 4              # dlo/dhi/dpl/pv
                + [P(*lead, t_ax, None, None)] * n_b)     # active lists
    return tuple(in_specs), P(*lead, t_ax, None)


def matching_scan(args, p: ElasParams, W: int, right_image: bool,
                  shapes) -> jnp.ndarray:
    """Run the Pallas scan.  `args` is the positional input tuple matching
    the in_specs built by _scan_pallas_call (one B plane + one active list
    full-res; two of each subsampled).  Returns key (Hp, Wp) int32.
    vmap-compatible: under vmap the custom batching rule dispatches one
    batched pallas_call with an explicit leading grid dimension.  Under an
    active parallel.ctx mesh the call is shard_map'ed (see _shard_specs)."""
    n_t = mesh_ctx.row_multiple()
    loc = (shapes[0] // n_t, shapes[1])

    @jax.custom_batching.custom_vmap
    def scan(*a):
        call = _scan_pallas_call(loc, p, W, right_image)
        if n_t == 1 and mesh_ctx.current() is None:
            return call(*a)
        in_s, out_s = _shard_specs(p, batched=False)
        return mesh_ctx.shard_kernel(call, in_s, out_s, *a)

    @scan.def_vmap
    def scan_vmap(axis_size, in_batched, *a):
        full = []
        for x, b in zip(a, in_batched):
            if not b:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            full.append(x)
        b_loc = mesh_ctx.batch_split(axis_size)
        call = _scan_pallas_call(loc, p, W, right_image, batch=b_loc)
        if mesh_ctx.current() is None:
            return call(*full), True
        in_s, out_s = _shard_specs(p, batched=True)
        return mesh_ctx.shard_kernel(call, in_s, out_s, *full), True

    return scan(*args)


def _pack_bytes(x):
    """(16, H, Wx) u8-valued -> (4, H, Wx) i32, byte j of plane k = x[4k+j]."""
    shifts4 = np.arange(4, dtype=np.uint32)[None, :, None, None] * 8
    return jnp.sum(x.astype(jnp.uint32).reshape(4, 4, *x.shape[1:])
                   << shifts4, axis=1).astype(jnp.int32)


def _active_lists(active, D):
    """(D, nbi, nbj) bool -> (nbi, nbj, D+1) i32 front-packed sorted index
    list with trailing count."""
    dall = np.arange(D, dtype=np.int32)[:, None, None]
    n_act = jnp.sum(active, axis=0).astype(jnp.int32)
    dlist = jnp.sort(jnp.where(active, dall, np.int32(D)), axis=0)
    return jnp.concatenate(
        [jnp.transpose(dlist, (1, 2, 0)), n_act[..., None]],
        axis=-1).astype(jnp.int32)


def compute_disparity(desc_self, desc_other, tri_id, planes, grid_mask,
                      p: ElasParams, right_image: bool,
                      true_height: int = 0,
                      pad_out_rows: int = 0) -> jnp.ndarray:
    """Drop-in replacement for ops.matching.compute_disparity using the
    Pallas scan kernel (same outputs).

    true_height / pad_out_rows: row-sharded-pipeline padding support with
    the same contract as ops.matching.compute_disparity — inputs may carry
    bottom padding rows, the output carries pad_out_rows extra (-10) rows,
    real rows stay bit-identical (row-local kernel + true-height clamps).
    """
    _, H, W = desc_self.shape
    H = true_height or H
    Ho, Wo = p.out_shape(W, H)
    Ho_tot = Ho + pad_out_rows
    sub = 2 if p.subsampling else 1
    D = p.disp_num

    v_full = np.arange(Ho_tot) * sub
    u_full = np.arange(Wo) * sub
    line_rows = np.clip(v_full, 2, H - 3)

    A = desc_self[:, line_rows, :]
    B = desc_other[:, line_rows, :]
    if sub != 1:
        # Native half-width lattice: A keeps only the even columns; B is
        # split into even/odd column planes (see module docstring).
        A = A[:, :, ::2][:, :, :Wo]

    # per-pixel plane quantities on the output lattice (tri_id arrives
    # either full-lattice (H, W) or already on the output lattice)
    if tri_id.shape == (Ho_tot, Wo):
        tid = tri_id.astype(jnp.int32)
    else:
        assert pad_out_rows == 0, "padded mode needs lattice-shaped tri_id"
        tid = jax.lax.slice(tri_id, (0, 0), (H, W),
                            (sub, sub))[:Ho, :Wo].astype(jnp.int32)
    plq = planes[jnp.clip(tid, 0)]
    a, b, c, a_other = plq[..., 0], plq[..., 1], plq[..., 2], plq[..., 3]
    uf = u_full.astype(np.float32)[None, :]
    vf = v_full.astype(np.float32)[:, None]
    d_plane = jnp.trunc(a * uf + b * vf + c).astype(jnp.int32)
    d_lo = jnp.maximum(d_plane - p.plane_radius, 0)
    d_hi = jnp.minimum(d_plane + p.plane_radius, D - 1)
    pvalid = ((jnp.abs(a) < 0.7) & (jnp.abs(a_other) < 0.7)).astype(jnp.int32)
    if pad_out_rows:
        # padding rows: empty plane window so straddling blocks don't
        # widen their active-disparity lists with garbage-plane spans
        real = np.arange(Ho_tot)[:, None] < Ho
        d_lo = jnp.where(real, d_lo, 1)
        d_hi = jnp.where(real, d_hi, 0)
        pvalid = jnp.where(real, pvalid, 0)

    # Packed per-pixel candidate-mask words (D//32, Ho, Wo), built by
    # packing at CELL level first and expanding the packed words — the
    # obvious order (expand cell mask to pixels, then pack) materializes a
    # (D, Ho, Wo) bool intermediate: ~120 MB at KITTI size and ~480 MB at
    # scale 0.5, which is what used to cap the batched path at batch 2 on
    # wide frames.
    gs = p.grid_size
    nwords = D // 32
    Gh, Gw = grid_mask.shape[1], grid_mask.shape[2]
    cb = grid_mask.reshape(nwords, 32, Gh, Gw).astype(jnp.uint32)
    shifts = np.arange(32, dtype=np.uint32)[None, :, None, None]
    cell_bits = jnp.sum(cb << shifts, axis=1).astype(jnp.int32)
    gy = np.minimum(v_full // gs, Gh - 1).astype(np.int32)  # -> cell row
    gx = (u_full // gs).astype(np.int32)
    gm_bits = cell_bits[:, gy][:, :, gx]             # (nwords, Ho, Wo)

    # pad to (8,128)-aligned grid; under a mesh context the row blocks must
    # also split evenly across 'tile' shards
    Hp = _round_up(Ho_tot, BH * mesh_ctx.row_multiple())
    Wp = _round_up(Wo, BW)
    padHW = ((0, Hp - Ho_tot), (0, Wp - Wo))

    def pad2(x, fill=0):
        return jnp.pad(x, padHW, constant_values=fill)

    # int32 descriptors: Mosaic's dynamic rotate (and most VPU ops) want
    # 32-bit lanes.  A is reordered so that A_p[4j+k] = A[4k+j] — the
    # layout produced by unpacking byte j from packed-B plane k — and B is
    # packed 4 bytes per int32 so the per-d dynamic roll moves 4x less.
    A_p = jnp.pad(A, ((0, 0),) + padHW)
    A_p = A_p.reshape(4, 4, Hp, Wp).transpose(1, 0, 2, 3) \
             .reshape(16, Hp, Wp).astype(jnp.int32)

    front = D // 2 if sub != 1 else D

    def pad_b(Bx):
        # zero-pad one B plane to (16, Hp, Wp + front + BW) and pack
        wb = Bx.shape[2]
        if right_image:
            Bx = jnp.pad(Bx, ((0, 0), (0, Hp - Ho_tot),
                              (0, Wp - wb + front + BW)))
        else:
            Bx = jnp.pad(Bx, ((0, 0), (0, Hp - Ho_tot),
                              (front, Wp - wb + BW)))
        return _pack_bytes(Bx)

    if sub != 1:
        b_planes = (pad_b(B[:, :, 0::2]), pad_b(B[:, :, 1::2]))
    else:
        b_planes = (pad_b(B),)
    gm_p = jnp.pad(gm_bits, ((0, 0),) + padHW)

    # Per-block compact active-disparity list: union of the block's
    # grid-cell candidate bits and the span of its plane windows,
    # extracted into a sorted front-packed index list + count (split by
    # disparity parity in subsampled mode, one list per B plane).
    nbi, nbj = Hp // BH, Wp // BW
    # Block-level candidate presence (D, nbi, nbj), from the CELL mask via
    # range sums — never touches pixel resolution.  The cell rows touched
    # by pixel-row block i are the contiguous range [gy[first], gy[last]]
    # (gy is monotone with unit steps), so a prefix-sum corner difference
    # gives "any cell in range"; same along columns.
    bi, bj = np.arange(nbi), np.arange(nbj)
    rlo = gy[np.minimum(bi * BH, Ho - 1)]
    rhi = gy[np.minimum((bi + 1) * BH - 1, Ho - 1)]
    valid_i = (bi * BH) < Ho                           # fully-padded blocks
    clo = gx[np.minimum(bj * BW, Wo - 1)]
    chi = gx[np.minimum((bj + 1) * BW - 1, Wo - 1)]
    valid_j = (bj * BW) < Wo
    ci = jnp.pad(jnp.cumsum(grid_mask.astype(jnp.int32), axis=1),
                 ((0, 0), (1, 0), (0, 0)))
    row_any = (ci[:, rhi + 1, :] - ci[:, rlo, :]) > 0  # (D, nbi, Gw)
    cj = jnp.pad(jnp.cumsum(row_any.astype(jnp.int32), axis=2),
                 ((0, 0), (0, 0), (1, 0)))
    gm_blk = (cj[:, :, chi + 1] - cj[:, :, clo]) > 0   # (D, nbi, nbj)
    gm_blk = gm_blk & jnp.asarray(valid_i[None, :, None]
                                  & valid_j[None, None, :])
    lo_p = pad2(d_lo, D)                                # empty on padding
    hi_p = pad2(d_hi, -1)
    lo_blk = jnp.min(lo_p.reshape(nbi, BH, nbj, BW), axis=(1, 3))
    hi_blk = jnp.max(hi_p.reshape(nbi, BH, nbj, BW), axis=(1, 3))
    dall = np.arange(D, dtype=np.int32)[:, None, None]
    active = gm_blk | ((dall >= lo_blk[None]) & (dall <= hi_blk[None]))
    if sub != 1:
        parity = (dall & 1).astype(bool)
        acts = (_active_lists(active & ~parity, D),
                _active_lists(active & parity, D))
    else:
        acts = (_active_lists(active, D),)

    # padded pixels: d_lo > d_hi -> window empty; gm word 0 -> no candidates
    args = (A_p,) + b_planes + (gm_p, pad2(d_lo, 1), pad2(d_hi, 0),
                                pad2(d_plane), pad2(pvalid)) + acts
    key = matching_scan(args, p, W, right_image, (Hp, Wp))
    key = key[:Ho_tot, :Wo]

    Ai = A.astype(jnp.int32)
    tex = jnp.sum(jnp.abs(Ai - 128), axis=0)
    u_out = u_full.astype(np.int32)[None, :]
    u_ok = (u_out >= 2) & (u_out <= W - 3)
    has_tri = tid >= 0
    visited = has_tri & u_ok & (tex >= p.match_texture)
    ok = visited & (key < _BIG)
    d_best = jnp.mod(key, 512).astype(jnp.float32)
    out = jnp.where(ok, d_best,
                    jnp.where(visited, jnp.float32(-1), jnp.float32(-10)))
    return out


def compute_disparity_pair(desc1, desc2, tri_l, tri_r, planes_l, planes_r,
                           grid_l, grid_r, p: ElasParams,
                           true_height: int = 0, pad_out_rows: int = 0):
    """Both dense matching passes (left and right reference image).

    A shared-SAD single-kernel variant (one cost volume feeding both
    passes via bwd(u', d) = fwd(u'+d, d), mirroring what the reference
    GPU avoids recomputing, src/parallel_includes/elas/elas_gpu.cu:17-150)
    was built in r3 and DELETED in r4 after a drift-controlled verdict:
    the interleaved A/B harness (bench.ab --mode pair, 5 adjacent
    segment pairs in one session, bench/ab_pair_r4.json) measured the
    shared volume slower in 4/5 pairs, median -1.11 FPS of ~11.4 at
    KITTI full-res batch 8 — the full-width stripe scans the UNION of
    every block's active disparities for both passes, which costs more
    than the shared SAD saves.  The per-block two-pass scans below are
    the production path."""
    D1 = compute_disparity(desc1, desc2, tri_l, planes_l, grid_l, p,
                           right_image=False, true_height=true_height,
                           pad_out_rows=pad_out_rows)
    D2 = compute_disparity(desc2, desc1, tri_r, planes_r, grid_r, p,
                           right_image=True, true_height=true_height,
                           pad_out_rows=pad_out_rows)
    return D1, D2
