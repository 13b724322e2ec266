"""Pallas TPU kernel for speckle-removal connected components (hot #3).

Same semantics as ops.postprocess.remove_small_segments (reference
removeSmallSegments, src/serial_includes/elas/elas.cpp:1013-1124): label
4-connected components of similar disparity, then invalidate components
smaller than speckle_size.

The XLA formulation iterates directional segmented cummins through HBM —
~6 ms per round x ~33 convergence rounds at KITTI size, plus a 466k-wide
gather for the size lookup.  Here the whole frame (384x1280 i32 ~ 2 MB)
lives in VMEM and one kernel runs the entire fixpoint: each round is four
segmented min-sweeps (row fwd/bwd, column fwd/bwd) in Kogge-Stone form
(log-depth shifted mins with segment flags), iterated in a while_loop
until the labels stop changing.

Convergence needs one round per direction-change of the longest
serpentine path (~42 rounds on KITTI frames).  A POINTER-JUMPING variant
(labels are linear pixel indices, so `lab <- lab[lab]` — an XLA gather
between bounded-round kernel calls — compresses label chains the way
union-find path-halving does; both steps only ever replace a pixel's
label with another member of the SAME component, so the combined
fixpoint is bit-identical) is implemented behind _JUMP_ROUNDS but OFF by
default: measured on v5e the per-jump gather costs more than the rounds
it saves (see the flag comment / scripts/ccl_lab.py).

The same kernel then runs a second time to SPREAD component sizes: with
labels converged, every component's root (the pixel whose linear index
equals the label) holds its size — min-propagating "size at root, +inf
elsewhere" over the same connectivity delivers the size to every member
without the per-pixel gather.  The only remaining XLA op between the two
calls is the histogram scatter-add.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...params import ElasParams
from ...parallel import ctx as mesh_ctx

_BIG = np.int32(2 ** 30)


def _segmented_min_sweep(val, conn, bit, axis, L, forward, stride):
    """Inclusive segmented min-scan along `axis` (length L): values flow
    from the segment start toward increasing index (forward) or decreasing
    index.  Uses the re-key trick (key = val - stride * seg_id; plain
    Kogge-Stone min never leaks across segments because stride exceeds the
    value range) with the segment ids rebuilt by an in-sweep cumsum —
    cheaper in VMEM than keeping flag/offset planes resident.  Requires
    0 <= val < stride."""
    shape = val.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, shape, axis)

    def shifted(x, s, fill):
        if forward:
            sx = pltpu.roll(x, s, axis=axis)
            return jnp.where(iota >= s, sx, fill)
        sx = pltpu.roll(x, L - s, axis=axis)
        return jnp.where(iota < L - s, sx, fill)

    seg = 1 - ((conn >> bit) & 1)        # 1 at segment starts
    s = 1
    while s < L:
        seg = seg + shifted(seg, s, 0)   # directional cumsum of starts
        s *= 2
    key = val - stride * seg
    s = 1
    while s < L:
        key = jnp.minimum(key, shifted(key, s, _BIG))
        s *= 2
    return key + stride * seg


def _kernel(conn_ref, init_ref, out_ref, *, Hp, Wp, stride, batched=False,
            rounds=0):
    if batched:
        conn = conn_ref[0]
        lab0 = init_ref[0]
    else:
        conn = conn_ref[...]
        lab0 = init_ref[...]

    # conn bits: 0 = connected to (v, u-1), 1 = to (v, u+1),
    #            2 = to (v-1, u), 3 = to (v+1, u)
    def round_(lab):
        m = _segmented_min_sweep(lab, conn, 0, 1, Wp, True, stride)
        m = _segmented_min_sweep(m, conn, 1, 1, Wp, False, stride)
        m = _segmented_min_sweep(m, conn, 2, 0, Hp, True, stride)
        m = _segmented_min_sweep(m, conn, 3, 0, Hp, False, stride)
        return m

    if rounds:
        # bounded mode: exactly `rounds` sweep rounds, no convergence
        # check — the driver's pointer-jump loop owns convergence.
        # Structured as a counter while_loop (not fori_loop) to keep the
        # same VMEM liveness as the convergence loop below: the fori form
        # measured 17.6 MB scoped VMEM at KITTI size (over the 16 MB cap)
        # vs ~13.5 MB for this form.
        lab, _ = jax.lax.while_loop(
            lambda s: s[1] < rounds,
            lambda s: (round_(s[0]), s[1] + 1),
            (lab0, jnp.int32(0)))
    else:
        def cond(state):
            return state[1]

        def body(state):
            lab, _ = state
            m = round_(lab)
            return m, jnp.any(m != lab)

        lab, _ = jax.lax.while_loop(cond, body, (lab0, jnp.bool_(True)))
    if batched:
        out_ref[0] = lab
    else:
        out_ref[...] = lab


def _round_up(x, m):
    return (x + m - 1) // m * m


def _fixpoint_call(shapes, stride: int, batch: int = 0, rounds: int = 0):
    Hp, Wp = shapes
    batched = batch > 0
    kern = functools.partial(_kernel, Hp=Hp, Wp=Wp, stride=stride,
                             batched=batched, rounds=rounds)
    if batched:
        grid = (batch,)

        def bs():
            return pl.BlockSpec((1, Hp, Wp), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        grid = (1,)

        def bs():
            return pl.BlockSpec((Hp, Wp), lambda _: (0, 0),
                                memory_space=pltpu.VMEM)

    lead = (batch,) if batched else ()
    est_rounds = rounds or 40  # cost hint only
    steps = int(math.log2(Wp)) * 2 + int(math.log2(Hp)) * 2 + 4
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bs(), bs()],
        out_specs=bs(),
        out_shape=jax.ShapeDtypeStruct(lead + (Hp, Wp), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=6 * est_rounds * steps * Hp * Wp * max(batch, 1),
            bytes_accessed=3 * 4 * Hp * Wp * max(batch, 1),
            transcendentals=0),
        # ~7 live i32 frame planes fit the default 16 MB scoped-VMEM cap
        # at KITTI size, but when this call sits inside the pointer-jump
        # while_loop XLA stages operands on the same budget (+2 planes,
        # measured 17.6 MB), and batched wide frames stage a full batch
        # operand on the same stack (measured 102.8 MB at 4x752x2560) —
        # raise the cap near the hardware total (v5e has 128 MB VMEM).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 2 ** 20),
        interpret=jax.default_backend() == "cpu",
    )


def _fixpoint(conn, init, stride, rounds: int = 0):
    """Run the whole-frame in-VMEM fixpoint.  conn, init: (Hp, Wp) i32;
    init values must lie in [0, stride).  Components cross row boundaries,
    so under an active parallel.ctx mesh this kernel runs tile-REPLICATED
    and shards only the batch over 'stream' — which is why
    remove_small_segments forces the BANDED path (shard-aligned bands
    sharded over 'tile', see _banded_labels) whenever the mesh has more
    than one 'tile' shard; this whole-frame form is only reached with a
    1-shard tile axis."""
    from jax.sharding import PartitionSpec as P
    Hp, Wp = conn.shape[-2:]

    def specs(batched):
        _, s_ax, _ = mesh_ctx.current()
        lead = (s_ax,) if batched else ()
        s = P(*lead, None, None)
        return (s, s), s

    @jax.custom_batching.custom_vmap
    def run(conn, init):
        call = _fixpoint_call((Hp, Wp), stride, rounds=rounds)
        if mesh_ctx.current() is None:
            return call(conn, init)
        in_s, out_s = specs(False)
        return mesh_ctx.shard_kernel(call, in_s, out_s, conn, init)

    @run.def_vmap
    def run_vmap(axis_size, in_batched, conn, init):
        args = []
        for x, b in zip((conn, init), in_batched):
            if not b:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            args.append(x)
        call = _fixpoint_call((Hp, Wp), stride,
                              batch=mesh_ctx.batch_split(axis_size),
                              rounds=rounds)
        if mesh_ctx.current() is None:
            return call(*args), True
        in_s, out_s = specs(True)
        return mesh_ctx.shard_kernel(call, in_s, out_s, *args), True

    return run(conn, init)


# Sweep rounds per pointer jump (0 = pure in-kernel fixpoint, no jumps)
# and whether the size lookup gathers from the histogram (vs the
# min-spread second fixpoint).  Module-level so perf scripts can A/B.
#
# MEASURED (scripts/ccl_lab.py, v5e, KITTI 1242x375 pre-speckle frame):
# pointer jumping cuts rounds-to-converge 42 -> 23, but every jump is a
# 481k-element XLA gather (~4-5 ms) while an in-kernel sweep round costs
# ~0.35 ms — pure fixpoint 30.0 ms end-to-end (~5 ms device after the
# ~25 ms tunnel dispatch) vs 60-112 ms for every jump variant, and the
# size-gather variant ties the min-spread second fixpoint.  The pure
# in-kernel design stays the default; the jump machinery is kept for
# A/B and for hardware where gathers are cheaper.
_JUMP_ROUNDS = 0
_SIZE_GATHER = False
# Banded-mode band height override (0 = auto-size to the VMEM budget);
# module-level so tests can force multi-band execution at small shapes.
_BAND_ROWS = 0


def _converge(conn_p, idx, stride):
    """Exact component-min labels: bounded sweep rounds + pointer jumps
    until a full (sweeps, jump) composition changes nothing.  Both steps
    are monotone non-increasing within component-member labels, so the
    combined fixpoint equals the pure-sweep fixpoint (module docstring)."""
    if not _JUMP_ROUNDS:
        return _fixpoint(conn_p, idx, stride)
    Hp, Wp = idx.shape[-2:]

    def cond(state):
        return state[1]

    def body(state):
        lab, _ = state
        m = _fixpoint(conn_p, lab, stride, rounds=_JUMP_ROUNDS)
        f = m.reshape(-1)
        m = f[f].reshape(Hp, Wp)
        return m, jnp.any(m != lab)

    lab, _ = jax.lax.while_loop(cond, body, (idx, jnp.bool_(True)))
    return lab


def _banded_labels(conn_p, Hb: int):
    """Band-local component labels: the whole-frame fixpoint kernel run
    on row bands of Hb rows (each band's ~7 live planes sized to the
    16 MB scoped-VMEM sweet spot), bands on the kernel's batch grid
    axis.  Under an active parallel.ctx mesh the band axis SHARDS over
    'tile' (remove_small_segments pads the frame so the band count
    divides the tile axis): each shard runs only its own bands'
    fixpoints, and the cross-band merge afterwards doubles as the
    shard-boundary merge.

    The kernel runs with BAND-LOCAL linear indices and
    stride = Hb*Wp + 1: the segmented-min re-key computes
    val - stride*seg_id with seg_id up to the sweep length, so a global
    stride (Hp*Wp ~ 2.1M at 2484x750) overflows int32 (measured as a
    wrong partition on hardware, r4).  Band-local values keep the
    product < 2^31; the band's global offset (band * Hb * Wp, constant
    within a band) is added afterwards, which preserves the in-band
    argmin.  Returns (Hp2, Wp) min-global-index-within-band labels.
    conn_p: (Hp2, Wp) with Hp2 % Hb == 0."""
    Hp2, Wp = conn_p.shape
    nb = Hp2 // Hb
    stride = Hb * Wp + 1
    assert stride * (max(Hb, Wp) + 1) < 2 ** 31, (Hb, Wp)
    c3 = conn_p.reshape(nb, Hb, Wp)
    i3 = jnp.broadcast_to(
        jnp.arange(Hb * Wp, dtype=jnp.int32).reshape(1, Hb, Wp),
        (nb, Hb, Wp))
    from jax.sharding import PartitionSpec as P

    @jax.custom_batching.custom_vmap
    def run(c, i):
        cfg = mesh_ctx.current()
        if cfg is None:
            return _fixpoint_call((Hb, Wp), stride, batch=nb)(c, i)
        mesh, _, t_ax = cfg
        n_t = int(mesh.shape[t_ax])
        if nb % n_t == 0:
            # bands shard over 'tile': each shard runs its own band
            # fixpoints (remove_small_segments pads Hp to an Hb*n_t
            # multiple so this always divides under a mesh); the
            # cross-band merge afterwards is the shard-boundary merge
            call = _fixpoint_call((Hb, Wp), stride, batch=nb // n_t)
            s = P(t_ax, None, None)
        else:
            call = _fixpoint_call((Hb, Wp), stride, batch=nb)
            s = P(None, None, None)   # fallback: tile-replicated
        return mesh_ctx.shard_kernel(call, (s, s), s, c, i)

    @run.def_vmap
    def run_vmap(axis_size, in_batched, c, i):
        args = []
        for x, b in zip((c, i), in_batched):
            if not b:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            args.append(x.reshape(axis_size * nb, Hb, Wp))
        cfg = mesh_ctx.current()
        if cfg is None:
            out = _fixpoint_call((Hb, Wp), stride,
                                 batch=axis_size * nb)(*args)
        else:
            mesh, s_ax, t_ax = cfg
            n_t = int(mesh.shape[t_ax])
            B_local = mesh_ctx.batch_split(axis_size)
            if nb % n_t == 0:
                # flattened (frame, band) axis over ('stream' major,
                # 'tile' minor): stream chunks are whole frames (B-major
                # flattening), tile sub-chunks are whole bands — every
                # band computed exactly once
                call = _fixpoint_call((Hb, Wp), stride,
                                      batch=B_local * nb // n_t)
                s = P((s_ax, t_ax), None, None)
            else:
                call = _fixpoint_call((Hb, Wp), stride, batch=B_local * nb)
                s = P(s_ax, None, None)   # frames over 'stream' only
            out = mesh_ctx.shard_kernel(call, (s, s), s, *args)
        return out.reshape(axis_size, nb, Hb, Wp), True

    lab_local = run(c3, i3)                       # (nb, Hb, Wp)
    offs = (jnp.arange(nb, dtype=jnp.int32) * (Hb * Wp))[:, None, None]
    return (lab_local + offs).reshape(Hp2, Wp)


def _merge_bands(lab, conn_p, Hb: int):
    """Union band-local components across band boundaries.

    Nodes are band-component labels (min global linear index within the
    band); for every vertically-connected (bottom row of band k, top row
    of band k+1) pixel pair there is an edge between their labels.  A
    label-indexed table T (identity-initialized) is relaxed with
    scatter-mins over the edge list plus path-halving jumps
    (T[l] <- T[T[l]]) until it stops changing: values only decrease and
    every merged component's labels all appear on boundary rows (they
    merged through one), so at the fixpoint T is constant over each
    merged component — the banded partition equals the whole-frame
    partition.  All per-round work is O(boundary) gathers/scatters
    (~(nb-1)*Wp elements); only the final relabel T[lab] is full-frame."""
    Hp2, Wp = lab.shape
    nb = Hp2 // Hb
    if nb == 1:
        return lab
    l3 = lab.reshape(nb, Hb, Wp)
    TL = l3[1:, 0, :].reshape(-1)          # top rows of bands 1..nb-1
    BL = l3[:-1, Hb - 1, :].reshape(-1)    # bottom rows of bands 0..nb-2
    up = (((conn_p.reshape(nb, Hb, Wp)[1:, 0, :] >> 2) & 1) > 0).reshape(-1)
    n = Hp2 * Wp
    T0 = jnp.arange(n, dtype=jnp.int32)

    def body(state):
        T, _ = state
        a = T[TL]
        b = T[BL]
        m = jnp.where(up, jnp.minimum(a, b), _BIG)
        T = T.at[TL].min(m)
        T = T.at[BL].min(m)
        # path-halving on the boundary label set
        T = T.at[TL].min(T[T[TL]])
        T = T.at[BL].min(T[T[BL]])
        changed = jnp.any(T[TL] != a) | jnp.any(T[BL] != b)
        return T, changed

    T, _ = jax.lax.while_loop(lambda s: s[1], body, (T0, jnp.bool_(True)))
    return T[lab.reshape(-1)].reshape(Hp2, Wp)


def remove_small_segments(D, p: ElasParams):
    """Drop-in Pallas replacement for
    ops.postprocess.remove_small_segments (exact fixpoint only).

    The kernel keeps the whole frame in VMEM (~7 live i32 planes + 2
    planes of while-body operand staging, under a raised 96 MB scoped
    limit — v5e VMEM is 128 MB); frames where that exceeds the budget
    (beyond ~scale 0.4, 3100x940) fall back to the XLA formulation
    (identical results)."""
    H, W = D.shape
    # Whole-frame mode only while the kernel's ~7 live i32 frame planes
    # fit the default 16 MB scoped-VMEM budget: KITTI-size frames
    # (384x1280 = 13.1 MB) are the measured sweet spot (~5 ms device).
    # r3 raised this guard to 112 MB to let wide frames (752x2560 =
    # 53.9 MB of live planes) run in-kernel, and the result was
    # catastrophic VMEM thrash — ~180 s per frame measured on v5e
    # (scripts/fault_probe.py, r4), which is what made every scale-0.5
    # sweep run "crash" the tunneled worker (a single dispatch running
    # for minutes under concurrent pipeline load;
    # docs/KNOWN_ISSUES.md post-mortem).  Larger frames now run BANDED:
    # the same fixpoint kernel on VMEM-sized row bands + a cross-band
    # label merge (see _banded_labels/_merge_bands) — identical
    # partition, whole-frame exact.  SV_CCL_MODE=xla forces the XLA
    # formulation (A/B baseline; it measured ~520 ms/frame at 2484x750,
    # 73% of frame time — the r2 wide-frame configuration).
    # SV_CCL_MODE is read at TRACE time (this function runs under jit and
    # the jit cache is not keyed on it): set it BEFORE the first compile
    # of a given shape; changing it afterwards is silently ignored for
    # already-compiled shapes.  Values: auto (whole-frame kernel where
    # VMEM-safe, else banded), banded (force banded), whole (whole-frame
    # where VMEM-safe, else the XLA fallback — it will NOT force the
    # whole-frame kernel past the VMEM guard; see the r4 post-mortem
    # above), xla (force the XLA formulation, the A/B baseline).
    import os
    mode = os.environ.get("SV_CCL_MODE", "auto")
    banded = _round_up(H, 8) * _round_up(W, 128) * 4 * 7 > 14 * 2 ** 20
    if mode == "xla" or (banded and mode == "whole"):
        from .. import postprocess as post
        return post.remove_small_segments(D, p, 0)
    n_t = mesh_ctx.row_multiple()
    if mode == "banded" or n_t > 1:
        # under a multi-shard 'tile' mesh the CCL always runs banded with
        # shard-aligned bands: per-shard in-VMEM fixpoints via shard_map
        # (_banded_labels shards the band axis over 'tile') + the
        # cross-band boundary merge.  Replicating the whole-frame kernel
        # (the pre-r5 behaviour) wasted a factor n_t of device compute.
        banded = True
    speckle = p.speckle_size
    if p.subsampling:
        speckle = int(math.sqrt(float(p.speckle_size)) * 2)

    valid = D >= 0

    def conn_dir(dy, dx):
        pads = ((max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0)))
        nb = jnp.pad(D, pads, constant_values=-1e9)[
            max(dy, 0):max(dy, 0) + H, max(dx, 0):max(dx, 0) + W]
        nb_valid = jnp.pad(valid, pads)[
            max(dy, 0):max(dy, 0) + H, max(dx, 0):max(dx, 0) + W]
        return valid & nb_valid & (jnp.abs(D - nb) <= p.speckle_sim_threshold)

    conn = (conn_dir(0, -1).astype(jnp.int32)
            + 2 * conn_dir(0, 1).astype(jnp.int32)
            + 4 * conn_dir(-1, 0).astype(jnp.int32)
            + 8 * conn_dir(1, 0).astype(jnp.int32))

    Hp = _round_up(H, 8)
    Wp = _round_up(W, 128)
    if banded:
        # band rows sized so 7 live planes stay ~12 MB, then pad Hp to a
        # band multiple (padding rows: conn 0 -> size-1 singletons,
        # cropped before the threshold)
        Hb = _BAND_ROWS or max((12 * 2 ** 20 // (Wp * 4 * 7)) // 8 * 8, 8)
        if n_t > 1:
            # shard-aligned: bands no taller than one tile shard's rows
            # and Hp padded to an Hb*n_t multiple, so the band count
            # divides 'tile' and every member owns whole bands
            Hb = min(Hb, _round_up(-(-Hp // n_t), 8))
            Hp = _round_up(Hp, Hb * n_t)
        else:
            Hp = _round_up(Hp, Hb)
    conn_p = jnp.pad(conn, ((0, Hp - H), (0, Wp - W)))   # padding: singletons
    n = Hp * Wp
    stride = n + 1
    idx = jnp.arange(n, dtype=jnp.int32).reshape(Hp, Wp)
    if not banded:
        # re-key overflow bound (see _banded_labels): val - stride*seg
        # must stay inside int32 for the longest sweep
        assert stride * (max(Hp, Wp) + 1) < 2 ** 31, (Hp, Wp)

    if banded:
        lab = _merge_bands(_banded_labels(conn_p, Hb), conn_p, Hb)
    else:
        lab = _converge(conn_p, idx, stride)

    sizes = jnp.zeros((n,), jnp.int32).at[lab.reshape(-1)].add(1)
    if _SIZE_GATHER or banded:
        # every pixel's component size is a direct lookup — the
        # scatter-add histogram above already pays the same
        # indexed-access cost.  Banded mode always takes this path: the
        # min-spread alternative would need its own cross-band
        # propagation (sizes live at the global root, possibly in
        # another band).
        size_px = sizes[lab.reshape(-1)].reshape(Hp, Wp)[:H, :W]
    else:
        # round-2 fallback: label == linear index of the component's first
        # (row-major) pixel, so reshaping the histogram puts every
        # component's size AT its root pixel; min-propagating
        # (size at root, n elsewhere) over the same connectivity hands it
        # to every member without a gather — at the cost of a second full
        # fixpoint (~the same round count again).
        root_size = sizes.reshape(Hp, Wp)
        spread0 = jnp.where(lab == idx, root_size, n)
        size_px = _fixpoint(conn_p, spread0, stride)[:H, :W]

    return jnp.where(size_px < speckle, jnp.float32(-10.0), D)
