"""Pallas TPU kernel for the left/right consistency check.

Same semantics as ops.postprocess.lr_consistency_check (reference
leftRightConsistencyCheck, src/serial_includes/elas/elas.cpp:946-1011).
The XLA formulation gathers D2[u - D1(u)] with take_along_axis — a
per-element dynamic gather that costs ~70 ms/batch on TPU.  Disparities
are exact integers in [0, disp_max], so the gather becomes a loop over
disparity values: for each d, one lane-roll of the other image's row
aligns the warped column for every pixel whose disparity equals d.  Both
directions share the loop, and the whole row stays in VMEM.

Under subsampling the warp is u -/+ d/2 with the reference's
truncation-to-int (elas.cpp:957-966): trunc(u - d/2) = u - ceil(d/2) and
trunc(u + d/2) = u + floor(d/2) for u >= d/2 — uniform shifts per d, so
the same rolls apply.
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

_INVALID = np.float32(-10.0)

BH = 8


def _kernel(D1_ref, D2_ref, o1_ref, o2_ref, *, D, W, lr_thr, sub,
            batched=False):
    if batched:
        D1 = D1_ref[0]
        D2 = D2_ref[0]
    else:
        D1 = D1_ref[...]
        D2 = D2_ref[...]
    Wp = D1.shape[-1]
    u = jax.lax.broadcasted_iota(jnp.int32, (BH, Wp), 1)

    def body(d, carry):
        o1, o2 = carry
        df = jnp.float32(d)
        if sub:
            s1 = (d + 1) >> 1          # trunc(u - d/2) = u - ceil(d/2)
            s2 = d >> 1                # trunc(u + d/2) = u + floor(d/2)
            lo1 = d                    # uw >= 0  <=>  2u >= d
            hi2 = 2 * W - d            # uw < W   <=>  2u < 2W - d
            u2 = 2 * u
        else:
            s1 = d
            s2 = d
            lo1 = d
            hi2 = W - d
            u2 = u
        # left image: db = D2[u - s1]
        db1 = pltpu.roll(D2, s1, axis=1)
        m1 = (D1 == df) & (u2 >= lo1)
        ok1 = jnp.abs(db1 - df) <= lr_thr
        o1 = jnp.where(m1, jnp.where(ok1, df, _INVALID), o1)
        # right image: db = D1[u + s2]
        db2 = pltpu.roll(D1, jnp.mod(-s2, Wp), axis=1)
        m2 = (D2 == df) & (u2 < hi2)
        ok2 = jnp.abs(db2 - df) <= lr_thr
        o2 = jnp.where(m2, jnp.where(ok2, df, _INVALID), o2)
        return o1, o2

    inv = jnp.full((BH, Wp), _INVALID, jnp.float32)
    o1, o2 = jax.lax.fori_loop(0, D, body, (inv, inv))
    if batched:
        o1_ref[0] = o1
        o2_ref[0] = o2
    else:
        o1_ref[...] = o1
        o2_ref[...] = o2


def _round_up(x, m):
    return (x + m - 1) // m * m


def _lr_call(shapes, D, W, lr_thr, sub, batch: int = 0):
    Hp, Wp = shapes
    batched = batch > 0
    kern = functools.partial(_kernel, D=D, W=W, lr_thr=lr_thr, sub=sub,
                             batched=batched)
    if batched:
        grid = (batch, Hp // BH)

        def bs():
            return pl.BlockSpec((1, BH, Wp), lambda b, i: (b, i, 0),
                                memory_space=pltpu.VMEM)
    else:
        grid = (Hp // BH,)

        def bs():
            return pl.BlockSpec((BH, Wp), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

    lead = (batch,) if batched else ()
    out = jax.ShapeDtypeStruct(lead + (Hp, Wp), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bs(), bs()],
        out_specs=(bs(), bs()),
        out_shape=(out, out),
        cost_estimate=pl.CostEstimate(
            flops=10 * D * Hp * Wp * max(batch, 1),
            bytes_accessed=4 * 4 * Hp * Wp * max(batch, 1),
            transcendentals=0),
        interpret=jax.default_backend() == "cpu",
    )


def lr_consistency_check(D1, D2, p: ElasParams):
    """Drop-in Pallas replacement for
    ops.postprocess.lr_consistency_check (same outputs)."""
    from jax.sharding import PartitionSpec as P
    H, W = D1.shape
    n_t = mesh_ctx.row_multiple()
    Hp = _round_up(H, BH * n_t)
    Wp = _round_up(W, 128)
    pad = ((0, Hp - H), (0, Wp - W))
    D1p = jnp.pad(D1, pad, constant_values=_INVALID)
    D2p = jnp.pad(D2, pad, constant_values=_INVALID)
    Dn = p.disp_num
    thr = float(p.lr_threshold)
    sub = bool(p.subsampling)
    loc = (Hp // n_t, Wp)

    def specs(batched):
        # the check is along-row only: rows shard over 'tile', no halo
        _, s_ax, t_ax = mesh_ctx.current()
        lead = (s_ax,) if batched else ()
        s = P(*lead, t_ax, None)
        return (s, s), (s, s)

    @jax.custom_batching.custom_vmap
    def run(D1p, D2p):
        call = _lr_call(loc, Dn, W, thr, sub)
        if mesh_ctx.current() is None:
            return call(D1p, D2p)
        in_s, out_s = specs(False)
        return mesh_ctx.shard_kernel(call, in_s, out_s, D1p, D2p)

    @run.def_vmap
    def run_vmap(axis_size, in_batched, D1p, D2p):
        args = []
        for x, b in zip((D1p, D2p), in_batched):
            if not b:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            args.append(x)
        call = _lr_call(loc, Dn, W, thr, sub,
                        batch=mesh_ctx.batch_split(axis_size))
        if mesh_ctx.current() is None:
            return call(*args), (True, True)
        in_s, out_s = specs(True)
        return mesh_ctx.shard_kernel(call, in_s, out_s, *args), (True, True)

    o1, o2 = run(D1p, D2p)
    return o1[..., :H, :W], o2[..., :H, :W]
