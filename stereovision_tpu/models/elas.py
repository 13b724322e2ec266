"""The ELAS stereo pipeline, assembled TPU-first.

The reference ships three copy-pasted implementations (serial SSE2, OpenMP,
CUDA — src/{serial,omp,parallel}_includes/elas/) behind one `Elas::process`
entry (src/serial_includes/elas/elas.cpp:31-150).  Here there is exactly one
pipeline; "variants" are execution configs (interpret/CPU for tests, one
chip, or a sharded mesh via stereovision_tpu.parallel).

Structure:
  device stage A  descriptors + support matching      (ops.descriptor/support)
  host middle     Delaunay + plane fit + rasterize    (ops.planes / hostlib)
  device stage B  grid masks + dense matching + post  (ops.grid/matching/postprocess)

The host middle is tiny (O(#support) ≈ thousands) and fixed-shape-padded;
`ElasEngine.process` runs it synchronously, `process_jit` wraps it in
`jax.pure_callback` so the whole pipeline is a single jittable function, and
the streaming engine (stereovision_tpu.engine) overlaps it with device work
across frames.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..params import ElasParams
from ..ops.descriptor import compute_descriptor
from ..ops.support import support_matches
from ..ops.grid import build_grid_mask
from ..ops.matching import compute_disparity
from ..ops import postprocess as post
from ..ops.planes import fit_plane_tables, host_geometry
from ..ops.spans import encode_tri_spans, expand_tri_spans


def host_mid_standalone(d_can: np.ndarray, params: ElasParams, width: int,
                        height: int, n_max: int, t_max: int, s_max: int,
                        host_filters: bool = True) -> Dict[str, np.ndarray]:
    """JAX-free host middle stage (picklable; used by process pools).
    Same products as ElasEngine.host_mid, plus a "warnings" entry: warnings
    raised here (support thinning, span overflow — the silent-accuracy
    channels) would otherwise vanish inside pool subprocesses, so they are
    captured and re-raised parent-side by the consumers.  The triangle-id
    maps travel as (H, s_max, 3) uint8 packed row spans (ops.spans) — ~5x
    less H2D than dense."""
    import warnings as _warnings
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        out = _host_mid_body(d_can, params, width, height, n_max, t_max,
                             s_max, host_filters)
    out["warnings"] = [str(w.message) for w in caught]
    return out


def _host_mid_body(d_can, params, width, height, n_max, t_max, s_max,
                   host_filters):
    d_can = np.asarray(d_can)
    if host_filters:
        from ..hostlib.raster import filter_support_sequential
        d_can = filter_support_sequential(d_can, params)
    try:
        from ..hostlib.raster import rasterize as rfn
    except Exception:
        rfn = None
    g = host_geometry(d_can, params, width, height, rasterize=rfn,
                      n_cap=n_max)
    pts = np.full((n_max, 3), -1, np.int16)
    n = min(len(g["pts"]), n_max)
    pts[:n] = g["pts"][:n]
    out = {"pts": pts}
    sub = 2 if params.subsampling else 1
    Ho, Wo = params.out_shape(width, height)
    for tag in ("l", "r"):
        # ship triangle vertex indices (6 B/tri); the device fits the
        # (T, 4) f32 plane tables itself (ops.planes.fit_plane_tables) —
        # 2.5x less geometry H2D than shipping the tables
        tr = np.full((t_max, 3), -1, np.int16)
        t = min(len(g["tris_" + tag]), t_max)
        tr[:t] = g["tris_" + tag][:t]
        out["tris_" + tag] = tr
        tri = g["tri_id_" + tag]
        tri = np.where(tri >= t_max, -1, tri)
        if sub != 1:
            # Matching only samples the output lattice (every 2nd row and
            # column); encode spans there — 4x less H2D than full-lattice
            # spans.
            tri = tri[::sub, ::sub][:Ho, :Wo]
        out["tri_" + tag] = encode_tri_spans(tri, s_max)
    return out


_POOL_CFG = {}


def _pool_init(params, width, height, n_max, t_max, s_max, host_filters):
    _POOL_CFG.update(params=params, width=width, height=height,
                     n_max=n_max, t_max=t_max, s_max=s_max,
                     host_filters=host_filters)


def _pool_host_mid(d_can):
    c = _POOL_CFG
    return host_mid_standalone(d_can, c["params"], c["width"], c["height"],
                               c["n_max"], c["t_max"], c["s_max"],
                               c["host_filters"])


class ElasEngine:
    """Static-shape ELAS pipeline for one image size."""

    def __init__(self, params: ElasParams, width: int, height: int,
                 rasterize=None, use_pallas: bool = False,
                 host_filters: bool = True, speckle_max_iters: int = 0,
                 row_pad: Tuple[int, int] = (0, 0)):
        # host_filters=True (default): support filtering runs on the host
        # with the reference's exact sequential in-place semantics
        # (hostlib); False keeps the snapshot filters on device (used by
        # fully-fused modes where no host stage exists).
        self.host_filters = host_filters
        # row_pad=(in_pad, out_pad): the row-sharded pipeline
        # (parallel/shard.py) pads image rows H -> H+in_pad and output
        # rows Ho -> Ho+out_pad so both divide the 'tile' axis and GSPMD
        # can shard the XLA glue.  Stage A then EXPECTS pre-padded
        # (H+in_pad, W) images; stage B emits (Ho+out_pad, Wo) maps whose
        # padding rows are -10 and whose real rows are bit-identical to
        # the unpadded engine (each op takes the true shape for its row
        # clamps/regions; see ops.descriptor/support/matching/postprocess).
        self.row_pad_in, self.row_pad_out = row_pad
        self.speckle_max_iters = speckle_max_iters
        self.p = params
        self.width = int(width)
        self.height = int(height)
        step = params.step
        self.Hc = -(-self.height // step)
        self.Wc = -(-self.width // step)
        # Static padding caps for the host-geometry arrays.  The grid has
        # Hc*Wc cells; the support filters keep ~2.2k points on KITTI but
        # up to 6.5k on dense-texture Middlebury pairs (raindeer 6480,
        # aloe 6204 measured) — 8192 covers every measured scene with 26%
        # headroom.  Pathological overflow is thinned UNIFORMLY on the
        # host BEFORE triangulation (host_geometry n_cap), keeping the
        # shipped triangle vertex indices consistent with the pts pad.
        # s_max bounds triangle runs per image row (~210 measured on
        # KITTI at width 1242; scales with width).
        self.n_max = min(self.Hc * self.Wc + 6, 8192)
        self.t_max = 2 * self.n_max + 8
        # Triangle spans are encoded on the matching output lattice (half
        # rows/cols under subsampling).  The run cap must NOT scale down
        # with the lattice: runs per row are set by triangle-edge crossings
        # (the triangulation is the same at either lattice), so subsampled
        # rows hold nearly as many runs as full-res ones (measured 188 at
        # Wo=621 vs ~210 at W=1242 on KITTI).  Size by full image width.
        self.Ho, self.Wo = params.out_shape(self.width, self.height)
        self.s_max = max(64, min(self.width // 4, self.Wo))
        if rasterize is None:
            try:
                from ..hostlib.raster import rasterize as _native_raster
                rasterize = _native_raster
            except Exception:
                rasterize = None
        self._rasterize = rasterize
        self.use_pallas = use_pallas

        self._stage_support = jax.jit(self._stage_support_impl)
        self._stage_dense = jax.jit(self._stage_dense_impl)
        self._host_pool = None

    def close(self):
        """Shut down the host geometry process pool (reference clean(),
        stereo_vision.cpp:105-114).  Idempotent."""
        if self._host_pool is not None:
            self._host_pool.shutdown(wait=True, cancel_futures=True)
            self._host_pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def host_pool(self, workers: int = 4):
        """Process pool running host_mid GIL-free (scipy's Delaunay holds
        the GIL, so threads cap host throughput at ~1.3x; processes scale
        linearly).  d_can in (37 KB) and geometry out (~3 MB) per frame
        cross via pickle."""
        if self._host_pool is None:
            import concurrent.futures as cf
            import multiprocessing as mp
            # spawn (not fork): the parent holds live accelerator-runtime
            # state/sockets that must not be inherited
            self._host_pool = cf.ProcessPoolExecutor(
                max_workers=workers, mp_context=mp.get_context("spawn"),
                initializer=_pool_init,
                initargs=(self.p, self.width, self.height, self.n_max,
                          self.t_max, self.s_max, self.host_filters))
        return self._host_pool

    def host_mid_parallel(self, d_cans, workers: int = 4):
        """Map host_mid over a batch of support grids in worker processes."""
        pool = self.host_pool(workers)
        return list(pool.map(_pool_host_mid, list(d_cans)))

    # ---- device stage A ---------------------------------------------------

    def _stage_support_impl(self, I1, I2):
        th = self.height if self.row_pad_in else 0
        desc1 = compute_descriptor(I1, true_height=th)
        desc2 = compute_descriptor(I2, true_height=th)
        if self.use_pallas:
            from ..ops.pallas import support_pl
            d_can = support_pl.support_matches(
                desc1, desc2, self.p, apply_filters=not self.host_filters,
                true_height=th)
        else:
            d_can = support_matches(desc1, desc2, self.p,
                                    apply_filters=not self.host_filters,
                                    true_height=th)
        return desc1, desc2, d_can

    # ---- host middle ------------------------------------------------------

    def host_mid(self, d_can: np.ndarray) -> Dict[str, np.ndarray]:
        """Support grid -> padded geometry arrays (fixed shapes)."""
        d_can = np.asarray(d_can)
        if self.host_filters:
            from ..hostlib.raster import filter_support_sequential
            d_can = filter_support_sequential(d_can, self.p)
        g = host_geometry(d_can, self.p, self.width, self.height,
                          rasterize=self._rasterize, n_cap=self.n_max)
        pts = np.full((self.n_max, 3), -1, np.int16)
        n = min(len(g["pts"]), self.n_max)
        pts[:n] = g["pts"][:n]
        out = {"pts": pts}
        sub = 2 if self.p.subsampling else 1
        for tag in ("l", "r"):
            tr = np.full((self.t_max, 3), -1, np.int16)
            t = min(len(g["tris_" + tag]), self.t_max)
            tr[:t] = g["tris_" + tag][:t]
            out["tris_" + tag] = tr
            tri = g["tri_id_" + tag]
            tri = np.where(tri >= self.t_max, -1, tri)
            if sub != 1:
                # spans on the output lattice (see host_mid_standalone)
                tri = tri[::sub, ::sub][:self.Ho, :self.Wo]
            out["tri_" + tag] = encode_tri_spans(tri, self.s_max)
        return out

    # ---- packed geometry transport -----------------------------------------
    #
    # The five per-frame geometry arrays (pts, tris_l/r, span-coded
    # tri_l/r) are small but each jnp.asarray is a separate host->device
    # dispatch; through a high-latency link (the axon tunnel pays ~10-25 ms
    # per transfer) that fixed cost dominates the bytes.  Pack them into
    # ONE uint8 buffer on the host and unpack on device with bitcasts
    # (free — XLA folds them into the consumers).

    @functools.cached_property
    def _geo_layout(self):
        segs = [("pts", (self.n_max, 3), np.int16),
                ("tris_l", (self.t_max, 3), np.int16),
                ("tris_r", (self.t_max, 3), np.int16),
                ("tri_l", (self.Ho, self.s_max, 3), np.uint8),
                ("tri_r", (self.Ho, self.s_max, 3), np.uint8)]
        layout, off = [], 0
        for name, shape, dt in segs:
            nbytes = int(np.prod(shape)) * np.dtype(dt).itemsize
            layout.append((name, shape, dt, off, nbytes))
            off += nbytes
        return layout, off

    def pack_geometry(self, g: Dict[str, np.ndarray]) -> np.ndarray:
        """host_mid dict -> one (nbytes,) uint8 buffer."""
        layout, total = self._geo_layout
        buf = np.empty(total, np.uint8)
        for name, shape, dt, off, nbytes in layout:
            buf[off:off + nbytes] = np.ascontiguousarray(
                g[name], dtype=dt).view(np.uint8).ravel()
        return buf

    def unpack_geometry(self, buf):
        """(nbytes,) uint8 device buffer -> (pts, tris_l, tris_r, tri_l,
        tri_r) jnp views (static slices + bitcasts)."""
        layout, _ = self._geo_layout
        out = []
        for name, shape, dt, off, nbytes in layout:
            seg = jax.lax.slice_in_dim(buf, off, off + nbytes)
            if np.dtype(dt).itemsize > 1:
                seg = jax.lax.bitcast_convert_type(
                    seg.reshape(-1, np.dtype(dt).itemsize), jnp.dtype(dt))
            out.append(seg.reshape(shape))
        return tuple(out)

    # ---- device stage B ---------------------------------------------------

    def _stage_dense_impl(self, desc1, desc2, pts, planes_l, planes_r,
                          tri_l, tri_r):
        p = self.p
        # geometry arrives compact: planes_l/planes_r may be (T, 3) int
        # triangle VERTEX INDICES (the streaming paths ship those — 2.5x
        # less H2D) to be fitted into (T, 4) f32 plane tables on device,
        # or precomputed f32 tables (op-level tests / oracle inputs)
        if jnp.issubdtype(planes_l.dtype, jnp.integer):
            planes_l, _ = fit_plane_tables(pts, planes_l)
            _, planes_r = fit_plane_tables(pts, planes_r)
        # triangle maps arrive as row spans on the output lattice;
        # reconstruct dense on device
        if tri_l.ndim == 3 and tri_l.shape[-1] == 3:
            tri_l = expand_tri_spans(tri_l, self.Wo)
            tri_r = expand_tri_spans(tri_r, self.Wo)
        out_pad = self.row_pad_out
        th = self.height if self.row_pad_in else 0
        if out_pad:
            # padded output lattice: -1 (no triangle) rows make matching
            # emit -10 there, which every later stage preserves (invalid
            # pixels never connect/fill/write) — see row_pad in __init__
            rp = ((0, out_pad), (0, 0))
            tri_l = jnp.pad(tri_l, rp, constant_values=-1)
            tri_r = jnp.pad(tri_r, rp, constant_values=-1)
        grid_l = build_grid_mask(pts, p, self.width, self.height,
                                 right_image=False)
        grid_r = build_grid_mask(pts, p, self.width, self.height,
                                 right_image=True)
        if self.use_pallas:
            from ..ops.pallas import matching_pl, ccl_pl, lr_pl
            match = matching_pl.compute_disparity
            lr_check = lr_pl.lr_consistency_check
            speckle = (ccl_pl.remove_small_segments
                       if self.speckle_max_iters == 0 else
                       lambda D, q: post.remove_small_segments(
                           D, q, self.speckle_max_iters))
        else:
            match = compute_disparity
            lr_check = post.lr_consistency_check
            speckle = lambda D, q: post.remove_small_segments(
                D, q, self.speckle_max_iters)
        if self.use_pallas:
            # one shared SAD volume feeds both passes where eligible
            # (full-res); subsampled/very-wide frames fall back to two
            # independent scans inside the pair wrapper
            D1, D2 = matching_pl.compute_disparity_pair(
                desc1, desc2, tri_l, tri_r, planes_l, planes_r,
                grid_l, grid_r, p, true_height=th, pad_out_rows=out_pad)
        else:
            D1 = match(desc1, desc2, tri_l, planes_l, grid_l, p,
                       right_image=False, true_height=th,
                       pad_out_rows=out_pad)
            D2 = match(desc2, desc1, tri_r, planes_r, grid_r, p,
                       right_image=True, true_height=th,
                       pad_out_rows=out_pad)

        D1, D2 = lr_check(D1, D2, p)
        D1 = speckle(D1, p)
        if not p.postprocess_only_left:
            D2 = speckle(D2, p)
        D1 = post.gap_interpolation(D1, p)
        if not p.postprocess_only_left:
            D2 = post.gap_interpolation(D2, p)
        tsh = (self.Ho, self.Wo) if out_pad else None
        if p.filter_adaptive_mean:
            D1 = post.adaptive_mean(D1, p, true_shape=tsh)
            if not p.postprocess_only_left:
                D2 = post.adaptive_mean(D2, p, true_shape=tsh)
        if p.filter_median:
            D1 = post.median_filter(D1, p, true_shape=tsh)
            if not p.postprocess_only_left:
                D2 = post.median_filter(D2, p, true_shape=tsh)
        if out_pad:
            # gap interpolation's border extrapolation may spill values
            # into the padding rows — re-assert them invalid so the
            # padded output's contract is clean (real rows + -10 pad)
            real = jnp.arange(D1.shape[0])[:, None] < self.Ho
            D1 = jnp.where(real, D1, jnp.float32(-10))
            D2 = jnp.where(real, D2, jnp.float32(-10))
        return D1, D2

    # ---- public entry points ---------------------------------------------

    def process(self, I1, I2) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Blocking single-frame processing (device -> host -> device).
        I1, I2: (H, W) uint8 grayscale.  Returns (D1, D2) float32 disparity
        maps (-10 / -1 = invalid), half size under subsampling."""
        desc1, desc2, d_can = self._stage_support(jnp.asarray(I1),
                                                  jnp.asarray(I2))
        g = self.host_mid(np.asarray(d_can))
        return self._stage_dense(desc1, desc2,
                                 jnp.asarray(g["pts"]),
                                 jnp.asarray(g["tris_l"]),
                                 jnp.asarray(g["tris_r"]),
                                 jnp.asarray(g["tri_l"]),
                                 jnp.asarray(g["tri_r"]))

    # Fully-jittable variant: host middle runs via pure_callback.

    def _host_mid_flat(self, d_can):
        g = self.host_mid(np.asarray(d_can))
        return (g["pts"], g["tris_l"], g["tris_r"],
                g["tri_l"], g["tri_r"])

    @functools.cached_property
    def process_jit(self):
        out_types = (
            jax.ShapeDtypeStruct((self.n_max, 3), np.int16),
            jax.ShapeDtypeStruct((self.t_max, 3), np.int16),
            jax.ShapeDtypeStruct((self.t_max, 3), np.int16),
            jax.ShapeDtypeStruct((self.Ho, self.s_max, 3), np.uint8),
            jax.ShapeDtypeStruct((self.Ho, self.s_max, 3), np.uint8),
        )

        def run(I1, I2):
            desc1, desc2, d_can = self._stage_support_impl(I1, I2)
            pts, pl_l, pl_r, tri_l, tri_r = jax.pure_callback(
                self._host_mid_flat, out_types, d_can)
            return self._stage_dense_impl(desc1, desc2, pts, pl_l, pl_r,
                                          tri_l, tri_r)

        return jax.jit(run)
