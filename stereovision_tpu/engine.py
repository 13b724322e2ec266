"""StereoEngine: calibrated frames -> disparity + point cloud, with the
reference application's exact output conventions, plus a pipelined streaming
mode that overlaps the host geometry stage with device compute.

Reference counterparts:
  externalInit / generatePointCloud  src/serial_includes/main/stereo_vision.cpp:498-623
  generateDisparityMap               stereo_vision.cpp:296-318 (disparity
                                     stored as uint8 = 4x true disparity)
  publishPointCloud                  stereo_vision.cpp:222-280 (Q reprojection
                                     of the *uint8* disparity)
  imageLoop timing printf            stereo_vision.cpp:682-686

Deliberate TPU-first deltas: one engine instead of three binaries; the
device keeps descriptors/disparity resident (no per-frame full round trips
like elas_gpu.cu:537-563); frames stream through a 2-deep software pipeline
so Delaunay overlaps matching of the previous frame.
"""

from __future__ import annotations

import collections
import queue
import time
from typing import Dict, Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .params import ElasParams, app_params
from .models.elas import ElasEngine
from .io.calibration import Rectification, rectification_from_yaml
from .ops.reproject import reproject, box_centroids


def bgr_to_gray(img: np.ndarray) -> np.ndarray:
    """BGR(A) -> grayscale uint8 with OpenCV's fixed-point BT.601 rounding
    (matches cvtColor(BGRA2GRAY), reference stereo_vision.cpp:338-339)."""
    if img.ndim == 2:
        return img
    b = img[..., 0].astype(np.uint32)
    g = img[..., 1].astype(np.uint32)
    r = img[..., 2].astype(np.uint32)
    # OpenCV: yuv shift 14; coefficients R 0.299, G 0.587, B 0.114.
    y = (4899 * r + 9617 * g + 1868 * b + (1 << 13)) >> 14
    return y.astype(np.uint8)


class StereoEngine:
    """Stereo frames -> disparity map + 3-D point cloud."""

    def __init__(self,
                 calibration_yaml: str,
                 width: int,
                 height: int,
                 scale: float = 1.0,
                 pc_extrapolation: int = 1,
                 params: Optional[ElasParams] = None,
                 subsampling: bool = False,
                 use_pallas: Optional[bool] = None,
                 rasterize=None,
                 true_scale_cloud: bool = False,
                 remove_sky: bool = False,
                 robot_frame: bool = False):
        self.p = params or app_params(subsampling=subsampling)
        self.remove_sky = remove_sky
        self.width = int(width)
        self.height = int(height)
        self.pc_w = self.width * pc_extrapolation
        self.pc_h = self.height * pc_extrapolation
        self.rect: Rectification = rectification_from_yaml(
            calibration_yaml, self.width, self.height, scale_factor=scale)
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        if rasterize is None:
            try:
                from .hostlib.raster import rasterize as _cr
                rasterize = _cr
            except Exception:
                rasterize = None
        self.elas = ElasEngine(self.p, self.width, self.height,
                               rasterize=rasterize, use_pallas=use_pallas)
        # The reference feeds the uint8 display disparity (4x true) into Q
        # (stereo_vision.cpp:316 + :234-242).  true_scale_cloud=False keeps
        # that behaviour for parity; True divides by 4 for metric clouds.
        self.disp_display_scale = 4.0
        self.true_scale_cloud = true_scale_cloud
        # robot_frame=True applies the calibration's XR/XT rigid transform
        # to the cloud (p' = XR @ p + XT), matching the reference CUDA
        # tree's projectParallel kernel (stereo_vision.cu:208-211); the
        # default False matches the serial tree, where the transform is
        # commented out (stereo_vision.cpp:251).
        self.robot_frame = robot_frame
        self._reproject = jax.jit(self._reproject_impl)
        # Fused dense stage + reprojection: one device dispatch for the
        # whole back half of the frame.  Takes the five host-geometry
        # arrays packed into ONE uint8 buffer (ElasEngine.pack_geometry):
        # each jnp.asarray is a separate host->device dispatch at ~25 ms
        # through the tunnel, so the single-frame paths (process_frame /
        # stream — the live-camera mode) ship one buffer like the batched
        # path instead of five arrays (4 crossings/frame saved).
        self._dense_tail = jax.jit(
            lambda desc1, desc2, buf: self._dense_tail_impl(
                desc1, desc2, *self.elas.unpack_geometry(buf)))
        self.timings: Dict[str, float] = {}
        self._executors = None
        self._fused_warnq: "queue.Queue[str]" = queue.Queue()

    def _drain_fused_warnings(self):
        """Surface host-geometry worker warnings queued by the fused-mode
        pure_callback.  The queue is engine-level: callbacks run async and
        multiple dispatches may be in flight, so messages are not
        attributable to a specific batch — they are emitted as soon as
        they are seen, plus once after the stream ends (no loss under
        fetch='device', where nothing forces completion mid-stream)."""
        import warnings as _warnings
        try:
            while True:
                _warnings.warn("host geometry worker: "
                               + self._fused_warnq.get_nowait())
        except queue.Empty:
            pass

    # -- lifecycle -----------------------------------------------------------

    def _get_executors(self, batch: int, pipeline_depth: int):
        """Lazily-created, engine-owned thread pools for stream_batched
        (reused across calls; shut down by close() — reference clean(),
        stereo_vision.cpp:105-114)."""
        import concurrent.futures as cf
        need = max(pipeline_depth, 1)
        if self._executors is not None and self._executors[3] < need:
            for e in self._executors[:3]:
                e.shutdown(wait=False, cancel_futures=True)
            self._executors = None
        if self._executors is None:
            self._executors = (
                cf.ThreadPoolExecutor(max_workers=min(max(batch, 1), 8)),
                cf.ThreadPoolExecutor(max_workers=need),
                cf.ThreadPoolExecutor(max_workers=1),
                need)
        return self._executors[:3]

    def close(self):
        """Release worker threads and host geometry processes.  Idempotent;
        the engine remains usable (pools are re-created on demand)."""
        if self._executors is not None:
            for e in self._executors[:3]:
                e.shutdown(wait=True, cancel_futures=True)
            self._executors = None
        self.elas.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # -- device tail: display disparity + cloud -----------------------------

    def _reproject_impl(self, D1):
        dmap = jnp.clip(jnp.round(D1 * self.disp_display_scale),
                        0, 255).astype(jnp.uint8)
        if self.remove_sky:
            # zero disparity above ~55% height (reference remove_sky,
            # stereo_vision.cpp:484-490: mask rows [0, H/2*1.1))
            sky_rows = int(dmap.shape[0] // 2 * 1.1)
            mask = (np.arange(dmap.shape[0]) >= sky_rows)[:, None]
            dmap = jnp.where(mask, dmap, 0)
        pc = dmap
        if (self.pc_h, self.pc_w) != dmap.shape:
            pc = jax.image.resize(dmap.astype(jnp.float32),
                                  (self.pc_h, self.pc_w), "linear")
        d_for_q = pc.astype(jnp.float32)
        if self.true_scale_cloud:
            d_for_q = d_for_q / self.disp_display_scale
        points = reproject(d_for_q, self.rect.Q)
        if self.robot_frame:
            from .ops.reproject import apply_robot_transform
            points = apply_robot_transform(points, self.rect.XR,
                                           self.rect.XT)
        return dmap, points

    def _dense_tail_impl(self, desc1, desc2, pts, planes_l, planes_r,
                         tri_l, tri_r):
        D1, D2 = self.elas._stage_dense_impl(desc1, desc2, pts, planes_l,
                                             planes_r, tri_l, tri_r)
        dmap, points = self._reproject_impl(D1)
        return D1, dmap, points

    def _run_dense(self, desc1, desc2, g):
        buf = jnp.asarray(self.elas.pack_geometry(g))   # ONE upload
        return self._dense_tail(desc1, desc2, buf)

    # -- blocking single-frame path -----------------------------------------

    def process_frame(self, left: np.ndarray, right: np.ndarray,
                      fetch: str = "host") -> Dict:
        """left/right: (H, W[, C]) uint8 BGR(A)/gray frames at engine size.
        Returns dict with dmap (uint8 display disparity), disparity (float),
        points ((pc_h*pc_w, 3)), and stage timings.

        fetch: "host" copies dmap+points to NumPy (reference-equivalent
        behaviour — its CUDA build copies the cloud back every frame,
        stereo_vision.cu:251-264); "dmap" copies only the display disparity
        and leaves the cloud on device (zero-copy consumers / chained
        device work); "device" leaves everything on device."""
        t0 = time.perf_counter()
        g1 = bgr_to_gray(left)
        g2 = bgr_to_gray(right)
        td = time.perf_counter()
        desc1, desc2, d_can = self.elas._stage_support(jnp.asarray(g1),
                                                       jnp.asarray(g2))
        g = self.elas.host_mid(np.asarray(d_can))
        D1, dmap, points = self._run_dense(desc1, desc2, g)
        if fetch in ("host", "dmap"):
            dmap = np.asarray(dmap)
        tq = time.perf_counter()
        if fetch == "host":
            points = np.asarray(points).reshape(-1, 3)
        t1 = time.perf_counter()
        self.timings = {"t_t": t1 - t0, "dmap_t": tq - td, "pc_t": t1 - tq}
        return {"dmap": dmap, "disparity": D1,
                "points": points, "timings": dict(self.timings)}

    # -- pipelined streaming path -------------------------------------------

    def stream(self, frames: Iterable[Tuple[np.ndarray, np.ndarray]],
               lookahead: int = 2, fetch: str = "host") -> Iterator[Dict]:
        """Process a stream of (left, right) frames with a software pipeline:
        stage-A (descriptors+support) of future frames is dispatched ahead so
        the host geometry stage of frame i overlaps device matching of frame
        i-1 (the TPU analogue of the reference's CPU/GPU overlap in
        elas_gpu.cu and the std::async YOLO overlap)."""
        frames = iter(frames)
        q = collections.deque()

        def dispatch_a():
            try:
                lf, rf = next(frames)
            except StopIteration:
                return False
            t0 = time.perf_counter()
            g1, g2 = bgr_to_gray(lf), bgr_to_gray(rf)
            out = self.elas._stage_support(jnp.asarray(g1), jnp.asarray(g2))
            q.append((t0, out))
            return True

        for _ in range(lookahead):
            if not dispatch_a():
                break
        while q:
            t0, (desc1, desc2, d_can) = q.popleft()
            g = self.elas.host_mid(np.asarray(d_can))
            D1, dmap_dev, points_dev = self._run_dense(desc1, desc2, g)
            dispatch_a()
            dmap = np.asarray(dmap_dev)
            tq = time.perf_counter()
            points = points_dev
            if fetch == "host":
                points = np.asarray(points_dev).reshape(-1, 3)
            t1 = time.perf_counter()
            # dmap_t = time until the display disparity materialized on the
            # host; pc_t = extra time to fetch the cloud (the stages are
            # fused in one dispatch, so the split is observed at the fetch
            # boundary — the reference's per-stage split is at
            # stereo_vision.cpp:682).
            self.timings = {"t_t": t1 - t0, "dmap_t": tq - t0,
                            "pc_t": t1 - tq}
            yield {"dmap": dmap, "points": points,
                   "timings": dict(self.timings)}

    # -- batched throughput path --------------------------------------------

    @property
    def _batched_fns(self):
        """(f_a, f_tail) for the batched path.  Inputs are packed to
        minimize host->device dispatches through high-latency links:
        f_a takes ONE (B, 2, H, W) stacked image pair array; f_tail takes
        ONE (B, nbytes) uint8 geometry buffer (ElasEngine.pack_geometry)
        next to the device-resident descriptors."""
        if not hasattr(self, "_batched_cache"):
            e = self.elas

            def tail_from_buf(desc1, desc2, buf):
                return self._dense_tail_impl(desc1, desc2,
                                             *e.unpack_geometry(buf))

            self._batched_cache = (
                jax.jit(jax.vmap(lambda pair: e._stage_support_impl(
                    pair[0], pair[1]))),
                jax.jit(jax.vmap(tail_from_buf)),
            )
        return self._batched_cache

    def _fused_fn(self, batch: int):
        """ONE jitted dispatch for the whole batched pipeline: stage A ->
        host geometry via jax.pure_callback (process pool) -> dense tail.
        Collapses the per-batch tunnel crossing count (stage-A dispatch,
        d_can fetch, geometry upload, tail dispatch -> one dispatch whose
        callback transfers ride the same round trip) — the win is the fixed
        ~25 ms/crossing link latency, which dominates small frames."""
        cache = getattr(self, "_fused_cache", None)
        if cache is None:
            cache = self._fused_cache = {}
        if batch not in cache:
            e = self.elas
            nbytes = e._geo_layout[1]
            out_t = jax.ShapeDtypeStruct((batch, nbytes), np.uint8)

            def host_cb(d_cans):
                dcs = np.asarray(d_cans)
                try:
                    gs = e.host_mid_parallel(
                        [dcs[i] for i in range(len(dcs))])
                except Exception:
                    gs = [e.host_mid(dcs[i]) for i in range(len(dcs))]
                # thread-safe queue, drained by the caller only after it
                # forces completion of the dispatch — the callback runs
                # asynchronously and multiple tail workers may be in flight
                for g in gs:
                    for m in g.get("warnings", ()):
                        self._fused_warnq.put(m)
                return np.stack([e.pack_geometry(g) for g in gs])

            def run(pairs):
                desc1, desc2, d_can = jax.vmap(
                    lambda pr: e._stage_support_impl(pr[0], pr[1]))(pairs)
                bufs = jax.pure_callback(host_cb, out_t, d_can)
                return jax.vmap(
                    lambda a, b, buf: self._dense_tail_impl(
                        a, b, *e.unpack_geometry(buf)))(desc1, desc2, bufs)

            cache[batch] = jax.jit(run)
        return cache[batch]

    def stream_batched(self, frames: Iterable[Tuple[np.ndarray, np.ndarray]],
                       batch: int = 4, fetch: str = "dmap",
                       pipeline_depth: int = 2,
                       host_workers: str = "process",
                       fused: bool = False) -> Iterator[Dict]:
        """Throughput mode: process frames in batches of `batch` per device
        dispatch (vmapped pipeline).  Amortizes dispatch latency and fills
        the VPU — the TPU-native scaling axis the reference has no analogue
        for (its three builds are all single-frame).  The per-batch chain
        (support-grid fetch -> host geometry -> dense-tail dispatch ->
        output fetch) runs on `pipeline_depth` worker threads, so host work
        and transfers of one batch overlap device execution of another.
        Yields per-frame results in order."""
        import warnings as _warnings
        f_a, f_tail = self._batched_fns
        ex, workers, prefetch = self._get_executors(batch, pipeline_depth)
        it = iter(frames)
        pending = collections.deque()

        def next_batch():
            fs = []
            for _ in range(batch):
                try:
                    fs.append(next(it))
                except StopIteration:
                    break
            if not fs:
                return None
            n_real = len(fs)
            while len(fs) < batch:      # pad short tail batch
                fs.append(fs[-1])
            pairs = np.stack([[bgr_to_gray(l), bgr_to_gray(r)]
                              for l, r in fs])       # (B, 2, H, W): 1 H2D
            t0 = time.perf_counter()
            if fused:
                return (t0, n_real, jnp.asarray(pairs))
            out = f_a(jnp.asarray(pairs))
            return (t0, n_real, out)

        host_mode = {"mode": host_workers}

        def run_tail(entry):
            if fused:
                t0, n, pairs = entry
                try:
                    D1, dmap, points = self._fused_fn(batch)(pairs)
                    dmaps = (np.asarray(dmap) if fetch in ("host", "dmap")
                             else dmap)
                except Exception as err:
                    msg = str(err)
                    if "callback" in msg or "UNIMPLEMENTED" in msg:
                        raise RuntimeError(
                            "stream_batched(fused=True) requires host "
                            "callbacks, which this backend rejects (the "
                            "axon TPU plugin does not support host "
                            "send/recv callbacks — docs/PERFORMANCE.md). "
                            "Use fused=False here.") from err
                    raise
                # Engine-level best-effort drain: the queue is shared
                # across in-flight dispatches (pipeline_depth > 1) and the
                # callbacks run asynchronously, so messages surfaced here
                # may belong to ANY dispatch — they are emitted untagged as
                # engine-level warnings, and stream_batched drains the
                # queue once more after the final batch so nothing is lost
                # even in fetch="device" mode (nothing forces completion
                # before this point there).
                self._drain_fused_warnings()
                t_dmap = time.perf_counter()
                pts_np = (np.asarray(points) if fetch == "host" else points)
                return t0, n, dmaps, pts_np, t_dmap
            t0, n, (desc1, desc2, d_can) = entry
            dcs = np.asarray(d_can)
            gs = None
            if host_mode["mode"] == "process":
                try:
                    gs = self.elas.host_mid_parallel(
                        [dcs[i] for i in range(dcs.shape[0])])
                except Exception:
                    # spawn workers need an importable __main__ (REPL /
                    # stdin scripts don't have one) — fall back to threads
                    host_mode["mode"] = "thread"
                    self.elas._host_pool = None
            if gs is None:
                gs = list(ex.map(self.elas.host_mid, [dcs[i] for i in
                                 range(dcs.shape[0])]))
            # surface warnings captured inside pool subprocesses (support
            # thinning / span overflow — otherwise silent accuracy loss)
            for g in gs:
                for msg in g.get("warnings", ()):
                    _warnings.warn("host geometry worker: " + msg)
            bufs = jnp.asarray(np.stack(
                [self.elas.pack_geometry(g) for g in gs]))   # 1 H2D
            D1, dmap, points = f_tail(desc1, desc2, bufs)
            dmaps = np.asarray(dmap) if fetch in ("host", "dmap") else dmap
            t_dmap = time.perf_counter()
            pts_np = (np.asarray(points) if fetch == "host" else points)
            return t0, n, dmaps, pts_np, t_dmap

        def emit(done):
            t0, n, dmaps, pts_np, t_dmap = done
            t1 = time.perf_counter()
            per = (t1 - t0) / n
            # per-frame stage split (reference stereo_vision.cpp:682):
            # dmap_t = batch time until display disparities materialized;
            # pc_t = extra time for the cloud fetch (0 when it stays on
            # device).
            dmap_per = (t_dmap - t0) / n
            pc_per = (t1 - t_dmap) / n
            for i in range(n):
                self.timings = {"t_t": per, "dmap_t": dmap_per,
                                "pc_t": pc_per}
                yield {"dmap": dmaps[i],
                       "points": (pts_np[i].reshape(-1, 3)
                                  if fetch == "host" else pts_np[i]),
                       "timings": dict(self.timings)}

        # Threaded pipeline: each batch's tail chain (support-grid fetch ->
        # host geometry -> tail dispatch -> output fetch) runs on a worker
        # thread, `pipeline_depth` batches in flight.  Stage A (grayscale
        # convert + image H2D + dispatch) runs on its own prefetch thread:
        # the image upload is the single largest transfer (~1 MB/frame
        # through the tunnel) and must overlap tail processing rather than
        # serialize the emit loop.
        state = {"exhausted": False}

        def pump_a():
            e = next_batch()
            if e is None:
                state["exhausted"] = True
            return e

        a_futs = collections.deque()

        def submit_a():
            if not state["exhausted"]:
                a_futs.append(prefetch.submit(pump_a))

        for _ in range(2):
            submit_a()
        while a_futs or pending:
            while a_futs and len(pending) < max(pipeline_depth, 1):
                e = a_futs.popleft().result()
                submit_a()
                if e is not None:
                    pending.append(workers.submit(run_tail, e))
            if pending:
                yield from emit(pending.popleft().result())
        if fused:
            # final drain: callbacks of the last dispatches may complete
            # after their run_tail's drain (see _drain_fused_warnings)
            self._drain_fused_warnings()

    # -- object fusion -------------------------------------------------------

    def object_positions(self, points: np.ndarray,
                         boxes: np.ndarray) -> np.ndarray:
        """Mean 3-D position per detection box
        (reference stereo_vision.cpp:261-277)."""
        pts = jnp.asarray(points.reshape(self.pc_h, self.pc_w, 3))
        return np.asarray(box_centroids(pts, jnp.asarray(boxes)))


class StereoVision:
    """Drop-in analogue of the reference pip package's Python class
    `stereo_vision.stereo_vision` (stereo_vision/sv.py:156-192): same
    constructor surface, same generatePointCloud(left, right) ->
    (width*height, 3) float64 array behaviour — backed by the TPU engine
    instead of a ctypes .so."""

    def __init__(self, so_lib_path=None, width=1242, height=375,
                 defaultCalibFile=True, objectTracking=False, graphics=False,
                 display=False, scale=1, pc_extrapolation=1,
                 YOLO_CFG=None, YOLO_WEIGHTS=None, YOLO_CLASSES=None,
                 CAMERA_CALIBRATION_YAML=None, subsampling=False):
        import os.path as osp
        if CAMERA_CALIBRATION_YAML is None:
            CAMERA_CALIBRATION_YAML = osp.join(
                osp.dirname(__file__), "data", "kitti_2011_09_26.yml")
        self.width, self.height = width, height
        self.engine = StereoEngine(CAMERA_CALIBRATION_YAML, width, height,
                                   scale=scale,
                                   pc_extrapolation=pc_extrapolation,
                                   subsampling=subsampling)
        self.objectTracking = objectTracking
        self.tracker = None
        self.detector = None
        if objectTracking:
            from .models.bayesian import BayesianTracker
            self.tracker = BayesianTracker()
            from .models.yolo import YoloV4Tiny
            try:
                self.detector = YoloV4Tiny.from_files(
                    YOLO_CFG, YOLO_WEIGHTS, YOLO_CLASSES)
            except Exception:
                self.detector = None

    def generatePointCloud(self, left, right):
        res = self.engine.process_frame(left, right)
        self.last = res
        if self.objectTracking and self.detector is not None:
            dets = self.detector.detect(left)
            preds = self.tracker.get_predicted_boxes()
            self.tracker.append(dets)
            self.last["objects"] = dets + preds
        t = self.engine.timings
        print("(FPS=%f) (%d, %d) (t_t=%f, dmap_t=%f, pc_t=%f)"
              % (1.0 / max(t["t_t"], 1e-9), res["dmap"].shape[0],
                 res["dmap"].shape[1], t["t_t"], t["dmap_t"], t["pc_t"]))
        return res["points"].astype(np.float64)

    def __del__(self):
        # reference clean() (stereo_vision.cpp:105-114): release worker
        # threads/processes when the wrapper object dies
        try:
            self.engine.close()
        except Exception:
            pass
