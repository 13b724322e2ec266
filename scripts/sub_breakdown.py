"""Subsampled-mode perf breakdown: stage A, host, tail, and matching alone.
Run on the TPU; writes findings to stderr."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, cv2
import concurrent.futures as cf
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_sv"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync1(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])


def main():
    from stereovision_tpu.engine import StereoEngine, bgr_to_gray
    B = int(os.environ.get("B", "4"))
    W, H = 1242, 375
    eng = StereoEngine("stereovision_tpu/data/kitti_2011_09_26.yml", W, H,
                       subsampling=True, use_pallas=True)
    kitti = "/root/reference/datasets/kitti_mini"
    imgs = []
    for i in range(21):
        l = cv2.imread(f"{kitti}/image_02/data/{i:010d}.png")
        r = cv2.imread(f"{kitti}/image_03/data/{i:010d}.png")
        imgs.append((cv2.resize(l, (W, H)), cv2.resize(r, (W, H))))
    f_a, f_tail = eng._batched_fns
    ex = cf.ThreadPoolExecutor(8)

    def make_batch(k):
        g1 = np.stack([bgr_to_gray(imgs[(k*B+i) % 21][0]) for i in range(B)])
        g2 = np.stack([bgr_to_gray(imgs[(k*B+i) % 21][1]) for i in range(B)])
        return g1, g2

    t0 = time.time()
    g1, g2 = make_batch(0)
    a = f_a(jnp.asarray(np.stack([g1, g2], axis=1)))
    dcs = np.asarray(a[2])
    gs = list(ex.map(eng.elas.host_mid, [dcs[i] for i in range(B)]))
    st = {k: jnp.asarray(np.stack([g[k] for g in gs]))
          for k in gs[0]}
    bufs = jnp.asarray(np.stack([eng.elas.pack_geometry(g) for g in gs]))
    out = f_tail(a[0], a[1], bufs)
    np.asarray(out[1])
    log("compile+warm: %.0f s (B=%d)" % (time.time() - t0, B))

    for name, fn in (
        ("A", lambda: f_a(jnp.asarray(np.stack([g1, g2], axis=1)))),
        ("tail", lambda: f_tail(a[0], a[1], bufs)),
    ):
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            sync1(fn())
            ts.append(time.perf_counter() - t0)
        log("%s only: %.0f ms/batch (min of 4)" % (name, 1000 * min(ts)))

    # stage-A internals + tail per-stage
    from stereovision_tpu.ops.pallas import matching_pl, ccl_pl, lr_pl
    from stereovision_tpu.ops.pallas import support_pl
    from stereovision_tpu.ops.descriptor import compute_descriptor
    from stereovision_tpu.ops.grid import build_grid_mask
    from stereovision_tpu.ops.spans import expand_tri_spans
    from stereovision_tpu.ops.planes import fit_plane_tables
    from stereovision_tpu.ops import postprocess as post
    p = eng.p
    vm = jax.vmap

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        sync1(out)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            sync1(f(*args))
            ts.append(time.perf_counter() - t0)
        log("%-28s %7.1f ms" % (name, 1000 * min(ts)))
        return out

    timeit("descriptors x2", vm(lambda x, y: (compute_descriptor(x),
                                              compute_descriptor(y))),
           jnp.asarray(g1), jnp.asarray(g2))
    timeit("support_pl", vm(lambda x, y: support_pl.support_matches(
        x, y, p, apply_filters=False)), a[0], a[1])
    tri_l = timeit("expand_spans_l", vm(lambda s: expand_tri_spans(s, eng.elas.Wo)),
                   st["tri_l"])
    gm_l = timeit("grid_mask_l",
                  vm(lambda q: build_grid_mask(q, p, W, H, False)),
                  st["pts"])
    gm_r = timeit("grid_mask_r",
                  vm(lambda q: build_grid_mask(q, p, W, H, True)),
                  st["pts"])
    tri_r = timeit("expand_spans_r", vm(lambda s: expand_tri_spans(s, eng.elas.Wo)),
                   st["tri_r"])
    pl_l, _ = jax.vmap(fit_plane_tables)(st["pts"], st["tris_l"])
    _, pl_r = jax.vmap(fit_plane_tables)(st["pts"], st["tris_r"])
    D1 = timeit("matching_left", vm(
        lambda a_, b_, t_, pm, g_: matching_pl.compute_disparity(
            a_, b_, t_, pm, g_, p, False)),
        a[0], a[1], tri_l, pl_l, gm_l)
    D2 = timeit("matching_right", vm(
        lambda a_, b_, t_, pm, g_: matching_pl.compute_disparity(
            a_, b_, t_, pm, g_, p, True)),
        a[1], a[0], tri_r, pl_r, gm_r)
    D1c, D2c = timeit("lr_check_pl", vm(
        lambda x, y: lr_pl.lr_consistency_check(x, y, p)), D1, D2)
    D1s = timeit("speckle_ccl_pl", vm(
        lambda x: ccl_pl.remove_small_segments(x, p)), D1c)
    D1g = timeit("gap_interp", vm(
        lambda x: post.gap_interpolation(x, p)), D1s)
    D1a = timeit("adaptive_mean", vm(
        lambda x: post.adaptive_mean(x, p)), D1g)
    if p.filter_median:
        D1a = timeit("median", vm(lambda x: post.median_filter(x, p)), D1a)
    timeit("reproject_tail", vm(eng._reproject_impl), D1a)

    # end-to-end
    def frames(n_):
        for i in range(n_):
            yield imgs[i % 21]
    for trial in range(3):
        t0 = time.time()
        n = 0
        for o in eng.stream_batched(frames(12 * B), batch=B, fetch="dmap",
                                    pipeline_depth=3):
            n += 1
        log("stream_batched(%d) FPS: %.2f" % (B, n / (time.time() - t0)))


if __name__ == "__main__":
    main()
