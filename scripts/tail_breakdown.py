"""Per-stage device timing of the dense tail at batch 8 (TPU).
Run alone (single tunneled chip)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import numpy as np
    import cv2
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_sv")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from stereovision_tpu.engine import StereoEngine, bgr_to_gray
    from stereovision_tpu.ops.spans import expand_tri_spans
    from stereovision_tpu.ops.planes import fit_plane_tables
    from stereovision_tpu.ops.grid import build_grid_mask
    from stereovision_tpu.ops.pallas import matching_pl, ccl_pl, lr_pl
    from stereovision_tpu.ops import postprocess as post
    from stereovision_tpu.ops.reproject import reproject

    W = int(os.environ.get("SV_LAB_W", "1242"))
    H = int(os.environ.get("SV_LAB_H", "375"))
    B = int(os.environ.get("SV_LAB_B", "8"))
    scale = 1242.0 / W
    eng = StereoEngine("stereovision_tpu/data/kitti_2011_09_26.yml", W, H,
                       scale=scale)
    p = eng.p
    kitti = "/root/reference/datasets/kitti_mini"
    g1 = np.stack([bgr_to_gray(cv2.resize(cv2.imread(
        f"{kitti}/image_02/data/{i:010d}.png"), (W, H))) for i in range(B)])
    g2 = np.stack([bgr_to_gray(cv2.resize(cv2.imread(
        f"{kitti}/image_03/data/{i:010d}.png"), (W, H))) for i in range(B)])

    f_a, _ = eng._batched_fns
    desc1, desc2, d_can = f_a(jnp.asarray(np.stack([g1, g2], axis=1)))
    dcs = np.asarray(d_can)
    gs = [eng.elas.host_mid(dcs[i]) for i in range(B)]
    st = {k: jnp.asarray(np.stack([g[k] for g in gs])) for k in gs[0]}

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])
        return x

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        out = sync(f(*args))   # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(f(*args))
            ts.append(time.perf_counter() - t0)
        log("%-28s %7.1f ms" % (name, 1000 * min(ts)))
        return out

    vm = jax.vmap
    tri_l = timeit("expand_spans_l", vm(lambda s: expand_tri_spans(s, W)),
                   st["tri_l"])
    tri_r = timeit("expand_spans_r", vm(lambda s: expand_tri_spans(s, W)),
                   st["tri_r"])
    gm_l = timeit("grid_mask_l",
                  vm(lambda q: build_grid_mask(q, p, W, H, False)),
                  st["pts"])
    gm_r = timeit("grid_mask_r",
                  vm(lambda q: build_grid_mask(q, p, W, H, True)),
                  st["pts"])
    pl_l, _ = jax.vmap(fit_plane_tables)(st["pts"], st["tris_l"])
    _, pl_r = jax.vmap(fit_plane_tables)(st["pts"], st["tris_r"])
    D1 = timeit("matching_left", vm(
        lambda a, b, t, pm, g: matching_pl.compute_disparity(
            a, b, t, pm, g, p, False)),
        desc1, desc2, tri_l, pl_l, gm_l)
    D2 = timeit("matching_right", vm(
        lambda a, b, t, pm, g: matching_pl.compute_disparity(
            a, b, t, pm, g, p, True)),
        desc2, desc1, tri_r, pl_r, gm_r)
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
    log("params: median=%s only_left=%s" % (p.filter_median,
                                            p.postprocess_only_left))


if __name__ == "__main__":
    main()
