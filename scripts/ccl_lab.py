"""CCL perf lab: A/B the speckle-removal fixpoint variants on a real KITTI
frame (VERDICT r2 next-step #3).

Measures, on the pre-speckle disparity map (matching + LR check output):
  1. round-2 design: pure in-kernel fixpoint labels + min-spread sizes
  2. jump design: bounded sweep rounds + XLA pointer jumps, gathered sizes
  3. sweep-rounds-to-converge with and without pointer jumping (host loop)

Run on the real TPU; writes findings to stderr."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import cv2
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync1(x):
    np.asarray(x.reshape(-1)[:1])


def main():
    from stereovision_tpu.engine import bgr_to_gray
    from stereovision_tpu.models.elas import ElasEngine
    from stereovision_tpu.params import robotics_params
    from stereovision_tpu.ops import postprocess as post
    from stereovision_tpu.ops.pallas import ccl_pl, matching_pl, lr_pl

    W, H = 1242, 375
    kitti = "/root/reference/datasets/kitti_mini"
    L = bgr_to_gray(cv2.resize(cv2.imread(f"{kitti}/image_02/data/0000000000.png"), (W, H)))
    R = bgr_to_gray(cv2.resize(cv2.imread(f"{kitti}/image_03/data/0000000000.png"), (W, H)))

    p = robotics_params()
    eng = ElasEngine(p, W, H, use_pallas=True)
    desc1, desc2, d_can = eng._stage_support(jnp.asarray(L), jnp.asarray(R))
    g = eng.host_mid(np.asarray(d_can))

    from stereovision_tpu.ops.planes import fit_plane_tables
    from stereovision_tpu.ops.spans import expand_tri_spans
    from stereovision_tpu.ops.grid import build_grid_mask

    @jax.jit
    def pre_speckle(desc1, desc2, pts, tv_l, tv_r, trs_l, trs_r):
        pl_l, _ = fit_plane_tables(pts, tv_l)
        _, pl_r = fit_plane_tables(pts, tv_r)
        tri_l = expand_tri_spans(trs_l, eng.Wo)
        tri_r = expand_tri_spans(trs_r, eng.Wo)
        gl = build_grid_mask(pts, p, W, H, right_image=False)
        gr = build_grid_mask(pts, p, W, H, right_image=True)
        D1 = matching_pl.compute_disparity(desc1, desc2, tri_l, pl_l, gl, p, right_image=False)
        D2 = matching_pl.compute_disparity(desc2, desc1, tri_r, pl_r, gr, p, right_image=True)
        return lr_pl.lr_consistency_check(D1, D2, p)

    D1, _ = pre_speckle(desc1, desc2, jnp.asarray(g["pts"]),
                        jnp.asarray(g["tris_l"]), jnp.asarray(g["tris_r"]),
                        jnp.asarray(g["tri_l"]), jnp.asarray(g["tri_r"]))
    D1h = np.asarray(D1)
    log("pre-speckle valid frac: %.3f" % (D1h >= 0).mean())

    def time_variant(name, jump_rounds, size_gather):
        ccl_pl._JUMP_ROUNDS = jump_rounds
        ccl_pl._SIZE_GATHER = size_gather
        fn = jax.jit(lambda d: ccl_pl.remove_small_segments(d, p))
        out = fn(D1)
        sync1(out)  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            sync1(fn(D1))
            ts.append(time.perf_counter() - t0)
        log("%s: %.1f ms (min of 5; includes ~25 ms tunnel dispatch)"
            % (name, 1000 * min(ts)))
        return np.asarray(out)

    ref = time_variant("r2 design (fixpoint+spread)  ", 0, False)
    for k in (1, 2, 4):
        o = time_variant(f"jump K={k} + size gather      ", k, True)
        assert np.array_equal(ref, o), f"jump K={k} mismatch!"
    o = time_variant("jump K=2 + spread            ", 2, False)
    assert np.array_equal(ref, o)

    # rounds-to-converge, host-controlled (counts only, timing irrelevant)
    from stereovision_tpu.ops.pallas.ccl_pl import (_fixpoint, _round_up)
    speckle_D = D1
    valid = speckle_D >= 0

    Hp, Wp = _round_up(H, 8), _round_up(W, 128)
    # rebuild conn exactly as remove_small_segments does
    def conn_dir(dy, dx):
        pads = ((max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0)))
        nb = jnp.pad(speckle_D, pads, constant_values=-1e9)[
            max(dy, 0):max(dy, 0) + H, max(dx, 0):max(dx, 0) + W]
        nbv = jnp.pad(valid, pads)[
            max(dy, 0):max(dy, 0) + H, max(dx, 0):max(dx, 0) + W]
        return valid & nbv & (jnp.abs(speckle_D - nb) <= p.speckle_sim_threshold)

    conn = (conn_dir(0, -1).astype(jnp.int32) + 2 * conn_dir(0, 1).astype(jnp.int32)
            + 4 * conn_dir(-1, 0).astype(jnp.int32) + 8 * conn_dir(1, 0).astype(jnp.int32))
    conn_p = jnp.pad(conn, ((0, Hp - H), (0, Wp - W)))
    n = Hp * Wp
    idx = jnp.arange(n, dtype=jnp.int32).reshape(Hp, Wp)
    one = jax.jit(lambda c, l: _fixpoint(c, l, n + 1, rounds=1))

    for jump in (False, True):
        lab = idx
        rounds = 0
        while True:
            m = one(conn_p, lab)
            if jump:
                f = m.reshape(-1)
                m = f[f].reshape(Hp, Wp)
            rounds += 1
            if np.array_equal(np.asarray(m), np.asarray(lab)):
                break
            lab = m
            if rounds > 200:
                break
        log("sweep rounds to converge (%s): %d"
            % ("with pointer jump" if jump else "pure sweeps", rounds))


if __name__ == "__main__":
    main()
