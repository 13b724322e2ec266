"""Pallas kernel parity vs the XLA formulations, in interpreter mode on CPU
(the TPU runs the same kernels compiled; bit-exactness there is verified by
the perf scripts and the golden test)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereovision_tpu.params import robotics_params
from stereovision_tpu.models.elas import ElasEngine
from stereovision_tpu.ops.planes import fit_plane_tables
from stereovision_tpu.ops.grid import build_grid_mask
from stereovision_tpu.ops import matching
from stereovision_tpu.ops.spans import expand_tri_spans
from stereovision_tpu.ops.pallas import matching_pl

def plane_table(g, tag):
    """(T, 4) f32 plane table from the shipped vertex indices (the same
    fit the engine performs on device)."""
    left, right = fit_plane_tables(jnp.asarray(g["pts"]),
                                   jnp.asarray(g["tris_" + tag]))
    return left if tag == "l" else right


@pytest.mark.parametrize("sub", [False, True])
def test_matching_kernel_matches_xla(sub):
    h, w = 64, 256
    p = robotics_params(disp_max=63, subsampling=sub,
                        postprocess_only_left=False)
    rng = np.random.default_rng(3)
    L = rng.integers(0, 255, (h, w), dtype=np.uint8)
    R = np.empty_like(L)
    for v in range(h):
        R[v] = np.roll(L[v], -(4 + v // 16))

    eng = ElasEngine(p, width=w, height=h)
    desc1, desc2, d_can = eng._stage_support(jnp.asarray(L), jnp.asarray(R))
    g = eng.host_mid(np.asarray(d_can))

    for right in (False, True):
        tag = "r" if right else "l"
        gm = build_grid_mask(jnp.asarray(g["pts"]), p, w, h, right)
        tri = expand_tri_spans(jnp.asarray(g["tri_" + tag]), eng.Wo)
        args = ((desc2, desc1) if right else (desc1, desc2)) + (
            tri, plane_table(g, tag),
            gm, p, right)
        Dx = np.asarray(matching.compute_disparity(*args))
        Dp = np.asarray(matching_pl.compute_disparity(*args))
        assert np.array_equal(Dx, Dp), f"right={right} sub={sub}"


@pytest.mark.parametrize("sub", [False, True])
def test_matching_kernel_batched_rule(sub):
    h, w = 32, 128
    p = robotics_params(disp_max=31, subsampling=sub,
                        postprocess_only_left=False)
    rng = np.random.default_rng(4)
    L = rng.integers(0, 255, (h, w), dtype=np.uint8)
    R = np.roll(L, -5, axis=1)
    eng = ElasEngine(p, width=w, height=h)
    desc1, desc2, d_can = eng._stage_support(jnp.asarray(L), jnp.asarray(R))
    g = eng.host_mid(np.asarray(d_can))
    gm = build_grid_mask(jnp.asarray(g["pts"]), p, w, h, False)
    tri_l = expand_tri_spans(jnp.asarray(g["tri_l"]), eng.Wo)

    single = np.asarray(matching_pl.compute_disparity(
        desc1, desc2, tri_l, plane_table(g, "l"),
        gm, p, False))

    B = 3
    st = lambda x: jnp.asarray(np.stack([np.asarray(x)] * B))
    batched = jax.vmap(
        lambda a, b, t, pm, gmask: matching_pl.compute_disparity(
            a, b, t, pm, gmask, p, False)
    )(st(desc1), st(desc2), st(tri_l), st(plane_table(g, "l")), st(gm))
    batched = np.asarray(batched)
    for i in range(B):
        assert np.array_equal(batched[i], single)


@pytest.mark.parametrize("filters", [False, True])
def test_support_kernel_matches_xla(filters):
    from stereovision_tpu.ops import support
    from stereovision_tpu.ops.pallas import support_pl
    from stereovision_tpu.ops.descriptor import compute_descriptor

    h, w = 96, 384
    p = robotics_params(disp_max=63, postprocess_only_left=False)
    rng = np.random.default_rng(7)
    L = rng.integers(0, 255, (h, w), dtype=np.uint8)
    R = np.empty_like(L)
    for v in range(h):
        R[v] = np.roll(L[v], -(6 + v // 24))
    d1 = compute_descriptor(jnp.asarray(L))
    d2 = compute_descriptor(jnp.asarray(R))
    ref = np.asarray(support.support_matches(d1, d2, p,
                                             apply_filters=filters))
    mine = np.asarray(support_pl.support_matches(d1, d2, p,
                                                 apply_filters=filters))
    assert ref.shape == mine.shape
    assert np.array_equal(ref, mine)
    if not filters:
        assert (ref >= 0).sum() > 50    # scene actually produced support


@pytest.mark.parametrize("batched", [False, True])
def test_support_kernel_chunked_matches_full(monkeypatch, batched):
    """The column-chunked wide-frame mode (overlapping halo windows on a
    chunk grid dimension) must be bit-identical to the full-width scan —
    forced here at a small size by shrinking the module thresholds."""
    from stereovision_tpu.ops.pallas import support_pl
    from stereovision_tpu.ops.descriptor import compute_descriptor

    h, w = 64, 320
    p = robotics_params(disp_max=63, postprocess_only_left=False)
    rng = np.random.default_rng(9)
    L = rng.integers(0, 255, (h, w), dtype=np.uint8)
    R = np.empty_like(L)
    for v in range(h):
        R[v] = np.roll(L[v], -(6 + v // 24))
    d1 = compute_descriptor(jnp.asarray(L))
    d2 = compute_descriptor(jnp.asarray(R))
    full = np.asarray(support_pl.support_matches(d1, d2, p))
    monkeypatch.setattr(support_pl, "_MAX_FULL_W", 128)
    monkeypatch.setattr(support_pl, "_CHUNK_W", 128)
    if batched:
        B = 2
        st = lambda x: jnp.asarray(np.stack([np.asarray(x)] * B))
        out = jax.vmap(lambda a, b: support_pl.support_matches(a, b, p))(
            st(d1), st(d2))
        for i in range(B):
            assert np.array_equal(np.asarray(out)[i], full)
    else:
        chunked = np.asarray(support_pl.support_matches(d1, d2, p))
        assert np.array_equal(full, chunked)


def test_support_kernel_batched_rule():
    from stereovision_tpu.ops import support
    from stereovision_tpu.ops.pallas import support_pl
    from stereovision_tpu.ops.descriptor import compute_descriptor

    h, w = 64, 256
    p = robotics_params(disp_max=31)
    rng = np.random.default_rng(8)
    L = rng.integers(0, 255, (h, w), dtype=np.uint8)
    R = np.roll(L, -7, axis=1)
    d1 = compute_descriptor(jnp.asarray(L))
    d2 = compute_descriptor(jnp.asarray(R))
    single = np.asarray(support_pl.support_matches(d1, d2, p))
    B = 3
    st = lambda x: jnp.asarray(np.stack([np.asarray(x)] * B))
    batched = jax.vmap(lambda a, b: support_pl.support_matches(a, b, p))(
        st(d1), st(d2))
    for i in range(B):
        assert np.array_equal(np.asarray(batched)[i], single)


def test_ccl_kernel_matches_xla():
    from stereovision_tpu.ops import postprocess as post
    from stereovision_tpu.ops.pallas import ccl_pl
    from stereovision_tpu.params import robotics_params

    p = robotics_params(disp_max=63)
    rng = np.random.default_rng(11)
    h, w = 48, 160
    # blobby disparity field with invalid speckles and serpentine shapes
    D = np.full((h, w), -10.0, np.float32)
    D[5:40, 10:150] = 12.0
    D[8:12, 20:40] = 40.0                 # small isolated plateau
    D[20, 50:130] = 80.0                  # thin line segment
    D[21:30, 129] = 80.0                  # ... with a bend (serpentine)
    D[30, 60:130] = 80.0
    D[44:46, 3:6] = 7.0                   # tiny segment
    noise = rng.integers(0, 3, (h, w))
    D = np.where(D >= 0, D + noise, D).astype(np.float32)

    for speckle_size in (20, 200):
        q = robotics_params(disp_max=63, speckle_size=speckle_size)
        ref = np.asarray(post.remove_small_segments(jnp.asarray(D), q, 0))
        mine = np.asarray(ccl_pl.remove_small_segments(jnp.asarray(D), q))
        assert np.array_equal(ref, mine), speckle_size


def test_ccl_kernel_batched():
    from stereovision_tpu.ops import postprocess as post
    from stereovision_tpu.ops.pallas import ccl_pl
    from stereovision_tpu.params import robotics_params

    p = robotics_params(disp_max=31, speckle_size=30)
    rng = np.random.default_rng(12)
    B, h, w = 3, 24, 136
    Ds = []
    for _ in range(B):
        D = np.where(rng.random((h, w)) < 0.7,
                     rng.integers(0, 30, (h, w)).astype(np.float32), -10.0)
        Ds.append(D.astype(np.float32))
    Ds = np.stack(Ds)
    ref = np.stack([np.asarray(post.remove_small_segments(
        jnp.asarray(Ds[i]), p, 0)) for i in range(B)])
    mine = np.asarray(jax.vmap(
        lambda x: ccl_pl.remove_small_segments(x, p))(jnp.asarray(Ds)))
    assert np.array_equal(ref, mine)


@pytest.mark.parametrize("batched", [False, True])
def test_ccl_kernel_banded(monkeypatch, batched):
    """Banded mode (wide frames whose planes exceed the whole-frame VMEM
    budget): per-band fixpoints + cross-band label merge must reproduce
    the whole-frame partition exactly — forced here at small shapes with
    16-row bands, with components deliberately spanning several bands
    (serpentine + vertical bars) and a 200-px threshold that straddles
    band-local sizes (a band-local count would wrongly remove spanning
    segments)."""
    from stereovision_tpu.ops import postprocess as post
    from stereovision_tpu.ops.pallas import ccl_pl
    from stereovision_tpu.params import robotics_params

    monkeypatch.setattr(ccl_pl, "_BAND_ROWS", 16)
    monkeypatch.setenv("SV_CCL_MODE", "banded")
    rng = np.random.default_rng(21)
    h, w = 61, 150      # 61 -> 64 padded -> 4 bands
    import scipy.ndimage as ndi

    def scene(seed):
        r = np.random.default_rng(seed)
        base = ndi.gaussian_filter(r.normal(size=(h, w)), 4)
        D = np.round((base - base.min()) * 40).astype(np.float32)
        D[r.random((h, w)) < 0.15] = -1
        D[:, 30] = 90.0                   # vertical bar spans all bands
        D[17, 40:90] = 55.0               # serpentine through 3 bands
        D[18:35, 89] = 55.0
        D[35, 40:90] = 55.0
        D[36:50, 40] = 55.0
        return D

    p = robotics_params(disp_max=63, speckle_size=200)
    if batched:
        Ds = np.stack([scene(s) for s in (1, 2, 3)])
        ref = np.stack([np.asarray(post.remove_small_segments(
            jnp.asarray(d), p, 0)) for d in Ds])
        mine = np.asarray(jax.vmap(
            lambda x: ccl_pl.remove_small_segments(x, p))(jnp.asarray(Ds)))
    else:
        D = scene(0)
        ref = np.asarray(post.remove_small_segments(jnp.asarray(D), p, 0))
        mine = np.asarray(ccl_pl.remove_small_segments(jnp.asarray(D), p))
    assert np.array_equal(ref, mine)


@pytest.mark.parametrize("sub", [False, True])
def test_lr_kernel_matches_xla(sub):
    from stereovision_tpu.ops import postprocess as post
    from stereovision_tpu.ops.pallas import lr_pl
    from stereovision_tpu.params import robotics_params

    p = robotics_params(disp_max=63, subsampling=sub)
    rng = np.random.default_rng(13)
    h, w = 40, 200
    def field():
        D = rng.integers(0, 64, (h, w)).astype(np.float32)
        D = np.where(rng.random((h, w)) < 0.2, -1.0, D)
        D = np.where(rng.random((h, w)) < 0.1, -10.0, D)
        return D
    D1, D2 = jnp.asarray(field()), jnp.asarray(field())
    r1, r2 = post.lr_consistency_check(D1, D2, p)
    m1, m2 = lr_pl.lr_consistency_check(D1, D2, p)
    assert np.array_equal(np.asarray(r1), np.asarray(m1))
    assert np.array_equal(np.asarray(r2), np.asarray(m2))

    B = 3
    st = lambda x: jnp.asarray(np.stack([np.asarray(x)] * B))
    b1, b2 = jax.vmap(lambda a, b: lr_pl.lr_consistency_check(a, b, p))(
        st(D1), st(D2))
    for i in range(B):
        assert np.array_equal(np.asarray(b1)[i], np.asarray(r1))
        assert np.array_equal(np.asarray(b2)[i], np.asarray(r2))


def _pair_setup(h, w, disp_max, seed=3):
    p = robotics_params(disp_max=disp_max, postprocess_only_left=False)
    rng = np.random.default_rng(seed)
    L = rng.integers(0, 255, (h, w), dtype=np.uint8)
    R = np.empty_like(L)
    for v in range(h):
        R[v] = np.roll(L[v], -(4 + v // 16))
    eng = ElasEngine(p, width=w, height=h)
    desc1, desc2, d_can = eng._stage_support(jnp.asarray(L), jnp.asarray(R))
    g = eng.host_mid(np.asarray(d_can))
    gm_l = build_grid_mask(jnp.asarray(g["pts"]), p, w, h, False)
    gm_r = build_grid_mask(jnp.asarray(g["pts"]), p, w, h, True)
    tri_l = expand_tri_spans(jnp.asarray(g["tri_l"]), eng.Wo)
    tri_r = expand_tri_spans(jnp.asarray(g["tri_r"]), eng.Wo)
    return (p, desc1, desc2, tri_l, tri_r, plane_table(g, "l"),
            plane_table(g, "r"), gm_l, gm_r)


def test_matching_pair_wrapper_matches_xla():
    """compute_disparity_pair (the two-pass production path; the r3
    shared-SAD kernel was deleted in r4 after losing its drift-controlled
    A/B — see the wrapper docstring) stays bit-identical to the two
    independent XLA passes."""
    (p, desc1, desc2, tri_l, tri_r, pl_l, pl_r,
     gm_l, gm_r) = _pair_setup(64, 256, disp_max=63)
    Dx1 = np.asarray(matching.compute_disparity(
        desc1, desc2, tri_l, pl_l, gm_l, p, False))
    Dx2 = np.asarray(matching.compute_disparity(
        desc2, desc1, tri_r, pl_r, gm_r, p, True))
    P1, P2 = matching_pl.compute_disparity_pair(
        desc1, desc2, tri_l, tri_r, pl_l, pl_r, gm_l, gm_r, p)
    assert np.array_equal(Dx1, np.asarray(P1))
    assert np.array_equal(Dx2, np.asarray(P2))


def test_matching_pair_wrapper_batched_rule():
    (p, desc1, desc2, tri_l, tri_r, pl_l, pl_r,
     gm_l, gm_r) = _pair_setup(32, 128, disp_max=31, seed=4)
    S1, S2 = matching_pl.compute_disparity_pair(
        desc1, desc2, tri_l, tri_r, pl_l, pl_r, gm_l, gm_r, p)
    B = 3
    st = lambda x: jnp.asarray(np.stack([np.asarray(x)] * B))
    B1, B2 = jax.vmap(
        lambda a, b, tl, tr, ql, qr, ml, mr:
            matching_pl.compute_disparity_pair(a, b, tl, tr, ql, qr,
                                               ml, mr, p)
    )(st(desc1), st(desc2), st(tri_l), st(tri_r), st(pl_l), st(pl_r),
      st(gm_l), st(gm_r))
    for i in range(B):
        assert np.array_equal(np.asarray(B1)[i], np.asarray(S1))
        assert np.array_equal(np.asarray(B2)[i], np.asarray(S2))
