"""Round-trip exactness of the triangle-map span codec (ops.spans)."""

import numpy as np
import jax
import jax.numpy as jnp

from stereovision_tpu.ops.spans import encode_tri_spans, expand_tri_spans


def _roundtrip(tri, s_max):
    spans = encode_tri_spans(tri, s_max)
    dense = np.asarray(expand_tri_spans(jnp.asarray(spans), tri.shape[1]))
    return spans, dense


def test_roundtrip_random_runs():
    rng = np.random.default_rng(0)
    H, W = 37, 300
    tri = np.empty((H, W), np.int16)
    for r in range(H):
        pos = 0
        while pos < W:
            ln = int(rng.integers(1, 40))
            tri[r, pos:pos + ln] = rng.integers(-1, 500)
            pos += ln
    spans, dense = _roundtrip(tri, s_max=W)
    assert np.array_equal(dense, tri)
    assert spans.dtype == np.uint8 and spans.shape[-1] == 3


def test_roundtrip_degenerate_rows():
    # constant rows (one run), alternating every pixel (W runs)
    H, W = 8, 64
    tri = np.zeros((H, W), np.int16)
    tri[1] = -1
    tri[2] = np.arange(W) % 2
    tri[3] = np.arange(W)          # W distinct runs
    _, dense = _roundtrip(tri, s_max=W)
    assert np.array_equal(dense, tri)


def test_overflow_warns_and_keeps_prefix():
    H, W = 2, 32
    tri = np.arange(W, dtype=np.int16)[None].repeat(H, 0)  # 32 runs/row
    import warnings
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        spans = encode_tri_spans(tri, s_max=8)
    assert any("overflow" in str(w.message) for w in rec)
    dense = np.asarray(expand_tri_spans(jnp.asarray(spans), W))
    # first 8 runs exact, last kept id persists
    assert np.array_equal(dense[:, :8], tri[:, :8])
    assert (dense[:, 8:] == 7).all()


def test_expand_under_vmap():
    rng = np.random.default_rng(1)
    H, W, B = 16, 96, 3
    tris = []
    for _ in range(B):
        t = np.repeat(rng.integers(-1, 99, (H, 12)), 8, axis=1)[:, :W]
        tris.append(t.astype(np.int16))
    spans = np.stack([encode_tri_spans(t, 24) for t in tris])
    out = jax.vmap(lambda s: expand_tri_spans(s, W))(jnp.asarray(spans))
    assert np.array_equal(np.asarray(out), np.stack(tris))


def test_large_gaps_split_into_fillers():
    """Gaps over 255 columns must round-trip exactly via repeat-fillers."""
    H, W = 3, 1242
    tri = np.full((H, W), 7, np.int16)
    tri[0, 0:2] = 3          # run at col 0, then a 2->1240 run of 7s
    tri[1, 900:] = -1        # 900-col first run
    tri[2, :] = -1           # empty row
    spans = encode_tri_spans(tri, s_max=32)
    dense = np.asarray(expand_tri_spans(jnp.asarray(spans), W))
    assert np.array_equal(dense, tri)
    # all gaps fit uint8 by construction
    assert spans[..., 0].max() <= 255


def test_packed_geometry_roundtrip():
    """ElasEngine.pack_geometry/unpack_geometry: one uint8 H2D buffer must
    reproduce the five geometry arrays bit-exactly (incl. negative int16
    padding through the device bitcast)."""
    from stereovision_tpu.params import robotics_params
    from stereovision_tpu.models.elas import ElasEngine
    p = robotics_params(disp_max=31)
    eng = ElasEngine(p, width=96, height=64)
    rng = np.random.default_rng(5)
    L = rng.integers(0, 255, (64, 96), dtype=np.uint8)
    R = np.roll(L, -4, axis=1)
    _, _, d_can = eng._stage_support(jnp.asarray(L), jnp.asarray(R))
    g = eng.host_mid(np.asarray(d_can))
    buf = eng.pack_geometry(g)
    out = eng.unpack_geometry(jnp.asarray(buf))
    for name, arr in zip(("pts", "tris_l", "tris_r", "tri_l", "tri_r"),
                         out):
        assert np.array_equal(np.asarray(arr), g[name]), name
