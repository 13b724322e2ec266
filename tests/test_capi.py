"""Embeddable C ABI (csrc/svtpu_capi.cpp + capi.py).

The library must be consumable exactly like the reference's .so
(src/serial_includes/main/stereo_vision.cpp:565-623):

  1. via ctypes from Python, the way the reference pip wrapper loads it
     (stereo_vision/sv.py:164-192) — same argtypes, same
     (width*height, 3) float64 restype;
  2. via dlopen from a plain C program with no Python involved in the
     host application (the embedded-interpreter path).
"""

import ctypes
import os
import site
import subprocess
import sys
import textwrap

import numpy as np
import pytest
from numpy.ctypeslib import ndpointer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(ROOT, "stereovision_tpu", "hostlib", "libsvtpu_capi.so")

W, H, D = 160, 120, 7


def _build_lib():
    r = subprocess.run(["make", "capi"], cwd=ROOT,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert os.path.exists(LIB)


def _scene_bgra(seed=0):
    rng = np.random.default_rng(seed)
    L = rng.integers(0, 255, (H, W), dtype=np.uint8)
    R = np.roll(L, -D, axis=1)

    def bgra(g):
        return np.ascontiguousarray(
            np.stack([g, g, g, np.full_like(g, 255)], axis=-1))

    return bgra(L), bgra(R)


def test_ctypes_surface_matches_python_engine():
    """Load the shim into this (already running) interpreter via ctypes —
    the PyGILState join path — and check the cloud is bit-identical to
    the pure-Python StereoVision wrapper under the same configuration."""
    _build_lib()
    lib = ctypes.CDLL(LIB, mode=ctypes.RTLD_GLOBAL)
    lib.generatePointCloud.restype = ndpointer(
        dtype=ctypes.c_double, shape=(W * H, 3))
    lib.generatePointCloud.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int,
        ctypes.c_bool, ctypes.c_bool, ctypes.c_bool, ctypes.c_bool,
        ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_bool, ctypes.c_bool]

    Lb, Rb = _scene_bgra()
    args = (Lb.tobytes(), Rb.tobytes(), b"", W, H,
            True, False, False, False, 1, 1, b"", b"", b"", False, False)
    pts = lib.generatePointCloud(*args)
    assert pts.shape == (W * H, 3)
    assert np.isfinite(pts).any()

    # getColor (reference stereo_vision.cpp:626-628): per-point BGRA of
    # the last left frame
    lib.getColor.restype = ndpointer(dtype=np.uint8, shape=(H, W, 4))
    assert np.array_equal(np.asarray(lib.getColor()), Lb)

    from stereovision_tpu.engine import StereoVision
    sv = StereoVision(width=W, height=H, objectTracking=False)
    ref = sv.generatePointCloud(Lb, Rb)
    assert np.array_equal(pts, ref)

    # second call reuses the engine (reference static-init semantics) and
    # must reproduce the same cloud for the same frames
    pts2 = lib.generatePointCloud(*args)
    assert np.array_equal(np.asarray(pts2), ref)

    lib.clean()
    # clean() then re-init from scratch, like the reference after its
    # graphics-thread exit path (stereo_vision.cpp:613-614)
    pts3 = lib.generatePointCloud(*args)
    assert np.array_equal(np.asarray(pts3), ref)
    lib.clean()


C_DRIVER = textwrap.dedent(r"""
    #include <dlfcn.h>
    #include <math.h>
    #include <stdio.h>
    #include <stdlib.h>

    typedef double *(*gen_fn)(unsigned char *, unsigned char *, char *,
                              int, int, int, int, int, int, int, int,
                              const char *, const char *, const char *,
                              int, int);

    int main(int argc, char **argv) {
        int W = 160, H = 120, D = 7;
        void *h = dlopen(argv[1], RTLD_NOW | RTLD_GLOBAL);
        if (!h) { fprintf(stderr, "dlopen: %s\n", dlerror()); return 2; }
        gen_fn gen = (gen_fn)dlsym(h, "generatePointCloud");
        void (*cln)(void) = (void (*)(void))dlsym(h, "clean");
        if (!gen || !cln) { fprintf(stderr, "dlsym failed\n"); return 2; }

        unsigned char *L = malloc(W * H * 4), *R = malloc(W * H * 4);
        unsigned int s = 12345;
        for (int v = 0; v < H; v++)
            for (int u = 0; u < W; u++) {
                s = s * 1664525u + 1013904223u;        /* LCG */
                unsigned char g = (unsigned char)(s >> 24);
                for (int c = 0; c < 3; c++) L[(v * W + u) * 4 + c] = g;
                L[(v * W + u) * 4 + 3] = 255;
            }
        for (int v = 0; v < H; v++)
            for (int u = 0; u < W; u++)
                for (int c = 0; c < 4; c++)
                    R[(v * W + u) * 4 + c] =
                        L[(v * W + ((u + D) % W)) * 4 + c];

        double *pts = gen(L, R, (char *)"", W, H, 1, 0, 0, 0, 1, 1,
                          "", "", "", 0, 0);
        if (!pts) { fprintf(stderr, "null cloud\n"); return 3; }
        int finite = 0;
        double sum1 = 0.0;
        for (int i = 0; i < W * H * 3; i++)
            if (isfinite(pts[i])) { finite++; sum1 += pts[i]; }

        double *pts2 = gen(L, R, (char *)"", W, H, 1, 0, 0, 0, 1, 1,
                           "", "", "", 0, 0);   /* engine reuse path */
        if (!pts2) { fprintf(stderr, "null cloud 2\n"); return 3; }
        /* reference-static buffer semantics: same pointer every call,
           refreshed in place (stereo_vision.cpp:565) */
        int same_ptr = (pts2 == pts);
        double sum2 = 0.0;
        for (int i = 0; i < W * H * 3; i++)
            if (isfinite(pts2[i])) sum2 += pts2[i];
        int equal = (sum1 == sum2);   /* deterministic engine, same frames */
        cln();
        printf("CAPI OK finite=%d equal=%d same_ptr=%d\n",
               finite, equal, same_ptr);
        return (finite > 0 && equal && same_ptr) ? 0 : 4;
    }
""")


@pytest.mark.slow
def test_plain_c_program(tmp_path):
    """Full embedding path: a C program with no Python of its own dlopens
    the library, which boots CPython, imports the engine, and runs two
    frames (second exercising the cached-engine path)."""
    _build_lib()
    src = tmp_path / "main.c"
    src.write_text(C_DRIVER)
    exe = tmp_path / "capi_main"
    r = subprocess.run(["gcc", str(src), "-o", str(exe), "-ldl"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr

    env = dict(os.environ)
    # the embedded interpreter uses the base /usr/local python; point it
    # at this venv's site-packages and the repo root
    paths = [ROOT] + site.getsitepackages()
    env["PYTHONPATH"] = ":".join(paths)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORM_NAME"] = "cpu"   # axon quirk: JAX_PLATFORMS ignored
    r = subprocess.run([str(exe), LIB], capture_output=True, text=True,
                       timeout=900, env=env)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "CAPI OK" in r.stdout and "equal=1" in r.stdout


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-v"]))
