"""Test configuration: force an 8-device CPU platform so sharding/collective
tests run without TPU hardware, as planned in SURVEY.md §4/§5.7."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def profile_pair():
    """The smallest bundled golden stereo pair (cones) + its committed golden
    disparity outputs (datasets/profile, producer: runProfiling,
    reference stereo_vision.cpp:690-755)."""
    import os.path as osp
    from stereovision_tpu.io.pgm import load_pgm

    base = osp.join(REFERENCE_ROOT, "datasets", "profile")
    if not osp.isdir(base):
        pytest.skip("reference datasets not available")
    return {
        "left": load_pgm(osp.join(base, "cones_left.pgm")),
        "right": load_pgm(osp.join(base, "cones_right.pgm")),
        "gold_left": load_pgm(osp.join(base, "cones_left_disp.pgm")),
        "gold_right": load_pgm(osp.join(base, "cones_right_disp.pgm")),
    }


def rng(seed=0):
    return np.random.default_rng(seed)
