"""Alias package: the full project name re-exporting `stereovision_tpu`.

The framework's importable name is `stereovision_tpu`; this module maps the
long project-title name onto it (including submodules) for discoverability.
"""

import importlib
import sys

import stereovision_tpu as _sv
from stereovision_tpu import *  # noqa: F401,F403
from stereovision_tpu import __version__  # noqa: F401

_SUBMODULES = [
    "params", "engine", "cli", "viz",
    "ops", "ops.filters", "ops.descriptor", "ops.support", "ops.grid",
    "ops.planes", "ops.matching", "ops.postprocess", "ops.reproject",
    "ops.pallas", "ops.pallas.matching_pl", "ops.pallas.support_pl",
    "models", "models.elas", "models.yolo", "models.bayesian",
    "parallel", "parallel.mesh", "parallel.shard",
    "io", "io.pgm", "io.calibration", "io.kitti",
    "hostlib", "hostlib.raster", "bench",
]
for _m in _SUBMODULES:
    try:
        sys.modules[__name__ + "." + _m] = importlib.import_module(
            "stereovision_tpu." + _m)
    except Exception:
        pass
