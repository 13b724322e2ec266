"""stereovision_tpu — a TPU-native stereo depth perception framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference project "Low-Cost Hardware-Accelerated Vision-Based Depth
Perception for Real-Time Applications" (LIBELAS-based stereo disparity +
point-cloud + object fusion), built for TPU hardware: dense masked
formulations on (8,128) tiles, one implementation instead of three source
trees, and multi-chip scaling through jax.sharding meshes instead of
per-frame cudaMemcpy round-trips.

Public surface:
  ElasParams / robotics_params / middlebury_params / app_params
  ElasEngine            — the core disparity pipeline (models/elas.py)
  StereoEngine          — frames -> disparity + point cloud (engine.py)
  StereoVision          — drop-in analogue of the reference's Python class
                          stereo_vision.sv.stereo_vision (sv.py:156-192)
"""

from .params import (ElasParams, robotics_params, middlebury_params,
                     app_params)
from .models.elas import ElasEngine

__version__ = "0.1.0"

__all__ = [
    "ElasParams", "robotics_params", "middlebury_params", "app_params",
    "ElasEngine", "StereoEngine", "StereoVision",
]


def __getattr__(name):
    # Lazy imports to keep `import stereovision_tpu` light.
    if name == "StereoEngine":
        from .engine import StereoEngine
        return StereoEngine
    if name == "StereoVision":
        from .engine import StereoVision
        return StereoVision
    raise AttributeError(name)
