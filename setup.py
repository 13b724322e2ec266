"""Package build for stereovision_tpu.

Unlike the reference (which compiles a C++ extension per variant,
setup.py:22-28 there), the TPU build is pure Python + JAX with one small
optional native host library (csrc/svtpu_host.cpp) that is compiled lazily
at first use or ahead of time via `make hostlib`.
"""

from setuptools import setup, find_packages

setup(
    name="stereovision_tpu",
    version="0.1.0",
    description=("TPU-native stereo depth perception: ELAS disparity, "
                 "point clouds, object fusion (JAX/XLA/Pallas)"),
    packages=find_packages(include=[
        "stereovision_tpu", "stereovision_tpu.*",
        "low_cost_hardware_accelerated_vision_based_depth_perception_for_real_time_applications_tpu",
    ]),
    package_data={"stereovision_tpu": ["data/*.yml", "data/*.txt",
                                       "data/calibration/*.yml",
                                       "data/yolo/*.txt", "data/yolo/*.cfg",
                                       "csrc/*.cpp"]},
    install_requires=["jax", "numpy", "scipy"],
    extras_require={"full": ["opencv-python", "requests"]},
    entry_points={"console_scripts":
                  ["stereovision-tpu=stereovision_tpu.cli:main"]},
    python_requires=">=3.10",
)
