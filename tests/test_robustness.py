"""Degenerate-input robustness: the pipeline must stay total (no crashes,
well-defined invalid outputs) where the reference bails with stderr prints
(e.g. <3 support points, serial elas.cpp:64-69)."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereovision_tpu.params import robotics_params
from stereovision_tpu.models.elas import ElasEngine

import oracle
from stereovision_tpu.ops.descriptor import (compute_descriptor,
                                             compute_descriptor_np)
from stereovision_tpu.ops import support as S


def test_flat_images_no_support_points():
    # textureless scene -> no support points -> no triangles -> all invalid
    p = robotics_params(disp_max=31, postprocess_only_left=False)
    eng = ElasEngine(p, width=96, height=64)
    L = np.full((64, 96), 100, np.uint8)
    D1, D2 = eng.process(L, L)
    D1 = np.asarray(D1)
    assert np.all(D1 < 0)


def test_mismatched_pair_mostly_invalid():
    p = robotics_params(disp_max=31, postprocess_only_left=False)
    eng = ElasEngine(p, width=96, height=64)
    rng = np.random.default_rng(0)
    L = rng.integers(0, 255, (64, 96), dtype=np.uint8)
    R = rng.integers(0, 255, (64, 96), dtype=np.uint8)  # unrelated
    D1, _ = eng.process(L, R)
    D1 = np.asarray(D1)
    # uncorrelated pair: L/R consistency keeps very little
    assert (D1 >= 0).mean() < 0.3


def test_tiny_image():
    p = robotics_params(disp_max=15)
    eng = ElasEngine(p, width=32, height=24)
    rng = np.random.default_rng(1)
    L = rng.integers(0, 255, (24, 32), dtype=np.uint8)
    D1, _ = eng.process(L, np.roll(L, -3, axis=1))
    assert np.asarray(D1).shape == (24, 32)


def test_support_matching_subsampled_step_matches_oracle():
    # subsampling forces the candidate step to 6 (reference elas.cpp:376-378)
    p = robotics_params(disp_max=31, subsampling=True)
    assert p.step == 6
    h, w = 72, 96
    rng = np.random.default_rng(2)
    L = rng.integers(0, 255, (h, w), dtype=np.uint8)
    R = np.roll(L, -7, axis=1)
    dL = compute_descriptor(jnp.asarray(L))
    dR = compute_descriptor(jnp.asarray(R))
    mine = np.asarray(S.support_matches(dL, dR, p, apply_filters=False))
    ref = oracle.support_grid(compute_descriptor_np(L),
                              compute_descriptor_np(R), p, w, h)
    assert np.array_equal(mine, ref)
