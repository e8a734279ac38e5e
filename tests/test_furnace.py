"""The furnace energy-conservation matrix — the reference's own
correctness gate (reference: tests/correctness_tests.rs:14-52): a 0.18-
albedo sphere inside a uniform emitter must render to ~0.8 after gamma
decode at pixel (65, 75) of a 128x128 frame, with and without NEE/MIS.

We run the same gate on the JAX CPU backend (TPU runs the identical
program; bench.py exercises it on hardware). Rendering only a probe
tile keeps CI fast — the wavefront integrator renders arbitrary pixel
sets natively.
"""

import numpy as np
import pytest

from rustic_tpu.config import NextEventEstimation, TracingConfig
from rustic_tpu.runtime.render import render_pixels

SIZE = 128
COORD = (65, 75)
ALBEDO = 0.8
SAMPLES = 32


def _furnace_value(furnace_scene, nee: NextEventEstimation) -> np.ndarray:
    cfg = TracingConfig(width=SIZE, height=SIZE, nee=nee)
    px = np.array([COORD[0]], np.int32)
    py = np.array([COORD[1]], np.int32)
    film = np.asarray(render_pixels(furnace_scene, cfg, px, py, samples=SAMPLES))
    return (film[0] / SAMPLES) ** (1.0 / 2.2)


def test_furnace(furnace_scene):
    pixel = _furnace_value(furnace_scene, NextEventEstimation.NONE)
    assert np.all(np.abs(pixel - ALBEDO) < 0.02), pixel


def test_furnace_mis(furnace_scene):
    # MIS must conserve the same energy. Tolerance 0.03 instead of the
    # reference's 0.02: the per-pixel noise realization differs (our
    # pixel seeds are deterministic hashes, not host RNG draws) and the
    # MIS estimator's single-pixel variance at 32 spp straddles 0.02.
    # At 128 spp it converges to the NEE-off value (see test below).
    pixel = _furnace_value(furnace_scene, NextEventEstimation.MIS)
    assert np.all(np.abs(pixel - ALBEDO) < 0.03), pixel


@pytest.mark.slow
def test_furnace_mis_converged(furnace_scene):
    cfg = TracingConfig(width=SIZE, height=SIZE, nee=NextEventEstimation.MIS)
    px = np.array([COORD[0]], np.int32)
    py = np.array([COORD[1]], np.int32)
    film = np.asarray(render_pixels(furnace_scene, cfg, px, py, samples=128))
    pixel = (film[0] / 128) ** (1.0 / 2.2)
    assert np.all(np.abs(pixel - ALBEDO) < 0.02), pixel


def test_emitter_seen_directly(furnace_scene):
    """A pixel on the emitter shell reads its radiance (3.0) exactly."""
    cfg = TracingConfig(width=SIZE, height=SIZE)
    px = np.array([20], np.int32)
    py = np.array([20], np.int32)
    film = np.asarray(render_pixels(furnace_scene, cfg, px, py, samples=4))
    np.testing.assert_allclose(film[0] / 4, 3.0, atol=1e-4)
