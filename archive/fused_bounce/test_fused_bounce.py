"""The fused mega-bounce Pallas kernel must reproduce the reference
integrator exactly (interpret mode; on TPU only transcendental rounding
differs). It is an experimental engine — the staged pipeline is the
default — but its math is pinned to ops/trace.py here."""

import numpy as np
import jax.numpy as jnp
import pytest

from rustic_tpu.config import NextEventEstimation, TracingConfig
from rustic_tpu.ops.trace import accumulate_samples
from rustic_tpu.runtime.pipeline import fused_applicable, render_batch_fused
from rustic_tpu.runtime.render import pixel_offsets


def _compare(scene, nee, wh=(12, 8), samples=2):
    w, h = wh
    config = TracingConfig(width=w, height=h, nee=nee)
    cfg = config.static_part()
    cam = config.dynamic_part()
    y, x = np.mgrid[0:h, 0:w]
    px = jnp.asarray(x.reshape(-1), jnp.int32)
    py = jnp.asarray(y.reshape(-1), jnp.int32)
    off = jnp.asarray(pixel_offsets(w, h))
    ref = accumulate_samples(
        scene, cfg, cam, px, py, off, jnp.uint32(0), samples, engine="brute"
    )
    fused = render_batch_fused(scene, cfg, cam, px, py, off, 0, samples)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(fused), rtol=1e-4, atol=1e-5
    )


def test_applicability(cornell_scene):
    assert fused_applicable(cornell_scene, TracingConfig().static_part())
    assert not fused_applicable(
        cornell_scene, TracingConfig(has_skybox=True).static_part()
    )


@pytest.mark.parametrize(
    "nee",
    [NextEventEstimation.NONE, NextEventEstimation.MIS, NextEventEstimation.DIRECT],
)
def test_fused_matches_reference_integrator(cornell_scene, nee):
    _compare(cornell_scene, nee)


def test_fused_multi_tile(furnace_scene):
    # 10k-triangle scene exercises the running-min combine across tiles
    _compare(furnace_scene, NextEventEstimation.MIS, wh=(6, 4), samples=1)
