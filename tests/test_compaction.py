"""Path compaction in the sorted staged pipeline
(runtime/pipeline.py:_stages_sorted with a schedule).

The reference's per-pixel megakernel loop simply exits on dead paths
(kernels/src/lib.rs:62-186) — free on SIMT, but a dead TPU lane rides
every later stage at full price. Compaction drops retired lanes after
each bounce using a measured static schedule; these tests pin that the
compacted film equals the uncompacted one (the schedule is a pure
optimization) and that an under-predicted schedule is detected and
re-rendered rather than biasing the image.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import scene_path
from rustic_tpu.runtime import pipeline as P
from rustic_tpu.scene.world import World


def _render(world, n_px, spp, monkeypatch, seed=11):
    """Returns (reference, multi): per-sample renders with compaction
    forced off, summed, vs one multi-sample render with whatever
    schedule the (possibly monkeypatched) quantizer produces."""
    from rustic_tpu.config import NextEventEstimation, TracingConfig

    scene = world.to_device()
    config = TracingConfig(width=64, height=64, nee=NextEventEstimation.MIS)
    cfg = config.static_part()
    cam = config.dynamic_part()
    rng = np.random.default_rng(seed)
    px = jnp.asarray(rng.integers(0, 64, n_px), jnp.int32)
    py = jnp.asarray(rng.integers(0, 64, n_px), jnp.int32)
    offsets = jnp.asarray(rng.integers(0, 1 << 31, n_px), jnp.uint32)

    with monkeypatch.context() as m:
        m.setattr(P, "_pilot_schedule", lambda *a, **k: None)
        films = [
            np.asarray(
                P.render_batch_staged(scene, cfg, cam, px, py, offsets, s, 1)
            )
            for s in range(spp)
        ]
    multi = np.asarray(
        P.render_batch_staged(scene, cfg, cam, px, py, offsets, 0, spp)
    )
    return np.sum(films, axis=0), multi


def test_quantize_schedule():
    # power-of-two grid, 10% + one-block margin, monotone, bt multiples
    ks = P._quantize_schedule([6000, 900, 10], 16384, 256)
    assert ks is not None and len(ks) == 3
    assert all(k % 256 == 0 for k in ks)
    assert list(ks) == sorted(ks, reverse=True)
    assert ks[0] >= 6000 * 1.1 and ks[2] >= 10 + 256
    # near-full survival -> not worth compacting
    assert P._quantize_schedule([15000, 14000, 13000], 16384, 256) is None


@pytest.mark.slow  # multi-group equality render
def test_compacted_film_matches_uncompacted(monkeypatch):
    """FurnaceTest retires ~94% of lanes at bounce 0 (camera rays end on
    the emissive shell), so the pilot-measured schedule compacts hard;
    the compacted multi-group render must equal the sum of per-sample
    renders with compaction forced off."""
    monkeypatch.setenv("RUSTIC_SAMPLE_FOLD", "1")
    # compaction schedules live on the state-sorted driver (the
    # ray-sorted default keeps state stationary and never compacts)
    monkeypatch.setenv("RUSTIC_SORT_MODE", "state")
    seen = {}
    orig = P._quantize_schedule

    def spy(counts, lanes, bt, **kw):
        out = orig(counts, lanes, bt, **kw)
        seen["schedule"] = out
        seen["lanes"] = lanes
        return out

    monkeypatch.setattr(P, "_quantize_schedule", spy)
    world = World.from_path(scene_path("FurnaceTest.glb"))
    ref, multi = _render(world, n_px=1024, spp=3, monkeypatch=monkeypatch)
    assert seen["schedule"] is not None, "compaction did not engage"
    assert min(seen["schedule"]) < seen["lanes"]
    np.testing.assert_allclose(multi, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # multi-group equality render
def test_overflow_redo_is_unbiased(monkeypatch):
    """Force a schedule that drops live lanes (VeachMIS keeps ~82% at
    bounce 0, the forced schedule keeps 256 of 512): the overflow flag
    must trip and the driver must re-render the window uncompacted,
    landing on the exact uncompacted film."""
    monkeypatch.setenv("RUSTIC_SAMPLE_FOLD", "1")
    monkeypatch.setenv("RUSTIC_SORT_MODE", "state")
    tripped = {}

    def bogus(counts, lanes, bt, **kw):
        tripped["lanes"] = lanes
        return (256,) * len(counts)

    monkeypatch.setattr(P, "_quantize_schedule", bogus)
    world = World.from_path(scene_path("VeachMIS.glb"))
    ref, multi = _render(world, n_px=512, spp=3, monkeypatch=monkeypatch)
    assert tripped["lanes"] == 512
    np.testing.assert_allclose(multi, ref, rtol=1e-5, atol=1e-6)
