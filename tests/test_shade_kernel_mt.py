"""Multi-tile kernel-shade driver (_render_batch_ks_multitile) equality
against the ray-sorted XLA driver: resolve + Mosaic shade + sort must be
a pure reimplementation of the shading stage, never a math change.

FurnaceTest: multi-tile, NEE-heavy, most lanes retire after bounce 1 —
exercises sentinels, the merged nearest+shadow unsort, the held-group
finish, and the deferred-sky payoff. BreakTime (rendered without its
HDR skybox, i.e. procedural sky): the textured resolve path — atlas
albedo/rough/metal + normal mapping feeding the kernel synthetic slim
rows. GlassTest: the per-lane glass BSDF branch."""

import numpy as np
import jax.numpy as jnp
import pytest

from rustic_tpu.runtime import pipeline as P

from conftest import scene_path


def _render(scene, spp, monkeypatch, ks: bool, n_px=1024, seed=9,
            nee="mis", has_skybox=False):
    from rustic_tpu.config import NextEventEstimation, TracingConfig

    config = TracingConfig(
        width=64, height=64, has_skybox=has_skybox,
        nee=NextEventEstimation.MIS if nee == "mis"
        else NextEventEstimation.NONE,
    )
    rng = np.random.default_rng(seed)
    px = jnp.asarray(rng.integers(0, 64, n_px), jnp.int32)
    py = jnp.asarray(rng.integers(0, 64, n_px), jnp.int32)
    offsets = jnp.asarray(rng.integers(0, 1 << 31, n_px), jnp.uint32)
    with monkeypatch.context() as m:
        m.setenv("RUSTIC_SHADE_KERNEL_MT", "1" if ks else "0")
        return np.asarray(
            P.render_batch_staged(
                scene, config.static_part(), config.dynamic_part(),
                px, py, offsets, 0, spp,
            )
        )


def _assert_ks_dispatched(monkeypatch):
    """Make the ks render FAIL LOUDLY if the dispatch gate silently
    falls back to the XLA driver (the equality would then be vacuous)."""
    calls = []
    real = P._render_batch_ks_multitile

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(P, "_render_batch_ks_multitile", spy)
    return calls


def _assert_drivers_match(world, spp, monkeypatch, skybox=None, **kw):
    scene = world.to_device(skybox)
    calls = _assert_ks_dispatched(monkeypatch)
    a = _render(scene, spp, monkeypatch, ks=True,
                has_skybox=skybox is not None, **kw)
    assert calls, "kernel-shade driver was not dispatched"
    b = _render(scene, spp, monkeypatch, ks=False,
                has_skybox=skybox is not None, **kw)
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)
    return a


def test_ks_mt_smoke_furnace(furnace_world, monkeypatch):
    """Fast gate: one 2-spp group through the full 4-program chain
    (FurnaceTest's 5120-entry alias table exercises prepicked NEE)."""
    scene = furnace_world.to_device()
    calls = _assert_ks_dispatched(monkeypatch)
    a = _render(scene, 2, monkeypatch, ks=True)
    assert calls, "kernel-shade driver was not dispatched"
    b = _render(scene, 2, monkeypatch, ks=False)
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_ks_mt_matches_raysorted_furnace(furnace_world, monkeypatch):
    _assert_drivers_match(furnace_world, 3, monkeypatch)


@pytest.mark.slow
def test_ks_mt_matches_raysorted_textured(monkeypatch):
    from rustic_tpu.scene.world import World

    world = World.from_path(scene_path("BreakTime.glb"))
    _assert_drivers_match(world, 2, monkeypatch)


@pytest.mark.slow
def test_ks_mt_matches_raysorted_glass(monkeypatch):
    from rustic_tpu.scene.world import World

    world = World.from_path(scene_path("GlassTest.glb"))
    _assert_drivers_match(world, 2, monkeypatch)


def test_ks_mt_hdr_skybox_payoff(monkeypatch):
    """Round-4 gate lift: has_skybox no longer excludes the MT shade
    driver — the kernel skips its in-kernel (procedural-only) payoff
    and pipeline._hdr_sky_payoff collects throughput * image_sky on the
    missed lanes in XLA. VeachMIS is open, so misses carry real energy:
    the equality would be vacuous if the sky never arrived."""
    from rustic_tpu.scene.world import World

    sky = np.zeros((16, 32, 4), np.float32)
    sky[6:10, :, 0] = 4.0  # bright red band: misses must light up red
    sky[:, :, 1] = 0.25
    sky[:, :, 3] = 1.0
    world = World.from_path(scene_path("VeachMIS.glb"))
    film = _assert_drivers_match(world, 2, monkeypatch, skybox=sky)
    assert film[:, 0].max() > 0.01, "no sky energy reached the film"


def test_ks_singletile_hdr_skybox_payoff(cornell_world, monkeypatch):
    """SINGLE-tile twin of test_ks_mt_hdr_skybox_payoff (the round-4
    advisor flagged that shade_kernel.supported() dropped the
    has_skybox gate, making the single-tile kernel-shade driver newly
    reachable for HDR-skybox scenes with only the MT path tested):
    the kernel skips its in-kernel procedural-sky payoff and the XLA
    _hdr_sky_payoff collects throughput * image_sky on missed lanes.
    DarkCornell's open front lets bounced paths escape, so misses
    carry real energy and the equality is non-vacuous."""
    from rustic_tpu.config import NextEventEstimation, TracingConfig
    from rustic_tpu.ops import shade_kernel as SK
    from rustic_tpu.runtime.render import pixel_offsets

    sky = np.zeros((16, 32, 4), np.float32)
    sky[6:10, :, 0] = 4.0  # bright red band: misses must light up red
    sky[:, :, 1] = 0.25
    sky[:, :, 3] = 1.0
    scene = cornell_world.to_device(sky)
    config = TracingConfig(
        width=32, height=16, nee=NextEventEstimation.MIS, has_skybox=True
    )
    assert SK.supported(scene, config.static_part(), False, 32 * 16)
    calls = []
    real = P._render_batch_kernelshade

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(P, "_render_batch_kernelshade", spy)
    cfg, cam = config.static_part(), config.dynamic_part()
    y, x = np.mgrid[0:16, 0:32]
    px = jnp.asarray(x.reshape(-1), jnp.int32)
    py = jnp.asarray(y.reshape(-1), jnp.int32)
    off = jnp.asarray(pixel_offsets(32, 16))
    films = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("RUSTIC_SHADE_KERNEL", flag)
        films[flag] = np.asarray(
            P.render_batch_staged(scene, cfg, cam, px, py, off, 0, 3)
        )
    assert calls, "single-tile kernel-shade driver was not dispatched"
    np.testing.assert_allclose(films["1"], films["0"], rtol=2e-3, atol=2e-4)
    assert films["1"][:, 0].max() > 0.01, "no sky energy reached the film"


@pytest.mark.slow
def test_ks_mt_matches_raysorted_breaktime_hdr(monkeypatch):
    """BASELINE config #5's exact shape: BreakTime WITH its committed
    HDR sky (textures + normal maps + wide alias table + image sky
    through the 4-program MT chain)."""
    from rustic_tpu.scene.world import World, load_skybox_image

    sky = load_skybox_image(scene_path("BreakTimeSky.npy"))
    world = World.from_path(scene_path("BreakTime.glb"))
    _assert_drivers_match(world, 2, monkeypatch, skybox=sky)
