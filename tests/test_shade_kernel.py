"""Equality gates for the Mosaic shade kernel (ops/shade_kernel.py):
the kernelized staged driver must match the XLA staged driver (and so
the brute single-program integrator, which the XLA driver is already
pinned against) on every supported configuration."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from rustic_tpu.config import NextEventEstimation, TracingConfig
from rustic_tpu.runtime.render import pixel_offsets

pytestmark = pytest.mark.slow  # render pairs (~tens of seconds on CPU)

W_, H_ = 32, 16  # 512 lanes: the smallest kernel-shade-eligible batch


def _render_both(scene, config, spp, monkeypatch):
    from rustic_tpu.runtime.pipeline import render_batch_staged

    cfg = config.static_part()
    cam = config.dynamic_part()
    w, h = config.width, config.height
    y, x = np.mgrid[0:h, 0:w]
    px = jnp.asarray(x.reshape(-1), jnp.int32)
    py = jnp.asarray(y.reshape(-1), jnp.int32)
    off = jnp.asarray(pixel_offsets(w, h))
    films = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("RUSTIC_SHADE_KERNEL", flag)
        films[flag] = np.asarray(
            render_batch_staged(scene, cfg, cam, px, py, off, 0, spp)
        )
    return films["0"], films["1"]


def _assert_kernel_engaged(scene, config):
    from rustic_tpu.ops import shade_kernel as SK

    assert SK.supported(
        scene, config.static_part(), False, W_ * H_
    ), "scene unexpectedly ineligible for the shade kernel"


@pytest.mark.parametrize(
    "nee", [NextEventEstimation.MIS, NextEventEstimation.NONE,
            NextEventEstimation.DIRECT]
)
def test_kernelshade_matches_staged_cornell(cornell_scene, monkeypatch, nee):
    config = TracingConfig(width=W_, height=H_, nee=nee)
    _assert_kernel_engaged(cornell_scene, config)
    xla, kern = _render_both(cornell_scene, config, 3, monkeypatch)
    np.testing.assert_allclose(kern, xla, rtol=1e-4, atol=1e-5)


def test_kernelshade_glass_and_sky(tmp_path, monkeypatch):
    """Single-tile scene with a glass panel over an emissive floor patch
    and OPEN sides: exercises the kernel's glass lobe and the last-
    bounce procedural-sky march (missed lanes)."""
    from rustic_tpu.scene.glb_write import MaterialSpec, MeshSpec, write_glb
    from rustic_tpu.scene.world import World

    quad = np.array(
        [[-4, 0, -4], [4, 0, -4], [4, 0, 4], [-4, 0, 4]], np.float32
    )
    glass = quad * 0.3 + np.array([0, 1.0, 0], np.float32)
    lamp = quad * 0.15 + np.array([1.5, 2.0, 0], np.float32)
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
    path = str(tmp_path / "glass_sky.glb")
    write_glb(
        path,
        meshes=[
            MeshSpec(positions=quad, indices=tris, material=0),
            MeshSpec(positions=glass, indices=tris, material=1),
            MeshSpec(positions=lamp, indices=tris[:, ::-1], material=2),
        ],
        materials=[
            MaterialSpec(base_color=(0.6, 0.55, 0.5, 1.0), roughness=0.7),
            MaterialSpec(
                base_color=(1.0, 1.0, 1.0, 1.0), roughness=0.05,
                transmission=1.0, ior=1.5,
            ),
            MaterialSpec(
                base_color=(0.0, 0.0, 0.0, 1.0), emissive=(4.0, 3.5, 3.0)
            ),
        ],
    )
    scene = World.from_path(path).to_device()
    config = TracingConfig(
        width=W_, height=H_, nee=NextEventEstimation.MIS,
        cam_position=(0.0, 1.5, -6.0), cam_rotation=(0.15, 0.0),
    )
    _assert_kernel_engaged(scene, config)
    xla, kern = _render_both(scene, config, 3, monkeypatch)
    # sky + glass paths reassociate a few float ops (trig-free
    # microfacet sample; per-shape FMA contraction) — tolerance only
    np.testing.assert_allclose(kern, xla, rtol=2e-3, atol=2e-4)
    assert kern.mean() > 0.01  # the sky actually contributed


def test_kernelshade_margin_path(cornell_scene, monkeypatch):
    """The epsilon-expanded-window branch (mixed2's edge_margin) must
    agree between the shade kernel's in-kernel re-test and the XLA
    classify_flash_hit — forced on here since the CPU (f32) plan would
    otherwise never exercise it."""
    import rustic_tpu.runtime.pipeline as P

    monkeypatch.setattr(
        P, "near_edge_margin", lambda prec: 2e-4
    )
    config = TracingConfig(width=W_, height=H_, nee=NextEventEstimation.MIS)
    xla, kern = _render_both(cornell_scene, config, 3, monkeypatch)
    np.testing.assert_allclose(kern, xla, rtol=1e-4, atol=1e-5)
