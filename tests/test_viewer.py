"""Headless checks of the interactive viewer's control logic."""

import numpy as np

from rustic_tpu.config import NextEventEstimation, RenderSettings, TracingConfig
from rustic_tpu.runtime.viewer import Viewer


def _viewer(cornell_scene):
    cfg = TracingConfig(width=16, height=16, max_bounces=2)
    return Viewer(cornell_scene, cfg, RenderSettings(sync_rate=1))


def test_step_produces_frames(cornell_scene):
    v = _viewer(cornell_scene)
    frame = v.step()
    assert frame.shape == (16, 16, 3)
    assert np.isfinite(frame).all()
    assert v.state.samples == 1


def test_camera_keys_mark_dirty_and_move(cornell_scene):
    v = _viewer(cornell_scene)
    v.step()
    pos0 = v.state.config.cam_position
    v.handle_key("w")
    assert v.state.config.cam_position != pos0
    v.step()
    assert v.state.samples == 1  # accumulation restarted after the move


def test_look_keys_change_rotation(cornell_scene):
    v = _viewer(cornell_scene)
    rot0 = v.state.config.cam_rotation
    v.handle_key("left")
    assert v.state.config.cam_rotation != rot0


def test_mode_toggles(cornell_scene):
    v = _viewer(cornell_scene)
    assert v.state.config.nee == NextEventEstimation.NONE
    v.handle_key("n")
    assert v.state.config.nee == NextEventEstimation.MIS
    t0 = v.tonemap
    v.handle_key("t")
    assert v.tonemap != t0
    v.handle_key("x")
    assert v.settings.denoise


def test_escape_quits(cornell_scene):
    v = _viewer(cornell_scene)
    assert not v.handle_key("escape")


def test_speed_modifiers(cornell_scene):
    """shift = 10x, ctrl = 0.1x (reference: src/app.rs:439-492)."""
    v = _viewer(cornell_scene)
    z0 = v.state.config.cam_position[2]
    v.handle_key("w")
    plain = v.state.config.cam_position[2] - z0
    z1 = v.state.config.cam_position[2]
    v.handle_key("shift+w")
    fast = v.state.config.cam_position[2] - z1
    z2 = v.state.config.cam_position[2]
    v.handle_key("ctrl+w")
    slow = v.state.config.cam_position[2] - z2
    assert np.isclose(fast, 10 * plain) and np.isclose(slow, 0.1 * plain)
    # matplotlib delivers shift+letter as the bare uppercase letter
    z3 = v.state.config.cam_position[2]
    v.handle_key("W")
    assert np.isclose(v.state.config.cam_position[2] - z3, 10 * plain)


def test_sun_controls(cornell_scene):
    """Sun orbit + intensity (reference env GUI: src/app.rs:365-437)."""
    v = _viewer(cornell_scene)
    sun0 = np.asarray(v.state.config.sun_direction)
    v.handle_key("l")
    sun1 = np.asarray(v.state.config.sun_direction)
    assert not np.allclose(sun1[:3], sun0[:3])
    # direction stays unit-length; intensity untouched by orbit keys
    assert np.isclose(np.linalg.norm(sun1[:3]), 1.0, atol=1e-6)
    assert sun1[3] == sun0[3]
    v.handle_key("=")
    assert v.state.config.sun_direction[3] > sun1[3]
    v.handle_key("-")
    # intensity never goes negative
    for _ in range(40):
        v.handle_key("-")
    assert v.state.config.sun_direction[3] >= 0.0
