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
