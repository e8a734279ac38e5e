"""prewarm_staged: the concurrent executable warmer for the fast path.

On the axon TPU runtime every executable load pays a server-side
compile even on a persistent-cache hit, so render_batch_staged warms
the kernelshade stage set through a thread pool on first touch. These
tests exercise the task construction end-to-end in interpret mode (the
dummy-operand shapes must trace through the real kernels) and pin the
idempotence contract.
"""

import numpy as np
import pytest

from rustic_tpu.config import NextEventEstimation, TracingConfig
from rustic_tpu.runtime.pipeline import _PREWARMED, prewarm_staged
from rustic_tpu.scene.world import World
from tests.conftest import scene_path

pytestmark = pytest.mark.slow  # interpret-mode kernel executions


@pytest.fixture(scope="module")
def cornell():
    return World.from_path(scene_path("DarkCornell.glb")).to_device()


def test_prewarm_builds_and_runs_all_stage_tasks(cornell):
    config = TracingConfig(width=32, height=32, nee=NextEventEstimation.MIS)
    cfg = config.static_part()
    cam = config.dynamic_part()
    _PREWARMED.clear()
    n = prewarm_staged(
        cornell, cfg, cam, lanes=1024, n_samples=2, force_interpret=True
    )
    # init + nearest + merged nearest/shadow + occlude + 4 shade bounces
    # + finish for the single fold group
    assert n == 9
    # second call with the same shape class is a no-op
    assert (
        prewarm_staged(
            cornell, cfg, cam, lanes=1024, n_samples=2, force_interpret=True
        )
        == 0
    )


def test_prewarm_remainder_fold_adds_a_shape_class(cornell, monkeypatch):
    config = TracingConfig(width=32, height=32, nee=NextEventEstimation.MIS)
    cfg = config.static_part()
    cam = config.dynamic_part()
    _PREWARMED.clear()
    # 3 samples at fold 2 -> groups of 2 and 1: both lane widths warm
    monkeypatch.setenv("RUSTIC_SAMPLE_FOLD", "2")
    n = prewarm_staged(
        cornell, cfg, cam, lanes=1024, n_samples=3, force_interpret=True
    )
    assert n == 18


def test_prewarm_fold_not_dividing_lanes(cornell, monkeypatch):
    """Regression (round-3 advisor): init dummies must be shaped like the
    driver's TILED (lanes * g,) operands. A (lanes,) dummy made
    _fold_sample_idx's broadcast raise for any fold that does not divide
    lanes (e.g. fold 3 at 1024 lanes) and warmed a wrong-shape init
    executable for folds that do."""
    config = TracingConfig(width=32, height=32, nee=NextEventEstimation.MIS)
    cfg = config.static_part()
    cam = config.dynamic_part()
    _PREWARMED.clear()
    monkeypatch.setenv("RUSTIC_SAMPLE_FOLD", "3")
    n = prewarm_staged(
        cornell, cfg, cam, lanes=1024, n_samples=3, force_interpret=True
    )
    assert n == 9


def test_prewarm_key_distinguishes_scenes(cornell, monkeypatch):
    """Regression (round-3 advisor): a second scene with matching config
    but different executable shapes must warm its own stage set."""
    config = TracingConfig(width=32, height=32, nee=NextEventEstimation.MIS)
    cfg = config.static_part()
    cam = config.dynamic_part()
    _PREWARMED.clear()
    n1 = prewarm_staged(
        cornell, cfg, cam, lanes=1024, n_samples=2, force_interpret=True
    )
    assert n1 > 0
    other = World.from_path(scene_path("FurnaceTest.glb")).to_device()
    if other.tri_attrs_split is not None:  # multi-tile scenes skip anyway
        n2 = prewarm_staged(
            other, cfg, cam, lanes=1024, n_samples=2, force_interpret=True
        )
        assert n2 > 0


def test_prewarm_skips_cpu_backend_without_override(cornell):
    config = TracingConfig(width=32, height=32, nee=NextEventEstimation.MIS)
    _PREWARMED.clear()
    assert (
        prewarm_staged(
            cornell,
            config.static_part(),
            config.dynamic_part(),
            lanes=1024,
            n_samples=2,
        )
        == 0
    )
