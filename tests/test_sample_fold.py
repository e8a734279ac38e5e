"""Sample folding (runtime/pipeline.py:pick_sample_fold).

Folding concatenates f consecutive samples' paths into one lane set so
every stage dispatch serves f samples. It must not change the image:
each lane block traces exactly the sample it would have traced
unfolded (same LDS indices), so the folded film equals the unfolded
film up to the film-summation reorder (f-way tree add vs sequential).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rustic_tpu.runtime import pipeline as P


pytestmark = pytest.mark.slow  # fold-equality renders: ~1.5 min


@pytest.fixture()
def fold_env(monkeypatch):
    def set_fold(n):
        monkeypatch.setenv("RUSTIC_SAMPLE_FOLD", str(n))

    return set_fold


def _render(world, n_px=64, spp=4, sample_start=0):
    from rustic_tpu.config import NextEventEstimation, TracingConfig

    scene = world.to_device()
    config = TracingConfig(width=32, height=32, nee=NextEventEstimation.MIS)
    cfg = config.static_part()
    cam = config.dynamic_part()
    rng = np.random.default_rng(5)
    px = jnp.asarray(rng.integers(0, 32, n_px), jnp.int32)
    py = jnp.asarray(rng.integers(0, 32, n_px), jnp.int32)
    offsets = jnp.asarray(rng.integers(0, 1 << 31, n_px), jnp.uint32)
    return np.asarray(
        P.render_batch_staged(
            scene, cfg, cam, px, py, offsets, sample_start, spp
        )
    )


def test_pick_sample_fold_budget(monkeypatch):
    monkeypatch.delenv("RUSTIC_SAMPLE_FOLD", raising=False)
    assert P.pick_sample_fold(1 << 22, 100) == 1
    assert P.pick_sample_fold(1 << 20, 100) == 4
    assert P.pick_sample_fold(1 << 18, 100) == 8  # capped at 8
    assert P.pick_sample_fold(1 << 18, 3) == 3  # capped by samples
    monkeypatch.setenv("RUSTIC_SAMPLE_FOLD", "4")
    assert P.pick_sample_fold(1 << 21, 100) == 4


def test_fold_sample_idx_blocks():
    sidx = P._fold_sample_idx(jnp.uint32(7), 12, 3)
    np.testing.assert_array_equal(
        np.asarray(sidx), np.repeat([7, 8, 9], 4).astype(np.uint32)
    )


def test_folded_staged_matches_unfolded(cornell_world, fold_env):
    fold_env("1")
    ref = _render(cornell_world)
    fold_env("4")
    folded = _render(cornell_world)
    np.testing.assert_allclose(folded, ref, rtol=1e-5, atol=1e-6)


def test_folded_with_remainder_group(cornell_world, fold_env):
    # spp=5, fold=2 -> groups of 2, 2, 1 (the remainder compiles its
    # own shapes and must still land on the same film)
    fold_env("1")
    ref = _render(cornell_world, spp=5)
    fold_env("2")
    folded = _render(cornell_world, spp=5)
    np.testing.assert_allclose(folded, ref, rtol=1e-5, atol=1e-6)


def test_folded_sorted_path_matches(fold_env):
    # VeachMIS is multi-tile -> exercises _render_batch_sorted's fold
    # (scatter-add film with colliding lane->pixel entries)
    from conftest import scene_path
    from rustic_tpu.scene.world import World

    world = World.from_path(scene_path("VeachMIS.glb"))
    fold_env("1")
    ref = _render(world, spp=4)
    fold_env("3")
    folded = _render(world, spp=4)
    np.testing.assert_allclose(folded, ref, rtol=1e-5, atol=1e-6)
