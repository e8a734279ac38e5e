"""Path-coherence sorting machinery (runtime/pipeline.py).

The sorted staged driver's end-to-end equality is pinned by
test_render.py::test_staged_pipeline_matches_fused_multitile; these
unit tests pin the pieces: the packed-permute round-trip must be exact
for every dtype it carries (a f32 cast silently corrupting u32 draws is
exactly the bug it once had), the sort key must retire dead lanes last,
and the block-size heuristic must only deviate for multi-tile scenes.
"""

import jax
import numpy as np
import pytest
import jax.numpy as jnp

from rustic_tpu.runtime import pipeline as P


def _fake_state(n, rng):
    from rustic_tpu.ops.nee import MISCarry
    from rustic_tpu.ops.trace import TraceState

    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    return TraceState(
        ro=f(n, 3),
        rd=f(n, 3),
        throughput=f(n, 3),
        radiance=f(n, 3),
        alive=jnp.asarray(rng.random(n) > 0.3),
        missed=jnp.asarray(rng.random(n) > 0.7),
        last_lobe_diffuse=jnp.asarray(rng.random(n) > 0.5),
        mis=MISCarry(
            vec=f(n, 3),
            area_cos=f(n),
            pdf=f(n),
            tri=jnp.asarray(rng.integers(0, 30000, n), jnp.int32),
        ),
    )


def test_permute_lanes_roundtrip_exact():
    rng = np.random.default_rng(7)
    n = 257
    st = _fake_state(n, rng)
    draws = jnp.asarray(rng.random((n, 32)), jnp.float32)
    lane2px = jnp.asarray(rng.permutation(n), jnp.int32)
    feats = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)

    perm = jnp.asarray(rng.permutation(n), jnp.int32)
    inv = jnp.zeros(n, jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))

    out = P._permute_lanes(perm, (st, feats, draws, lane2px))
    back = P._permute_lanes(inv, out)
    for a, b in zip(
        jax.tree_util.tree_leaves((st, feats, draws, lane2px)),
        jax.tree_util.tree_leaves(back),
    ):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sort_perm_retires_dead_lanes_last(cornell_scene):
    rng = np.random.default_rng(3)
    n = 512
    st = _fake_state(n, rng)
    dead = ~st.alive
    perm = P._sort_perm(cornell_scene, st, dead)
    sorted_dead = np.asarray(dead)[np.asarray(perm)]
    n_dead = int(sorted_dead.sum())
    assert not sorted_dead[: n - n_dead].any()
    assert sorted_dead[n - n_dead :].all()
    # a permutation, not a projection
    assert len(np.unique(np.asarray(perm))) == n


def test_sentinel_feats_escape_every_tile(cornell_scene):
    from rustic_tpu.ops.flash_intersect import _tile_possible

    rng = np.random.default_rng(11)
    feats = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
    dead = jnp.asarray(np.ones(64, bool))
    sent = P._sentinel_feats(feats, dead)
    # every row replaced, and a fully-dead block culls every tile
    # (_tile_possible takes the kernels' transposed [16, BT] block)
    assert float(jnp.max(jnp.abs(sent[:, 0:3] - sent[0:1, 0:3]))) == 0.0
    for j in range(cornell_scene.tile_aabbs.shape[0]):
        reachable = _tile_possible(
            sent.T, cornell_scene.tile_aabbs[j], sent[:, 10]
        )
        assert not bool(reachable)
    # live rows untouched
    half = P._sentinel_feats(feats, jnp.asarray(np.arange(64) % 2 == 0))
    np.testing.assert_array_equal(np.asarray(half[1::2]), np.asarray(feats[1::2]))


def test_pick_bt_single_vs_multi(cornell_scene):
    from rustic_tpu.ops.flash_intersect import DEF_BT, pick_bt
    from rustic_tpu.scene.world import World
    from tests.conftest import scene_path

    assert pick_bt(cornell_scene.tri_feats16) == DEF_BT
    veach = World.from_path(scene_path("VeachMIS.glb")).to_device()
    assert pick_bt(veach.tri_feats16) == 256


def test_pack_unsort_exact():
    rng = np.random.default_rng(5)
    n = 300
    perm = jnp.asarray(rng.permutation(n), jnp.int32)
    inv = jnp.zeros(n, jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
    t = jnp.asarray(rng.standard_normal(n), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 1 << 23, n), jnp.int32)
    occ = jnp.asarray(rng.integers(0, 2, n), jnp.int32)
    ts, idxs, occs = t[perm], idx[perm], occ[perm]
    t2, idx2, occ2 = P._pack_unsort(inv, ts, idxs, occs)
    np.testing.assert_array_equal(np.asarray(t2), np.asarray(t))
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(idx))
    np.testing.assert_array_equal(np.asarray(occ2), np.asarray(occ))
    assert idx2.dtype == jnp.int32 and occ2.dtype == jnp.int32


def _render_multitile(scene, mode, spp, monkeypatch, n_px=1024, seed=9):
    from rustic_tpu.config import NextEventEstimation, TracingConfig

    config = TracingConfig(width=64, height=64, nee=NextEventEstimation.MIS)
    rng = np.random.default_rng(seed)
    px = jnp.asarray(rng.integers(0, 64, n_px), jnp.int32)
    py = jnp.asarray(rng.integers(0, 64, n_px), jnp.int32)
    offsets = jnp.asarray(rng.integers(0, 1 << 31, n_px), jnp.uint32)
    with monkeypatch.context() as m:
        if mode == "off":
            m.setattr(P, "_SORT_PATHS", False)
        else:
            m.setenv("RUSTIC_SORT_MODE", mode)
        return np.asarray(
            P.render_batch_staged(
                scene, config.static_part(), config.dynamic_part(),
                px, py, offsets, 0, spp,
            )
        )


@pytest.mark.slow  # 3-driver equality render
def test_raysorted_matches_state_sorted_and_unsorted(
    furnace_world, monkeypatch
):
    """The ray-sorted driver must produce the same film as the
    state-sorted and unsorted drivers: sorting/unsorting kernel operands
    is a pure reordering, never a math change. FurnaceTest is
    multi-tile, NEE-heavy, and retires most lanes after bounce 1 —
    exercising sentinels, the merged nearest+shadow unsort, and the
    held-group finish."""
    scene = furnace_world.to_device()
    films = {
        mode: _render_multitile(scene, mode, 3, monkeypatch)
        for mode in ("rays", "state", "off")
    }
    np.testing.assert_allclose(
        films["rays"], films["state"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        films["rays"], films["off"], rtol=1e-5, atol=1e-6
    )
