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
