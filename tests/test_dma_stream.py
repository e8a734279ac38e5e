"""Equality gates for the DMA-streamed multi-tile kernels
(ops/flash_intersect.py `_nearest_multi_dma` family): same packed-min /
any-hit results as the streamed-grid kernels, bit for bit. The DMA
variants make the G fetch cull-proportional (grid = ray blocks only;
only slab-admitted tiles are copied from HBM) — pure orchestration, so
the results must be EXACTLY equal: the compacted tile set is a superset
of every tile that can contain a winner, and packed-min / any-OR are
visit-order-independent."""

import numpy as np
import pytest

import jax.numpy as jnp

from rustic_tpu.ops import flash_intersect as FI
from rustic_tpu.ops.intersect import _ray_features16
from rustic_tpu.scene.world import World
from tests.conftest import scene_path


@pytest.fixture(scope="module")
def multi_tile_scene():
    scene = World.from_path(scene_path("VeachMIS.glb")).to_device()
    assert FI._geometry(scene.tri_feats16)[2] > 1, "scene must be multi-tile"
    return scene


def _rays(b, seed=0):
    rng = np.random.default_rng(seed)
    ro = rng.normal(0, 2.0, (b, 3)).astype(np.float32)
    rd = rng.normal(0, 1, (b, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    feats = _ray_features16(jnp.asarray(ro), jnp.asarray(rd))
    return feats, feats.at[:, FI.SH_MAXT_COL].set(3.0)


@pytest.mark.parametrize("precision", ["f32", "x6"])
def test_dma_nearest_matches_streamed(multi_tile_scene, precision):
    scene = multi_tile_scene
    feats, _ = _rays(2048)
    kw = dict(bt=256, interpret=True, precision=precision)
    t0, i0, *_ = FI._flash_nearest(
        feats, scene.tri_feats16, scene.tile_aabbs, **kw
    )
    t1, i1, *_ = FI._flash_nearest(
        feats, scene.tri_feats16, scene.tile_aabbs, dma=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


@pytest.mark.parametrize("precision", ["f32", "x6"])
def test_dma_merged_and_occlude_match_streamed(multi_tile_scene, precision):
    scene = multi_tile_scene
    feats, shadow = _rays(2048, seed=1)
    kw = dict(bt=256, interpret=True, precision=precision)
    a0, b0, o0, *_ = FI._flash_nearest_shadow(
        feats, shadow, scene.tri_feats16, scene.tile_aabbs, **kw
    )
    a1, b1, o1, *_ = FI._flash_nearest_shadow(
        feats, shadow, scene.tri_feats16, scene.tile_aabbs, dma=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
    c0 = FI._flash_occlude_packed(
        shadow, scene.tri_feats16, scene.tile_aabbs, **kw
    )
    c1 = FI._flash_occlude_packed(
        shadow, scene.tri_feats16, scene.tile_aabbs, dma=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))


def test_block_admits_superset_of_per_ray(furnace_scene):
    """_block_tile_lists' interval verdicts must admit every tile ANY
    ray in the block exactly slab-hits — the soundness condition that
    keeps the DMA kernels bit-exact (extra admits only add losing
    candidates; a missed admit would drop real hits)."""
    import numpy as np
    import jax.numpy as jnp
    from rustic_tpu.ops import flash_intersect as FI

    rng = np.random.default_rng(3)
    bt = 128
    B = 512
    scene = furnace_scene
    aabb = np.asarray(scene.tile_aabbs)
    nt = aabb.shape[0]
    # mixed ray population: coherent-ish origins per block + random dirs
    ro = rng.normal(0, 2.0, (B, 3)).astype(np.float32)
    rd = rng.normal(0, 1.0, (B, 3)).astype(np.float32)
    rd /= np.maximum(np.linalg.norm(rd, axis=-1, keepdims=True), 1e-9)
    from rustic_tpu.ops.intersect import _ray_features16

    feats = np.asarray(_ray_features16(jnp.asarray(ro), jnp.asarray(rd))).T
    plist, pcount = FI._block_tile_lists(
        jnp.asarray(aabb), bt, (False,), jnp.asarray(feats)
    )
    # transposed layout: plist [nt, nb128], pcount [1, nb128]
    plist, pcount = np.asarray(plist), np.asarray(pcount)[0]
    admitted = [
        set(int(v) & FI._LIST_ID_MASK for v in plist[: pcount[b], b])
        for b in range(B // bt)
    ]
    # exact per-ray slab
    inv = 1.0 / np.where(np.abs(rd) < 1e-12,
                         np.where(rd < 0, -1e-12, 1e-12), rd)
    lo, hi = aabb[:, 0:3], aabb[:, 4:7]
    for b in range(B // bt):
        s = slice(b * bt, (b + 1) * bt)
        t1 = (lo[None] - ro[s][:, None]) * inv[s][:, None]
        t2 = (hi[None] - ro[s][:, None]) * inv[s][:, None]
        tmin = np.minimum(t1, t2).max(axis=2)
        tmax = np.maximum(t1, t2).min(axis=2)
        hit_any = ((tmax >= tmin) & (tmax > 0)).any(axis=0)
        for j in np.nonzero(hit_any)[0]:
            assert int(j) in admitted[b], (b, int(j))
