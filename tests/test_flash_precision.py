"""Dot-precision modes of the flash kernels (interpret mode).

"f32" is the bit-conservative reference; "bf16x3" (compensated 3-pass
bf16 split) and "mixed" (f32 nearest + bf16x3 any-hit) must agree with
it to the tolerances their mantissa budgets promise — see the
flash_intersect module docstring for the error model.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rustic_tpu.ops.flash_intersect import (
    BIG,
    flash_nearest,
    flash_nearest_shadow,
    flash_occlude,
    split_bf16,
)
from rustic_tpu.ops.intersect import _ray_features16


@pytest.fixture(scope="module")
def cornell(cornell_world):
    return cornell_world.to_device()


def _rays(n, seed):
    rng = np.random.default_rng(seed)
    ro = rng.normal(0, 0.8, (n, 3)).astype(np.float32)
    rd = rng.normal(0, 1, (n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_split_bf16_reconstructs_f32():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(0, 10, (64, 16)).astype(np.float32))
    hi, lo = split_bf16(a)
    back = hi.astype(jnp.float32) + lo.astype(jnp.float32)
    # 2-way bf16 split carries ~16 mantissa bits
    np.testing.assert_allclose(np.asarray(back), np.asarray(a), rtol=2e-5)


def test_bf16x3_nearest_matches_f32(cornell):
    ro, rd = _rays(256, 1)
    feats = _ray_features16(ro, rd)
    t_f32, idx_f32 = flash_nearest(
        feats, cornell.tri_feats16, cornell.tile_aabbs,
        interpret=True, precision="f32",
    )
    t_b, idx_b = flash_nearest(
        feats, cornell.tri_feats16, cornell.tile_aabbs,
        interpret=True, precision="bf16x3",
    )
    hit_f32 = np.asarray(t_f32) < BIG
    hit_b = np.asarray(t_b) < BIG
    # essentially no hit/miss flips in a non-degenerate scene
    assert np.mean(hit_f32 != hit_b) < 0.01
    both = hit_f32 & hit_b
    np.testing.assert_allclose(
        np.asarray(t_b)[both], np.asarray(t_f32)[both], rtol=1e-2
    )


def test_mixed_nearest_matches_f32_to_the_floor(cornell):
    # "mixed" runs the same f32 dot as the oracle mode but the fast
    # packed epilogue floors t to a 14-bit mantissa (idx in the low
    # bits), so t agrees to 2^-14 relative and the hit mask exactly.
    ro, rd = _rays(256, 2)
    feats = _ray_features16(ro, rd)
    t_f32, idx_f32 = flash_nearest(
        feats, cornell.tri_feats16, cornell.tile_aabbs,
        interpret=True, precision="f32",
    )
    t_m, idx_m = flash_nearest(
        feats, cornell.tri_feats16, cornell.tile_aabbs,
        interpret=True, precision="mixed",
    )
    hit_f32 = np.asarray(t_f32) < BIG
    np.testing.assert_array_equal(np.asarray(t_m) < BIG, hit_f32)
    np.testing.assert_allclose(
        np.asarray(t_m)[hit_f32], np.asarray(t_f32)[hit_f32], rtol=1.3e-4
    )
    # winners may differ only where two surfaces tie within the floor
    assert np.mean(np.asarray(idx_m) != np.asarray(idx_f32)) < 0.01


@pytest.mark.parametrize("precision", ["mixed", "bf16x3"])
def test_anyhit_precision_flip_rate(cornell, precision):
    ro, rd = _rays(512, 3)
    feats = _ray_features16(ro, rd)
    maxt = jnp.full(512, 2.5, jnp.float32)
    occ_f32 = np.asarray(
        flash_occlude(
            feats, maxt, cornell.tri_feats16, cornell.tile_aabbs,
            interpret=True, precision="f32",
        )
    )
    occ_p = np.asarray(
        flash_occlude(
            feats, maxt, cornell.tri_feats16, cornell.tile_aabbs,
            interpret=True, precision=precision,
        )
    )
    # visibility flips are confined to silhouette-grazing rays
    assert np.mean(occ_f32 != occ_p) < 0.01


def test_nearest_shadow_mixed_matches_components(cornell):
    ro, rd = _rays(256, 4)
    feats = _ray_features16(ro, rd)
    sh_ro, sh_rd = _rays(256, 5)
    shadow = _ray_features16(sh_ro, sh_rd)
    shadow = shadow.at[:, 10].set(2.0)
    t_m, idx_m, occ_m = flash_nearest_shadow(
        feats, shadow, cornell.tri_feats16, cornell.tile_aabbs,
        interpret=True, precision="mixed",
    )
    t_f, idx_f = flash_nearest(
        feats, cornell.tri_feats16, cornell.tile_aabbs,
        interpret=True, precision="mixed",
    )
    np.testing.assert_array_equal(np.asarray(t_m), np.asarray(t_f))
    np.testing.assert_array_equal(np.asarray(idx_m), np.asarray(idx_f))
    occ_b = np.asarray(
        flash_occlude(
            shadow, shadow[:, 10], cornell.tri_feats16, cornell.tile_aabbs,
            interpret=True, precision="bf16x3",
        )
    )
    np.testing.assert_array_equal(np.asarray(occ_m), occ_b)
