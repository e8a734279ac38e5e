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
    t_f32, idx_f32, _, _ = flash_nearest(
        feats, cornell.tri_feats16, cornell.tile_aabbs,
        interpret=True, precision="f32",
    )
    t_b, idx_b, t_b2, idx_b2 = flash_nearest(
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
    t_f32, idx_f32, _, _ = flash_nearest(
        feats, cornell.tri_feats16, cornell.tile_aabbs,
        interpret=True, precision="f32",
    )
    t_m, idx_m, _, _ = flash_nearest(
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
    t_m, idx_m, occ_m, _, _ = flash_nearest_shadow(
        feats, shadow, cornell.tri_feats16, cornell.tile_aabbs,
        interpret=True, precision="mixed",
    )
    t_f, idx_f, _, _ = flash_nearest(
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


# ---------------------------------------------------------------------------
# top-2 winner carry (bf16x3 plans)
# ---------------------------------------------------------------------------


def test_top2_pair_invariants(cornell):
    ro, rd = _rays(512, 7)
    feats = _ray_features16(ro, rd)
    t1, i1, t2, i2 = flash_nearest(
        feats, cornell.tri_feats16, cornell.tile_aabbs,
        interpret=True, precision="bf16x3",
    )
    t1, i1, t2, i2 = map(np.asarray, (t1, i1, t2, i2))
    # second candidate is never nearer than the first
    assert np.all(t2 >= t1)
    # a second candidate implies a first
    assert np.all((t2 >= BIG) | (t1 < BIG))
    # where both exist they are distinct triangles
    both = t2 < BIG
    assert np.all(i1[both] != i2[both])


def test_top2_mixed_and_f32_carry_none(cornell):
    ro, rd = _rays(64, 8)
    feats = _ray_features16(ro, rd)
    for prec in ("f32", "mixed"):
        t1, i1, t2, i2 = flash_nearest(
            feats, cornell.tri_feats16, cornell.tile_aabbs,
            interpret=True, precision=prec,
        )
        assert t2 is None and i2 is None


def test_top2_near_tie_resolves_exactly():
    """Adversarial near-tie geometry: pairs of parallel triangles whose
    t separation sits inside the bf16x3 dot's noise window. The noisy
    scan may rank them either way; the top-2 carry + exact dual re-test
    (classify_flash_hit2) must still return the exact brute winner."""
    from rustic_tpu.ops import intersect as I
    from rustic_tpu.ops.flash_intersect import pack_tri_feats16
    from rustic_tpu.ops.intersect import classify_flash_hit2
    from rustic_tpu.scene.world import _triangle_features

    rng = np.random.default_rng(11)
    n_pairs = 128
    verts, tris = [], []
    ro_l, rd_l = [], []
    for k in range(n_pairs):
        # pair of big triangles normal +z at z ~ cell, dt within noise
        cx, cy = (k % 16) * 10.0, (k // 16) * 10.0
        z = 1.0 + rng.uniform(0, 0.5)
        dt = rng.uniform(1e-6, 2e-5) * (1 if k % 2 == 0 else -1)
        for dz in (0.0, dt):
            b = len(verts)
            verts += [
                [cx - 2, cy - 2, z + dz],
                [cx + 2, cy - 2, z + dz],
                [cx, cy + 2, z + dz],
            ]
            tris.append([b, b + 1, b + 2])
        # slightly tilted ray through the pair (generic, not axis-exact)
        d = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1), 1.0])
        d /= np.linalg.norm(d)
        ro_l.append([cx + rng.uniform(-0.5, 0.5), cy + rng.uniform(-0.5, 0.5), 0.0])
        rd_l.append(d)
    verts = np.asarray(verts, np.float32)
    tris_np = np.asarray(tris, np.int64)
    tf = _triangle_features(verts, tris_np)
    g16 = jnp.asarray(pack_tri_feats16(tf))
    aabbs = jnp.zeros((1, 8), jnp.float32)
    ro = jnp.asarray(np.asarray(ro_l, np.float32))
    rd = jnp.asarray(np.asarray(rd_l, np.float32))
    feats = _ray_features16(ro, rd)

    t1, i1, t2, i2 = flash_nearest(
        feats, g16, aabbs, interpret=True, precision="bf16x3"
    )
    # attr rows only need the vertex columns for the exact re-test
    table = np.zeros((len(tris_np), 9), np.float32)
    for j, (a, b, c) in enumerate(tris_np):
        table[j] = np.concatenate([verts[a], verts[b], verts[c]])
    table = jnp.asarray(table)
    res, _ = classify_flash_hit2(
        t1, i1, table[i1], t2, i2, table[i2], ro, rd
    )

    brute = I.intersect_brute(jnp.asarray(tf), ro, rd)
    np.testing.assert_array_equal(np.asarray(res.hit), np.asarray(brute.hit))
    hit = np.asarray(brute.hit)
    np.testing.assert_array_equal(
        np.asarray(res.tri_idx)[hit], np.asarray(brute.tri_idx)[hit]
    )
    np.testing.assert_allclose(
        np.asarray(res.t)[hit], np.asarray(brute.t)[hit], rtol=1e-6
    )


def test_top2_multitile_merge(furnace_scene):
    """Multi-tile (21-tile) scene: the cross-tile top-2 merge + t2 cull
    limit must agree with brute after the exact dual re-test, except
    for rays whose true winner was ranked third (vanishingly rare)."""
    from rustic_tpu.ops import intersect as I
    from rustic_tpu.ops.intersect import classify_flash_hit2, gather_attr_rows

    scene = furnace_scene
    rng = np.random.default_rng(13)
    n = 512
    ro = jnp.asarray(rng.normal(0, 0.5, (n, 3)).astype(np.float32))
    rd = rng.normal(0, 1, (n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rd = jnp.asarray(rd)
    feats = _ray_features16(ro, rd)
    t1, i1, t2, i2 = flash_nearest(
        feats, scene.tri_feats16, scene.tile_aabbs,
        interpret=True, precision="bf16x3",
    )
    assert t2 is not None
    assert np.all(np.asarray(t2) >= np.asarray(t1))
    res, _ = classify_flash_hit2(
        t1, i1, gather_attr_rows(scene, i1), t2, i2,
        gather_attr_rows(scene, i2), ro, rd,
    )
    brute = I.intersect_brute(scene.tri_feats, ro, rd)
    hit_match = np.asarray(res.hit) == np.asarray(brute.hit)
    assert np.mean(~hit_match) < 0.01
    both = np.asarray(res.hit) & np.asarray(brute.hit)
    t_ok = np.isclose(
        np.asarray(res.t)[both], np.asarray(brute.t)[both], rtol=1e-5
    )
    assert np.mean(~t_ok) < 0.01


# ---------------------------------------------------------------------------
# split-role dot ("mixed2": f32 det/t + bf16x3 u/v)
# ---------------------------------------------------------------------------


def test_mixed2_nearest_ranking_matches_f32(cornell):
    """mixed2's ranking columns (det, t) are exact f32, so hits and
    winners agree with the oracle except where the epsilon-expanded u/v
    window or the raised det floor flips an edge/grazing pair."""
    ro, rd = _rays(512, 21)
    feats = _ray_features16(ro, rd)
    t_f, idx_f, _, _ = flash_nearest(
        feats, cornell.tri_feats16, cornell.tile_aabbs,
        interpret=True, precision="f32",
    )
    t_m, idx_m, t2, i2 = flash_nearest(
        feats, cornell.tri_feats16, cornell.tile_aabbs,
        interpret=True, precision="mixed2",
    )
    assert t2 is None and i2 is None  # no top-2 carry needed
    hit_f = np.asarray(t_f) < BIG
    hit_m = np.asarray(t_m) < BIG
    assert np.mean(hit_f != hit_m) < 0.01
    both = hit_f & hit_m
    # t floored to 14-bit mantissa by the packed reduction, else exact
    np.testing.assert_allclose(
        np.asarray(t_m)[both], np.asarray(t_f)[both], rtol=1.3e-4
    )
    assert np.mean(np.asarray(idx_m)[both] != np.asarray(idx_f)[both]) < 0.005


def test_mixed2_near_tie_resolves_exactly():
    """The adversarial near-tie pairs that require a top-2 carry under
    bf16x3 resolve exactly under mixed2 with NO carry: the t/det dot is
    f32, so the packed min ranks them exactly (up to the shared 14-bit
    t floor, ~6e-5 relative — the pair separations here sit above it;
    unlike bf16x3's term-magnitude-relative noise, the floor is
    scene-scale independent)."""
    from rustic_tpu.ops import intersect as I
    from rustic_tpu.ops.flash_intersect import pack_tri_feats16
    from rustic_tpu.ops.intersect import classify_flash_hit2
    from rustic_tpu.scene.world import _triangle_features

    rng = np.random.default_rng(23)
    n_pairs = 128
    verts, tris = [], []
    ro_l, rd_l = [], []
    for k in range(n_pairs):
        cx, cy = (k % 16) * 10.0, (k // 16) * 10.0
        z = 1.0 + rng.uniform(0, 0.5)
        dt = rng.uniform(5e-4, 2e-3) * (1 if k % 2 == 0 else -1)
        for dz in (0.0, dt):
            b = len(verts)
            verts += [
                [cx - 2, cy - 2, z + dz],
                [cx + 2, cy - 2, z + dz],
                [cx, cy + 2, z + dz],
            ]
            tris.append([b, b + 1, b + 2])
        d = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1), 1.0])
        d /= np.linalg.norm(d)
        ro_l.append([cx + rng.uniform(-0.5, 0.5), cy + rng.uniform(-0.5, 0.5), 0.0])
        rd_l.append(d)
    verts = np.asarray(verts, np.float32)
    tris_np = np.asarray(tris, np.int64)
    tf = _triangle_features(verts, tris_np)
    g16 = jnp.asarray(pack_tri_feats16(tf))
    aabbs = jnp.zeros((1, 8), jnp.float32)
    ro = jnp.asarray(np.asarray(ro_l, np.float32))
    rd = jnp.asarray(np.asarray(rd_l, np.float32))
    feats = _ray_features16(ro, rd)

    t1, i1, t2, i2 = flash_nearest(
        feats, g16, aabbs, interpret=True, precision="mixed2"
    )
    assert t2 is None
    table = np.zeros((len(tris_np), 9), np.float32)
    for j, (a, b, c) in enumerate(tris_np):
        table[j] = np.concatenate([verts[a], verts[b], verts[c]])
    table = jnp.asarray(table)
    res, _ = classify_flash_hit2(
        t1, i1, table[i1], None, None, None, ro, rd, edge_margin=1e-3
    )
    brute = I.intersect_brute(jnp.asarray(tf), ro, rd)
    np.testing.assert_array_equal(np.asarray(res.hit), np.asarray(brute.hit))
    hit = np.asarray(brute.hit)
    np.testing.assert_array_equal(
        np.asarray(res.tri_idx)[hit], np.asarray(brute.tri_idx)[hit]
    )
    np.testing.assert_allclose(
        np.asarray(res.t)[hit], np.asarray(brute.t)[hit], rtol=1e-6
    )


def test_mixed2_anyhit_matches_mixed(cornell):
    """mixed2's any-hit side is the same bf16x3 split as mixed, just
    computed from the [det|t]/[u|v] regrouped operands."""
    ro, rd = _rays(512, 25)
    feats = _ray_features16(ro, rd)
    sh_ro, sh_rd = _rays(512, 26)
    shadow = _ray_features16(sh_ro, sh_rd).at[:, 10].set(2.0)
    t_a, i_a, occ_a, _, _ = flash_nearest_shadow(
        feats, shadow, cornell.tri_feats16, cornell.tile_aabbs,
        interpret=True, precision="mixed2",
    )
    occ_m = np.asarray(
        flash_occlude(
            shadow, shadow[:, 10], cornell.tri_feats16, cornell.tile_aabbs,
            interpret=True, precision="bf16x3",
        )
    )
    np.testing.assert_array_equal(np.asarray(occ_a), occ_m)
    # merged nearest side agrees with the standalone mixed2 nearest
    t_n, i_n, _, _ = flash_nearest(
        feats, cornell.tri_feats16, cornell.tile_aabbs,
        interpret=True, precision="mixed2",
    )
    np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_n))
    np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_n))


def test_mixed2_multitile_merge(furnace_scene):
    """Multi-tile merge under mixed2: winners match brute exactly away
    from edge-margin admits."""
    from rustic_tpu.ops import intersect as I
    from rustic_tpu.ops.intersect import classify_flash_hit2, gather_attr_rows

    scene = furnace_scene
    rng = np.random.default_rng(27)
    n = 512
    ro = jnp.asarray(rng.normal(0, 0.5, (n, 3)).astype(np.float32))
    rd = rng.normal(0, 1, (n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rd = jnp.asarray(rd)
    feats = _ray_features16(ro, rd)
    t1, i1, t2, i2 = flash_nearest(
        feats, scene.tri_feats16, scene.tile_aabbs,
        interpret=True, precision="mixed2",
    )
    assert t2 is None
    res, _ = classify_flash_hit2(
        t1, i1, gather_attr_rows(scene, i1), None, None, None, ro, rd,
        edge_margin=1e-3,
    )
    brute = I.intersect_brute(scene.tri_feats, ro, rd)
    hit_match = np.asarray(res.hit) == np.asarray(brute.hit)
    assert np.mean(~hit_match) < 0.01
    both = np.asarray(res.hit) & np.asarray(brute.hit)
    idx_match = np.asarray(res.tri_idx)[both] == np.asarray(brute.tri_idx)[both]
    assert np.mean(~idx_match) < 0.01
    # every winner flip is a genuine tie within the 14-bit t floor —
    # the exact re-tested t still matches brute to the floor
    np.testing.assert_allclose(
        np.asarray(res.t)[both], np.asarray(brute.t)[both], rtol=1.5e-4
    )


# ---------------------------------------------------------------------------
# resident-G multi-tile kernels (in-kernel unrolled tile loop)
# ---------------------------------------------------------------------------


def test_resident_nearest_matches_streamed(furnace_scene, monkeypatch):
    """The resident-G kernel (whole triangle table in VMEM, unrolled
    tile loop) must agree exactly with the streamed grid formulation —
    same math, same tile visit order, no grid dimension."""
    from rustic_tpu.ops.flash_intersect import (
        _flash_nearest,
        _flash_nearest_shadow,
        _flash_occlude_packed,
        use_resident,
    )

    scene = furnace_scene
    monkeypatch.setenv("RUSTIC_RESIDENT", "1")  # opt-in since 2026-08-19
    assert use_resident("f32", scene.tri_feats16, "near")
    rng = np.random.default_rng(31)
    n = 700  # not a block multiple: exercises ray padding
    ro = jnp.asarray(rng.normal(0, 0.5, (n, 3)).astype(np.float32))
    rd = rng.normal(0, 1, (n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rd = jnp.asarray(rd)
    feats = _ray_features16(ro, rd)
    sh_ro, sh_rd = _rays(n, 32)
    shadow = _ray_features16(sh_ro, sh_rd).at[:, 10].set(2.0)

    for prec in ("f32", "mixed", "mixed2", "bf16x3", "x6"):
        a = _flash_nearest(
            feats, scene.tri_feats16, scene.tile_aabbs, bt=256,
            interpret=True, precision=prec, resident=False,
        )
        b = _flash_nearest(
            feats, scene.tri_feats16, scene.tile_aabbs, bt=256,
            interpret=True, precision=prec, resident=True,
        )
        for x, y in zip(a, b):
            if x is None:
                assert y is None
            else:
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

        sa = _flash_nearest_shadow(
            feats, shadow, scene.tri_feats16, scene.tile_aabbs, bt=256,
            interpret=True, precision=prec, resident=False,
        )
        sb = _flash_nearest_shadow(
            feats, shadow, scene.tri_feats16, scene.tile_aabbs, bt=256,
            interpret=True, precision=prec, resident=True,
        )
        for x, y in zip(sa, sb):
            if x is None:
                assert y is None
            else:
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

        oa = _flash_occlude_packed(
            shadow, scene.tri_feats16, scene.tile_aabbs, bt=256,
            interpret=True, precision=prec, resident=False,
        )
        ob = _flash_occlude_packed(
            shadow, scene.tri_feats16, scene.tile_aabbs, bt=256,
            interpret=True, precision=prec, resident=True,
        )
        np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


def test_use_resident_gates():
    from rustic_tpu.ops.flash_intersect import (
        RESIDENT_VMEM_BUDGET,
        use_resident,
    )

    # single-tile scenes never use resident mode
    g1 = jnp.zeros((16, 4 * 512), jnp.float32)
    assert not use_resident("f32", g1, "near")
    # VMEM budget gate: a huge table falls back to streaming
    big_cols = 4 * 512 * (RESIDENT_VMEM_BUDGET // (16 * 512 * 4) + 8)
    g_big = jnp.zeros((16, big_cols), jnp.float32)
    assert not use_resident("f32", g_big, "near")


# ---------------------------------------------------------------------------
# f32p: exact f32 HIGHEST dots on every role + fast packed epilogue
# (the TPU default since round 2c — tools/mxu_floor.py measured the
# scan dots output-bound, making HIGHEST cheaper than the bf16 splits)
# ---------------------------------------------------------------------------


def test_f32p_nearest_matches_f32_oracle(cornell):
    """f32p's nearest dot is the same HIGHEST dot as the oracle; only
    the epilogue differs (packed min vs exact division + dual argmin),
    so t agrees to the packed reduction's 14-bit mantissa floor and
    winners/hits agree everywhere (no margins, no raised det floor)."""
    ro, rd = _rays(512, 33)
    feats = _ray_features16(ro, rd)
    t_f, idx_f, _, _ = flash_nearest(
        feats, cornell.tri_feats16, cornell.tile_aabbs,
        interpret=True, precision="f32",
    )
    t_p, idx_p, t2, i2 = flash_nearest(
        feats, cornell.tri_feats16, cornell.tile_aabbs,
        interpret=True, precision="f32p",
    )
    assert t2 is None and i2 is None
    hit_f = np.asarray(t_f) < BIG
    hit_p = np.asarray(t_p) < BIG
    np.testing.assert_array_equal(hit_f, hit_p)
    np.testing.assert_allclose(
        np.asarray(t_p)[hit_p], np.asarray(t_f)[hit_f], rtol=1.3e-4
    )
    np.testing.assert_array_equal(
        np.asarray(idx_p)[hit_p], np.asarray(idx_f)[hit_f]
    )


def test_f32p_anyhit_matches_f32_oracle(cornell):
    """f32p's any-hit dot is exact f32 (vs the split plans' bf16x3), so
    occlusion agrees with the oracle bit-for-bit — no grazing flips."""
    ro, rd = _rays(512, 34)
    shadow = _ray_features16(ro, rd)
    shadow = shadow.at[:, 10].set(2.0)
    occ_f = np.asarray(
        flash_occlude(
            shadow, shadow[:, 10], cornell.tri_feats16, cornell.tile_aabbs,
            interpret=True, precision="f32",
        )
    )
    occ_p = np.asarray(
        flash_occlude(
            shadow, shadow[:, 10], cornell.tri_feats16, cornell.tile_aabbs,
            interpret=True, precision="f32p",
        )
    )
    np.testing.assert_array_equal(occ_f, occ_p)


def test_f32p_no_margin():
    from rustic_tpu.ops.flash_intersect import near_edge_margin

    assert near_edge_margin("f32p") == 0.0


# ---------------------------------------------------------------------------
# x6: emulated-f32 dot as ONE bf16 pass at K=96 (six exact bf16 cross
# terms of a 3-way split concatenated along the contraction dim — see
# flash_intersect._prep_f_x6 and tools/probe_k96.py). f32-class
# accuracy (~4e-7 of term scale vs HIGHEST's ~2e-7) at ~1.0x a bf16
# pass instead of HIGHEST's measured 2.78x.
# ---------------------------------------------------------------------------


def test_split_bf16x3_reconstructs_f32_exactly():
    from rustic_tpu.ops.flash_intersect import split_bf16x3

    rng = np.random.default_rng(5)
    a = jnp.asarray(
        (rng.normal(0, 10, (64, 16)) * 10.0 ** rng.integers(-6, 6, (64, 16)))
        .astype(np.float32)
    )
    hi, mid, lo = split_bf16x3(a)
    back = (
        hi.astype(jnp.float32) + mid.astype(jnp.float32)
    ) + lo.astype(jnp.float32)
    # 3x8 mantissa bits cover f32's 24: exact reconstruction
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


def test_x6_nearest_matches_f32_oracle(cornell):
    """x6's ~4e-7 dot noise is far below any geometric feature of a
    non-degenerate scene: hits, winners, and t (to the packed 14-bit
    floor) must match the f32 oracle on random rays, with at most
    measure-zero boundary flips."""
    ro, rd = _rays(512, 40)
    feats = _ray_features16(ro, rd)
    t_f, idx_f, _, _ = flash_nearest(
        feats, cornell.tri_feats16, cornell.tile_aabbs,
        interpret=True, precision="f32",
    )
    t_x, idx_x, t2, i2 = flash_nearest(
        feats, cornell.tri_feats16, cornell.tile_aabbs,
        interpret=True, precision="x6",
    )
    assert t2 is None and i2 is None
    hit_f = np.asarray(t_f) < BIG
    hit_x = np.asarray(t_x) < BIG
    assert np.mean(hit_f != hit_x) < 0.005
    both = hit_f & hit_x
    np.testing.assert_allclose(
        np.asarray(t_x)[both], np.asarray(t_f)[both], rtol=1.5e-4
    )
    assert np.mean(np.asarray(idx_x)[both] != np.asarray(idx_f)[both]) < 0.005


def test_x6_anyhit_matches_f32_oracle(cornell):
    ro, rd = _rays(512, 41)
    shadow = _ray_features16(ro, rd)
    maxt = jnp.full(512, 2.5, jnp.float32)
    occ_f = np.asarray(
        flash_occlude(
            shadow, maxt, cornell.tri_feats16, cornell.tile_aabbs,
            interpret=True, precision="f32",
        )
    )
    occ_x = np.asarray(
        flash_occlude(
            shadow, maxt, cornell.tri_feats16, cornell.tile_aabbs,
            interpret=True, precision="x6",
        )
    )
    assert np.mean(occ_f != occ_x) < 0.005


def test_x6_nearest_shadow_multitile(furnace_scene):
    """Merged nearest+shadow under x6 on a multi-tile scene matches the
    f32 plan's results away from boundary noise."""
    scene = furnace_scene
    ro, rd = _rays(512, 42)
    feats = _ray_features16(ro, rd)
    sh_ro, sh_rd = _rays(512, 43)
    shadow = _ray_features16(sh_ro, sh_rd).at[:, 10].set(2.0)
    tf, idf, occf, _, _ = flash_nearest_shadow(
        feats, shadow, scene.tri_feats16, scene.tile_aabbs,
        interpret=True, precision="f32",
    )
    tx, idx, occx, _, _ = flash_nearest_shadow(
        feats, shadow, scene.tri_feats16, scene.tile_aabbs,
        interpret=True, precision="x6",
    )
    hit_f = np.asarray(tf) < BIG
    hit_x = np.asarray(tx) < BIG
    assert np.mean(hit_f != hit_x) < 0.005
    both = hit_f & hit_x
    np.testing.assert_allclose(
        np.asarray(tx)[both], np.asarray(tf)[both], rtol=1.5e-4
    )
    assert np.mean(np.asarray(occf) != np.asarray(occx)) < 0.005


def test_x6_no_margin_exact_det_floor():
    from rustic_tpu.ops.flash_intersect import (
        DET_EPS,
        _plan_for,
        near_edge_margin,
    )

    assert near_edge_margin("x6") == 0.0
    plan = _plan_for("x6", "near")
    assert plan.near_det_eps == DET_EPS
    assert plan.any_det_eps == DET_EPS
    assert plan.g_rows == [96]
