"""Packed-table layout guards.

The flash kernels and the shading stage communicate through packed rows
(ATTR_*/ENTRY_* in scene/world.py). These tests pin every column against
the unpacked source arrays so a silent layout drift cannot survive CI.
Plus end-to-end determinism: the sampler is a pure function, so renders
must be bit-identical across runs.
"""

import numpy as np

from rustic_tpu.scene import world as W


def test_attr_rows_match_source_arrays(cornell_world):
    w = cornell_world
    tris = w.triangles
    n = len(tris)
    attrs = w.tri_attrs
    vi = tris[:, :3]
    mi = tris[:, 3]
    np.testing.assert_array_equal(
        attrs[:n, W.ATTR_POS], w.positions[vi].reshape(n, 9)
    )
    np.testing.assert_array_equal(
        attrs[:n, W.ATTR_NRM], w.normals[vi].reshape(n, 9)
    )
    np.testing.assert_array_equal(
        attrs[:n, W.ATTR_TAN], w.tangents[vi].reshape(n, 9)
    )
    np.testing.assert_array_equal(attrs[:n, W.ATTR_UV], w.uv0[vi].reshape(n, 6))
    np.testing.assert_array_equal(attrs[:n, W.ATTR_EMISSIVE], w.mat_emissive[mi])
    np.testing.assert_array_equal(attrs[:n, W.ATTR_ALBEDO], w.mat_albedo[mi])
    np.testing.assert_array_equal(attrs[:n, W.ATTR_ROUGH], w.mat_roughness[mi])
    np.testing.assert_array_equal(attrs[:n, W.ATTR_METAL], w.mat_metallic[mi])
    np.testing.assert_array_equal(
        attrs[:n, W.ATTR_HASTEX], w.mat_has_tex[mi].astype(np.float32)
    )
    # padding rows are inert (zero => det 0 => never valid)
    assert not attrs[n:].any()


def test_entry_rows_match_light_table(cornell_world):
    w = cornell_world
    lt = w.light_table
    rows = w.entry_rows
    n = len(lt)
    np.testing.assert_allclose(rows[:n, W.ENTRY_AREA_A], lt.area_a)
    np.testing.assert_allclose(rows[:n, W.ENTRY_PDF_A], lt.pdf_a)
    np.testing.assert_allclose(rows[:n, W.ENTRY_RATIO], lt.ratio)
    vi = w.triangles[:, :3]
    for side, idx in (("A", lt.idx_a), ("B", lt.idx_b)):
        gi = idx.astype(np.int64)
        verts = w.positions[vi[gi]].reshape(n, 9)
        sl = W.ENTRY_A_VERTS if side == "A" else W.ENTRY_B_VERTS
        np.testing.assert_allclose(rows[:n, sl], verts)
        tri_col = W.ENTRY_A_TRI if side == "A" else W.ENTRY_B_TRI
        np.testing.assert_array_equal(rows[:n, tri_col].astype(np.int64), gi)


def test_tile_aabbs_cover_their_triangles(furnace_world):
    w = furnace_world
    from rustic_tpu.ops.flash_intersect import tile_size

    t_pad = w.tri_feats16.shape[-1] // 4
    tt = tile_size(t_pad)
    aabbs = w.tile_aabbs
    pts = w.positions[w.triangles[:, :3]]
    for j in range(len(aabbs)):
        lo, hi = j * tt, min((j + 1) * tt, len(w.triangles))
        if hi <= lo:
            assert aabbs[j, 0] > aabbs[j, 4]  # inverted box for padding
            continue
        tile = pts[lo:hi].reshape(-1, 3)
        assert np.all(aabbs[j, 0:3] <= tile.min(axis=0) + 1e-6)
        assert np.all(aabbs[j, 4:7] >= tile.max(axis=0) - 1e-6)


def test_render_is_deterministic(cornell_scene):
    from rustic_tpu.config import NextEventEstimation, RenderSettings, TracingConfig
    from rustic_tpu.runtime.render import render_image

    cfg = TracingConfig(width=16, height=16, nee=NextEventEstimation.MIS, max_bounces=2)
    a = render_image(cornell_scene, cfg, RenderSettings(samples=3))
    b = render_image(cornell_scene, cfg, RenderSettings(samples=3))
    np.testing.assert_array_equal(a, b)


def test_attr_split_is_bit_exact(cornell_world):
    """The hi/mid/lo bf16 decomposition must reconstruct tri_attrs
    bit-for-bit ((hi+mid)+lo in f32), and the one-hot fetch in
    gather_attr_rows must therefore equal the row gather exactly."""
    import jax.numpy as jnp

    from rustic_tpu.scene.world import expand_slim_attrs, slim_attr_table

    scene = cornell_world.to_device()
    assert scene.tri_attrs_split is not None
    s = np.asarray(scene.tri_attrs_split.astype(jnp.float32))
    rebuilt = (s[0] + s[1]) + s[2]
    # untextured scenes split the slim row layout (half the kernel
    # emission width); expansion must reproduce the full row exactly
    assert not scene.has_textures
    np.testing.assert_array_equal(
        rebuilt, slim_attr_table(np.asarray(scene.tri_attrs))
    )
    # Expansion restores every column the untextured shading path can
    # consume — including the rough/metal vec4 broadcast and albedo
    # alpha=1, exactly as the full table stores them. The dropped
    # columns (tangents, uvs, atlas rects, flags — only read under
    # scene.has_textures) come back as zeros, which is also their full-
    # table value for an untextured scene.
    expect = np.asarray(scene.tri_attrs).copy()
    expect[:, 18:33] = 0.0  # TAN + UV
    expect[:, 48:56] = 0.0  # NORMTEX + HASTEX
    np.testing.assert_array_equal(
        np.asarray(expand_slim_attrs(jnp.asarray(rebuilt))), expect
    )

    from rustic_tpu.ops.intersect import gather_attr_rows

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, scene.tri_attrs.shape[0], 257), jnp.int32)
    onehot = np.asarray(gather_attr_rows(scene, idx))
    direct = np.asarray(scene.tri_attrs)[np.asarray(idx)]
    np.testing.assert_array_equal(onehot, direct)
