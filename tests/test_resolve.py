"""ops/resolve.py — winner-row resolution for the multi-tile/textured
shade-kernel path, pinned against the XLA shade stage's own helpers
(gather_attr_rows / refine_from_attrs / material_from_attrs / the
bounce_pre texture stack). Image-level equality of the full driver is
pinned separately in tests/test_shade_kernel_mt.py."""

import numpy as np
import jax.numpy as jnp
import pytest

from rustic_tpu.ops import resolve as R
from rustic_tpu.ops import sampling as s
from rustic_tpu.ops.bsdf import material_from_attrs
from rustic_tpu.ops.intersect import (
    _ray_features16,
    gather_attr_rows,
    refine_from_attrs,
)
from rustic_tpu.ops.texture import sample_atlas
from rustic_tpu.scene import world as W

from conftest import scene_path


@pytest.fixture(scope="module")
def breaktime_scene():
    from rustic_tpu.scene.world import World

    return World.from_path(scene_path("BreakTime.glb")).to_device()


def _rays_at(scene, idx):
    """Rays through each chosen triangle's centroid (guaranteed hits
    with interior barycentrics)."""
    attrs = np.asarray(scene.tri_attrs)[idx]
    a = attrs[:, 0:3]
    b = attrs[:, 3:6]
    c = attrs[:, 6:9]
    centroid = (a + b + c) / 3.0
    # offset along the geometric normal so t > 0 and det != 0
    n = np.cross(b - a, c - a)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    ro = centroid + n * 0.7 + np.array([0.013, 0.021, -0.017])
    rd = centroid - ro
    rd /= np.maximum(np.linalg.norm(rd, axis=-1, keepdims=True), 1e-12)
    return jnp.asarray(ro, jnp.float32), jnp.asarray(rd, jnp.float32)


def test_rowgather_variant_bit_equal(cornell_scene, breaktime_scene):
    """resolve_attrs_rowT (ONE [B, W] row gather + relayout) must be
    bit-equal to the field-wise form on both the untextured and the
    textured path — same math routed through _textured_rows."""
    rng = np.random.default_rng(3)
    for scene in (cornell_scene, breaktime_scene):
        T = int(np.asarray(scene.tri_attrs).shape[0])
        idx = jnp.asarray(rng.integers(0, T, 513).astype(np.int32))
        featsT = jnp.asarray(
            rng.standard_normal((16, 513)), jnp.float32
        )
        a = np.asarray(R.resolve_attrs_t(scene, featsT, idx, 1e-4))
        b = np.asarray(R.resolve_attrs_rowT(scene, featsT, idx, 1e-4))
        np.testing.assert_array_equal(a, b)


def test_untextured_rows_match_slim_table(cornell_scene):
    scene = cornell_scene
    assert not scene.has_textures
    T = int(np.asarray(scene.tri_attrs).shape[0])
    idx = jnp.asarray(np.arange(T, dtype=np.int32) % T)
    featsT = jnp.zeros((16, T), jnp.float32)
    out = np.asarray(R.resolve_attrs_t(scene, featsT, idx))
    ref = W.slim_attr_table(np.asarray(scene.tri_attrs))[np.asarray(idx)].T
    np.testing.assert_array_equal(out, ref)


def test_textured_rows_match_xla_shade_stack(breaktime_scene):
    scene = breaktime_scene
    assert scene.has_textures
    rng = np.random.default_rng(7)
    T = int(np.asarray(scene.tri_attrs).shape[0])
    idx_np = rng.integers(0, T, size=257).astype(np.int32)
    # drop padded zero-area rows (centroid rays would be degenerate)
    pos = np.asarray(scene.tri_attrs)[idx_np, 0:9]
    area = np.linalg.norm(
        np.cross(pos[:, 3:6] - pos[:, 0:3], pos[:, 6:9] - pos[:, 0:3]),
        axis=-1,
    )
    idx_np = idx_np[area > 1e-8]
    idx = jnp.asarray(idx_np)
    ro, rd = _rays_at(scene, idx_np)
    featsT = _ray_features16(ro, rd).T

    out = np.asarray(R.resolve_attrs_t(scene, featsT, idx))

    # reference: the XLA shade stage's own resolution path
    attrs = gather_attr_rows(scene, idx)
    t2, u, v, backface, valid = refine_from_attrs(attrs, ro, rd)
    assert bool(jnp.all(valid)), "centroid rays must re-test as hits"
    w_b = u[..., None]
    w_c = v[..., None]
    w_a = 1.0 - w_b - w_c
    nrm = attrs[:, W.ATTR_NRM]
    normal = w_a * nrm[:, 0:3] + w_b * nrm[:, 3:6] + w_c * nrm[:, 6:9]
    uvs = attrs[:, W.ATTR_UV]
    uv = w_a[:, 0:1] * uvs[:, 0:2] + w_b[:, 0:1] * uvs[:, 2:4] \
        + w_c[:, 0:1] * uvs[:, 4:6]
    oor = jnp.any((uv < 0.0) | (uv > 1.0), axis=-1, keepdims=True)
    uv = jnp.where(oor, uv - jnp.floor(uv), uv)
    from rustic_tpu.ops.bsdf import material_tex_rect, material_tex_rows
    from rustic_tpu.scene.atlas import CH_NORMAL

    has_tex = attrs[:, W.ATTR_HASTEX]
    has_nm = has_tex[:, 3] != 0
    rect = material_tex_rect(
        has_tex, attrs[:, W.ATTR_ALBEDO], attrs[:, W.ATTR_METAL],
        attrs[:, W.ATTR_ROUGH], attrs[:, W.ATTR_NORMTEX],
    )
    nm = material_tex_rows(scene, rect, uv)[..., CH_NORMAL] * 2.0 - 1.0
    tan = attrs[:, W.ATTR_TAN]
    tangent = w_a * tan[:, 0:3] + w_b * tan[:, 3:6] + w_c * tan[:, 6:9]
    bitangent = s.cross(tangent, normal)
    mapped = s.normalize(
        tangent * nm[..., 0:1] + bitangent * nm[..., 1:2]
        + normal * nm[..., 2:3]
    )
    normal = np.asarray(jnp.where(has_nm[..., None], mapped, normal))
    mat = material_from_attrs(
        scene, attrs, uv, jnp.asarray([0.1, 0.9], jnp.float32)
    )

    np.testing.assert_array_equal(out[0:9], np.asarray(attrs[:, 0:9]).T)
    for k in range(3):  # replicated shading normal in all 3 slots
        np.testing.assert_allclose(
            out[9 + 3 * k : 12 + 3 * k], normal.T, rtol=1e-3, atol=2e-4
        )
    np.testing.assert_array_equal(
        out[W.SLIM_EMISSIVE], np.asarray(attrs[:, W.ATTR_EMISSIVE]).T
    )
    # texture-sampled values: a 1-ulp uv difference between the two
    # f32 barycentric pipelines can move a bilinear tap weight, so the
    # sampled comparisons get a noise-scale tolerance
    np.testing.assert_allclose(
        out[W.SLIM_ALBEDO], np.asarray(mat.albedo).T, rtol=1e-3, atol=2e-4
    )
    # material_from_attrs clamps rough/metal; the kernel applies the
    # same clamps to the raw resolved values — compare post-clamp
    np.testing.assert_allclose(
        np.maximum(out[W.SLIM_ROUGH], s.EPS), np.asarray(mat.roughness),
        rtol=1e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.minimum(out[W.SLIM_METAL], 1.0 - s.EPS), np.asarray(mat.metallic),
        rtol=1e-3, atol=2e-4,
    )
    np.testing.assert_array_equal(
        out[W.SLIM_TRANSMISSION],
        np.asarray(attrs[:, W.ATTR_TRANSMISSION]),
    )
    np.testing.assert_array_equal(
        out[W.SLIM_IOR], np.asarray(attrs[:, W.ATTR_IOR])
    )
