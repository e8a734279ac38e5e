"""Winner-row resolution for the Mosaic shade kernel on multi-tile and
textured scenes.

The single-tile flash kernels emit the winner's slim attr row [W, B]
in-kernel (ops/flash_intersect._nearest_single_attrs), which is what
lets ops/shade_kernel.py consume attributes with zero XLA glue. The
multi-tile kernels return only (t, idx) — and textured scenes need
atlas fetches + normal mapping that have no place inside a Mosaic
kernel (per-lane random gathers are XLA's strength, not Mosaic's).

This module closes both gaps with ONE XLA stage between the
intersection kernel and the shade kernel:

- untextured scenes: a field-wise transposed gather of the slim table
  (each output row is `take(tableT[w], idx)` — contiguous [B] writes,
  no [B, W] -> [W, B] relayout). The kernel interpolates normals and
  re-tests the winner exactly as in the single-tile path.

- textured scenes: the full rows are gathered field-wise, the winner is
  re-tested once in f32 (same math as the kernel's _mt_retest) for
  barycentrics, then the texture stack of ops/trace.bounce_pre runs —
  uv blend + wrap, atlas albedo/roughness/metallic, tangent-basis
  normal mapping (reference: kernels/src/lib.rs:111-141,
  kernels/src/bsdf.rs:354-387) — and the RESOLVED values are packed
  into a synthetic slim row: the mapped shading normal is replicated
  into all three vertex-normal slots (the kernel's barycentric blend of
  three equal vectors is exact, since w_a+w_b+w_c == 1), and the
  texture-resolved scalars take the SLIM_* slots. The kernel's own
  retest still validates the hit and derives backface from the det
  sign, so its emissive/termination logic is untouched.

Equality with the XLA shade stage is pinned by
tests/test_resolve.py / tests/test_shade_kernel_mt.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rustic_tpu.ops.texture import sample_atlas
from rustic_tpu.scene import world as W


def _take(row, idx):
    return jnp.take(row, idx, axis=0)


def _gather_rows_t(table, idx, rows):
    """Field-wise transposed gather: [T, W] table -> [len(rows), B].

    Each output row is an independent [B] gather from a [T] column —
    contiguous writes, small cached operand — instead of one [B, W] row
    gather followed by the 4*W*B-byte transpose the kernel layout would
    otherwise force."""
    tT = table.T
    return [_take(tT[r], idx) for r in rows]


def resolve_attrs_t(scene, featsT, idx, edge_margin: float = 0.0):
    """Winner attr rows for the shade kernel: [SLIM_WIDTH, B] f32.

    featsT: [16, B] packed ray rows (rd = rows 0:3, ro = rows 6:9 —
    ops/flash_intersect ray-feature layout). idx: the nearest-kernel
    winner. For untextured scenes this is a pure table gather; for
    textured scenes the synthetic slim row carries texture-resolved
    material scalars and the normal-mapped shading normal (see module
    docstring)."""
    if not scene.has_textures:
        return _resolve_untextured_t(scene.tri_attrs, idx)
    return _resolve_textured_t(
        scene.tri_attrs, scene.atlas, featsT, idx, edge_margin
    )


def resolve_attrs_rowT(scene, featsT, idx, edge_margin: float = 0.0):
    """resolve_attrs_t with ONE [B, W] row gather instead of ~50
    field-wise [B] gathers.

    TPU gathers pay a per-ROW latency (~5 ms per million rows) with the
    row width riding free (PERFORMANCE.md round-2 finding); at
    megabatch sizes the field-wise form therefore costs ~50x the row
    form, and the [B, W] -> [W, B] relayout it was avoiding is plain
    HBM bandwidth (~1-2 ms). Same math, same op order — bit-equal
    output (tests/test_resolve.py)."""
    if not scene.has_textures:
        return _resolve_untextured_rowT(scene.tri_attrs, idx)
    return _resolve_textured_rowT(
        scene.tri_attrs, scene.atlas, featsT, idx, edge_margin
    )


def _slim_cols():
    return (
        list(range(0, 18))  # POS + NRM, same offsets
        + list(range(W.ATTR_EMISSIVE.start, W.ATTR_EMISSIVE.stop))
        + list(range(W.ATTR_ALBEDO.start, W.ATTR_ALBEDO.start + 3))
        + [W.ATTR_ROUGH.start, W.ATTR_METAL.start,
           W.ATTR_TRANSMISSION, W.ATTR_IOR]
    )


@jax.jit
def _resolve_untextured_t(tri_attrs, idx):
    """Slim rows straight off the full table (slim_attr_table's column
    mapping, field-wise)."""
    rows = _gather_rows_t(tri_attrs, idx, _slim_cols())
    zero = jnp.zeros_like(rows[0])
    rows += [zero] * (W.SLIM_WIDTH - len(rows))
    return jnp.stack(rows)


@jax.jit
def _resolve_untextured_rowT(tri_attrs, idx):
    """One row gather of the slim columns + one relayout."""
    cols = _slim_cols()
    g = jnp.take(tri_attrs[:, jnp.asarray(cols)], idx, axis=0)  # [B, len]
    pad = W.SLIM_WIDTH - len(cols)
    if pad:
        g = jnp.pad(g, ((0, 0), (0, pad)))
    return g.T


@functools.partial(jax.jit, static_argnames=("edge_margin",))
def _resolve_textured_t(tri_attrs, atlas, featsT, idx, edge_margin):
    tT = tri_attrs.T
    return jnp.stack(_textured_rows(
        lambda ks: [_take(tT[k], idx) for k in ks],
        atlas, featsT, idx, edge_margin,
    ))


@functools.partial(jax.jit, static_argnames=("edge_margin",))
def _resolve_textured_rowT(tri_attrs, atlas, featsT, idx, edge_margin):
    g = jnp.take(tri_attrs, idx, axis=0)  # ONE [B, W] row gather
    return jnp.stack(_textured_rows(
        lambda ks: [g[:, k] for k in ks],
        atlas, featsT, idx, edge_margin,
    ))


def _textured_rows(cols, atlas, featsT, idx, edge_margin):
    """The textured resolve math over a column accessor: cols(ks) ->
    list of [B] winner-row columns. Both gather strategies route
    through this, so their outputs are bit-equal by construction."""
    B = idx.shape[0]
    rd = (featsT[0], featsT[1], featsT[2])
    ro = (featsT[6], featsT[7], featsT[8])

    pos = cols(range(0, 9))
    a3, b3, c3 = tuple(pos[0:3]), tuple(pos[3:6]), tuple(pos[6:9])

    # exact winner re-test for barycentrics (shade_kernel._mt_retest
    # math; the kernel repeats it for validity/backface — duplicating
    # ~20 VPU ops is far cheaper than widening the kernel interface)
    e1 = tuple(b - a for a, b in zip(a3, b3))
    e2 = tuple(c - a for a, c in zip(a3, c3))
    pv = _cross(rd, e2)
    det = _dot(e1, pv)
    good = jnp.abs(det) >= 1e-6
    inv_det = jnp.where(good, jnp.reciprocal(jnp.where(good, det, 1.0)), 0.0)
    tv = tuple(o - a for a, o in zip(a3, ro))
    u = _dot(tv, pv) * inv_det
    qv = _cross(tv, e1)
    v = _dot(rd, qv) * inv_det
    if edge_margin > 0.0:
        u = jnp.clip(u, 0.0, 1.0)
        v = jnp.clip(v, 0.0, 1.0 - u)
    w_b, w_c = u, v
    w_a = 1.0 - w_b - w_c

    def blend3(rows):  # rows: 9 rows (a.xyz b.xyz c.xyz) -> 3 rows
        return tuple(
            w_a * rows[k] + w_b * rows[3 + k] + w_c * rows[6 + k]
            for k in range(3)
        )

    nrm_rows = cols(range(9, 18))
    normal = blend3(nrm_rows)

    # uv blend + out-of-range wrap (trace.bounce_pre parity)
    uv_rows = cols(range(W.ATTR_UV.start, W.ATTR_UV.stop))
    uv0 = w_a * uv_rows[0] + w_b * uv_rows[2] + w_c * uv_rows[4]
    uv1 = w_a * uv_rows[1] + w_b * uv_rows[3] + w_c * uv_rows[5]
    oor = (uv0 < 0.0) | (uv0 > 1.0) | (uv1 < 0.0) | (uv1 > 1.0)
    uv0 = jnp.where(oor, uv0 - jnp.floor(uv0), uv0)
    uv1 = jnp.where(oor, uv1 - jnp.floor(uv1), uv1)
    uv = jnp.stack([uv0, uv1], axis=-1)  # [B, 2] for sample_atlas

    def slot(sl):  # 4-wide atlas uvst slot -> [B, 4]
        return jnp.stack(cols(range(sl.start, sl.stop)), axis=-1)

    has_tex = cols(range(W.ATTR_HASTEX.start, W.ATTR_HASTEX.stop))

    # ONE bilinear footprint over the co-located 9-channel material
    # atlas serves normal map + albedo + rough + metal (round-5
    # textured-path fix; scene/atlas.pack_material_textures — every
    # textured slot of a material holds the SAME rect, pick the first)
    from rustic_tpu.scene.atlas import CH_ALBEDO, CH_METAL, CH_NORMAL, CH_ROUGH

    ht = jnp.stack(has_tex, axis=-1)
    rect = jnp.where(
        ht[..., 0:1] != 0, slot(W.ATTR_ALBEDO),
        jnp.where(
            ht[..., 1:2] != 0, slot(W.ATTR_METAL),
            jnp.where(
                ht[..., 2:3] != 0, slot(W.ATTR_ROUGH),
                slot(W.ATTR_NORMTEX),
            ),
        ),
    )
    tex_rows = sample_atlas(atlas, rect, uv)

    # normal mapping (kernels/src/lib.rs:131-141)
    has_nm = has_tex[3] != 0
    nm = tex_rows[..., CH_NORMAL] * 2.0 - 1.0
    tan_rows = cols(range(18, 27))
    tangent = blend3(tan_rows)
    bitangent = _cross(tangent, normal)
    mapped = tuple(
        tangent[k] * nm[..., 0] + bitangent[k] * nm[..., 1]
        + normal[k] * nm[..., 2]
        for k in range(3)
    )
    # sampling.normalize parity: reciprocal of the clamped length
    inv_len = jnp.reciprocal(
        jnp.maximum(jnp.sqrt(_dot(mapped, mapped)), jnp.float32(1e-20))
    )
    mapped = tuple(m * inv_len for m in mapped)
    normal = tuple(jnp.where(has_nm, mapped[k], normal[k]) for k in range(3))

    # material scalars (bsdf.material_from_attrs parity; the kernel
    # applies the EPS clamps itself, so raw resolved values ship)
    alb_slot = slot(W.ATTR_ALBEDO)
    albedo = tuple(
        jnp.where(
            has_tex[0] != 0, tex_rows[..., CH_ALBEDO][..., k],
            alb_slot[..., k],
        )
        for k in range(3)
    )
    rough = jnp.where(
        has_tex[2] != 0, tex_rows[..., CH_ROUGH],
        slot(W.ATTR_ROUGH)[..., 0],
    )
    metal = jnp.where(
        has_tex[1] != 0, tex_rows[..., CH_METAL],
        slot(W.ATTR_METAL)[..., 0],
    )

    emis = cols(range(W.ATTR_EMISSIVE.start, W.ATTR_EMISSIVE.stop))
    trans, ior = cols((W.ATTR_TRANSMISSION, W.ATTR_IOR))

    zero = jnp.zeros((B,), jnp.float32)
    rows = (
        list(pos)
        + [normal[0], normal[1], normal[2]] * 3
        + list(emis)
        + list(albedo)
        + [rough, metal, trans, ior]
    )
    rows += [zero] * (W.SLIM_WIDTH - len(rows))
    return jnp.stack(rows)


def picked_light_rows_t(scene, bounce: int, sidx, offsets):
    """Pre-picked NEE light rows [NPICK, B] for the shade kernel's
    prepicked mode (scenes whose alias table exceeds the in-kernel
    select-sum width, shade_kernel.supported gates).

    Uses the SAME LDS draws the kernel's in-kernel pick would
    (dimensions dim0+3 / dim0+4 of the bounce's 8-dim block —
    trace.bounce_draws layout), so the picked light is identical; the
    row fetch is nee.resolve_entry_fields' gather path."""
    from rustic_tpu.ops import nee as nee_mod
    from rustic_tpu.ops import shade_kernel as SK
    from rustic_tpu.ops.rng import lds

    dim0 = SK._AA_DIMS + bounce * SK._DIMS_PER_BOUNCE + 1
    n1 = lds(sidx, dim0 + 3, offsets)
    n2 = lds(sidx, dim0 + 4, offsets)
    n_alias = scene.n_alias_entries
    entry = jnp.clip((n1 * n_alias).astype(jnp.int32), 0, n_alias - 1)
    f = nee_mod.resolve_entry_fields(scene, entry, n2)
    rows = (
        [f["area"], f["pdf"]]
        + [f["va"][:, d] for d in range(3)]
        + [f["vb"][:, d] for d in range(3)]
        + [f["vc"][:, d] for d in range(3)]
        + [f["normal"][:, d] for d in range(3)]
        + [f["emission"][:, d] for d in range(3)]
        + [f["tri_idx"].astype(jnp.float32)]
    )
    return jnp.stack(rows)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )
