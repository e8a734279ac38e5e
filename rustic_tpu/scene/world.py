"""World assembly: GLB -> (BVH, light table, atlas, SoA device arrays).

The analog of the reference's `World::from_path` / `World::into_gpu`
pipeline (reference: src/asset.rs:55-235): load the scene, pack
textures, build the BVH (reordering the triangle buffer), build the
light-pick table from the *reordered* triangles, and upload flat arrays
to the device once. Scene data is read-only and replicated across chips.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax.numpy as jnp
from flax import struct

from rustic_tpu.scene import atlas as atlas_mod
from rustic_tpu.scene import bvh as bvh_mod
from rustic_tpu.scene import light_table as lt_mod
from rustic_tpu.scene.gltf import GltfScene, load_glb

ATLAS_SIZE = 4096  # reference: src/asset.rs:177

# Packed per-triangle shading-row layout (tri_attrs[:, i]):
ATTR_POS = slice(0, 9)  # vertex positions a,b,c
ATTR_NRM = slice(9, 18)  # vertex normals a,b,c
ATTR_TAN = slice(18, 27)  # vertex tangents a,b,c
ATTR_UV = slice(27, 33)  # vertex uv0 a,b,c
ATTR_EMISSIVE = slice(33, 36)
ATTR_ALBEDO = slice(36, 40)  # color or atlas uvst
ATTR_ROUGH = slice(40, 44)
ATTR_METAL = slice(44, 48)
ATTR_NORMTEX = slice(48, 52)
ATTR_HASTEX = slice(52, 56)  # albedo, metallic, roughness, normal flags
ATTR_TRANSMISSION = 56  # KHR_materials_transmission factor
ATTR_IOR = 57  # KHR_materials_ior
ATTR_WIDTH = 64

# Slim shading-row layout for UNTEXTURED scenes: the texture-only
# columns (tangents, uvs, atlas rects, has-tex flags) are dropped and
# the color/factor slots collapse to their scalar components, halving
# the per-winner attr row the flash kernels emit and the shade stages
# read back (HBM boundary traffic + in-kernel one-hot emission width).
# POS/NRM stay at the same offsets so the exact winner re-test
# (ops/intersect.py:refine_from_attrs) reads either layout unchanged;
# expand_slim_attrs() reconstitutes the full logical row (the dropped
# columns are all-zero for untextured scenes, so expansion is exact).
SLIM_EMISSIVE = slice(18, 21)
SLIM_ALBEDO = slice(21, 24)
SLIM_ROUGH = 24
SLIM_METAL = 25
SLIM_TRANSMISSION = 26
SLIM_IOR = 27
SLIM_WIDTH = 32


def slim_attr_table(attrs: "np.ndarray") -> "np.ndarray":
    """[T, ATTR_WIDTH] full shading rows -> [T, SLIM_WIDTH] (untextured)."""
    out = np.zeros((attrs.shape[0], SLIM_WIDTH), np.float32)
    out[:, 0:18] = attrs[:, 0:18]  # POS + NRM, same offsets
    out[:, SLIM_EMISSIVE] = attrs[:, ATTR_EMISSIVE]
    out[:, SLIM_ALBEDO] = attrs[:, ATTR_ALBEDO][:, :3]
    out[:, SLIM_ROUGH] = attrs[:, ATTR_ROUGH][:, 0]
    out[:, SLIM_METAL] = attrs[:, ATTR_METAL][:, 0]
    out[:, SLIM_TRANSMISSION] = attrs[:, ATTR_TRANSMISSION]
    out[:, SLIM_IOR] = attrs[:, ATTR_IOR]
    return out


def attr_is_slim(attrs) -> bool:
    """Static layout test for a per-lane shading-row batch."""
    return attrs.shape[-1] == SLIM_WIDTH


def attr_emissive(attrs):
    return attrs[:, SLIM_EMISSIVE if attr_is_slim(attrs) else ATTR_EMISSIVE]


def attr_albedo3(attrs):
    if attr_is_slim(attrs):
        return attrs[:, SLIM_ALBEDO]
    return attrs[:, ATTR_ALBEDO][:, :3]


def attr_rough_scalar(attrs):
    return attrs[:, SLIM_ROUGH if attr_is_slim(attrs) else ATTR_ROUGH.start]


def attr_metal_scalar(attrs):
    return attrs[:, SLIM_METAL if attr_is_slim(attrs) else ATTR_METAL.start]


def attr_transmission(attrs):
    return attrs[
        :, SLIM_TRANSMISSION if attr_is_slim(attrs) else ATTR_TRANSMISSION
    ]


def attr_ior(attrs):
    return attrs[:, SLIM_IOR if attr_is_slim(attrs) else ATTR_IOR]


def expand_slim_attrs(slim: jnp.ndarray) -> jnp.ndarray:
    """[B, SLIM_WIDTH] -> the full logical [B, ATTR_WIDTH] row. A pure
    column shuffle — XLA fuses it into the consumers, so only the slim
    row ever crosses an executable boundary. The scalar rough/metal
    broadcast across their four columns exactly as in the full table
    (slim rows exist only for untextured scenes); albedo alpha is
    reconstructed as 1 (no consumer reads it, and a rare base_color
    alpha != 1 would be the one inexact column); TAN/UV/NORMTEX/HASTEX
    genuinely are all-zero untextured."""
    b = slim.shape[0]
    z = lambda n: jnp.zeros((b, n), slim.dtype)
    # alpha = 1 on real rows only: unit vertex normals make the NRM
    # block nonzero for every real triangle, all-zero for padding rows,
    # which must stay bit-inert (test_attr_split_is_bit_exact).
    one = jnp.any(slim[:, 9:18] != 0, axis=1, keepdims=True).astype(slim.dtype)
    rough = slim[:, SLIM_ROUGH : SLIM_ROUGH + 1]
    metal = slim[:, SLIM_METAL : SLIM_METAL + 1]
    return jnp.concatenate(
        [
            slim[:, 0:18],  # POS + NRM
            z(15),  # TAN + UV
            slim[:, SLIM_EMISSIVE],
            slim[:, SLIM_ALBEDO], one,  # albedo alpha = 1
            jnp.tile(rough, (1, 4)),
            jnp.tile(metal, (1, 4)),
            z(8),  # NORMTEX + HASTEX
            slim[:, SLIM_TRANSMISSION : SLIM_IOR + 1],
            z(ATTR_WIDTH - 58),
        ],
        axis=-1,
    )

# Combined NEE entry rows (entry_rows[:, i]): everything one alias entry
# can resolve to, in a single row — one fetch per NEE sample covers the
# whole light-pick + light-geometry lookup.
ENTRY_AREA_A, ENTRY_PDF_A = 0, 1
ENTRY_AREA_B, ENTRY_PDF_B = 2, 3
ENTRY_RATIO = 4
ENTRY_A_VERTS = slice(8, 17)
ENTRY_A_NORMAL = slice(17, 20)
ENTRY_A_EMISSION = slice(20, 23)
ENTRY_A_TRI = 23
ENTRY_B_VERTS = slice(24, 33)
ENTRY_B_NORMAL = slice(33, 36)
ENTRY_B_EMISSION = slice(36, 39)
ENTRY_B_TRI = 39
ENTRY_WIDTH = 48


class SceneArrays(struct.PyTreeNode):
    """Device-resident scene: everything the integrator needs, SoA.

    The capability twin of the reference's GpuWorld (src/asset.rs:18-25)
    plus the precomputed "flash intersection" triangle features.
    """

    # geometry (per vertex)
    positions: jnp.ndarray  # [V, 3] f32
    normals: jnp.ndarray  # [V, 3] f32
    tangents: jnp.ndarray  # [V, 3] f32
    uv0: jnp.ndarray  # [V, 2] f32
    # triangles
    tri_vidx: jnp.ndarray  # [T, 3] i32 vertex indices
    tri_mat: jnp.ndarray  # [T] i32 material index
    # brute-force (MXU) intersection features: see ops/intersect.py
    tri_feats: jnp.ndarray  # [10, T, 4] f32
    # Pallas flash-intersection layout: see ops/flash_intersect.py
    tri_feats16: jnp.ndarray  # [4, 16, T_pad] f32
    # Packed per-triangle shading rows [T_pad, 64]: everything the shader
    # needs about a hit triangle in one row, fetched gather-free by the
    # flash kernel's hit-mask matmul (see ATTR_* layout constants below).
    tri_attrs: jnp.ndarray  # [T_pad, 64] f32
    # Bit-exact 3-part bf16 decomposition of tri_attrs (hi/mid/lo RNE
    # residuals of <=8 mantissa bits each, so hi+mid+lo == value in f32
    # exactly). Lets the shading row be fetched as THREE one-hot bf16
    # matmuls at full MXU utilization (~2 ms) instead of XLA's
    # per-row-latency-bound gather (~5 ms/M rows). Built only for small
    # scenes (one-hot width = T_pad); None otherwise.
    tri_attrs_split: Optional[jnp.ndarray]  # [3, T_pad, 64] bf16 or None
    # Combined NEE entry rows (ENTRY_* constants): one row per alias
    # entry resolves the light pick AND the picked light's geometry.
    entry_rows: jnp.ndarray  # [L_pad, 48] f32
    # Per-triangle-tile AABBs for kernel-side tile culling:
    tile_aabbs: jnp.ndarray  # [NT, 8] f32 (min xyz, pad, max xyz, pad)
    # BVH (SoA; leaf iff count > 0)
    bvh_min: jnp.ndarray  # [N, 3] f32
    bvh_max: jnp.ndarray  # [N, 3] f32
    bvh_left_first: jnp.ndarray  # [N] i32
    bvh_count: jnp.ndarray  # [N] i32
    # materials (each row is a color OR an atlas uvst rect;
    # has_texture flags say which — reference shared_structs/src/lib.rs:44-90)
    mat_emissive: jnp.ndarray  # [M, 3] f32
    mat_albedo: jnp.ndarray  # [M, 4] f32
    mat_roughness: jnp.ndarray  # [M, 4] f32
    mat_metallic: jnp.ndarray  # [M, 4] f32
    mat_normals: jnp.ndarray  # [M, 4] f32
    mat_has_tex: jnp.ndarray  # [M, 4] i32 (albedo, metallic, roughness, normal)
    # light-pick alias table (SoA LightPickEntry,
    # reference shared_structs/src/lib.rs:102-119)
    light_idx_a: jnp.ndarray  # [L] i32
    light_area_a: jnp.ndarray  # [L] f32
    light_pdf_a: jnp.ndarray  # [L] f32
    light_idx_b: jnp.ndarray  # [L] i32
    light_area_b: jnp.ndarray  # [L] f32
    light_pdf_b: jnp.ndarray  # [L] f32
    light_ratio: jnp.ndarray  # [L] f32 (<0 => sentinel)
    # images
    atlas: jnp.ndarray  # [Ha, Wa, 9] f32 co-located material maps (scene/atlas.py CH_*)
    skybox: jnp.ndarray  # [Hs, Ws, 4] f32

    # static metadata
    n_tris: int = struct.field(pytree_node=False, default=0)
    n_nodes: int = struct.field(pytree_node=False, default=0)
    n_alias_entries: int = struct.field(pytree_node=False, default=0)
    has_lights: bool = struct.field(pytree_node=False, default=False)
    has_textures: bool = struct.field(pytree_node=False, default=False)
    has_glass: bool = struct.field(pytree_node=False, default=False)


def _triangle_features(
    verts: np.ndarray, tri_vidx: np.ndarray
) -> np.ndarray:
    """Per-triangle feature tensor G[10, T, 4] for MXU intersection.

    The Möller–Trumbore scalars for every (ray, triangle) pair factor as
    one matmul F @ G with ray features F = [rd, ro×rd, ro, 1] (10) and
    per-triangle columns (det, u_num, v_num, t_num):

        det   = -rd·n                  (n = e1×e2)
        u_num =  (ro×rd)·e2 + rd·(a×e2)
        v_num = -(ro×rd)·e1 + rd·(e1×a)
        t_num =  ro·n - a·n

    with u = u_num/det, v = v_num/det, t = t_num/det — algebraically the
    same Möller–Trumbore the reference evaluates per pixel
    (reference: kernels/src/intersection.rs:9-54), restructured so the
    pair-wise work is a single [B,10]x[10,4T] contraction on the MXU.
    """
    a = verts[tri_vidx[:, 0]].astype(np.float64)
    b = verts[tri_vidx[:, 1]].astype(np.float64)
    c = verts[tri_vidx[:, 2]].astype(np.float64)
    e1 = b - a
    e2 = c - a
    n = np.cross(e1, e2)
    d0 = np.sum(a * n, axis=-1)

    t_count = len(tri_vidx)
    g = np.zeros((10, t_count, 4), np.float32)
    g[0:3, :, 0] = -n.T
    g[0:3, :, 1] = np.cross(a, e2).T
    g[3:6, :, 1] = e2.T
    g[0:3, :, 2] = np.cross(e1, a).T
    g[3:6, :, 2] = -e1.T
    g[6:9, :, 3] = n.T
    g[9, :, 3] = -d0
    return g


def _tile_aabbs(
    verts: np.ndarray, tri_vidx: np.ndarray, t_pad: int, tt: int
) -> np.ndarray:
    """Per-triangle-tile AABBs [nt, 8] = (min xyz, pad, max xyz, pad).

    Triangles are BVH-reordered, so consecutive tiles are spatially
    coherent and their boxes tight — the flash kernels slab-test a whole
    ray block against a tile box and skip the MXU work for tiles no ray
    can reach. Empty (padding-only) tiles get inverted boxes that never
    pass the test.
    """
    nt = t_pad // tt
    out = np.zeros((nt, 8), np.float32)
    out[:, 0:3] = np.inf
    out[:, 4:7] = -np.inf
    pts = verts[tri_vidx].astype(np.float32)  # [T, 3, 3]
    for j in range(nt):
        lo = j * tt
        hi = min(lo + tt, len(tri_vidx))
        if hi > lo:
            tile = pts[lo:hi].reshape(-1, 3)
            out[j, 0:3] = tile.min(axis=0)
            out[j, 4:7] = tile.max(axis=0)
    return out


# The in-kernel one-hot attr fetch is wired only into the single-tile
# flash kernels (the winner must be final when the row is selected),
# so the split table is built only for single-tile scenes.
ONEHOT_ATTRS_MAX_TPAD = 512


def _split_rows_bf16x3(rows: np.ndarray) -> Optional[np.ndarray]:
    """Bit-exact [3, T, W] bf16 decomposition of an f32 table, or None
    when exactness cannot be guaranteed (denormal parts).

    hi = rne_bf16(a), mid = rne_bf16(a - hi), lo = rne_bf16(rest): each
    residual carries <= 8 fresh mantissa bits, so a == (hi + mid) + lo
    in exact f32 arithmetic — verified element-wise below. A one-hot
    row-select matmul of each part is exact (single nonzero product),
    so three DEFAULT-precision MXU passes reconstruct the row
    bit-for-bit."""
    import ml_dtypes

    bf = ml_dtypes.bfloat16
    a = rows.astype(np.float32)
    hi = a.astype(bf)
    r1 = a - hi.astype(np.float32)
    mid = r1.astype(bf)
    lo = (r1 - mid.astype(np.float32)).astype(bf)
    rebuilt = (hi.astype(np.float32) + mid.astype(np.float32)) + lo.astype(
        np.float32
    )
    if not np.array_equal(rebuilt, a):
        return None
    # TPU flushes denormals the host reconstruction check can't see
    tiny = 2.0 ** -126
    for part in (hi, mid, lo):
        p = np.abs(part.astype(np.float32))
        if np.any((p > 0.0) & (p < tiny)):
            return None
    return np.stack([np.asarray(hi), np.asarray(mid), np.asarray(lo)])


def _fallback_skybox() -> np.ndarray:
    """2x2 magenta fallback (reference: src/asset.rs:275-289)."""
    px = np.array([1.0, 0.0, 1.0, 1.0], np.float32)
    return np.tile(px, (2, 2, 1))


def load_skybox_image(path: str) -> np.ndarray:
    """Load an equirect skybox (HDR or LDR) to float32 [H, W, 4]
    (reference: src/asset.rs:238-255)."""
    if path.lower().endswith(".npy"):
        img = np.asarray(np.load(path), np.float32)
        if img.shape[-1] == 3:
            img = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
        return img
    if path.lower().endswith(".hdr"):
        # Dedicated RGBE decoder: the available Python image stacks
        # either reject .hdr or silently tonemap it to uint8, losing the
        # radiance scale (reference decodes it natively via the image
        # crate, src/asset.rs:238-255).
        from rustic_tpu.utils.hdr import read_hdr

        img = read_hdr(path)
        return np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
    if path.lower().endswith(".exr"):
        import imageio.v3 as iio

        img = np.asarray(iio.imread(path), np.float32)
        if img.ndim == 2:
            img = img[..., None].repeat(3, axis=-1)
        if img.shape[-1] == 3:
            img = np.concatenate(
                [img, np.ones_like(img[..., :1])], axis=-1
            )
        return img
    from PIL import Image

    pil = Image.open(path).convert("RGBA")
    return np.asarray(pil, np.float32) / 255.0


class World:
    """Host-side scene bundle (NumPy) with `.to_device()` upload."""

    def __init__(self, gltf: GltfScene, atlas_size: int = ATLAS_SIZE):
        self.positions = gltf.positions
        self.normals = gltf.normals
        self.tangents = gltf.tangents
        self.uv0 = gltf.uv0
        triangles = gltf.triangles.copy()

        # ---- texture atlas --------------------------------------------------
        n_mats = len(gltf.materials)
        mat_transmission = np.zeros((n_mats, 2), np.float32)
        mat_emissive = np.zeros((n_mats, 3), np.float32)
        mat_albedo = np.zeros((n_mats, 4), np.float32)
        mat_roughness = np.zeros((n_mats, 4), np.float32)
        mat_metallic = np.zeros((n_mats, 4), np.float32)
        mat_normals = np.zeros((n_mats, 4), np.float32)
        mat_has_tex = np.zeros((n_mats, 4), np.int32)

        mat_maps: List[dict] = []
        for mi, m in enumerate(gltf.materials):
            mat_albedo[mi] = m.base_color
            mat_roughness[mi] = m.roughness
            mat_metallic[mi] = m.metallic
            mat_emissive[mi] = m.emissive
            mat_transmission[mi] = (m.transmission, m.ior)
            mat_maps.append({
                "albedo": m.albedo_texture,
                "metallic": m.metallic_texture,
                "roughness": m.roughness_texture,
                "normal": m.normal_texture,
            })

        if any(v is not None for maps in mat_maps for v in maps.values()):
            # Co-located 9-channel material atlas: every map of a
            # material shares ONE rect, so a single bilinear footprint
            # (4 row gathers) serves albedo+metal+rough+normal — the
            # round-5 textured-path fix (gather count bound BreakTime
            # at 0.43 Mpaths/s; see ops/texture.py, PERFORMANCE.md).
            # The reference packs per-texture rects into an RGBA8 atlas
            # (src/atlas.rs:26-90); capability is identical, layout is
            # the TPU-shaped one.
            atlas_img, mat_uvst = atlas_mod.pack_material_textures(
                mat_maps, atlas_size, atlas_size
            )
        else:
            atlas_img = np.zeros((4, 4, atlas_mod.ATLAS_CHANNELS), np.float32)
            mat_uvst = [None] * n_mats

        # Substitute the material's (shared) uvst rect into each
        # textured field slot (reference: src/asset.rs:179-192 — there
        # per-texture rects; here one rect per material)
        field_col = {"albedo": 0, "metallic": 1, "roughness": 2, "normal": 3}
        for mi, (maps, uvst) in enumerate(zip(mat_maps, mat_uvst)):
            for field, tex in maps.items():
                if tex is None:
                    continue
                mat_has_tex[mi, field_col[field]] = 1
                if field == "albedo":
                    mat_albedo[mi] = uvst
                elif field == "metallic":
                    mat_metallic[mi] = uvst
                elif field == "roughness":
                    mat_roughness[mi] = uvst
                else:
                    mat_normals[mi] = uvst

        # ---- BVH (reorders triangles) --------------------------------------
        self.bvh, perm = bvh_mod.build_bvh(self.positions, triangles)
        triangles = triangles[perm]
        self.triangles = triangles

        # ---- light table (on reordered triangles, like the reference:
        # src/asset.rs:194-203 builds BVH first, then the light table) -------
        mask = lt_mod.compute_emissive_mask(triangles, mat_emissive)
        self.light_table = lt_mod.build_light_table(
            self.positions, triangles, mask, mat_emissive
        )

        self.mat_emissive = mat_emissive
        self.mat_transmission = mat_transmission
        self.mat_albedo = mat_albedo
        self.mat_roughness = mat_roughness
        self.mat_metallic = mat_metallic
        self.mat_normals = mat_normals
        self.mat_has_tex = mat_has_tex
        self.atlas = atlas_img

        self.tri_feats = _triangle_features(self.positions, triangles[:, :3])
        from rustic_tpu.ops.flash_intersect import pack_tri_feats16

        self.tri_feats16 = pack_tri_feats16(self.tri_feats)
        from rustic_tpu.ops.flash_intersect import tile_size

        t_pad = self.tri_feats16.shape[-1] // 4
        self.tile_aabbs = _tile_aabbs(
            self.positions, triangles[:, :3], t_pad, tile_size(t_pad)
        )
        self._pack_shading_rows()

    def _pack_shading_rows(self):
        """Build the gather-free shading tables (see ATTR_*/LIGHT_*/ALIAS_*)."""
        tris = self.triangles
        t_count = len(tris)
        # tri_feats16's last dim is NT*4*TT (four numerator blocks per
        # tile); the attr table needs one row per padded TRIANGLE.
        t_pad = self.tri_feats16.shape[-1] // 4
        vi = tris[:, :3]
        mi = tris[:, 3]

        attrs = np.zeros((t_pad, ATTR_WIDTH), np.float32)
        attrs[:t_count, ATTR_POS] = self.positions[vi].reshape(t_count, 9)
        attrs[:t_count, ATTR_NRM] = self.normals[vi].reshape(t_count, 9)
        attrs[:t_count, ATTR_TAN] = self.tangents[vi].reshape(t_count, 9)
        attrs[:t_count, ATTR_UV] = self.uv0[vi].reshape(t_count, 6)
        attrs[:t_count, ATTR_EMISSIVE] = self.mat_emissive[mi]
        attrs[:t_count, ATTR_ALBEDO] = self.mat_albedo[mi]
        attrs[:t_count, ATTR_ROUGH] = self.mat_roughness[mi]
        attrs[:t_count, ATTR_METAL] = self.mat_metallic[mi]
        attrs[:t_count, ATTR_NORMTEX] = self.mat_normals[mi]
        attrs[:t_count, ATTR_HASTEX] = self.mat_has_tex[mi]
        attrs[:t_count, ATTR_TRANSMISSION] = self.mat_transmission[mi, 0]
        attrs[:t_count, ATTR_IOR] = self.mat_transmission[mi, 1]
        self.tri_attrs = attrs

        lt = self.light_table

        # Combined entry rows: alias scalars + both candidate triangles'
        # geometry, so one row fetch resolves an entire NEE light sample.
        la_pad = max(8, int(-(-len(lt) // 8) * 8))
        entries = np.zeros((la_pad, ENTRY_WIDTH), np.float32)
        n_e = len(lt)
        entries[:n_e, ENTRY_AREA_A] = lt.area_a
        entries[:n_e, ENTRY_PDF_A] = lt.pdf_a
        entries[:n_e, ENTRY_AREA_B] = lt.area_b
        entries[:n_e, ENTRY_PDF_B] = lt.pdf_b
        entries[:n_e, ENTRY_RATIO] = lt.ratio
        if not lt.is_sentinel:
            for side, idx_g in (("A", lt.idx_a), ("B", lt.idx_b)):
                gi = idx_g.astype(np.int64)
                svi = vi[gi]
                verts = self.positions[svi].reshape(n_e, 9)
                # UNNORMALIZED mean of vertex normals — deliberate parity
                # with the reference's light normal (kernels/src/
                # light_pick.rs:129, "(na+nb+nc)/3, lights can use flat
                # shading"); |n| < 1 on curved emitters skews the
                # area->solid-angle pdf exactly as it does there.
                nrm = self.normals[svi].mean(axis=1)
                emis = self.mat_emissive[mi[gi]]
                if side == "A":
                    entries[:n_e, ENTRY_A_VERTS] = verts
                    entries[:n_e, ENTRY_A_NORMAL] = nrm
                    entries[:n_e, ENTRY_A_EMISSION] = emis
                    entries[:n_e, ENTRY_A_TRI] = gi
                else:
                    entries[:n_e, ENTRY_B_VERTS] = verts
                    entries[:n_e, ENTRY_B_NORMAL] = nrm
                    entries[:n_e, ENTRY_B_EMISSION] = emis
                    entries[:n_e, ENTRY_B_TRI] = gi
        self.entry_rows = entries
        self.n_alias_entries = len(lt)

    @classmethod
    def from_path(cls, path: str) -> "World":
        """Load any supported scene format (.glb/.gltf/.obj — the
        reference gets its multi-format surface from assimp,
        reference: README.md:13)."""
        low = path.lower()
        if low.endswith(".obj"):
            from rustic_tpu.scene.obj import load_obj

            return cls(load_obj(path))
        if low.endswith(".stl"):
            from rustic_tpu.scene.mesh_formats import load_stl

            return cls(load_stl(path))
        if low.endswith(".ply"):
            from rustic_tpu.scene.mesh_formats import load_ply

            return cls(load_ply(path))
        if low.endswith(".fbx"):
            from rustic_tpu.scene.fbx import load_fbx

            return cls(load_fbx(path))
        return cls(load_glb(path))

    def to_device(self, skybox: Optional[np.ndarray] = None) -> SceneArrays:
        lt = self.light_table
        return SceneArrays(
            positions=jnp.asarray(self.positions),
            normals=jnp.asarray(self.normals),
            tangents=jnp.asarray(self.tangents),
            uv0=jnp.asarray(self.uv0),
            tri_vidx=jnp.asarray(self.triangles[:, :3], jnp.int32),
            tri_mat=jnp.asarray(self.triangles[:, 3], jnp.int32),
            tri_feats=jnp.asarray(self.tri_feats),
            tri_feats16=jnp.asarray(self.tri_feats16),
            tri_attrs=jnp.asarray(self.tri_attrs),
            tri_attrs_split=(
                jnp.asarray(split)
                if (
                    self.tri_attrs.shape[0] <= ONEHOT_ATTRS_MAX_TPAD
                    and (
                        split := _split_rows_bf16x3(
                            # untextured scenes emit the slim row (half
                            # the kernel output + boundary traffic)
                            self.tri_attrs
                            if self.mat_has_tex.any()
                            else slim_attr_table(self.tri_attrs)
                        )
                    )
                    is not None
                )
                else None
            ),
            bvh_min=jnp.asarray(self.bvh.aabb_min),
            bvh_max=jnp.asarray(self.bvh.aabb_max),
            bvh_left_first=jnp.asarray(self.bvh.left_first),
            bvh_count=jnp.asarray(self.bvh.count),
            mat_emissive=jnp.asarray(self.mat_emissive),
            mat_albedo=jnp.asarray(self.mat_albedo),
            mat_roughness=jnp.asarray(self.mat_roughness),
            mat_metallic=jnp.asarray(self.mat_metallic),
            mat_normals=jnp.asarray(self.mat_normals),
            mat_has_tex=jnp.asarray(self.mat_has_tex),
            entry_rows=jnp.asarray(self.entry_rows),
            tile_aabbs=jnp.asarray(self.tile_aabbs),
            n_alias_entries=self.n_alias_entries,
            light_idx_a=jnp.asarray(lt.idx_a),
            light_area_a=jnp.asarray(lt.area_a),
            light_pdf_a=jnp.asarray(lt.pdf_a),
            light_idx_b=jnp.asarray(lt.idx_b),
            light_area_b=jnp.asarray(lt.area_b),
            light_pdf_b=jnp.asarray(lt.pdf_b),
            light_ratio=jnp.asarray(lt.ratio),
            atlas=jnp.asarray(self.atlas),
            skybox=jnp.asarray(
                skybox if skybox is not None else _fallback_skybox()
            ),
            n_tris=len(self.triangles),
            n_nodes=self.bvh.n_nodes,
            has_lights=not lt.is_sentinel,
            has_textures=bool(self.mat_has_tex.any()),
            has_glass=bool((self.mat_transmission[:, 0] > 0.0).any()),
        )


def load_scene(
    scene_path: str, skybox_path: Optional[str] = None
) -> SceneArrays:
    """Convenience: GLB path (+ optional skybox image path) -> device arrays."""
    world = World.from_path(scene_path)
    skybox = load_skybox_image(skybox_path) if skybox_path else None
    return world.to_device(skybox)
