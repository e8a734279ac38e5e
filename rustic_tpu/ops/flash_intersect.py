"""Flash intersection — the Pallas TPU kernel for ray/scene traversal.

The XLA formulation in ops/intersect.py materializes the [rays, tris]
Möller–Trumbore scalars in HBM, which makes traversal bandwidth-bound.
This kernel is the fused version: ray tiles and triangle tiles stream
through VMEM, the four pair-scalar blocks (det, u·det, v·det, t·det)
come off the MXU as one [BT, 4·TT] tile, the epilogue and a *running
min-reduction over triangle tiles* happen on-chip, and only per-ray
results are written to HBM — flash-attention's trick applied to ray
casting. The winning triangle's packed shading row is pulled out of the
attribute table by a one-hot MXU matmul, so shading needs no gathers.

Layout contract (built in scene/world.py):
  ray features  F [B, 16] f32 = [rd, ro×rd, ro, 1, pad..]
  tri features  G [16, NT * 4 * TT] f32 — per triangle tile j the
                columns [j*4TT : (j+1)*4TT] hold the four numerator
                blocks [det | u | v | t], each TT wide. Zero-padded
                triangle columns have det == 0 => never valid.
  attr rows     A [T_pad, W] f32 packed shading rows (ATTR_* layout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rustic_tpu.ops.sampling import EPS

BIG = 1e6
DET_EPS = 1e-6

DEF_BT = 1024  # rays per tile
DEF_TT = 512  # triangles per tile


def padded_tri_count(t_count: int) -> int:
    """Pad to a lane multiple (128); beyond one tile, to a tile multiple."""
    if t_count <= DEF_TT:
        return -(-t_count // 128) * 128
    return -(-t_count // DEF_TT) * DEF_TT


def tile_size(t_pad: int) -> int:
    return min(t_pad, DEF_TT)


def pack_tri_feats16(tri_feats):
    """[10, T, 4] feature tensor (scene/world.py) -> [16, NT*4*TT]."""
    import numpy as np

    t_count = tri_feats.shape[1]
    t_pad = padded_tri_count(t_count)
    tt = tile_size(t_pad)
    nt = t_pad // tt
    g = np.zeros((16, nt, 4, tt), np.float32)
    src = np.moveaxis(np.asarray(tri_feats), 2, 0)  # [4, 10, T]
    for j in range(nt):
        cols = src[:, :, j * tt : (j + 1) * tt]
        g[: cols.shape[1], j, :, : cols.shape[2]] = np.moveaxis(cols, 0, 1)
    return g.reshape(16, nt * 4 * tt)


def _epilogue(raw, tt):
    """[BT, 4*TT] numerators -> det, u, v, t, valid ([BT, TT] each)."""
    det = raw[:, 0 * tt : 1 * tt]
    u_num = raw[:, 1 * tt : 2 * tt]
    v_num = raw[:, 2 * tt : 3 * tt]
    t_num = raw[:, 3 * tt : 4 * tt]
    good = jnp.abs(det) >= DET_EPS
    inv = jnp.where(good, pl.reciprocal(jnp.where(good, det, 1.0)), 0.0)
    u = u_num * inv
    v = v_num * inv
    t = t_num * inv
    valid = good & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) & (t > EPS)
    return det, u, v, t, valid


def _pair_dot(f_tile, g_block):
    # HIGHEST = full-f32 passes on the MXU (Mosaic supports only
    # DEFAULT/HIGHEST; DEFAULT's bf16 mantissa breaks EPS-scale geometry).
    return jax.lax.dot_general(
        f_tile,
        g_block,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _tile_winner(f_tile, g_block, attr_block, tt):
    """Nearest valid candidate of one tile: (t, index, packed attr row).

    u/v/backface are NOT reduced out of the pair grid — the winner's
    vertices ride in its attr row, and the consumer re-derives them with
    one exact f32 Möller–Trumbore (ops/intersect.py:refine_from_attrs).
    That trades three masked cross-lane reductions per tile step for ~30
    VPU ops per ray once per scan.
    """
    _, _, _, t, valid = _epilogue(_pair_dot(f_tile, g_block), tt)
    tm = jnp.where(valid, t, BIG)
    tile_min = jnp.min(tm, axis=1)
    tile_arg = jnp.argmin(tm, axis=1).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 1)
    one_hot = (iota == tile_arg[:, None]).astype(jnp.float32)

    def select(block, precision):
        return jax.lax.dot_general(
            one_hot,
            block,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    # The first 16 columns carry the vertex positions the f32 winner
    # re-test depends on — they must come through exactly (a DEFAULT
    # one-hot matmul bf16-rounds the selected values!). The remaining
    # shading columns tolerate bf16 selection.
    attr_best = jnp.concatenate(
        [
            select(attr_block[:, 0:16], jax.lax.Precision.HIGHEST),
            select(attr_block[:, 16:], jax.lax.Precision.DEFAULT),
        ],
        axis=1,
    )
    return tile_min, tile_arg, attr_best


def _nearest_kernel_single(f_ref, g_ref, attr_ref, t_ref, idx_ref, out_attr_ref):
    """One triangle tile: no running combine, outputs written once."""
    tt = attr_ref.shape[0]
    tile_min, tile_arg, attr_b = _tile_winner(
        f_ref[...], g_ref[...], attr_ref[...], tt
    )
    t_ref[0, :] = tile_min
    idx_ref[0, :] = tile_arg
    out_attr_ref[...] = attr_b


def _nearest_kernel_multi(f_ref, g_ref, attr_ref, aabb_ref, t_ref, idx_ref, out_attr_ref):
    j = pl.program_id(1)
    tt = attr_ref.shape[0]

    @pl.when(j == 0)
    def _():
        t_ref[...] = jnp.full_like(t_ref, BIG)
        idx_ref[...] = jnp.zeros_like(idx_ref)
        out_attr_ref[...] = jnp.zeros_like(out_attr_ref)

    f = f_ref[...]

    aabb_row = aabb_ref[pl.ds(j, 1), :][0, :]

    @pl.when(_tile_possible(f, aabb_row, t_ref[0, :]))
    def _():
        tile_min, tile_arg, attr_b = _tile_winner(
            f, g_ref[...], attr_ref[...], tt
        )
        better = tile_min < t_ref[0, :]
        t_ref[0, :] = jnp.where(better, tile_min, t_ref[0, :])
        idx_ref[0, :] = jnp.where(better, tile_arg + j * tt, idx_ref[0, :])
        out_attr_ref[...] = jnp.where(better[:, None], attr_b, out_attr_ref[...])


def _nearest_shadow_kernel_single(f_ref, sh_ref, g_ref, attr_ref, t_ref, idx_ref, out_attr_ref, occ_ref):
    """Merged scan: nearest hit for the current rays + any-hit for the
    previous bounce's shadow rays (max_t in feature column 10), sharing
    the triangle tile already resident in VMEM."""
    tt = attr_ref.shape[0]
    tile_min, tile_arg, attr_b = _tile_winner(
        f_ref[...], g_ref[...], attr_ref[...], tt
    )
    t_ref[0, :] = tile_min
    idx_ref[0, :] = tile_arg
    out_attr_ref[...] = attr_b

    sh = sh_ref[...]
    _, _, _, t_s, valid_s = _epilogue(_pair_dot(sh, g_ref[...]), tt)
    hit = valid_s & (t_s <= sh[:, 10][:, None])
    occ_ref[0, :] = jnp.any(hit, axis=1).astype(jnp.int32)


def _nearest_shadow_kernel_multi(f_ref, sh_ref, g_ref, attr_ref, aabb_ref, t_ref, idx_ref, out_attr_ref, occ_ref):
    j = pl.program_id(1)
    tt = attr_ref.shape[0]

    @pl.when(j == 0)
    def _():
        t_ref[...] = jnp.full_like(t_ref, BIG)
        idx_ref[...] = jnp.zeros_like(idx_ref)
        out_attr_ref[...] = jnp.zeros_like(out_attr_ref)
        occ_ref[...] = jnp.zeros_like(occ_ref)

    f = f_ref[...]
    sh = sh_ref[...]
    aabb_row = aabb_ref[pl.ds(j, 1), :][0, :]

    @pl.when(_tile_possible(f, aabb_row, t_ref[0, :]))
    def _():
        tile_min, tile_arg, attr_b = _tile_winner(f, g_ref[...], attr_ref[...], tt)
        better = tile_min < t_ref[0, :]
        t_ref[0, :] = jnp.where(better, tile_min, t_ref[0, :])
        idx_ref[0, :] = jnp.where(better, tile_arg + j * tt, idx_ref[0, :])
        out_attr_ref[...] = jnp.where(better[:, None], attr_b, out_attr_ref[...])

    @pl.when(_tile_possible(sh, aabb_row, sh[:, 10]))
    def _():
        _, _, _, t_s, valid_s = _epilogue(_pair_dot(sh, g_ref[...]), tt)
        hit = valid_s & (t_s <= sh[:, 10][:, None])
        occ_ref[0, :] = occ_ref[0, :] | jnp.any(hit, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("bt", "interpret"))
def flash_nearest_shadow(
    feats: jnp.ndarray,
    shadow_feats: jnp.ndarray,
    tri_feats16: jnp.ndarray,
    tri_attrs: jnp.ndarray,
    tile_aabbs: jnp.ndarray,
    bt: int = DEF_BT,
    interpret: bool = False,
):
    """Merged nearest(current rays) + occlusion(shadow rays from the
    previous bounce, max_t packed in column 10). Returns
    (t, idx, attrs, occluded)."""
    feats, b, nb = _pad_rays(feats, bt)
    shadow_feats = jnp.pad(shadow_feats, ((0, feats.shape[0] - b), (0, 0)))
    t_pad, tt, nt = _geometry(tri_feats16)
    width = tri_attrs.shape[-1]
    kernel = (
        _nearest_shadow_kernel_single if nt == 1 else _nearest_shadow_kernel_multi
    )
    in_specs = [
        pl.BlockSpec((bt, 16), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, 16), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((16, 4 * tt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((tt, width), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
    ]
    operands = [feats, shadow_feats, tri_feats16, tri_attrs]
    if nt > 1:
        in_specs.append(
            pl.BlockSpec((nt, 8), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(tile_aabbs)
    outs = pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, width), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, nb * bt), jnp.float32),
            jax.ShapeDtypeStruct((1, nb * bt), jnp.int32),
            jax.ShapeDtypeStruct((nb * bt, width), jnp.float32),
            jax.ShapeDtypeStruct((1, nb * bt), jnp.int32),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    t_out, idx_out, attr_out, occ_out = outs
    return (
        t_out.reshape(-1)[:b],
        idx_out.reshape(-1)[:b],
        attr_out[:b],
        occ_out.reshape(-1)[:b] != 0,
    )


def _occlude_kernel_packed_single(f_ref, g_ref, occ_ref):
    """Occlusion for packed shadow-feature blocks: max_t rides in
    feature column 10 (see ops/fused_bounce.py SH_MAXT_COL)."""
    tt = g_ref.shape[-1] // 4
    f = f_ref[...]
    _, _, _, t, valid = _epilogue(_pair_dot(f, g_ref[...]), tt)
    hit = valid & (t <= f[:, 10][:, None])
    occ_ref[0, :] = jnp.any(hit, axis=1).astype(jnp.int32)


def _occlude_kernel_packed_multi(f_ref, g_ref, aabb_ref, occ_ref):
    j = pl.program_id(1)
    tt = g_ref.shape[-1] // 4

    @pl.when(j == 0)
    def _():
        occ_ref[...] = jnp.zeros_like(occ_ref)

    f = f_ref[...]

    aabb_row = aabb_ref[pl.ds(j, 1), :][0, :]

    @pl.when(_tile_possible(f, aabb_row, f[:, 10]))
    def _():
        _, _, _, t, valid = _epilogue(_pair_dot(f, g_ref[...]), tt)
        hit = valid & (t <= f[:, 10][:, None])
        occ_ref[0, :] = occ_ref[0, :] | jnp.any(hit, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("bt", "interpret"))
def flash_occlude_packed(
    feats: jnp.ndarray,
    tri_feats16: jnp.ndarray,
    tile_aabbs: jnp.ndarray,
    bt: int = DEF_BT,
    interpret: bool = False,
):
    """Any-hit for packed shadow feature blocks -> [B] i32 (1=occluded)."""
    feats, b, nb = _pad_rays(feats, bt)
    t_pad, tt, nt = _geometry(tri_feats16)
    kernel = (
        _occlude_kernel_packed_single if nt == 1 else _occlude_kernel_packed_multi
    )
    in_specs = [
        pl.BlockSpec((bt, 16), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((16, 4 * tt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [feats, tri_feats16]
    if nt > 1:
        in_specs.append(
            pl.BlockSpec((nt, 8), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(tile_aabbs)
    occ = pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nb * bt), jnp.int32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return occ.reshape(-1)[:b]


def _occlude_kernel_single(f_ref, maxt_ref, g_ref, occ_ref):
    tt = g_ref.shape[-1] // 4
    _, _, _, t, valid = _epilogue(_pair_dot(f_ref[...], g_ref[...]), tt)
    hit = valid & (t <= maxt_ref[0, :][:, None])
    occ_ref[0, :] = jnp.any(hit, axis=1).astype(jnp.int32)


def _occlude_kernel_multi(f_ref, maxt_ref, g_ref, aabb_ref, occ_ref):
    j = pl.program_id(1)
    tt = g_ref.shape[-1] // 4

    @pl.when(j == 0)
    def _():
        occ_ref[...] = jnp.zeros_like(occ_ref)

    f = f_ref[...]
    maxt = maxt_ref[0, :]

    aabb_row = aabb_ref[pl.ds(j, 1), :][0, :]

    @pl.when(_tile_possible(f, aabb_row, maxt))
    def _():
        _, _, _, t, valid = _epilogue(_pair_dot(f, g_ref[...]), tt)
        hit = valid & (t <= maxt[:, None])
        occ_ref[0, :] = occ_ref[0, :] | jnp.any(hit, axis=1).astype(jnp.int32)


def _tile_possible(f, aabb_row, limit):
    """Can ANY ray in this block hit the tile AABB closer than its
    current limit? Scalar verdict for @pl.when tile culling. ~20 VPU ops
    per ray vs ~100 KFLOP of MXU work per skipped tile."""
    rd = f[:, 0:3]
    ro = f[:, 6:9]
    inv = jnp.where(jnp.abs(rd) < 1e-12, jnp.where(rd < 0, -1e12, 1e12), 1.0 / rd)
    t1 = (aabb_row[0:3] - ro) * inv
    t2 = (aabb_row[4:7] - ro) * inv
    lo = jnp.minimum(t1, t2)
    hi = jnp.maximum(t1, t2)
    tmin = jnp.maximum(jnp.maximum(lo[:, 0], lo[:, 1]), lo[:, 2])
    tmax = jnp.minimum(jnp.minimum(hi[:, 0], hi[:, 1]), hi[:, 2])
    ok = (tmax >= tmin) & (tmax > 0.0) & (tmin < limit)
    return jnp.any(ok)


def _pad_rays(feats, bt):
    b = feats.shape[0]
    pad = (-b) % bt
    if pad:
        feats = jnp.pad(feats, ((0, pad), (0, 0)))
    return feats, b, feats.shape[0] // bt


def _geometry(tri_feats16):
    total = tri_feats16.shape[-1]
    # total = nt * 4 * tt with tt = tile_size(t_pad), t_pad = nt * tt
    t_pad = total // 4
    tt = tile_size(t_pad)
    nt = t_pad // tt
    return t_pad, tt, nt


def pick_bt(tri_feats16) -> int:
    """Ray-block size heuristic for a scene's triangle-tile count.

    With a single triangle tile there is nothing to cull, so big blocks
    amortize grid overhead best. With several tiles, the per-block AABB
    slab test (_tile_possible) skips a tile only if NO ray in the block
    can reach it — smaller blocks make that test fine-grained enough to
    actually prune. Measured on v5e at 256x144x8spp: PBRTest (24k tris)
    1.22 -> 1.57 Mpaths/s at bt=256 vs 1024; the enclosed FurnaceTest
    pays -8% (nothing is cullable, pure grid overhead) — open scenes
    are the common case, so multi-tile defaults to 256.
    """
    _, _, nt = _geometry(tri_feats16)
    return DEF_BT if nt == 1 else 256


@functools.partial(jax.jit, static_argnames=("bt", "interpret"))
def flash_nearest(
    feats: jnp.ndarray,
    tri_feats16: jnp.ndarray,
    tri_attrs: jnp.ndarray,
    tile_aabbs: jnp.ndarray,
    bt: int = DEF_BT,
    interpret: bool = False,
):
    """Nearest hit + winning triangle's packed shading row.

    Returns t [B] (BIG when missed), idx [B] i32, attrs [B, W]. The
    winner's u/v/backface are re-derived exactly by the consumer from
    the attr row's vertices (refine_from_attrs) — cheaper than reducing
    them across triangle tiles in-kernel.
    """
    feats, b, nb = _pad_rays(feats, bt)
    t_pad, tt, nt = _geometry(tri_feats16)
    width = tri_attrs.shape[-1]
    kernel = _nearest_kernel_single if nt == 1 else _nearest_kernel_multi
    in_specs = [
        pl.BlockSpec((bt, 16), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((16, 4 * tt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((tt, width), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
    ]
    operands = [feats, tri_feats16, tri_attrs]
    if nt > 1:
        in_specs.append(
            pl.BlockSpec((nt, 8), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(tile_aabbs)

    outs = pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, width), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, nb * bt), jnp.float32),
            jax.ShapeDtypeStruct((1, nb * bt), jnp.int32),
            jax.ShapeDtypeStruct((nb * bt, width), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    t_out, idx_out, attr_out = outs
    return (
        t_out.reshape(-1)[:b],
        idx_out.reshape(-1)[:b],
        attr_out[:b],
    )


@functools.partial(jax.jit, static_argnames=("bt", "interpret"))
def flash_occlude(
    feats: jnp.ndarray,
    max_t: jnp.ndarray,
    tri_feats16: jnp.ndarray,
    tile_aabbs: jnp.ndarray,
    bt: int = DEF_BT,
    interpret: bool = False,
):
    """Any-hit within (EPS, max_t] -> [B] bool."""
    feats, b, nb = _pad_rays(feats, bt)
    maxt = jnp.pad(max_t, (0, feats.shape[0] - b), constant_values=-1.0)
    t_pad, tt, nt = _geometry(tri_feats16)
    kernel = _occlude_kernel_single if nt == 1 else _occlude_kernel_multi
    in_specs = [
        pl.BlockSpec((bt, 16), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((16, 4 * tt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [feats, maxt.reshape(1, nb * bt), tri_feats16]
    if nt > 1:
        in_specs.append(
            pl.BlockSpec((nt, 8), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(tile_aabbs)

    occ = pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nb * bt), jnp.int32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return occ.reshape(-1)[:b] != 0
