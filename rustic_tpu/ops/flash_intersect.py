"""Flash intersection — the Pallas TPU kernel for ray/scene traversal.

The XLA formulation in ops/intersect.py materializes the [rays, tris]
Möller–Trumbore scalars in HBM, which makes traversal bandwidth-bound.
This kernel is the fused version: ray tiles and triangle tiles stream
through VMEM, the four pair-scalar blocks (det, u·det, v·det, t·det)
come off the MXU as [BT, TT] tiles, the epilogue and a *running
min-reduction over triangle tiles* happen in registers/VMEM, and only
the per-ray result (t, triangle index | occlusion bit) is ever written
to HBM — flash-attention's trick applied to ray casting.

Memory traffic per traversal: rays read once per triangle tile row,
triangles read once per ray tile row, outputs written once. No [B, T]
intermediate exists anywhere.

Layout contract (built in scene/world.py):
  ray features  F [B, 16] f32 = [rd, ro×rd, ro, 1, pad..]
  tri features  G [4, 16, T] f32, padded so G @ F gives
                (det, u_num, v_num, t_num) per pair; zero-padded
                triangle columns have det == 0 => never valid.
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

# Tile sizes: [BT, TT] f32 intermediates (~1 MB each) with a handful live
# keep VMEM use well under budget while giving the MXU [512,16]x[16,512].
DEF_BT = 512
DEF_TT = 512


def _pair_scalars(f_tile, g_ref):
    """MXU: [BT,16] x 4x[16,TT] -> det, u, v, t, valid ([BT, TT] each)."""
    det = jax.lax.dot_general(
        f_tile, g_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    u_num = jax.lax.dot_general(
        f_tile, g_ref[1],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    v_num = jax.lax.dot_general(
        f_tile, g_ref[2],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    t_num = jax.lax.dot_general(
        f_tile, g_ref[3],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    good = jnp.abs(det) >= DET_EPS
    inv = jnp.where(good, pl.reciprocal(jnp.where(good, det, 1.0)), 0.0)
    u = u_num * inv
    v = v_num * inv
    t = t_num * inv
    valid = good & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) & (t > EPS)
    return t, valid


def _pair_scalars_full(f_tile, g_ref):
    """Like _pair_scalars but also returns det, u, v (for attr output)."""
    det = jax.lax.dot_general(
        f_tile, g_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    u_num = jax.lax.dot_general(
        f_tile, g_ref[1],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    v_num = jax.lax.dot_general(
        f_tile, g_ref[2],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    t_num = jax.lax.dot_general(
        f_tile, g_ref[3],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    good = jnp.abs(det) >= DET_EPS
    inv = jnp.where(good, pl.reciprocal(jnp.where(good, det, 1.0)), 0.0)
    u = u_num * inv
    v = v_num * inv
    t = t_num * inv
    valid = good & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) & (t > EPS)
    return det, u, v, t, valid


def _nearest_kernel(f_ref, g_ref, attr_ref, t_ref, idx_ref, u_ref, v_ref, d_ref, out_attr_ref):
    """Nearest hit + gather-free attribute fetch.

    The per-tile winner's one-hot row (iota == argmin) doubles as the
    selector matmul that pulls the winning triangle's packed shading row
    out of the attribute table on the MXU — attribute "gathers" for free.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[...] = jnp.full_like(t_ref, BIG)
        idx_ref[...] = jnp.zeros_like(idx_ref)
        u_ref[...] = jnp.zeros_like(u_ref)
        v_ref[...] = jnp.zeros_like(v_ref)
        d_ref[...] = jnp.zeros_like(d_ref)
        out_attr_ref[...] = jnp.zeros_like(out_attr_ref)

    f_tile = f_ref[...]
    det, u, v, t, valid = _pair_scalars_full(f_tile, g_ref)
    tt = g_ref.shape[-1]
    tm = jnp.where(valid, t, BIG)
    tile_min = jnp.min(tm, axis=1)
    tile_arg = jnp.argmin(tm, axis=1).astype(jnp.int32)

    iota = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 1)
    one_hot = (iota == tile_arg[:, None]).astype(jnp.float32)
    u_best = jnp.sum(one_hot * u, axis=1)
    v_best = jnp.sum(one_hot * v, axis=1)
    d_best = jnp.sum(one_hot * det, axis=1)
    attr_best = jax.lax.dot_general(
        one_hot, attr_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    cur = t_ref[0, :]
    better = tile_min < cur
    t_ref[0, :] = jnp.where(better, tile_min, cur)
    idx_ref[0, :] = jnp.where(better, tile_arg + j * tt, idx_ref[0, :])
    u_ref[0, :] = jnp.where(better, u_best, u_ref[0, :])
    v_ref[0, :] = jnp.where(better, v_best, v_ref[0, :])
    d_ref[0, :] = jnp.where(better, d_best, d_ref[0, :])
    out_attr_ref[...] = jnp.where(
        better[:, None], attr_best, out_attr_ref[...]
    )


def _occlude_kernel(f_ref, maxt_ref, g_ref, occ_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        occ_ref[...] = jnp.zeros_like(occ_ref)

    t, valid = _pair_scalars(f_ref[...], g_ref)
    hit = valid & (t <= maxt_ref[0, :][:, None])
    any_hit = jnp.any(hit, axis=1).astype(jnp.int32)
    occ_ref[0, :] = occ_ref[0, :] | any_hit


def _pad_rays(feats, bt):
    b = feats.shape[0]
    pad = (-b) % bt
    if pad:
        feats = jnp.pad(feats, ((0, pad), (0, 0)))
    return feats, b, feats.shape[0] // bt


@functools.partial(jax.jit, static_argnames=("bt", "interpret"))
def flash_nearest(
    feats: jnp.ndarray,
    tri_feats16: jnp.ndarray,
    tri_attrs: jnp.ndarray,
    bt: int = DEF_BT,
    interpret: bool = False,
):
    """Nearest hit + winning triangle's packed shading row.

    Args:
      feats: [B, 16] ray features.
      tri_feats16: [4, 16, T_pad] triangle features, T_pad % tt == 0.
      tri_attrs: [T_pad, W] packed shading rows (scene/world.py ATTR_*).
    Returns:
      t [B] f32 (BIG when missed), idx [B] i32, u [B], v [B], det [B],
      attrs [B, W].
    """
    feats, b, nb = _pad_rays(feats, bt)
    t_pad = tri_feats16.shape[-1]
    tt = tile_size(t_pad)
    nt = t_pad // tt
    width = tri_attrs.shape[-1]

    outs = pl.pallas_call(
        _nearest_kernel,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((bt, 16), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 16, tt), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, width), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, width), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, nb * bt), jnp.float32),
            jax.ShapeDtypeStruct((1, nb * bt), jnp.int32),
            jax.ShapeDtypeStruct((1, nb * bt), jnp.float32),
            jax.ShapeDtypeStruct((1, nb * bt), jnp.float32),
            jax.ShapeDtypeStruct((1, nb * bt), jnp.float32),
            jax.ShapeDtypeStruct((nb * bt, width), jnp.float32),
        ],
        interpret=interpret,
    )(feats, tri_feats16, tri_attrs)
    t_out, idx_out, u_out, v_out, d_out, attr_out = outs
    return (
        t_out.reshape(-1)[:b],
        idx_out.reshape(-1)[:b],
        u_out.reshape(-1)[:b],
        v_out.reshape(-1)[:b],
        d_out.reshape(-1)[:b],
        attr_out[:b],
    )


@functools.partial(jax.jit, static_argnames=("bt", "interpret"))
def flash_occlude(
    feats: jnp.ndarray,
    max_t: jnp.ndarray,
    tri_feats16: jnp.ndarray,
    bt: int = DEF_BT,
    interpret: bool = False,
):
    """Any-hit within (EPS, max_t] -> [B] bool."""
    feats, b, nb = _pad_rays(feats, bt)
    maxt = jnp.pad(max_t, (0, feats.shape[0] - b), constant_values=-1.0)
    t_pad = tri_feats16.shape[-1]
    tt = tile_size(t_pad)
    nt = t_pad // tt

    occ = pl.pallas_call(
        _occlude_kernel,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((bt, 16), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 16, tt), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nb * bt), jnp.int32),
        interpret=interpret,
    )(feats, maxt.reshape(1, nb * bt), tri_feats16)
    return occ.reshape(-1)[:b] != 0


def padded_tri_count(t_count: int) -> int:
    """Pad to a lane multiple (128); beyond one tile, to a tile multiple."""
    if t_count <= DEF_TT:
        return -(-t_count // 128) * 128
    return -(-t_count // DEF_TT) * DEF_TT


def tile_size(t_pad: int) -> int:
    return min(t_pad, DEF_TT)


def pack_tri_feats16(tri_feats):
    """[10, T, 4] feature tensor (scene/world.py) -> [4, 16, T_pad]."""
    import numpy as np

    t_count = tri_feats.shape[1]
    t_pad = padded_tri_count(t_count)
    g = np.zeros((4, 16, t_pad), np.float32)
    g[:, :10, :t_count] = np.moveaxis(np.asarray(tri_feats), 2, 0)[:, :, :t_count]
    return g
