"""Ray-scene intersection, TPU-first.

Two interchangeable engines with the same interface:

1. `intersect_brute` — "flash intersection": Möller–Trumbore over *all*
   (ray, triangle) pairs as one matmul on the MXU plus an elementwise
   epilogue and a min-reduction. The pairwise scalars factor exactly as
   F @ G with F = [rd, ro×rd, ro, 1] per ray and a precomputed [10,4T]
   triangle tensor (see scene/world.py:_triangle_features). Rays are
   processed in chunks so the [chunk, T] intermediate stays on-chip
   sized. For the scene sizes the reference ships (hundreds to tens of
   thousands of triangles) this saturates the MXU and beats any
   divergent traversal on TPU by a wide margin.

2. `intersect_bvh` — semantics-faithful twin of the reference's ordered
   stackful traversal (reference: kernels/src/intersection.rs:177-234):
   every ray ("lane") keeps a fixed-depth stack; all lanes advance in
   lockstep inside one lax.while_loop, popping nodes / testing leaf
   triangles under masks. Scales to large scenes where brute force is
   quadratic-infeasible.

`intersect_nearest` / `intersect_any` pick the engine by triangle count
(static), mirroring the reference's two entry points
(kernels/src/intersection.rs:169-175).

Result convention matches the reference TraceResult
(kernels/src/intersection.rs:56-74): default t = 1e6 ("BIG"), a hit
requires t > 0.001 (EPS), backface = sign of the Möller–Trumbore
determinant, and any-hit additionally requires t <= max_t.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from rustic_tpu.ops.sampling import EPS, cross

BIG = 1e6  # reference: kernels/src/intersection.rs:69
DET_EPS = 1e-6  # reference: kernels/src/intersection.rs:23
STACK_DEPTH = 32  # reference: kernels/src/intersection.rs:178
# Triangle count at or below which brute force is used by `auto`.
# CPU `auto` crossover: measured on the XLA CPU backend (65536 rays),
# the lockstep BVH traversal beats brute force at EVERY shipped scene
# size (184 tris: 0.60 vs 0.85 s; 2932: 0.38 vs 3.2; 10240: 0.96 vs
# 10.1) — brute's [chunk, 4T] epilogue is memory-bound on host. Brute
# remains the explicit oracle engine (engine="brute") and the TPU
# formulation's basis; `auto` only keeps it for tiny scenes where BVH
# build/traversal bookkeeping cannot pay for itself.
BRUTE_FORCE_MAX_TRIS = 64
# Target f32 elements for one [chunk, 4T] intermediate (~64 MB).
_CHUNK_BUDGET = 1 << 24


class TraceResult(NamedTuple):
    t: jnp.ndarray  # [B] f32, BIG when missed
    tri_idx: jnp.ndarray  # [B] i32
    hit: jnp.ndarray  # [B] bool
    backface: jnp.ndarray  # [B] bool
    u: jnp.ndarray  # [B] f32 barycentric weight of vertex b
    v: jnp.ndarray  # [B] f32 barycentric weight of vertex c


def _ray_features(ro: jnp.ndarray, rd: jnp.ndarray) -> jnp.ndarray:
    ones = jnp.ones(ro.shape[:-1] + (1,), ro.dtype)
    return jnp.concatenate([rd, cross(ro, rd), ro, ones], axis=-1)


def _brute_chunk_size(n_tris: int, batch: int) -> int:
    per_ray = max(4 * n_tris, 1)
    chunk = max(_CHUNK_BUDGET // per_ray, 8)
    return min(chunk, max(batch, 1))


def _mt_scalars(feats: jnp.ndarray, tri_feats_flat: jnp.ndarray, n_tris: int):
    """[Bc,10] x [10,4T] -> det, u, v, t, valid-geometry mask, each [Bc, T]."""
    raw = jnp.dot(
        feats, tri_feats_flat, precision=lax.Precision.HIGHEST
    ).reshape(feats.shape[0], n_tris, 4)
    det = raw[..., 0]
    good_det = jnp.abs(det) >= DET_EPS
    inv_det = jnp.where(good_det, jnp.reciprocal(jnp.where(good_det, det, 1.0)), 0.0)
    u = raw[..., 1] * inv_det
    v = raw[..., 2] * inv_det
    t = raw[..., 3] * inv_det
    valid = (
        good_det
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > EPS)
    )
    return det, u, v, t, valid


def intersect_brute(
    tri_feats: jnp.ndarray, ro: jnp.ndarray, rd: jnp.ndarray
) -> TraceResult:
    """Nearest-hit over all triangles via the MXU. tri_feats: [10, T, 4]."""
    n_tris = tri_feats.shape[1]
    batch = ro.shape[0]
    tf = tri_feats.reshape(10, n_tris * 4)
    chunk = _brute_chunk_size(n_tris, batch)
    pad = (-batch) % chunk
    ro_p = jnp.pad(ro, ((0, pad), (0, 0)))
    rd_p = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)

    def body(args):
        ro_c, rd_c = args
        det, u, v, t, valid = _mt_scalars(_ray_features(ro_c, rd_c), tf, n_tris)
        t_masked = jnp.where(valid, t, BIG)
        idx = jnp.argmin(t_masked, axis=-1).astype(jnp.int32)
        tb = jnp.take_along_axis(t_masked, idx[:, None], axis=-1)[:, 0]
        db = jnp.take_along_axis(det, idx[:, None], axis=-1)[:, 0]
        ub = jnp.take_along_axis(u, idx[:, None], axis=-1)[:, 0]
        vb = jnp.take_along_axis(v, idx[:, None], axis=-1)[:, 0]
        hit = tb < BIG
        return tb, idx, hit, db < 0.0, ub, vb

    parts = lax.map(
        body,
        (
            ro_p.reshape(-1, chunk, 3),
            rd_p.reshape(-1, chunk, 3),
        ),
    )
    res = TraceResult(*(p.reshape(-1)[:batch] for p in parts))
    return res


def occlude_brute(
    tri_feats: jnp.ndarray,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    max_t: jnp.ndarray,
) -> jnp.ndarray:
    """Any-hit within (EPS, max_t] over all triangles. Returns [B] bool."""
    n_tris = tri_feats.shape[1]
    batch = ro.shape[0]
    tf = tri_feats.reshape(10, n_tris * 4)
    chunk = _brute_chunk_size(n_tris, batch)
    pad = (-batch) % chunk
    ro_p = jnp.pad(ro, ((0, pad), (0, 0)))
    rd_p = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
    mt_p = jnp.pad(max_t, (0, pad), constant_values=-1.0)

    def body(args):
        ro_c, rd_c, mt_c = args
        _, _, _, t, valid = _mt_scalars(_ray_features(ro_c, rd_c), tf, n_tris)
        return jnp.any(valid & (t <= mt_c[:, None]), axis=-1)

    occ = lax.map(
        body,
        (
            ro_p.reshape(-1, chunk, 3),
            rd_p.reshape(-1, chunk, 3),
            mt_p.reshape(-1, chunk),
        ),
    )
    return occ.reshape(-1)[:batch]


# ---------------------------------------------------------------------------
# BVH traversal engine
# ---------------------------------------------------------------------------


def _slab_test(lo, hi, ro, inv_rd, prev_t):
    """Slab AABB entry distance, +inf when missed
    (reference: kernels/src/intersection.rs:104-122)."""
    t1 = (lo - ro) * inv_rd
    t2 = (hi - ro) * inv_rd
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    ok = (tmax >= tmin) & (tmax > 0.0) & (tmin < prev_t)
    return jnp.where(ok, tmin, jnp.inf)


def _mt_single(a, b, c, ro, rd):
    """Möller–Trumbore for one gathered triangle per lane
    (reference: kernels/src/intersection.rs:9-54)."""
    e1 = b - a
    e2 = c - a
    pv = cross(rd, e2)
    det = jnp.sum(e1 * pv, axis=-1)
    backface = det < 0.0
    good = jnp.abs(det) >= DET_EPS
    inv_det = jnp.where(good, jnp.reciprocal(jnp.where(good, det, 1.0)), 0.0)
    tv = ro - a
    u = jnp.sum(tv * pv, axis=-1) * inv_det
    qv = cross(tv, e1)
    v = jnp.sum(rd * qv, axis=-1) * inv_det
    t = jnp.sum(e2 * qv, axis=-1) * inv_det
    valid = good & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0) & (t > EPS)
    return t, u, v, backface, valid


def _intersect_bvh_impl(scene, ro, rd, max_t, nearest: bool):
    batch = ro.shape[0]
    inv_rd = jnp.reciprocal(
        jnp.where(jnp.abs(rd) < 1e-12, jnp.where(rd < 0, -1e-12, 1e-12), rd)
    )
    lane = jnp.arange(batch)

    stack = jnp.zeros((batch, STACK_DEPTH), jnp.int32)  # root pre-pushed
    sp = jnp.ones(batch, jnp.int32)
    leaf_ptr = jnp.zeros(batch, jnp.int32)
    leaf_end = jnp.zeros(batch, jnp.int32)
    best_t = jnp.full(batch, BIG, jnp.float32)
    best_idx = jnp.zeros(batch, jnp.int32)
    best_back = jnp.zeros(batch, bool)
    best_u = jnp.zeros(batch, jnp.float32)
    best_v = jnp.zeros(batch, jnp.float32)
    done = jnp.zeros(batch, bool)  # any-hit early out

    def cond(state):
        sp, leaf_ptr, leaf_end, done = state[1], state[2], state[3], state[9]
        return jnp.any(~done & ((sp > 0) | (leaf_ptr < leaf_end)))

    def body(state):
        (
            stack,
            sp,
            leaf_ptr,
            leaf_end,
            best_t,
            best_idx,
            best_back,
            best_u,
            best_v,
            done,
        ) = state

        active = ~done
        in_leaf = active & (leaf_ptr < leaf_end)

        # --- leaf lanes: test one triangle ---------------------------------
        ti = jnp.clip(leaf_ptr, 0, scene.tri_vidx.shape[0] - 1)
        vidx = scene.tri_vidx[ti]
        a = scene.positions[vidx[:, 0]]
        b = scene.positions[vidx[:, 1]]
        c = scene.positions[vidx[:, 2]]
        t, u, v, backface, valid = _mt_single(a, b, c, ro, rd)
        better = in_leaf & valid & (t < best_t)
        if not nearest:
            better = better & (t <= max_t)
        best_t = jnp.where(better, t, best_t)
        best_idx = jnp.where(better, ti, best_idx)
        best_back = jnp.where(better, backface, best_back)
        best_u = jnp.where(better, u, best_u)
        best_v = jnp.where(better, v, best_v)
        if not nearest:
            done = done | better  # early-exit shadow rays
        leaf_ptr = leaf_ptr + in_leaf.astype(jnp.int32)

        # --- non-leaf lanes: pop a node ------------------------------------
        popping = active & ~in_leaf & (sp > 0)
        sp = sp - popping.astype(jnp.int32)
        node = stack[lane, jnp.clip(sp, 0, STACK_DEPTH - 1)]
        node = jnp.where(popping, node, 0)
        n_count = scene.bvh_count[node]
        n_left = scene.bvh_left_first[node]
        is_leaf = popping & (n_count > 0)

        # enter leaf: set the triangle cursor
        leaf_ptr = jnp.where(is_leaf, n_left, leaf_ptr)
        leaf_end = jnp.where(is_leaf, n_left + n_count, leaf_end)

        # internal: ordered push of both children
        # (reference: kernels/src/intersection.rs:206-230)
        internal = popping & (n_count == 0)
        li = n_left
        ri = n_left + 1
        ld = _slab_test(
            scene.bvh_min[li], scene.bvh_max[li], ro, inv_rd, best_t
        )
        rdist = _slab_test(
            scene.bvh_min[ri], scene.bvh_max[ri], ro, inv_rd, best_t
        )
        swap = ld > rdist
        near_i = jnp.where(swap, ri, li)
        far_i = jnp.where(swap, li, ri)
        near_d = jnp.minimum(ld, rdist)
        far_d = jnp.maximum(ld, rdist)

        push_far = internal & jnp.isfinite(far_d) & (sp < STACK_DEPTH)
        stack = stack.at[lane, jnp.clip(sp, 0, STACK_DEPTH - 1)].set(
            jnp.where(push_far, far_i, stack[lane, jnp.clip(sp, 0, STACK_DEPTH - 1)])
        )
        sp = sp + push_far.astype(jnp.int32)
        push_near = internal & jnp.isfinite(near_d) & (sp < STACK_DEPTH)
        stack = stack.at[lane, jnp.clip(sp, 0, STACK_DEPTH - 1)].set(
            jnp.where(push_near, near_i, stack[lane, jnp.clip(sp, 0, STACK_DEPTH - 1)])
        )
        sp = sp + push_near.astype(jnp.int32)

        return (
            stack,
            sp,
            leaf_ptr,
            leaf_end,
            best_t,
            best_idx,
            best_back,
            best_u,
            best_v,
            done,
        )

    state = (
        stack,
        sp,
        leaf_ptr,
        leaf_end,
        best_t,
        best_idx,
        best_back,
        best_u,
        best_v,
        done,
    )
    state = lax.while_loop(cond, body, state)
    best_t, best_idx, best_back, best_u, best_v = state[4:9]
    hit = best_t < BIG
    return TraceResult(best_t, best_idx, hit, best_back, best_u, best_v)


def intersect_bvh(scene, ro, rd) -> TraceResult:
    return _intersect_bvh_impl(scene, ro, rd, None, nearest=True)


def occlude_bvh(scene, ro, rd, max_t) -> jnp.ndarray:
    return _intersect_bvh_impl(scene, ro, rd, max_t, nearest=False).hit


# ---------------------------------------------------------------------------
# Pallas flash engine (TPU fused kernel; interpreted elsewhere)
# ---------------------------------------------------------------------------


def _ray_features16(ro, rd, maxt=None):
    # One concatenate including the zero pad columns: a separate
    # jnp.pad materializes the whole [B, 16] block a second time
    # (measured 0.36 ms per build at 1.84M lanes on v5e). `maxt` fills
    # the shadow-ray column (flash_intersect.SH_MAXT_COL == 10)
    # directly — an .at[:, 10].set() after the fact copies the whole
    # [B, 16] block again (~1.2 ms at 3.7M lanes).
    ones = jnp.ones(ro.shape[:-1] + (1,), ro.dtype)
    if maxt is None:
        tail = jnp.zeros(ro.shape[:-1] + (6,), ro.dtype)
        return jnp.concatenate([rd, cross(ro, rd), ro, ones, tail], axis=-1)
    tail = jnp.zeros(ro.shape[:-1] + (5,), ro.dtype)
    return jnp.concatenate(
        [rd, cross(ro, rd), ro, ones, maxt[..., None], tail], axis=-1
    )


def refine_from_attrs(attrs, ro, rd):
    """Exact f32 Möller–Trumbore of a per-ray candidate whose vertices
    ride in its packed attr row (columns 0:9 = a,b,c) — no gathers."""
    return _mt_single(attrs[:, 0:3], attrs[:, 3:6], attrs[:, 6:9], ro, rd)


def gather_attr_rows(scene, idx):
    """The winning triangles' packed shading rows — ONE XLA row gather.

    An XLA-level one-hot matmul over the bit-exact bf16 split was
    measured NOT faster (6.0 vs 5.0 ms at B=0.92M): the [B, T_pad]
    one-hot operand round-trips HBM once per pass. The split table
    (scene.tri_attrs_split) pays off only where the one-hot never
    leaves VMEM — inside the single-tile flash kernels, which emit the
    winner's row directly (ops/flash_intersect.py)."""
    return scene.tri_attrs[jnp.clip(idx, 0, scene.tri_attrs.shape[0] - 1)]


def classify_flash_hit(t_kernel, idx, attrs, ro, rd, trust_kernel: bool = False,
                       edge_margin: float = 0.0):
    """Turn a flash-kernel winner (t_kernel, gathered attr row) into an
    exact TraceResult via one f32 re-test of that triangle.

    trust_kernel=False (the default for every precision): a winner the
    exact re-test rejects is a miss. With an f32 kernel scan this is
    vanishingly rare; with the (correctly compensated) bf16x3 scan it is
    rare enough that dropping the path costs <0.3% energy and beats the
    alternative below on outlier count (measured: px>0.1 error 0.07% vs
    0.29% at 64spp).
    edge_margin > 0 (split-window scans without a top-2 carry, i.e.
    "mixed2"): a winner whose exact barycentrics land within the margin
    OUTSIDE the simplex is a real near-edge crossing the kernel's
    epsilon-expanded window admitted — accept it with clamped u/v
    (sub-noise geometric shift) instead of dropping the path. The
    kernel's t ranking is exact under mixed2, so this never shadows a
    nearer true hit.
    trust_kernel=True (experimental): the kernel's hit verdict stands —
    barycentrics are clamped into the simplex and the kernel's t is used
    where the re-test's is unusable, trading lost paths for a sub-pixel
    geometric blur at triangle seams. Was required when the bf16 split
    was silently broken (see split_bf16); kept for experiments.
    """
    t2, u, v, backface, valid = refine_from_attrs(attrs, ro, rd)
    kernel_hit = t_kernel < BIG
    if not trust_kernel:
        if edge_margin > 0.0:
            m = edge_margin
            near_edge = (
                (u >= -m) & (v >= -m) & (u + v <= 1.0 + m) & (t2 > EPS)
            )
            valid = valid | near_edge
            u = jnp.clip(u, 0.0, 1.0)
            v = jnp.clip(v, 0.0, 1.0 - u)
        hit = kernel_hit & valid
        return TraceResult(
            jnp.where(hit, t2, BIG), idx, hit, backface & hit, u, v
        )
    hit = kernel_hit
    u = jnp.clip(u, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0 - u)
    t = jnp.where(valid, t2, jnp.maximum(t_kernel, EPS * 2.0))
    return TraceResult(jnp.where(hit, t, BIG), idx, hit, backface & hit, u, v)


def classify_flash_hit2(t1k, i1, attrs1, t2k, i2, attrs2, ro, rd,
                        edge_margin: float = 0.0):
    """Resolve a top-2 flash winner pair into an exact TraceResult plus
    the chosen triangle's attr row.

    Both candidates are re-tested in exact f32 (refine_from_attrs) and
    the nearer VALID one wins — so a noisy-ranked pair (the bf16x3
    scan's failure mode) still yields the exact nearest hit unless the
    true winner was ranked third. Falls back to the single-candidate
    classify when the kernel carried no second candidate."""
    if t2k is None:
        return (
            classify_flash_hit(t1k, i1, attrs1, ro, rd,
                               edge_margin=edge_margin),
            attrs1,
        )
    ta, ua, va, bfa, vala = refine_from_attrs(attrs1, ro, rd)
    tb, ub, vb, bfb, valb = refine_from_attrs(attrs2, ro, rd)
    hita = (t1k < BIG) & vala
    hitb = (t2k < BIG) & valb
    useb = hitb & (~hita | (tb < ta))
    hit = hita | hitb
    t = jnp.where(useb, tb, ta)
    res = TraceResult(
        jnp.where(hit, t, BIG),
        jnp.where(useb, i2, i1),
        hit,
        jnp.where(useb, bfb, bfa) & hit,
        jnp.where(useb, ub, ua),
        jnp.where(useb, vb, va),
    )
    return res, jnp.where(useb[:, None], attrs2, attrs1)


def intersect_flash_attrs(scene, ro, rd, interpret: bool = False):
    """Nearest hit via the fused Pallas kernel (ops/flash_intersect.py).
    Returns (TraceResult, attrs [B, ATTR_WIDTH]) — the winning triangle's
    packed shading row comes from one row gather, so shading needs no
    further gathers; u/v/backface come from one exact re-test of the
    winner."""
    from rustic_tpu.ops.flash_intersect import (
        flash_nearest,
        flash_nearest_attrs,
        near_edge_margin,
        resolve_precision,
    )

    prec = resolve_precision("auto", interpret)
    margin = near_edge_margin(prec)
    if scene.tri_attrs_split is not None:
        t, idx, attrs, t2, i2, attrs2 = flash_nearest_attrs(
            _ray_features16(ro, rd),
            scene.tri_feats16,
            scene.tile_aabbs,
            scene.tri_attrs_split,
            interpret=interpret,
            precision=prec,
        )
        res, win = classify_flash_hit2(
            t, idx, attrs, t2, i2, attrs2, ro, rd, edge_margin=margin
        )
        # slim untextured rows pass through unexpanded — bounce_pre reads
        # either layout natively (scene/world.py attr_* accessors)
        return res, win
    t, idx, t2, i2 = flash_nearest(
        _ray_features16(ro, rd),
        scene.tri_feats16,
        scene.tile_aabbs,
        interpret=interpret,
        precision=prec,
    )
    attrs = gather_attr_rows(scene, idx)
    attrs2 = None if t2 is None else gather_attr_rows(scene, i2)
    return classify_flash_hit2(
        t, idx, attrs, t2, i2, attrs2, ro, rd, edge_margin=margin
    )


def intersect_flash(scene, ro, rd, interpret: bool = False) -> TraceResult:
    return intersect_flash_attrs(scene, ro, rd, interpret=interpret)[0]


def occlude_flash(scene, ro, rd, max_t, interpret: bool = False) -> jnp.ndarray:
    from rustic_tpu.ops.flash_intersect import flash_occlude_packed

    return (
        flash_occlude_packed(
            _ray_features16(ro, rd, max_t), scene.tri_feats16,
            scene.tile_aabbs, interpret=interpret,
        )
        != 0
    )


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def _pick_engine(scene, engine: str) -> str:
    if engine != "auto":
        return engine
    if jax.default_backend() == "tpu":
        return "flash"
    return "brute" if scene.n_tris <= BRUTE_FORCE_MAX_TRIS else "bvh"


def intersect_nearest(scene, ro, rd, engine: str = "auto") -> TraceResult:
    """Nearest hit (reference: kernels/src/intersection.rs:169-171)."""
    engine = _pick_engine(scene, engine)
    if engine == "flash":
        return intersect_flash(scene, ro, rd, interpret=jax.default_backend() != "tpu")
    if engine == "brute":
        return intersect_brute(scene.tri_feats, ro, rd)
    return intersect_bvh(scene, ro, rd)


def intersect_any(scene, ro, rd, max_t, engine: str = "auto") -> jnp.ndarray:
    """Occlusion within (EPS, max_t] (reference: kernels/src/intersection.rs:173-175)."""
    engine = _pick_engine(scene, engine)
    if engine == "flash":
        return occlude_flash(scene, ro, rd, max_t, interpret=jax.default_backend() != "tpu")
    if engine == "brute":
        return occlude_brute(scene.tri_feats, ro, rd, max_t)
    return occlude_bvh(scene, ro, rd, max_t)
