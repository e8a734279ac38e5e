"""Staged render pipeline: the TPU fast path.

Architecturally this is the wavefront integrator of ops/trace.py with
the intersection kernels hoisted into their own executables. Per sample:
[init] -> [flash nearest] -> per bounce b>=1: [shade bounce b-1] ->
[merged nearest(b) + shadow-occlude(b-1)] -> ... -> [final occlude] ->
[finish]. The previous bounce's shadow rays ride along in the next
bounce's nearest kernel (flash_nearest_shadow) since both ray sets
stream the same triangle tiles — halving the intersection dispatches.
All launches are queued asynchronously; the host never blocks until
readback.

Why not one fused program? Measured (2026-08): a single jitted program
containing the Pallas custom calls plus the XLA shade stages compiles
on the axon runtime but *executes* 4-5x slower than these separately
dispatched stages (1.07 vs 5.10 Mpaths/s at B=2^18 on DarkCornell,
bit-identical output) — XLA's scheduling around in-loop Mosaic custom
calls inserts large copies and serializes poorly. Separate executables
also reuse compiled stages across scenes with equal shapes. The stage
functions themselves are shared verbatim with the fused driver, so the
CPU test suite exercises exactly the math that runs here.
"""

from __future__ import annotations

import functools
import os
import warnings
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from jax.sharding import PartitionSpec as _P

from rustic_tpu.config import StaticConfig
from rustic_tpu.ops import trace as trace_mod
from rustic_tpu.ops.flash_intersect import (
    DEF_BT,
    flash_nearest,
    flash_nearest_attrs,
    flash_nearest_shadow,
    flash_nearest_shadow_attrs,
    flash_occlude_packed,
    pick_bt,
)

# Re-sort paths by origin locality each bounce so ray blocks stay
# coherent for the kernels' tile culling (multi-tile scenes only; the
# single-tile staged path is untouched). Measured on v5e at
# 256x144x8spp: PBRTest 1.60 -> 2.47 Mpaths/s, FurnaceTest
# 1.12 -> 3.16. Set RUSTIC_SORT_PATHS=0 to disable.
_SORT_PATHS = os.environ.get("RUSTIC_SORT_PATHS", "1") == "1"
from rustic_tpu.ops.flash_intersect import (
    _plan_for,
    near_edge_margin,
    resolve_precision,
)
from rustic_tpu.ops.intersect import (
    _ray_features16,
    classify_flash_hit,
    classify_flash_hit2,
    gather_attr_rows,
)


# Lane budgets for sample folding. The sorted (multi-tile) path packs
# every per-lane carry into wide [B, ~130-200] permute intermediates,
# so its HBM footprint per lane is several times the unsorted path's —
# observed RESOURCE_EXHAUSTED at 1.18M sorted lanes (fold 8 x 147k px).
# Unsorted budget measured on v5e (DarkCornell 1280x720x160spp):
# fold 2 -> 7.9, fold 4 -> 8.7-9.1, fold 8 -> 8.1 Mpaths/s, so the
# budget admits fold 4 at megabatch sizes and no more.
_FOLD_MAX_LANES = 1 << 22  # unsorted (~4M paths -> fold 4 at 1M px)
_FOLD_MAX_LANES_SORTED = 1 << 19


# Queue at most this many fold-groups before hard-syncing on the film:
# the tunnel runtime otherwise accumulates every queued group's
# intermediates in HBM (observed: RESOURCE_EXHAUSTED at 256 spp x 1.18M
# lanes on the sorted path). A sync every few groups bounds live memory
# while keeping enough dispatch depth to hide host latency. The sorted
# path's fatter per-lane footprint gets the tighter bound; the unsorted
# depth is measured (queue 4 -> 8.67, 8 -> 9.11, 16 -> 9.04 Mpaths/s).
_THROTTLE_GROUPS = int(os.environ.get("RUSTIC_QUEUE_GROUPS", "8"))
_THROTTLE_GROUPS_SORTED = int(
    os.environ.get("RUSTIC_QUEUE_GROUPS_SORTED", "4")
)


def _throttle(film, group_index: int, groups: int = None):
    limit = _THROTTLE_GROUPS if groups is None else groups
    if limit > 0 and (group_index + 1) % limit == 0:
        # np.asarray on a tiny slice forces execution of the whole queued
        # chain (jax.block_until_ready can return early on axon)
        np.asarray(film[:1])


def _fold_sample_idx(sample_idx, lanes: int, fold: int):
    """Per-lane sample indices for a folded lane set: lane block k of
    size lanes/fold traces sample sample_idx + k."""
    if fold == 1:
        return sample_idx
    return sample_idx + jnp.repeat(
        jnp.arange(fold, dtype=jnp.uint32), lanes // fold
    )


def pick_sample_fold(batch: int, n_samples: int,
                     sorted_path: bool = False) -> int:
    """How many consecutive samples to fold into one lane set.

    Folding multiplies every stage's lane count, so each of the ~11
    dispatches per bounce-chain serves `fold` samples — the lever for
    the per-dispatch runtime overhead that dominates once kernels are
    fast (measured ~40% of wall time at 0.92M single-sample lanes).
    Capped by a lane budget (HBM + compile-shape growth) and by the
    sample count. $RUSTIC_SAMPLE_FOLD overrides.
    """
    env = os.environ.get("RUSTIC_SAMPLE_FOLD")
    if env:
        return max(1, min(int(env), max(n_samples, 1)))
    budget = _FOLD_MAX_LANES_SORTED if sorted_path else _FOLD_MAX_LANES
    f = max(1, budget // max(batch, 1))
    return min(f, 8, max(n_samples, 1))


def _tile_inputs(arrs, fold: int):
    if fold == 1:
        return arrs
    return tuple(jnp.tile(a, fold) for a in arrs)


def _shadow_feats16(nee_pack):
    """Shadow rays as packed feature rows, max_t in SH_MAXT_COL."""
    return _ray_features16(
        nee_pack.shadow_ro, nee_pack.shadow_rd, nee_pack.shadow_maxt
    )


def _fold_slim_nee(radiance, prev_nee, prev_occ):
    """Fold the last bounce's slim NEE carry (eligible, contribution)
    into the radiance (the tail of trace.bounce_post)."""
    if prev_nee is None:
        return radiance
    from rustic_tpu.ops import sampling as s

    eligible, contribution = prev_nee
    lit = eligible & ~prev_occ
    return radiance + jnp.where(lit[..., None], s.mask_nan(contribution), 0.0)


def _sort_perm(scene, st, sentinel_dead):
    """Spatial-coherence sort key: origin cell (4-bit/axis Morton) major,
    direction octant minor, retired lanes last. Blocks of consecutive
    rays then share origin locality, so the per-block tile-AABB slab
    test in the flash kernels actually prunes (see pick_bt)."""
    return _sort_perm_rays(scene, st.ro, st.rd, sentinel_dead)


def _sort_perm_rays(scene, ro, rd, sentinel_dead):
    """_sort_perm on bare [B, 3] ray arrays (the kernel-shade multi-tile
    driver carries rays in feature rows, not a TraceState)."""
    aabb = scene.tile_aabbs
    lo = jnp.min(aabb[:, 0:3], axis=0)
    hi = jnp.max(aabb[:, 4:7], axis=0)
    span = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(((ro - lo) / span * 16.0).astype(jnp.int32), 0, 15)

    def spread4(v):  # 4-bit Morton spread: b3 b2 b1 b0 -> bits 9,6,3,0
        return ((v & 8) << 6) | ((v & 4) << 4) | ((v & 2) << 2) | (v & 1)

    morton = (
        (spread4(q[:, 0]) << 2) | (spread4(q[:, 1]) << 1) | spread4(q[:, 2])
    )
    octant = (
        ((rd[:, 0] > 0).astype(jnp.int32) << 2)
        | ((rd[:, 1] > 0).astype(jnp.int32) << 1)
        | (rd[:, 2] > 0).astype(jnp.int32)
    )
    dead = jnp.where(sentinel_dead, 1, 0).astype(jnp.int32)
    key = (dead << 16) | (morton << 3) | octant
    return jnp.argsort(key)


def _permute_lanes(perm, tree):
    """Apply one lane permutation with exactly ONE row gather: every
    leaf rides in one packed [B, W] f32 matrix (XLA TPU gather cost is
    flat in row width but linear in gather count). Non-f32 leaves
    round-trip through f32 — exact for the bool masks and the i32
    indices here, which stay far below 2^24. u32 leaves (the full-range
    RNG offsets) ride as two 16-bit-half f32 columns, so they survive
    bit-exactly."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    meta, cols = [], []
    for a in leaves:
        a2 = a[:, None] if a.ndim == 1 else a
        if a.dtype == jnp.uint32:
            meta.append((a.dtype, a.ndim, a2.shape[1]))
            cols.append((a2 & jnp.uint32(0xFFFF)).astype(jnp.float32))
            cols.append((a2 >> 16).astype(jnp.float32))
        else:
            meta.append((a.dtype, a.ndim, a2.shape[1]))
            cols.append(a2.astype(jnp.float32))
    packed = jnp.concatenate(cols, axis=1)[perm]
    out, o = [], 0
    for dtype, ndim, w in meta:
        if dtype == jnp.uint32:
            lo = packed[:, o : o + w].astype(jnp.uint32)
            hi = packed[:, o + w : o + 2 * w].astype(jnp.uint32)
            sl = lo | (hi << 16)
            o += 2 * w
        else:
            sl = packed[:, o : o + w]
            o += w
            if dtype != jnp.float32:
                sl = sl.astype(dtype)
        out.append(sl[:, 0] if ndim == 1 else sl)
    return jax.tree_util.tree_unflatten(treedef, out)


def _sentinel_feats(feats, dead):
    """Replace retired lanes' ray features with a ray far outside every
    tile AABB, so fully-retired blocks fail the slab test and skip all
    MXU work. max_t (col 10) goes to -1 so any-hit can never trigger."""
    row = _ray_features16(
        jnp.full((1, 3), 1e7, jnp.float32),
        jnp.concatenate(
            [jnp.ones((1, 1), jnp.float32), jnp.zeros((1, 2), jnp.float32)],
            axis=1,
        ),
    )
    row = row.at[0, 10].set(-1.0)
    return jnp.where(dead[:, None], row, feats)


# Buffer donation measured HARMFUL on the axon runtime (2026-08-19,
# tools/boundary_probe.py): a donated dispatch pays ~2.2-3.4 ms of
# extra boundary cost vs ~0.2-0.3 ms non-donated — across ~11 staged
# dispatches per sample that tax WAS the "dispatch residual" of
# PERFORMANCE.md. Donation also never fully landed ("donated buffers
# not usable" warnings). Off by default; RUSTIC_DONATE=1 re-enables
# for runtimes where donation behaves.
_DONATE = os.environ.get("RUSTIC_DONATE", "0") == "1"


def _don(donate):
    return donate if _DONATE else ()


def _spp_size(mesh) -> int:
    """Size of the mesh's sample-parallel ('spp') axis; 1 = pure pixel
    data parallelism (a ('px',) mesh or no mesh)."""
    if mesh is None or "spp" not in mesh.axis_names:
        return 1
    return int(mesh.shape["spp"])


def _lane_spec(mesh):
    """PartitionSpec for per-lane (tiled) arrays. On a ('px','spp')
    mesh the lane dim shards over BOTH axes: the driver tiles inputs by
    fold == |spp| (exactly the single-device sample-fold layout), so
    consecutive lane blocks are fold groups and P(('spp','px')) gives
    each device one sample-group x pixel-shard chunk. The film itself
    stays P('px') (replicated over 'spp'); finish psums the fold
    groups' radiance over 'spp' before the add."""
    return _P(("spp", "px")) if _spp_size(mesh) > 1 else _P("px")


def _jit_stage(fn, donate, mesh, in_specs, out_specs):
    """jit a stage function, shard_mapping it over `mesh` first when one
    is given (multi-chip mode: every per-lane array data-parallel over
    the 'px' axis, scene/config operands replicated — paths are
    independent, so no stage needs a collective)."""
    if mesh is not None:
        fn = jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    return jax.jit(fn, donate_argnums=_don(donate))


class _Kernels:
    """Driver-level flash-kernel entry points, optionally shard_mapped
    over a mesh: lane operands (ray/shadow feature rows) shard over
    'px'; the triangle tables / tile AABBs / attr split replicate. Each
    device then runs the identical Mosaic kernel on its lane shard —
    the multi-chip story for the staged fast path."""

    def __init__(self, bt, interpret, prec, mesh=None):
        kw = dict(bt=bt, interpret=interpret, precision=prec)
        self.nearest = functools.partial(flash_nearest, **kw)
        self.nearest_attrs = functools.partial(flash_nearest_attrs, **kw)
        self.nearest_shadow = functools.partial(flash_nearest_shadow, **kw)
        self.nearest_shadow_attrs = functools.partial(
            flash_nearest_shadow_attrs, **kw
        )
        self.occlude_packed = functools.partial(flash_occlude_packed, **kw)
        if mesh is None:
            return
        S, R = _lane_spec(mesh), _P()

        def sm(fn, n_lane, n_scene, n_out):
            out = (S,) * n_out if n_out > 1 else S
            return jax.jit(
                jax.shard_map(
                    fn, mesh=mesh, in_specs=(S,) * n_lane + (R,) * n_scene,
                    out_specs=out, check_vma=False,
                )
            )

        self.nearest = sm(self.nearest, 1, 2, 4)
        self.nearest_attrs = sm(self.nearest_attrs, 1, 3, 6)
        self.nearest_shadow = sm(self.nearest_shadow, 2, 2, 5)
        self.nearest_shadow_attrs = sm(self.nearest_shadow_attrs, 2, 3, 7)
        self.occlude_packed = sm(self.occlude_packed, 1, 2, 1)


@functools.lru_cache(maxsize=16)
def _stages(cfg: StaticConfig, trust_kernel: bool = False, fold: int = 1,
            edge_margin: float = 0.0, mesh=None):
    """Compile the per-bounce XLA stages (cached per static config).

    Each bounce is ONE XLA program: it folds the previous bounce's
    shadow-ray result in (bounce_post) and runs the full shade
    (bounce_pre) off the winner's gathered attribute row — exactly one
    row gather on the shading path, no separate post dispatch.

    `fold` > 1 concatenates that many consecutive samples' paths into
    one lane set (px/py/offsets tiled by the caller), so every stage
    dispatch serves `fold` samples — amortizing the per-dispatch
    runtime overhead that dominates single-tile scenes. `finish` sums
    the per-sample slabs back into the [B]-pixel film.

    `mesh` shard_maps every stage over its 'px' axis (lane arrays
    data-parallel, scene replicated). A ('px','spp') mesh additionally
    splits the SAMPLE range: fold must equal |spp|, the tiled fold
    groups shard over the 'spp' axis (P(('spp','px')) — each device
    owns one sample-group x pixel-shard chunk), each spp-peer's sample
    index comes from lax.axis_index('spp'), and finish psums the
    groups' radiance over 'spp' into the px-sharded film. This is the
    multi-chip form of the reference's sequential sync_rate re-dispatch
    (src/trace.rs:179-195): samples are independent, so the only
    collective is the final film psum. On a plain ('px',) mesh fold
    must be 1 — tiled fold copies would straddle shard boundaries.
    """
    spp = _spp_size(mesh)
    assert mesh is None or fold == spp, (
        "mesh mode: fold must equal the mesh's spp-axis size "
        f"(fold={fold}, spp={spp})"
    )
    S, R = _lane_spec(mesh), _P()
    F = _P("px") if mesh is not None else S  # film: px-sharded, spp-repl

    def init(cam, px, py, sample_idx, offsets):
        if spp > 1:
            # Lane block g (of fold == |spp|) is spp-peer g's sample:
            # the global [fold*B] tiled layout under P(('spp','px'))
            # puts block g on spp index g, so the local sample index is
            # sample_idx + axis_index('spp') — the same decomposition
            # _fold_sample_idx gives single-device.
            sidx = jnp.broadcast_to(
                sample_idx
                + jax.lax.axis_index("spp").astype(jnp.uint32),
                (px.shape[0],),
            )
        else:
            sidx = _fold_sample_idx(sample_idx, px.shape[0], fold)
        st = trace_mod.init_state(cfg, cam, px, py, sidx, offsets)
        feats = _ray_features16(st.ro, st.rd)
        # ro/rd ride ONLY in the packed ray features between stages
        # (feats cols 6:9 / 0:3 hold them verbatim); carrying them in
        # TraceState too would write the same 6 f32 columns twice per
        # boundary. Dead lanes' features stay frozen at their last rays
        # (no sentinels on this path), so the deferred sky still sees
        # the miss-time ray bit-exactly.
        return st._replace(ro=None, rd=None), feats, sidx

    # In px-only mesh mode sidx is the replicated scalar sample index
    # (fold=1); with an spp axis it is a lane array (distinct per peer).
    init = _jit_stage(
        init, (), mesh, in_specs=(R, S, S, R, S),
        out_specs=(S, S, S if spp > 1 else R),
    )

    def make_pre(bounce: int, last: bool):
        # Donate the per-bounce state and the kernel outputs: every one
        # is consumed exactly once here, so XLA can update in place
        # instead of allocating fresh 0.1-1 GB buffers per stage.
        # LDS draws are recomputed per stage from (sidx, offsets)
        # instead of carrying the [B, 8*max_bounces] block (see
        # trace.bounce_draws).
        def pre(scene, cam, st, feats, prev_nee, prev_occ, t, idx, attrs,
                t2, idx2, attrs2, sidx, offsets):
            st = st._replace(ro=feats[:, 6:9], rd=feats[:, 0:3])
            if prev_nee is not None:
                # prev_nee is the slim (eligible, contribution) pair —
                # bounce_post only ever read those two fields, and the
                # shadow geometry already rode in the packed features.
                st = st._replace(
                    radiance=_fold_slim_nee(st.radiance, prev_nee, prev_occ)
                )
            if attrs is None:
                attrs = gather_attr_rows(scene, idx)
                if t2 is not None:
                    attrs2 = gather_attr_rows(scene, idx2)
            if t2 is None and trust_kernel:
                res = classify_flash_hit(
                    t, idx, attrs, st.ro, st.rd, trust_kernel=True
                )
            else:
                res, attrs = classify_flash_hit2(
                    t, idx, attrs, t2, idx2, attrs2, st.ro, st.rd,
                    edge_margin=edge_margin,
                )
            # slim kernel-emitted rows are consumed natively by
            # bounce_pre (scene/world.py attr_* accessors) — no [B, 64]
            # expansion crosses the fusion graph.
            st2, nee_pack = trace_mod.bounce_pre(
                scene, cfg, cam, bounce, st, res,
                trace_mod.bounce_draws(bounce, sidx, offsets),
                attrs=attrs,
            )
            if last:
                # The final bounce's continuation is never traced: return
                # only what finish consumes (radiance + slim NEE carry +
                # shadow features), so XLA dead-code-eliminates the BSDF
                # continuation sample, ray update, roulette, and next-ray
                # features instead of materializing them as outputs.
                if nee_pack is None:
                    return st2.radiance, None, None
                shadow_feats = _shadow_feats16(nee_pack)
                slim = (nee_pack.eligible, nee_pack.contribution)
                return st2.radiance, None, (slim, shadow_feats)
            next_feats = _ray_features16(st2.ro, st2.rd)
            st2 = st2._replace(ro=None, rd=None)  # ride in next_feats only
            if nee_pack is None:
                return st2, next_feats, None
            # Shadow max_t rides in the spare feature column 10 so the
            # occlusion scan can be folded into the NEXT bounce's nearest
            # kernel (flash_nearest_shadow) — one triangle-tile pass
            # serves both ray sets. Only the slim (eligible,
            # contribution) pair crosses the boundary; the other 7
            # NEEPack columns are already inside shadow_feats.
            slim = (nee_pack.eligible, nee_pack.contribution)
            return st2, next_feats, (slim, _shadow_feats16(nee_pack))

        return _jit_stage(
            pre, (2, 3, 4, 5, 6, 7, 8, 9, 10, 11), mesh,
            in_specs=(R, R, S, S, S, S, S, S, S, S, S, S,
                      S if spp > 1 else R, S),
            out_specs=(S, S, S),
        )

    def finish(radiance, prev_nee, prev_occ, film):
        radiance = _fold_slim_nee(radiance, prev_nee, prev_occ)
        if fold > 1 and spp == 1:
            radiance = radiance.reshape(fold, film.shape[0], 3).sum(axis=0)
        if spp > 1:
            # The fold dim is sharded over 'spp' (one group per peer):
            # the cross-group sum IS the collective. After it, every
            # peer adds the identical total, keeping the px-sharded
            # film's spp replication consistent.
            radiance = jax.lax.psum(radiance, "spp")
        return film + radiance

    finish = _jit_stage(
        finish, (0, 1, 2, 3), mesh, in_specs=(S, S, S, F), out_specs=F
    )

    pres = [
        make_pre(b, b == cfg.max_bounces - 1) for b in range(cfg.max_bounces)
    ]
    return init, pres, finish


def _pack_unsort(inv, *cols):
    """Unsort kernel outputs (ray order -> state order) with ONE narrow
    gather: every column rides as f32 (exact for the i32 triangle
    indices < 2^24 and the 0/1 occlusion flags here)."""
    parts = [
        (c if c.dtype == jnp.float32 else c.astype(jnp.float32))[:, None]
        for c in cols
    ]
    g = jnp.concatenate(parts, axis=1)[inv]
    out = []
    for k, c in enumerate(cols):
        v = g[:, k]
        out.append(v if c.dtype == jnp.float32 else v.astype(c.dtype))
    return out


@functools.lru_cache(maxsize=32)
def _stages_raysorted(cfg: StaticConfig, fold: int = 1,
                      edge_margin: float = 0.0):
    """Stage set for the RAY-SORTED multi-tile driver: the path state
    stays stationary in pixel order forever; only the kernels' ray
    operands are permuted.

    The original sorted driver (_stages_sorted) re-orders the WHOLE
    per-lane state every bounce so ray blocks stay coherent — one
    ~56-column gather per bounce, measured 66 ms per 1M lanes on v5e
    (vs 4 ms for the argsort itself): the permute, not the sort, was
    the multi-tile path's megabatch bottleneck. Here each shade stage
    instead emits only its (next rays ++ shadow rays) feature rows
    pre-permuted for the next kernel call ([B, 32] gather) plus the
    inverse permutation; the next stage unsorts the kernel's 3-5 result
    columns through one narrow gather. Permute traffic per bounce drops
    ~6x, and the state never moves.

    Retired lanes still get sentinel rays (far outside every tile AABB)
    sorted to the back, so fully-dead blocks skip all MXU work inside
    the kernels — the compaction effect on kernel time survives without
    compaction; shade stages remain full-width (masked lanes).
    """

    @jax.jit
    def init(cam, px, py, sample_idx, offsets):
        sidx = _fold_sample_idx(sample_idx, px.shape[0], fold)
        st = trace_mod.init_state(cfg, cam, px, py, sidx, offsets)
        # camera rays are already pixel-coherent: bounce 0 runs unsorted
        return st, _ray_features16(st.ro, st.rd), sidx

    def make_pre(bounce: int, last: bool):
        # st keeps ro/rd on this path (the kernels' feats are sorted, so
        # they can't double as the state's ray carry like _stages does).
        @functools.partial(
            jax.jit, donate_argnums=_don((2, 3, 4, 5, 6, 7, 8, 9))
        )
        def pre(scene, cam, st, prev_nee, prev_occ, t, idx, t2, i2, inv,
                sidx, offsets):
            if inv is not None:
                cols = [t, idx] + ([t2, i2] if t2 is not None else [])
                if prev_occ is not None:
                    cols.append(prev_occ.astype(jnp.int32))
                cols = _pack_unsort(inv, *cols)
                t, idx = cols[0], cols[1]
                if t2 is not None:
                    t2, i2 = cols[2], cols[3]
                if prev_occ is not None:
                    prev_occ = cols[-1] != 0
            if prev_nee is not None:
                st = st._replace(
                    radiance=_fold_slim_nee(st.radiance, prev_nee, prev_occ)
                )
            attrs = gather_attr_rows(scene, idx)
            attrs2 = None if t2 is None else gather_attr_rows(scene, i2)
            res, attrs = classify_flash_hit2(
                t, idx, attrs, t2, i2, attrs2, st.ro, st.rd,
                edge_margin=edge_margin,
            )
            st2, nee_pack = trace_mod.bounce_pre(
                scene, cfg, cam, bounce, st, res,
                trace_mod.bounce_draws(bounce, sidx, offsets),
                attrs=attrs,
            )
            if last:
                # only finish's inputs survive -> the untraced
                # continuation is DCE'd (see _stages.make_pre). The
                # final shadow rays still sort (they ride the NEXT
                # sample group's bounce-0 kernel or the standalone
                # occlusion scan).
                if nee_pack is None:
                    return st2.radiance, None, None, None
                shadow_feats = _sentinel_feats(
                    _shadow_feats16(nee_pack), ~nee_pack.eligible
                )
                perm = _sort_perm(scene, st2, ~nee_pack.eligible)
                inv_n = jnp.empty_like(perm).at[perm].set(
                    jnp.arange(perm.shape[0], dtype=perm.dtype)
                )
                slim = (nee_pack.eligible, nee_pack.contribution)
                return st2.radiance, None, (slim, shadow_feats[perm]), inv_n
            next_feats = _sentinel_feats(
                _ray_features16(st2.ro, st2.rd), ~st2.alive
            )
            dead = ~st2.alive
            slim = shadow_feats = None
            if nee_pack is not None:
                shadow_feats = _sentinel_feats(
                    _shadow_feats16(nee_pack), ~nee_pack.eligible
                )
                dead = dead & ~nee_pack.eligible
                slim = (nee_pack.eligible, nee_pack.contribution)
            perm = _sort_perm(scene, st2, dead)
            inv_n = jnp.empty_like(perm).at[perm].set(
                jnp.arange(perm.shape[0], dtype=perm.dtype)
            )
            if shadow_feats is None:
                sf = next_feats[perm]
                ssh = None
            else:
                # one [B, 32] gather serves both ray sets
                both = jnp.concatenate([next_feats, shadow_feats], axis=1)[
                    perm
                ]
                sf, ssh = both[:, :16], both[:, 16:]
            nee_out = None if slim is None else (slim, ssh)
            return st2, sf, nee_out, inv_n

        return pre

    @functools.partial(jax.jit, donate_argnums=_don((0, 1, 2, 4)))
    def finish(radiance, prev_nee, prev_occ, inv, film):
        if prev_occ is not None and inv is not None:
            (prev_occ,) = _pack_unsort(inv, prev_occ.astype(jnp.int32))
            prev_occ = prev_occ != 0
        radiance = _fold_slim_nee(radiance, prev_nee, prev_occ)
        if fold > 1:
            radiance = radiance.reshape(fold, film.shape[0], 3).sum(axis=0)
        return film + radiance

    pres = [
        make_pre(b, b == cfg.max_bounces - 1) for b in range(cfg.max_bounces)
    ]
    return init, pres, finish


@functools.lru_cache(maxsize=32)
def _stages_sorted(cfg: StaticConfig, trust_kernel: bool = False,
                   fold: int = 1, schedule: Optional[tuple] = None,
                   edge_margin: float = 0.0, mesh=None):
    """Variant of _stages that re-sorts paths by origin locality after
    every shade, so ray blocks stay coherent and the flash kernels' tile
    culling prunes on secondary bounces too. The film sum becomes a
    scatter-add over the carried lane->pixel map (with `fold` > 1 the
    map carries each lane's *pixel* index — samples collide there and
    the scatter-add accumulates them).

    `schedule` enables PATH COMPACTION (the wavefront analog of the
    reference's per-pixel loop simply exiting, kernels/src/lib.rs:62-186
    — a dead SIMT thread costs nothing there, but a dead TPU lane rides
    every later stage at full price): schedule[b] is the static lane
    count kept after bounce b's shade. The sort already places droppable
    lanes last, so compaction is a head slice; the dropped tail's
    radiance (plus its owed deferred-sky term) is scatter-added into the
    film right there. A lane is droppable once it is neither alive nor
    owed a shadow-visibility result for this bounce's NEE sample — a
    roulette-killed lane still carries its direct-light candidate to the
    next kernel, so it must survive one more stage. Schedules come from
    a strided pilot probe (_pilot_schedule); if the measurement
    under-predicted, the stage raises an overflow flag (an undroppable
    lane in the dropped tail) and the driver re-renders that window
    uncompacted — compaction is an optimization, never a bias.

    With a schedule, each pre additionally threads (film, oflow);
    without one, each non-final pre returns its keep count so the
    pilot probe can measure a schedule.

    With a `mesh`, every stage is shard_mapped over 'px' (fold=1, no
    schedule — each shard sorts and renders its own lane set; the only
    cross-device op is the psum of the pilot keep count)."""
    assert mesh is None or (fold == 1 and schedule is None), (
        "mesh mode: fold=1, compaction schedule handled per-device"
    )
    S, R = _P("px"), _P()

    def init(cam, px, py, sample_idx, offsets):
        lanes = px.shape[0]
        sidx = jnp.broadcast_to(
            _fold_sample_idx(sample_idx, lanes, fold), (lanes,)
        )
        st = trace_mod.init_state(cfg, cam, px, py, sidx, offsets)
        lane2px = jnp.arange(lanes, dtype=jnp.int32) % (lanes // fold)
        return st, _ray_features16(st.ro, st.rd), sidx, lane2px

    init = _jit_stage(
        init, (), mesh, in_specs=(R, S, S, R, S), out_specs=(S, S, S, S)
    )

    def make_pre(bounce: int, last: bool):
        k_out = None if (last or schedule is None) else schedule[bounce]
        # Donate everything consumed exactly once. `offsets` at bounce 0
        # is the driver's tiled array, shared across sample groups — not
        # donatable; from bounce 1 on it is this group's fresh permuted
        # copy. Donating `film` makes the compaction scatter-add a true
        # in-place update instead of a copy per stage.
        donate = (2, 3, 4, 5, 6, 7, 8, 9, 11, 12, 13)
        if bounce > 0:
            donate = donate + (10,)

        def pre(scene, cam, st, prev_nee, prev_occ, t, idx, t2, idx2,
                sidx, offsets, lane2px, film=None, oflow=None):
            if prev_nee is not None:
                # slim (eligible, contribution) carry — see _stages.pre
                st = st._replace(
                    radiance=_fold_slim_nee(st.radiance, prev_nee, prev_occ)
                )
            attrs = gather_attr_rows(scene, idx)
            attrs2 = None if t2 is None else gather_attr_rows(scene, idx2)
            if t2 is None and trust_kernel:
                res = classify_flash_hit(
                    t, idx, attrs, st.ro, st.rd, trust_kernel=True
                )
            else:
                res, attrs = classify_flash_hit2(
                    t, idx, attrs, t2, idx2, attrs2, st.ro, st.rd,
                    edge_margin=edge_margin,
                )
            st2, nee_pack = trace_mod.bounce_pre(
                scene, cfg, cam, bounce, st, res,
                trace_mod.bounce_draws(bounce, sidx, offsets),
                attrs=attrs,
            )
            if last:
                # See _stages.make_pre: only finish's inputs are
                # returned so the untraced continuation is DCE'd.
                if nee_pack is None:
                    out = (st2.radiance, None, None, None, None, lane2px)
                else:
                    shadow_feats = _sentinel_feats(
                        _shadow_feats16(nee_pack), ~nee_pack.eligible
                    )
                    slim = (nee_pack.eligible, nee_pack.contribution)
                    out = (
                        st2.radiance, None, (slim, shadow_feats), None,
                        None, lane2px,
                    )
                return out + ((film, oflow) if schedule is not None else ())
            next_feats = _sentinel_feats(
                _ray_features16(st2.ro, st2.rd), ~st2.alive
            )
            shadow_feats = slim = None
            keep = st2.alive
            if nee_pack is not None:
                shadow_feats = _sentinel_feats(
                    _shadow_feats16(nee_pack), ~nee_pack.eligible
                )
                keep = keep | nee_pack.eligible
                # only the slim pair crosses the boundary (and the
                # permute): the shadow geometry is inside shadow_feats
                slim = (nee_pack.eligible, nee_pack.contribution)
            # Droppable lanes (not `keep`) sort last so a compacted head
            # slice keeps every lane that still owes work.
            perm = _sort_perm(scene, st2, ~keep)
            st2, slim, next_feats, shadow_feats, sidx, offsets, lane2px, keep = (
                _permute_lanes(
                    perm,
                    (st2, slim, next_feats, shadow_feats, sidx, offsets,
                     lane2px, keep),
                )
            )
            if k_out is not None and k_out < st2.alive.shape[0]:
                # ---- compaction: fold the dropped tail into the film.
                # A dropped missed lane is still owed its deferred sky
                # term (trace.bounce_pre defers the atmosphere march to
                # the final bounce, which the lane will never reach).
                t_rad = st2.radiance[k_out:]
                t_missed = st2.missed[k_out:]
                sky = jax.lax.cond(
                    jnp.any(t_missed),
                    lambda: trace_mod.sky_radiance(
                        scene, cfg.has_skybox, cam.sun_direction,
                        st2.ro[k_out:], st2.rd[k_out:],
                    ),
                    lambda: jnp.zeros((t_rad.shape[0], 3), jnp.float32),
                )
                t_rad = t_rad + jnp.where(
                    t_missed[:, None], st2.throughput[k_out:] * sky, 0.0
                )
                film = film.at[lane2px[k_out:]].add(t_rad)
                oflow = oflow | jnp.any(keep[k_out:])
                head = lambda a: a[:k_out]
                st2 = jax.tree_util.tree_map(head, st2)
                slim = jax.tree_util.tree_map(head, slim)
                next_feats = head(next_feats)
                if shadow_feats is not None:
                    shadow_feats = head(shadow_feats)
                sidx, offsets, lane2px = (
                    head(sidx), head(offsets), head(lane2px)
                )
            n_keep = jnp.sum(keep.astype(jnp.int32))
            if mesh is not None:  # global keep count for the pilot
                n_keep = jax.lax.psum(n_keep, "px")
            nee_out = None if slim is None else (slim, shadow_feats)
            if schedule is not None:
                return (
                    st2, next_feats, nee_out, sidx, offsets, lane2px,
                    film, oflow,
                )
            return (
                st2, next_feats, nee_out, sidx, offsets, lane2px, n_keep,
            )

        out_specs = (
            (S, S, S, S, S, S) if last else (S, S, S, S, S, S, R)
        )
        return _jit_stage(
            pre, donate, mesh,
            in_specs=(R, R, S, S, S, S, S, S, S, S, S, S, S, R),
            out_specs=out_specs,
        )

    def finish(radiance, prev_nee, prev_occ, film, lane2px):
        radiance = _fold_slim_nee(radiance, prev_nee, prev_occ)
        return film.at[lane2px].add(radiance)

    finish = _jit_stage(
        finish, (0, 1, 2, 3, 4), mesh, in_specs=(S, S, S, S, S),
        out_specs=S,
    )

    pres = [
        make_pre(b, b == cfg.max_bounces - 1) for b in range(cfg.max_bounces)
    ]
    return init, pres, finish


# The experimental fused mega-bounce kernel (one Mosaic kernel per
# bounce: scan + sky march + BSDF + NEE) was retired to the
# in-repo archive/fused_bounce/ directory after two rounds of measurement: 3.4x
# slower than these staged executables (Mosaic's scheduling of the
# transcendental-heavy VPU shade tail; PERFORMANCE.md "Why the fused
# kernel lost"), with no remaining path to a win short of a Mosaic
# scheduler change.


# Shape classes already pre-warmed this process (prewarm_staged).
_PREWARMED = set()


def prewarm_staged(scene, cfg: StaticConfig, cam, lanes: int,
                   n_samples: int, max_workers: int = 8,
                   force_interpret: bool = False) -> int:
    """Compile/load the single-tile fast path's executables CONCURRENTLY.

    On the axon TPU runtime a persistent-compilation-cache hit still
    pays a near-full server-side compile at executable-load time
    (measured round 2: a fully cached DarkCornell warm render costs
    ~190 s vs ~205 s stone cold — the cache saves ~10%). Loads do
    parallelize across host threads (4 concurrent loads ≈ 1.2x one
    load, measured), so warming the ~12 distinct stage executables
    through a thread pool cuts time-to-first-frame several-fold where
    serial first-dispatch compiles cannot.

    Dummy operands are zero-filled lane arrays shaped exactly like the
    driver's (shapes derived with jax.eval_shape, so kernel output
    dtypes are never guessed); executing them once per executable is
    ~60 ms each — noise against multi-second loads. Returns the number
    of executables warmed (0 = config not on the kernelshade path;
    callers simply fall back to lazy serial compiles)."""
    from concurrent.futures import ThreadPoolExecutor

    from rustic_tpu.ops import shade_kernel as SK
    from rustic_tpu.ops.flash_intersect import (
        flash_nearest_attrs_t,
        flash_nearest_shadow_attrs_t,
        flash_occlude_packed_t,
    )

    interpret = jax.default_backend() != "tpu"
    if interpret and not force_interpret:
        # CPU/interpret compiles are fast; nothing to hide. The override
        # lets the CPU test suite exercise the task construction.
        return 0
    prec = resolve_precision("auto", interpret)
    bt = pick_bt(scene.tri_feats16)
    if bt != DEF_BT or os.environ.get("RUSTIC_SHADE_KERNEL", "1") != "1":
        return 0
    if not SK.supported(scene, cfg, _plan_for(prec, "near").top2, lanes):
        return 0
    fold = pick_sample_fold(lanes, n_samples)
    folds = {fold}
    if n_samples % fold:
        folds.add(n_samples % fold)
    g16 = scene.tri_feats16
    kattrs = scene.tri_attrs_split
    kw = dict(bt=bt, interpret=interpret, precision=prec)
    n_alias = (
        scene.n_alias_entries
        if cfg.nee.uses_nee and scene.has_lights
        else 0
    )
    # The key carries every scene-derived EXECUTABLE-SHAPE input, not
    # just the config: a second scene in the same process with matching
    # (cfg, lanes) but a different tile count / attr width / light table
    # compiles different executables and must warm again.
    key = (
        cfg, lanes, tuple(sorted(folds)), prec, g16.shape, kattrs.shape,
        kattrs.dtype.name, scene.entry_rows.shape, n_alias,
        scene.has_glass,
    )
    if key in _PREWARMED:
        return 0
    skw = dict(
        has_glass=scene.has_glass, n_alias=n_alias,
        edge_margin=near_edge_margin(prec), interpret=interpret,
    )

    tasks = []
    for g in sorted(folds):
        B = lanes * g
        initk, finishk = _stages_kernelshade(cfg, fold=g)
        featsT_s = jax.ShapeDtypeStruct((16, B), jnp.float32)
        near_out = jax.eval_shape(
            lambda f: flash_nearest_attrs_t(
                f, g16, scene.tile_aabbs, kattrs, **kw
            ),
            featsT_s,
        )
        t_s, i_s, attrsT_s = near_out[0], near_out[1], near_out[2]
        occ_s = jax.eval_shape(
            lambda f: flash_occlude_packed_t(
                f, g16, scene.tile_aabbs, **kw
            ),
            featsT_s,
        )

        def z(s):
            return jnp.zeros(s.shape, s.dtype)

        # initk's real operands are the driver's TILED (lanes * g,)
        # arrays (px/py/offsets, _tile_inputs) — a (lanes,) dummy made
        # _fold_sample_idx's broadcast raise whenever g did not divide
        # lanes, and warmed a wrong-shape executable when it did.
        lane_i32 = jnp.zeros((B,), jnp.int32)
        lane_u32 = jnp.zeros((B,), jnp.uint32)
        params = jnp.zeros((1, 8), jnp.float32)
        tasks.append(
            lambda initk=initk, a=lane_i32, b=lane_u32: initk(
                cam, a, a, jnp.uint32(0), b
            )
        )
        tasks.append(
            lambda f=z(featsT_s): flash_nearest_attrs_t(
                f, g16, scene.tile_aabbs, kattrs, **kw
            )
        )
        if n_alias > 0:  # shadow rays exist only with NEE lights
            tasks.append(
                lambda f=z(featsT_s), s=z(featsT_s):
                flash_nearest_shadow_attrs_t(
                    f, s, g16, scene.tile_aabbs, kattrs, **kw
                )
            )
            tasks.append(
                lambda f=z(featsT_s): flash_occlude_packed_t(
                    f, g16, scene.tile_aabbs, **kw
                )
            )
        for bounce in range(cfg.max_bounces):
            occ_arg = z(occ_s) if bounce > 0 and n_alias > 0 else None
            tasks.append(
                lambda bounce=bounce, p=params, st=z(
                    jax.ShapeDtypeStruct((SK.NST, B), jnp.float32)
                ), f=z(featsT_s), t=z(t_s), i=z(i_s), at=z(attrsT_s),
                occ=occ_arg, si=jnp.zeros((B,), jnp.uint32),
                of=jnp.zeros((B,), jnp.uint32): SK.shade_bounce(
                    cfg, bounce, p, scene.entry_rows, st, f, t, i, at,
                    occ, si, of, **skw,
                )
            )
        # With NEE, every group ends holding shadow rays, so finishk
        # always sees an occlusion column; without, it never does.
        fin_occ = z(occ_s) if n_alias > 0 else None
        tasks.append(
            lambda finishk=finishk, st=z(
                jax.ShapeDtypeStruct((SK.NST, B), jnp.float32)
            ), occ=fin_occ, fl=jnp.zeros((lanes, 3), jnp.float32):
            finishk(st, occ, fl)
        )

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futs = [pool.submit(t) for t in tasks]
        for f in futs:
            f.result()  # surface tracing errors; device work stays queued
    # Mark the shape class warmed only once every task succeeded: a
    # raised task (or interrupted pool) must not make later calls in
    # this process silently skip warming.
    _PREWARMED.add(key)
    return len(tasks)


def render_batch_staged(
    scene,
    cfg: StaticConfig,
    cam,
    px: jnp.ndarray,
    py: jnp.ndarray,
    offsets: jnp.ndarray,
    sample_start: int,
    n_samples: int,
    film_in: Optional[jnp.ndarray] = None,
    mesh=None,
) -> jnp.ndarray:
    """Render n_samples for one pixel batch through the staged pipeline.

    All dispatches are queued asynchronously; the returned film-sum array
    is on device (callers np.asarray() it to sync).

    `mesh` (a jax.sharding.Mesh with a 'px' axis) runs every stage and
    kernel shard_mapped: lane arrays data-parallel over 'px', scene
    replicated — the multi-chip mode of the fast path (parallel/shard.py
    render_sharded prepares the sharded operands)."""
    g16 = scene.tri_feats16
    film = (
        film_in
        if film_in is not None
        else jnp.zeros((px.shape[0], 3), jnp.float32)
    )
    interpret = jax.default_backend() != "tpu"
    prec = resolve_precision("auto", interpret)
    bt = pick_bt(g16)
    K = _Kernels(bt, interpret, prec, mesh)
    multi_tile = bt != DEF_BT  # pick_bt returns DEF_BT iff single-tile
    if _SORT_PATHS and multi_tile:
        # "rays": state stays pixel-stationary, only kernel ray
        # operands permute (~6x less permute traffic per bounce).
        # "state": the original whole-state re-sort + compaction
        # schedules. "auto" (default since round 5) picks per scene
        # from the measured compaction pilot (_pick_sort_mode).
        # $RUSTIC_SORT_MODE forces; mesh mode uses "state" (its
        # shard_map wiring exists there).
        if mesh is None and os.environ.get(
            "RUSTIC_SHADE_KERNEL_MT", "0"
        ) == "1":
            from rustic_tpu.ops import shade_kernel as SK

            if SK.supported_mt(
                scene, cfg, _plan_for(prec, "near").top2, px.shape[0]
            ):
                return _render_batch_ks_multitile(
                    scene, cfg, cam, px, py, offsets, sample_start,
                    n_samples, film, bt, interpret, prec,
                )
            warnings.warn(
                "RUSTIC_SHADE_KERNEL_MT=1 set but unsupported for this "
                f"batch (lanes={px.shape[0]}, pick_bs="
                f"{SK.pick_bs(px.shape[0])})"
                " — falling back to the XLA shade drivers",
                stacklevel=2,
            )
        mode = os.environ.get("RUSTIC_SORT_MODE", "auto")
        if mesh is None and mode == "auto":
            mode = _pick_sort_mode(
                scene, cfg, cam, px, py, offsets, sample_start, n_samples,
                bt, interpret, prec,
            )
        if mesh is None and mode == "rays":
            return _render_batch_raysorted(
                scene, cfg, cam, px, py, offsets, sample_start, n_samples,
                film, bt, interpret, prec,
            )
        return _render_batch_sorted(
            scene, cfg, cam, px, py, offsets, sample_start, n_samples,
            film, bt, interpret, prec, mesh=mesh,
        )
    if mesh is None and not multi_tile and os.environ.get(
        "RUSTIC_SHADE_KERNEL", "1"
    ) == "1":
        from rustic_tpu.ops import shade_kernel as SK

        plan = _plan_for(prec, "near")
        if SK.supported(scene, cfg, plan.top2, px.shape[0]):
            # First touch of this shape class: compile/load the whole
            # stage set concurrently (the axon runtime pays a server-side
            # compile per executable load even on persistent-cache hits;
            # threads overlap them ~4x).
            prewarm_staged(scene, cfg, cam, int(px.shape[0]), n_samples)
            return _render_batch_kernelshade(
                scene, cfg, cam, px, py, offsets, sample_start, n_samples,
                film, bt, interpret, prec,
            )
    if mesh is not None:
        # A ('px','spp') mesh renders |spp| samples per group in
        # parallel via the fold layout (see _stages); sample counts
        # must tile evenly, callers pad/validate (render_sharded_staged).
        fold = _spp_size(mesh)
        assert n_samples % fold == 0, (
            f"n_samples={n_samples} not divisible by spp axis {fold}"
        )
    else:
        fold = pick_sample_fold(px.shape[0], n_samples)
    tiled = _tile_inputs((px, py, offsets), fold)
    # Single-tile scenes with a bit-exact attr split get the winner's
    # shading row straight from the kernel (no consumer gather). Guarded
    # on multi_tile: the split table also exists for small-T_pad
    # multi-tile packings (RUSTIC_TT < 512 with sorting disabled), but
    # the in-kernel attr path is single-tile only.
    kattrs = scene.tri_attrs_split if not multi_tile else None
    # The LAST bounce's shadow rays of group k ride group k+1's bounce-0
    # nearest kernel (same merged executable as mid-bounce), so the
    # standalone occlusion scan runs once per render, not once per
    # group; group k's film fold then happens during group k+1.
    held = None  # (radiance, prev_nee, pending_shadow, finish) awaiting occ
    for k in range(0, n_samples, fold):
        g = min(fold, n_samples - k)
        init, pres, finish = _stages(
            cfg, fold=g, edge_margin=near_edge_margin(prec), mesh=mesh
        )
        pxg, pyg, offg = (
            tiled if g == fold else _tile_inputs((px, py, offsets), g)
        )
        if held is not None and held[2].shape[0] != pxg.shape[0]:
            film = _flush_held(held, film, g16, scene, K)
            held = None
        sample_idx = jnp.uint32(sample_start + k)
        st, feats, sidx = init(cam, pxg, pyg, sample_idx, offg)
        prev_nee = pending_shadow = None
        if held is not None:
            pending_shadow = held[2]
        for bounce in range(cfg.max_bounces):
            attrs = attrs2 = t2 = i2 = None
            if pending_shadow is None:
                if kattrs is not None:
                    t, idx, attrs, t2, i2, attrs2 = K.nearest_attrs(
                        feats, g16, scene.tile_aabbs, kattrs
                    )
                else:
                    t, idx, t2, i2 = K.nearest(feats, g16, scene.tile_aabbs)
                prev_occ = None
            else:
                # The previous bounce's shadow scan piggybacks on this
                # bounce's nearest scan: both ray sets stream the same
                # triangle tiles, so merging halves the kernel dispatches
                # and the per-tile VMEM loads.
                if kattrs is not None:
                    t, idx, prev_occ, attrs, t2, i2, attrs2 = (
                        K.nearest_shadow_attrs(
                            feats, pending_shadow, g16, scene.tile_aabbs,
                            kattrs,
                        )
                    )
                else:
                    t, idx, prev_occ, t2, i2 = K.nearest_shadow(
                        feats, pending_shadow, g16, scene.tile_aabbs
                    )
            if bounce == 0 and held is not None:
                # the occlusion result belongs to the HELD group
                rad_h, nee_h, _, finish_h = held
                film = finish_h(rad_h, nee_h, prev_occ, film)
                held = None
                prev_occ = None
            st, feats, nee = pres[bounce](
                scene, cam, st, feats, prev_nee, prev_occ, t, idx, attrs,
                t2, i2, attrs2, sidx, offg,
            )
            prev_nee = pending_shadow = None
            if nee is not None:
                prev_nee, pending_shadow = nee
        if pending_shadow is not None:
            held = (st, prev_nee, pending_shadow, finish)
        else:
            film = finish(st, prev_nee, None, film)
        _throttle(film, k // fold)
    if held is not None:
        film = _flush_held(held, film, g16, scene, K)
    return film


def _flush_held(held, film, g16, scene, K):
    """Resolve a held group's final shadow scan with the standalone
    occlusion kernel and fold its film contribution."""
    rad, prev_nee, pending_shadow, finish = held
    final_occ = (
        K.occlude_packed(pending_shadow, g16, scene.tile_aabbs) != 0
    )
    return finish(rad, prev_nee, final_occ, film)


@functools.lru_cache(maxsize=16)
def _stages_kernelshade(cfg: StaticConfig, fold: int = 1):
    """init/finish XLA stages for the Mosaic-shade driver
    (_render_batch_kernelshade): the per-bounce shading runs entirely in
    ops/shade_kernel.py, so only ray/state setup and the film fold are
    XLA programs. State crosses bounces packed as [NST, B] rows."""
    from rustic_tpu.ops import shade_kernel as SK
    from rustic_tpu.ops.sampling import cross

    @jax.jit
    def initk(cam, px, py, sample_idx, offsets):
        lanes = px.shape[0]
        sidx = jnp.broadcast_to(
            _fold_sample_idx(sample_idx, lanes, fold), (lanes,)
        ).astype(jnp.uint32)
        ro, rd = trace_mod.camera_rays(cfg, cam, px, py, sidx, offsets)
        st = SK.init_state_packed(lanes)
        featsT = jnp.concatenate(
            [
                rd.T, cross(ro, rd).T, ro.T,
                jnp.ones((1, lanes), jnp.float32),
                jnp.zeros((6, lanes), jnp.float32),
            ],
            axis=0,
        )
        params = jnp.concatenate(
            [cam.sun_direction, cam.specular_weight_clamp,
             jnp.zeros(2, jnp.float32)]
        ).reshape(1, 8)
        return st, featsT, sidx, params

    @jax.jit
    def finishk(st, occ, film):
        rad = st[3:6]
        if occ is not None:
            pend = st[15:18]
            finite = jnp.all(jnp.isfinite(pend), axis=0)
            lit = (st[SK.SK_PEND_ELIG] > 0.5) & (occ == 0) & finite
            rad = rad + jnp.where(lit[None, :], pend, 0.0)
        if fold > 1:
            rad = rad.reshape(3, fold, -1).sum(axis=1)
        return film + rad.T

    return initk, finishk


def _render_batch_kernelshade(
    scene, cfg, cam, px, py, offsets, sample_start, n_samples, film,
    bt, interpret, prec,
):
    """Single-tile staged driver with the shading stage as ONE Mosaic
    kernel per bounce (ops/shade_kernel.py): per bounce exactly two
    device programs run — the flash intersection kernel and the shade
    kernel — chained through transposed row operands with no XLA glue
    and no relayouts. Keeps the unsorted driver's sample folding and
    held-group trick."""
    from rustic_tpu.ops import shade_kernel as SK
    from rustic_tpu.ops.flash_intersect import (
        flash_nearest_attrs_t,
        flash_nearest_shadow_attrs_t,
        flash_occlude_packed_t,
    )

    g16 = scene.tri_feats16
    kattrs = scene.tri_attrs_split
    fold = pick_sample_fold(px.shape[0], n_samples)
    tiled = _tile_inputs((px, py, offsets), fold)
    margin = near_edge_margin(prec)
    n_alias = (
        scene.n_alias_entries
        if cfg.nee.uses_nee and scene.has_lights
        else 0
    )
    kw = dict(bt=bt, interpret=interpret, precision=prec)
    skw = dict(
        has_glass=scene.has_glass, n_alias=n_alias, edge_margin=margin,
        interpret=interpret,
    )

    def flush_held(held, film):
        st_h, sh_h, fin_h = held
        occ = flash_occlude_packed_t(sh_h, g16, scene.tile_aabbs, **kw)
        return fin_h(st_h, occ, film)

    held = None  # (st, shadow_featsT, finishk) awaiting occlusion
    for k in range(0, n_samples, fold):
        g = min(fold, n_samples - k)
        initk, finishk = _stages_kernelshade(cfg, fold=g)
        pxg, pyg, offg = (
            tiled if g == fold else _tile_inputs((px, py, offsets), g)
        )
        if held is not None and held[1].shape[1] != pxg.shape[0]:
            film = flush_held(held, film)
            held = None
        st, featsT, sidx, params = initk(
            cam, pxg, pyg, jnp.uint32(sample_start + k), offg
        )
        offg_u = jnp.asarray(offg, jnp.uint32)
        pending_sh = held[1] if held is not None else None
        for bounce in range(cfg.max_bounces):
            if pending_sh is None:
                t, i, attrsT, t2, i2, _a2 = flash_nearest_attrs_t(
                    featsT, g16, scene.tile_aabbs, kattrs, **kw
                )
                occ = None
            else:
                t, i, occ, attrsT, t2, i2, _a2 = flash_nearest_shadow_attrs_t(
                    featsT, pending_sh, g16, scene.tile_aabbs, kattrs, **kw
                )
            assert t2 is None, "top-2 plans use the XLA shade stage"
            if bounce == 0 and held is not None:
                st_h, _sh, fin_h = held
                film = fin_h(st_h, occ, film)
                held = None
                occ = None
            st, nfT, sfT = SK.shade_bounce(
                cfg, bounce, params, scene.entry_rows, st, featsT, t, i,
                attrsT, occ, sidx, offg_u, **skw,
            )
            if nfT is not None:  # last bounce keeps its input rows
                featsT = nfT    # (the HDR payoff reads their rd)
            pending_sh = sfT
        if cfg.has_skybox:
            st = _hdr_sky_payoff(scene.skybox, cam.sun_direction, st, featsT)
        if pending_sh is not None:
            held = (st, pending_sh, finishk)
        else:
            film = finishk(st, None, film)
        _throttle(film, k // fold)
    if held is not None:
        film = flush_held(held, film)
    return film


@functools.lru_cache(maxsize=16)
def _stages_ks_mt(cfg: StaticConfig, fold: int = 1, edge_margin: float = 0.0,
                  resolve: str = "row"):
    """Stage set for the MULTI-TILE Mosaic-shade driver
    (_render_batch_ks_multitile): per bounce the device runs exactly
    four programs — [nearest kernel] -> [resolve XLA] -> [shade kernel]
    -> [sort XLA]. The packed [NST, B] path state and the shade
    kernel's featsT stay pixel-stationary (the _stages_raysorted
    insight); only the kernels' ray operands are permuted, and the
    winner columns unsort through one narrow gather. Attr rows come
    from ops/resolve.py (field-wise transposed gathers + texture/
    normal-map resolution) instead of the single-tile kernels'
    in-kernel emission."""
    from rustic_tpu.ops import shade_kernel as SK
    from rustic_tpu.ops.resolve import (
        picked_light_rows_t,
        resolve_attrs_rowT,
        resolve_attrs_t,
    )

    # Row-gather resolve: ONE [B, W] gather + relayout instead of ~50
    # field-wise [B] gathers (per-row gather latency dominates at
    # megabatch; see resolve.resolve_attrs_rowT). `resolve` is part of
    # the lru_cache key: the $RUSTIC_RESOLVE env is read per driver
    # invocation at the call site, so in-process A/B toggles take
    # effect (the round-4 advisor flagged the frozen-at-first-call
    # footgun when the env was read here).
    resolve_fn = resolve_attrs_t if resolve == "field" else resolve_attrs_rowT

    initk, finishk = _stages_kernelshade(cfg, fold=fold)

    @functools.partial(
        jax.jit, static_argnames=("bounce", "has_occ", "has_inv", "prepick")
    )
    def resolvek(scene, featsT, t, i, occ, inv, sidx, offsets,
                 bounce: int, has_occ: bool, has_inv: bool, prepick: bool):
        if has_inv:
            cols = [t, i] + ([occ.astype(jnp.int32)] if has_occ else [])
            cols = _pack_unsort(inv, *cols)
            t, i = cols[0], cols[1]
            if has_occ:
                occ = cols[2]
        elif has_occ:
            occ = occ.astype(jnp.int32)
        attrsT = resolve_fn(scene, featsT, i, edge_margin)
        pickedT = (
            picked_light_rows_t(scene, bounce, sidx, offsets)
            if prepick else None
        )
        return t, i, occ, attrsT, pickedT

    @functools.partial(jax.jit, static_argnames=("has_next", "has_shadow"))
    def sortk(scene, st, nfT, sfT, has_next: bool, has_shadow: bool):
        """Sort the shade kernel's emitted ray rows for the next kernel
        call: retired lanes last (with sentinel rays so fully-dead
        blocks skip all intersection work), next + shadow rays share
        one [B, 32] row gather, and the inverse permutation rides out
        for the winner-column unsort."""
        alive = st[SK.SK_ALIVE] > 0.5
        elig = st[SK.SK_PEND_ELIG] > 0.5 if has_shadow else None
        nf = nfT.T if has_next else None
        sf = sfT.T if has_shadow else None
        if has_next:
            dead = ~alive if not has_shadow else ~alive & ~elig
            ro, rd = nf[:, 6:9], nf[:, 0:3]
            nf = _sentinel_feats(nf, ~alive)
        else:
            dead = ~elig
            ro, rd = sf[:, 6:9], sf[:, 0:3]
        if has_shadow:
            sf = _sentinel_feats(sf, ~elig)
        perm = _sort_perm_rays(scene, ro, rd, dead)
        inv = jnp.empty_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=perm.dtype)
        )
        if has_next and has_shadow:
            both = jnp.concatenate([nf, sf], axis=1)[perm]
            return both[:, :16], both[:, 16:], inv
        if has_next:
            return nf[perm], None, inv
        return None, sf[perm], inv

    return initk, finishk, resolvek, sortk


_feats_rows = jax.jit(lambda fT: fT.T)


@jax.jit
def _unsort_occ(inv, occ):
    (occ,) = _pack_unsort(inv, occ.astype(jnp.int32))
    return occ


@jax.jit
def _hdr_sky_payoff(skybox, sun_direction, st, featsT):
    """Deferred HDR-sky payoff for the kernel-shade drivers: the Mosaic
    shade kernel defers sky to the last bounce but has no equirect
    image gather, so missed lanes collect throughput * image_sky here,
    in XLA, from the stationary last-bounce ray rows (rd stays frozen
    at its miss-time value for retired lanes — the kernel only writes
    direction under the shade mask). Twin of the in-kernel procedural
    payoff (ops/shade_kernel.py) and of trace.deferred_sky_term on the
    XLA drivers (reference: kernels/src/lib.rs:66-79)."""
    from rustic_tpu.ops import shade_kernel as SK
    from rustic_tpu.ops.skybox import image_sky

    missed = st[SK.SK_MISSED] > 0.5

    def payoff():
        rd = featsT[0:3].T
        sky = image_sky(skybox, sun_direction, rd)  # [B, 3]
        add = jnp.where(missed[None, :], st[SK.SK_THR] * sky.T, 0.0)
        return st.at[SK.SK_RAD].add(add)

    # enclosed scenes: a false predicate makes the cond free
    return jax.lax.cond(jnp.any(missed), payoff, lambda: st)


def _render_batch_ks_multitile(
    scene, cfg, cam, px, py, offsets, sample_start, n_samples, film,
    bt, interpret, prec,
):
    """Multi-tile staged driver with the shading stage as ONE Mosaic
    kernel per bounce: the ray-sorted driver's coherence machinery
    (origin-Morton sort, sentinel dead-last blocks, stationary state)
    wrapped around ops/shade_kernel.py + ops/resolve.py instead of the
    ~50-fusion XLA shade stage. Opt-in via $RUSTIC_SHADE_KERNEL_MT
    until the hardware numbers land (measurement-discipline rule)."""
    from rustic_tpu.ops import shade_kernel as SK
    from rustic_tpu.ops.flash_intersect import (
        flash_nearest,
        flash_nearest_shadow,
        flash_occlude_packed,
    )

    g16 = scene.tri_feats16
    fold = pick_sample_fold(px.shape[0], n_samples)
    tiled = _tile_inputs((px, py, offsets), fold)
    margin = near_edge_margin(prec)
    n_alias = (
        scene.n_alias_entries
        if cfg.nee.uses_nee and scene.has_lights
        else 0
    )
    # wide alias tables: the pick runs in XLA (resolve stage) and the
    # kernel consumes the picked rows (prepicked mode)
    from rustic_tpu.ops.nee import ENTRY_SELECT_MAX

    prepick = n_alias > ENTRY_SELECT_MAX
    kw = dict(bt=bt, interpret=interpret, precision=prec)
    skw = dict(
        has_glass=scene.has_glass, n_alias=n_alias, edge_margin=margin,
        interpret=interpret,
    )

    def flush_held(held, film):
        st_h, sh_h, inv_h, fin_h = held
        occ = flash_occlude_packed(sh_h, g16, scene.tile_aabbs, **kw)
        return fin_h(st_h, _unsort_occ(inv_h, occ), film)

    held = None  # (st, sorted_shadow, inv, finishk) awaiting occlusion
    for k in range(0, n_samples, fold):
        g = min(fold, n_samples - k)
        initk, finishk, resolvek, sortk = _stages_ks_mt(
            cfg, fold=g, edge_margin=margin,
            resolve=os.environ.get("RUSTIC_RESOLVE", "row"),
        )
        pxg, pyg, offg = (
            tiled if g == fold else _tile_inputs((px, py, offsets), g)
        )
        if held is not None and held[1].shape[0] != pxg.shape[0]:
            film = flush_held(held, film)
            held = None
        st, featsT, sidx, params = initk(
            cam, pxg, pyg, jnp.uint32(sample_start + k), offg
        )
        offg_u = jnp.asarray(offg, jnp.uint32)
        pending_sh = held[1] if held is not None else None
        inv = None  # inverse of the CURRENT kernel operands' order
        feats_in = None  # sorted next rays; None => bounce-0 camera rays
        for bounce in range(cfg.max_bounces):
            op = feats_in if feats_in is not None else _feats_rows(featsT)
            if pending_sh is None:
                t, i, t2, i2 = flash_nearest(
                    op, g16, scene.tile_aabbs, **kw
                )
                occ = None
            else:
                t, i, occ, t2, i2 = flash_nearest_shadow(
                    op, pending_sh, g16, scene.tile_aabbs, **kw
                )
            assert t2 is None, "top-2 plans use the XLA shade stage"
            if bounce == 0 and held is not None:
                # the occlusion column belongs to the HELD group (its
                # shadow rows rode this kernel in their own order)
                st_h, _sh, inv_h, fin_h = held
                film = fin_h(st_h, _unsort_occ(inv_h, occ), film)
                held = None
                occ = None
            t, i, occ, attrsT, pickedT = resolvek(
                scene, featsT, t, i, occ, inv, sidx, offg_u,
                # bounce only keys the trace when the pick needs its
                # LDS dims — fewer shape classes to compile otherwise
                bounce if prepick else 0,
                occ is not None, inv is not None, prepick,
            )
            st, nfT, sfT = SK.shade_bounce(
                cfg, bounce, params, scene.entry_rows, st, featsT, t, i,
                attrsT, occ, sidx, offg_u, pickedT=pickedT, **skw,
            )
            if nfT is None and sfT is None:
                pending_sh = feats_in = inv = None
                continue  # final bounce, NEE off: nothing left to trace
            feats_in, pending_sh, inv = sortk(
                scene, st, nfT, sfT, nfT is not None, sfT is not None
            )
            if nfT is not None:
                featsT = nfT
        if cfg.has_skybox:
            # featsT still holds the last bounce's STATIONARY input rows
            # (nfT is None on the last bounce)
            st = _hdr_sky_payoff(scene.skybox, cam.sun_direction, st, featsT)
        if pending_sh is not None:
            held = (st, pending_sh, inv, finishk)
        else:
            film = finishk(st, None, film)
        _throttle(film, k // fold, _THROTTLE_GROUPS_SORTED)
    if held is not None:
        film = flush_held(held, film)
    return film


def _flush_held_rs(held, film, g16, scene, K):
    """Ray-sorted variant of _flush_held: the held shadow rows are in
    their group's final ray order; finish unsorts the occlusion column
    through the held inverse permutation."""
    rad, prev_nee, shadow_sorted, inv, finish = held
    occ = K.occlude_packed(shadow_sorted, g16, scene.tile_aabbs) != 0
    return finish(rad, prev_nee, occ, inv, film)


def _render_batch_raysorted(
    scene, cfg, cam, px, py, offsets, sample_start, n_samples, film,
    bt, interpret, prec,
):
    """Multi-tile staged driver, ray-sorted (see _stages_raysorted):
    kernels receive origin-coherent, dead-last ray blocks; the path
    state never moves. Keeps the unsorted driver's sample folding and
    the held-group trick (the final shadow scan of group k rides group
    k+1's bounce-0 kernel)."""
    g16 = scene.tri_feats16
    K = _Kernels(bt, interpret, prec)
    fold = pick_sample_fold(px.shape[0], n_samples)
    tiled = _tile_inputs((px, py, offsets), fold)
    held = None  # (radiance, prev_nee, sorted_shadow, inv, finish)
    for k in range(0, n_samples, fold):
        g = min(fold, n_samples - k)
        init, pres, finish = _stages_raysorted(
            cfg, fold=g, edge_margin=near_edge_margin(prec)
        )
        pxg, pyg, offg = (
            tiled if g == fold else _tile_inputs((px, py, offsets), g)
        )
        if held is not None and held[2].shape[0] != pxg.shape[0]:
            film = _flush_held_rs(held, film, g16, scene, K)
            held = None
        st, feats, sidx = init(
            cam, pxg, pyg, jnp.uint32(sample_start + k), offg
        )
        prev_nee = pending_shadow = inv = None
        for bounce in range(cfg.max_bounces):
            held_here = bounce == 0 and held is not None
            sh = held[2] if held_here else pending_shadow
            if sh is None:
                t, idx, t2, i2 = K.nearest(feats, g16, scene.tile_aabbs)
                prev_occ = None
            else:
                t, idx, prev_occ, t2, i2 = K.nearest_shadow(
                    feats, sh, g16, scene.tile_aabbs
                )
            if held_here:
                rad_h, nee_h, _sh, inv_h, finish_h = held
                film = finish_h(rad_h, nee_h, prev_occ, inv_h, film)
                held = None
                prev_occ = None
            st, feats, nee, inv = pres[bounce](
                scene, cam, st, prev_nee, prev_occ, t, idx, t2, i2, inv,
                sidx, offg,
            )
            prev_nee = pending_shadow = None
            if nee is not None:
                prev_nee, pending_shadow = nee
        if pending_shadow is not None:
            held = (st, prev_nee, pending_shadow, inv, finish)
        else:
            film = finish(st, prev_nee, None, None, film)
        _throttle(film, k // fold, _THROTTLE_GROUPS_SORTED)
    if held is not None:
        film = _flush_held_rs(held, film, g16, scene, K)
    return film


def _quantize_schedule(counts, lanes: int, bt: int, measured: int = None):
    """Static per-bounce keep-lane counts from measured keep counts.

    `measured` is the lane count the counts were observed over (a pilot
    subsample); estimates scale up to `lanes`. Quantized to a coarse
    power-of-two grid (each level a bt multiple) so only a handful of
    kernel/stage shapes ever compile, with a 10% + one-block safety
    margin over the measurement; overflow beyond the margin is detected
    at run time and the window re-rendered. Returns None when
    compaction would not drop at least half the lanes anywhere (not
    worth the extra executables)."""
    scale = lanes / max(measured or lanes, 1)
    levels = sorted(
        min(lanes, -(-(lanes // d) // bt) * bt) for d in (1, 2, 4, 8, 16, 32)
    )
    ks = []
    for c in counts:
        need = int(c * scale * 1.10) + bt
        ks.append(next((lv for lv in levels if lv >= need), lanes))
    for i in range(1, len(ks)):  # keep-set only shrinks
        ks[i] = min(ks[i], ks[i - 1])
    if min(ks) > lanes // 2:
        return None
    return tuple(ks)


# (schedule, camera-signature) per (scene table id, cfg, lanes, bt,
# prec): the pilot probe costs a host sync + a ~10-executable dispatch
# chain (~0.3 s measured over the tunnel), which dominated small and
# interactive renders when it ran per call. Keep counts depend on the
# camera, so a cached schedule is reused only while the camera matches;
# a stale/wrong schedule is never a correctness risk (the overflow flag
# re-renders the window uncompacted), only a perf blip.
_PILOT_CACHE: dict = {}


def _cached_pilot_schedule(
    scene, cfg, cam, px, py, offsets, sample_start, lanes, bt, interpret,
    prec,
):
    # keyed on the pilot fn identity too, so tests that monkeypatch
    # _pilot_schedule never hit entries produced by a different pilot
    key = (id(scene.tri_feats16), cfg, lanes, bt, prec, id(_pilot_schedule))
    leaves = jax.tree_util.tree_leaves(cam)
    sig = (
        np.concatenate(
            [np.ravel(np.asarray(leaf, np.float64)) for leaf in leaves]
        )
        if leaves
        else np.zeros(0)
    )
    hit = _PILOT_CACHE.get(key)
    if hit is not None and hit[1].shape == sig.shape and np.allclose(
        hit[1], sig, atol=1e-6
    ):
        return hit[0]
    sched = _pilot_schedule(
        scene, cfg, cam, px, py, offsets, sample_start, lanes, bt,
        interpret, prec,
    )
    if len(_PILOT_CACHE) > 64:
        _PILOT_CACHE.clear()
    _PILOT_CACHE[key] = (sched, sig)
    return sched


def _pilot_schedule(
    scene, cfg, cam, px, py, offsets, sample_start, lanes, bt, interpret,
    prec,
):
    """Measure per-bounce keep counts on a strided pixel subsample (one
    sample, uncompacted) and quantize into a compaction schedule for
    the full lane set. The pilot is a few thousand lanes — its kernel
    and stage shapes compile in seconds and its dispatch chain is
    ~trivial next to one real sample group — so every real group runs
    compacted (a group-0 measurement would leave single-group renders,
    e.g. low-spp folded batches, uncompacted)."""
    if cfg.max_bounces < 2:
        return None
    stride = max(1, px.shape[0] // 8192)
    ppx, ppy, poff = px[::stride], py[::stride], offsets[::stride]
    g16 = scene.tri_feats16
    init, pres, _ = _stages_sorted(
        cfg, fold=1, schedule=None, edge_margin=near_edge_margin(prec)
    )
    st, feats, sidx, lane2px = init(
        cam, ppx, ppy, jnp.uint32(sample_start), poff
    )
    offsets_s = poff
    prev_nee = pending_shadow = None
    counts = []
    for bounce in range(cfg.max_bounces - 1):
        if pending_shadow is None:
            t, idx, t2, i2 = flash_nearest(
                feats, g16, scene.tile_aabbs, bt=bt, interpret=interpret,
                precision=prec,
            )
            prev_occ = None
        else:
            t, idx, prev_occ, t2, i2 = flash_nearest_shadow(
                feats, pending_shadow, g16, scene.tile_aabbs,
                bt=bt, interpret=interpret, precision=prec,
            )
        st, feats, nee, sidx, offsets_s, lane2px, nk = pres[bounce](
            scene, cam, st, prev_nee, prev_occ, t, idx, t2, i2,
            sidx, offsets_s, lane2px, None, None,
        )
        counts.append(nk)
        prev_nee = pending_shadow = None
        if nee is not None:
            prev_nee, pending_shadow = nee
    host = [int(np.asarray(c)) for c in counts]
    return _quantize_schedule(host, lanes, bt, measured=ppx.shape[0])


# Auto sort-mode threshold: the state-sorted driver's whole-state
# permute overhead is ~15-30% (measured round 5: PBRTest 2.27 -> 1.62,
# BreakTime 0.81 -> 0.68); its compaction saves (1 - work_fraction) of
# every stage. Measured crossover on v5e (1280x720x16, 3 reps each):
# GlassTest W=0.594 state WINS +39% (2.46 -> 3.42), PBRTest W=0.812
# LOSES -29%, VeachMIS W=0.875 loses. 0.7 splits the measured points.
_STATE_SORT_MAX_W = float(os.environ.get("RUSTIC_STATE_SORT_MAX_W", "0.7"))


def _pick_sort_mode(
    scene, cfg, cam, px, py, offsets, sample_start, n_samples, bt,
    interpret, prec,
) -> str:
    """Pick the multi-tile driver from the measured compaction pilot:
    'state' (whole-state re-sort + compaction schedules) when enough
    lanes retire early for the head-slicing to outweigh the permute
    traffic, else 'rays' (pixel-stationary state). The pilot is the
    same cached strided probe the state driver uses for its schedules
    (one probe per scene/config/camera; ~0.3 s once)."""
    fold = pick_sample_fold(px.shape[0], n_samples, sorted_path=True)
    lanes = px.shape[0] * fold
    schedule = _cached_pilot_schedule(
        scene, cfg, cam, px, py, offsets, sample_start, lanes, bt,
        interpret, prec,
    )
    if schedule is None:
        return "rays"  # no usable schedule -> compaction can't pay
    work = (lanes + sum(schedule)) / (cfg.max_bounces * lanes)
    return "state" if work <= _STATE_SORT_MAX_W else "rays"


def _render_batch_sorted(
    scene, cfg, cam, px, py, offsets, sample_start, n_samples, film,
    bt, interpret, prec, mesh=None,
):
    """Staged driver with per-bounce path re-sorting and compaction.

    A strided pilot probe (_pilot_schedule) measures per-bounce keep
    counts once; the quantized schedule then compacts every group.
    Compacted groups accumulate into a side film with an overflow flag;
    every _THROTTLE_GROUPS_SORTED groups the flag is read back at the
    throttle sync — clean windows merge into the main film, overflowed
    windows (schedule under-predicted: possible but ~never, the margin
    is ~100 sigma of the binomial lane-count noise) are re-rendered
    uncompacted, so compaction can never bias the image."""
    if _spp_size(mesh) > 1:
        raise NotImplementedError(
            "sorted staged driver: the sample-parallel ('spp') mesh axis"
            " is wired only for the unsorted single-tile path (_stages);"
            " use a ('px',) mesh for multi-tile scenes"
        )
    g16 = scene.tri_feats16
    K = _Kernels(bt, interpret, prec, mesh)
    fold = (
        1 if mesh is not None
        else pick_sample_fold(px.shape[0], n_samples, sorted_path=True)
    )
    tiled = _tile_inputs((px, py, offsets), fold)

    def run_group(k, g, schedule, film_in, oflow):
        """One fold-group of g samples; returns the updated film
        (+ oflow and per-bounce keep counts in the respective modes)."""
        init, pres, finish = _stages_sorted(
            cfg, fold=g, schedule=schedule,
            edge_margin=near_edge_margin(prec), mesh=mesh,
        )
        pxg, pyg, offg = (
            tiled if g == fold else _tile_inputs((px, py, offsets), g)
        )
        sample_idx = jnp.uint32(sample_start + k)
        st, feats, sidx, lane2px = init(cam, pxg, pyg, sample_idx, offg)
        offsets_s = offg
        prev_nee = pending_shadow = None
        for bounce in range(cfg.max_bounces):
            if pending_shadow is None:
                t, idx, t2, i2 = K.nearest(feats, g16, scene.tile_aabbs)
                prev_occ = None
            else:
                t, idx, prev_occ, t2, i2 = K.nearest_shadow(
                    feats, pending_shadow, g16, scene.tile_aabbs
                )
            outs = pres[bounce](
                scene, cam, st, prev_nee, prev_occ, t, idx, t2, i2,
                sidx, offsets_s, lane2px,
                film_in if schedule is not None else None,
                oflow if schedule is not None else None,
            )
            if schedule is not None:
                st, feats, nee, sidx, offsets_s, lane2px, film_in, oflow = outs
            elif bounce == cfg.max_bounces - 1:
                st, feats, nee, sidx, offsets_s, lane2px = outs
            else:
                # nk (the keep count) is only consumed by the pilot
                # measurement pass (_pilot_schedule), not here
                st, feats, nee, sidx, offsets_s, lane2px, _nk = outs
            prev_nee = pending_shadow = None
            if nee is not None:
                prev_nee, pending_shadow = nee
        final_occ = None
        if pending_shadow is not None:
            final_occ = (
                K.occlude_packed(pending_shadow, g16, scene.tile_aabbs) != 0
            )
        film_in = finish(st, prev_nee, final_occ, film_in, lane2px)
        return film_in, oflow

    lanes = px.shape[0] * fold
    # Compaction schedules are single-device for now: the pilot measures
    # global keep counts but the head slice would need a per-shard
    # schedule under a mesh.
    schedule = None if mesh is not None else _cached_pilot_schedule(
        scene, cfg, cam, px, py, offsets, sample_start, lanes, bt,
        interpret, prec,
    )
    window_film = window_oflow = None
    window_ks = []

    def flush_window():
        nonlocal film, schedule, window_film, window_oflow, window_ks
        if not window_ks:
            return
        if bool(np.asarray(window_oflow)):
            # ~never: the pilot under-predicted (margin is ~100 sigma of
            # subsample noise). Re-render the window uncompacted and stop
            # compacting — correctness never depends on the schedule.
            schedule = None
            for k2 in window_ks:
                g2 = min(fold, n_samples - k2)
                film, _ = run_group(k2, g2, None, film, None)
            np.asarray(film[:1])
        else:
            film = film + window_film
        window_film = window_oflow = None
        window_ks = []

    for k in range(0, n_samples, fold):
        g = min(fold, n_samples - k)
        if g != fold or schedule is None:
            film, _ = run_group(k, g, None, film, None)
            _throttle(film, k // fold, _THROTTLE_GROUPS_SORTED)
        else:
            if window_film is None:
                window_film = jnp.zeros_like(film)
                window_oflow = jnp.zeros((), bool)
            window_film, window_oflow = run_group(
                k, g, schedule, window_film, window_oflow
            )
            window_ks.append(k)
            if len(window_ks) >= _THROTTLE_GROUPS_SORTED:
                flush_window()
    flush_window()
    return film
