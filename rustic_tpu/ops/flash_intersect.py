"""Flash intersection — the Pallas TPU kernels for ray/scene traversal.

The XLA formulation in ops/intersect.py materializes the [rays, tris]
Möller–Trumbore scalars in HBM, which makes traversal bandwidth-bound.
These kernels are the fused version: ray tiles and triangle tiles stream
through VMEM, the four pair-scalar blocks (det, u·det, v·det, t·det)
come off the MXU as one [BT, 4·TT] tile, the epilogue and a *running
min-reduction over triangle tiles* happen on-chip, and only the per-ray
(t, winner-index) pair is written to HBM — flash-attention's trick
applied to ray casting. On single-tile scenes the kernels additionally
emit the winner's packed shading row (flash_nearest_attrs): a one-hot
select over the bit-exact bf16 hi/mid/lo attr split runs at full MXU
utilization in VMEM (~1.4 ms added) and replaces the consumer's ~5 ms
latency-bound row gather, bit-for-bit. Multi-tile scenes keep the
gather (the winner isn't final until all tiles have run).

Dot precision (static `precision` arg on every entry point):
  "f32"    — Precision.HIGHEST pair dot everywhere, exact
             division-based epilogue + dual min/argmin reductions: the
             bit-faithful oracle mode (flash == brute to float
             rounding); also the interpret (CPU test) default.
  "bf16x3" — compensated 3-pass bf16 split: each f32 operand is split
             into bf16 hi + bf16 lo residual and the dot is
             hi@hi + (hi@lo + lo@hi), f32-accumulated. A 2-way bf16
             split carries ~16 mantissa bits, so error is ~2^-16 of the
             summed terms vs HIGHEST's ~2^-24 (HIGHEST *is* the 3-way
             split). Fast but can misrank winners near edges; opt-in.
  "mixed"  — nearest scans stay "f32"; shadow/occlusion any-hit scans
             use the bf16x3 dot. Viable because of the det-scale
             normalization in pack_tri_feats16: every triangle's four
             numerator columns carry a common 1/|e1×e2| factor (the
             u/v/t quotients are invariant), making det = -cosθ, so
             the split-dot scans can raise their det threshold to
             DET_EPS_SPLIT — far above the ~2^-16 dot noise — and a
             noise-dominated det can no longer mint random occluders
             (pre-normalization this ate ~25% of NEE energy on
             DarkCornell).
  "mixed2" — SPLIT-ROLE nearest dot: the det and t numerator columns
             run at f32 (6-pass), the u and v columns at bf16x3
             (3-pass) — 18 instead of 24 single-pass-equivalents per
             nearest scan. Safe because the two failure modes of a
             noisy scan are asymmetric: t/det noise MISRANKS winners
             (image-level errors, needed the top-2 carry), while u/v
             noise only blurs the validity window at triangle EDGES —
             an epsilon-expanded window plus the consumer's exact f32
             winner re-test resolves those exactly (same contract the
             bf16x3 margin already relies on). Ranking stays exact, so
             no top-2 carry is needed. Any-hit scans are bf16x3 as in
             "mixed".
  "auto"   — "f32" when interpret=True, else $RUSTIC_FLASH_DOT
             (default "mixed").

Measured on v5e (DarkCornell 1280x720x40spp, interleaved best-of-3,
correct compensated split): f32 5.4, mixed 5.6, bf16x3 6.4 Mpaths/s.
Quality vs f32 at 64x64x64spp: mixed max|d| 5.7e-4 (nearest scan is
bit-exact f32; only grazing-shadow visibility can differ), bf16x3
max|d| 0.14 with ~2% of pixels off by >0.01 (winner misranking near
edges) — hence mixed is the default and bf16x3 stays opt-in.

Layout contract (built in scene/world.py):
  ray features  F [B, 16] f32 = [rd, ro×rd, ro, 1, maxt, pad..]
  tri features  G [16, NT * 4 * TT] f32 — per triangle tile j the
                columns [j*4TT : (j+1)*4TT] hold the four numerator
                blocks [det | u | v | t], each TT wide,
                det-scale-normalized per triangle (see
                pack_tri_feats16). Zero-padded triangle columns have
                det == 0 => never valid.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rustic_tpu.ops.sampling import EPS

BIG = 1e6
DET_EPS = 1e-6
# det is -cosθ after det-scale normalization (pack_tri_feats16); the
# bf16x3 split dot's det noise is ~3·2^-16 ≈ 5e-5, so 1e-3 (grazing
# beyond 89.94°) keeps 20x headroom while rejecting noise-dominated dets
DET_EPS_SPLIT = 1e-3

DEF_BT = 1024  # rays per tile
DEF_TT = 512  # triangles per tile

SH_MAXT_COL = 10  # shadow rays carry max_t in this spare feature column


def _tt_cap() -> int:
    """Triangle-tile width cap. $RUSTIC_TT overrides DEF_TT (experiments:
    finer tiles turn single-tile scenes into multi-tile ones, engaging
    per-block AABB culling + path sorting at the cost of grid overhead).
    Read at scene PACK time — pack and render in one process."""
    return int(os.environ.get("RUSTIC_TT", DEF_TT))


def padded_tri_count(t_count: int) -> int:
    """Pad to a lane multiple (128); beyond one tile, to a tile multiple."""
    tt = _tt_cap()
    if t_count <= tt:
        return -(-t_count // 128) * 128
    return -(-t_count // tt) * tt


def tile_size(t_pad: int) -> int:
    return min(t_pad, _tt_cap())


def pack_tri_feats16(tri_feats):
    """[10, T, 4] feature tensor (scene/world.py) -> [16, NT*4*TT].

    Each triangle's four numerator columns are scaled by 1/|e1×e2|
    (det-scale normalization): the u/v/t quotients are invariant to a
    common column scale, but the normalized det becomes -cosθ ∈ [-1,1]
    regardless of triangle size, so DET_EPS is a fixed *angular*
    threshold that sits far above the bf16x3 split dot's ~2^-16 noise
    floor — without it, tiny-area triangles have |det| below the noise
    and the split dot turns near-parallel pairs into random occluders.
    """
    import numpy as np

    t_count = tri_feats.shape[1]
    t_pad = padded_tri_count(t_count)
    tt = tile_size(t_pad)
    nt = t_pad // tt
    src = np.moveaxis(np.asarray(tri_feats), 2, 0)  # [4, 10, T]
    n_len = np.linalg.norm(src[0, 0:3, :], axis=0)  # |n| (det col = -n)
    src = src * np.where(n_len > 0.0, 1.0 / np.maximum(n_len, 1e-30), 1.0)
    g = np.zeros((16, nt, 4, tt), np.float32)
    for j in range(nt):
        cols = src[:, :, j * tt : (j + 1) * tt]
        g[: cols.shape[1], j, :, : cols.shape[2]] = np.moveaxis(cols, 0, 1)
    return g.reshape(16, nt * 4 * tt)


def resolve_precision(precision: str, interpret: bool) -> str:
    if precision != "auto":
        return precision
    if interpret:
        return "f32"
    # "x6" default since round 3: the same flat-in-K measurement that
    # made f32p the round-2c default (tools/mxu_floor.py: scan dots are
    # OUTPUT-bound, f32 HIGHEST = 2.75x one bf16 pass) also means an
    # f32-accuracy dot can ride the idle systolic depth as ONE bf16
    # pass at K=96 — six exact bf16 cross terms of a 3-way split
    # concatenated along the contraction dim (_prep_f_x6). Measured
    # (tools/probe_k96.py): 1.00x a bf16 K=16 pass vs f32H's 2.78x,
    # max rel error vs f64 3.96e-07 (f32H itself: 2.07e-07). End to
    # end (tools/probe_x6_e2e.py, DarkCornell 1280x720x40spp warm
    # interleaved best-of-3): x6 16.60 vs f32p 9.63 Mpaths/s, film
    # mean equal to 6 decimals. No margins, no raised det floor; the
    # older plans stay one env flip away.
    return os.environ.get("RUSTIC_FLASH_DOT", "x6")


def near_edge_margin(precision: str) -> float:
    """The consumer-side barycentric clamp margin matching the kernel's
    epsilon-expanded validity window (classify_flash_hit edge_margin).
    Nonzero only for split-window nearest scans WITHOUT a top-2 carry:
    with top-2, the dual exact re-test resolves margin admits instead."""
    plan = _plan_for(precision, "near")
    return plan.near_margin if not plan.top2 else 0.0


def split_bf16(a):
    """f32 -> (bf16 hi, bf16 lo) with a == hi + lo up to bf16 lo rounding.

    The rounding MUST go through lax.reduce_precision: writing it as
    `a - a.astype(bf16).astype(f32)` lets XLA's excess-precision pass
    elide the f32->bf16->f32 round-trip inside jit, making lo == 0 and
    silently degrading the compensated dot to a single bf16 pass
    (measured: 2.6e-3 relative error instead of ~8e-6, and 29% shadow
    flips on FurnaceTest). reduce_precision is a real XLA op and
    survives optimization."""
    hi_f = jax.lax.reduce_precision(a, 8, 7)  # bf16-representable, still f32
    hi = hi_f.astype(jnp.bfloat16)  # exact conversion
    lo = (a - hi_f).astype(jnp.bfloat16)
    return hi, lo


def split_bf16_kernel(a):
    """In-kernel (Mosaic) variant of split_bf16. Mosaic has no
    reduce_precision lowering, but it also has no excess-precision pass:
    the convert+subtract formulation compiles faithfully there (verified
    numerically against the host emulation — see split_bf16's docstring
    for why this same code is NOT safe under XLA jit)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def split_bf16x3(a):
    """f32 -> (hi, mid, lo) bf16 with hi + mid + lo == a exactly: each
    residual carries 8 fresh mantissa bits, 3x8 covering f32's 24 (the
    rounding rides reduce_precision — see split_bf16 — so XLA cannot
    elide it). Sub-denormal lo parts flush to zero on TPU; their lost
    contribution to a dot is ~2^-126, irrelevant at geometry scale."""
    hi_f = jax.lax.reduce_precision(a, 8, 7)
    r1 = a - hi_f
    mid_f = jax.lax.reduce_precision(r1, 8, 7)
    lo = (r1 - mid_f).astype(jnp.bfloat16)
    return hi_f.astype(jnp.bfloat16), mid_f.astype(jnp.bfloat16), lo


def _g_cat6(tri_feats16):
    """G-side operand of the "x6" plan: [96, N] bf16 blocks
    [hb mb lb hb mb hb] (pairing with the F-side [ha ha ha ma ma la]
    gives the six kept cross terms — see _prep_f_x6)."""
    hi, mid, lo = split_bf16x3(tri_feats16)
    return jnp.concatenate([hi, mid, lo, hi, mid, hi], axis=0)


def _prep_f_x6(f_t):
    """In-kernel F-side prep of the "x6" plan: [16, BT] f32 ray features
    -> [96, BT] bf16 blocks [ha ha ha ma ma la].

    The "x6" dot is the round-3 algorithmic move: tools/mxu_floor.py
    proved the scan dots OUTPUT-bound (time flat in K from 8 to 128,
    f32 HIGHEST = 2.75x one bf16 pass), so an f32-accuracy dot can ride
    the idle systolic depth as ONE bf16 pass at K=96. Each operand
    splits into three bf16 parts (a == ha+ma+la exactly); the six cross
    terms >= 2^-24 of the term scale concatenate along K:

        a.b = ha.hb + ha.mb + ha.lb + ma.hb + ma.mb + la.hb  (kept)
            + ma.lb + la.mb + la.lb                          (dropped)

    Every kept bf16xbf16 product is exact in the f32 accumulator, so
    the only error is the dropped tail + accumulation rounding.
    Measured on v5e (tools/probe_k96.py): 0.558 ns/128out == 1.00x a
    bf16 K=16 pass (f32 HIGHEST: 1.538 = 2.78x); max relative error vs
    float64 on real DarkCornell MT features 3.96e-07 — within 2x of
    f32 HIGHEST's own 2.07e-07. Mosaic's convert+subtract split is
    faithful (no excess-precision pass; see split_bf16_kernel)."""
    hi = f_t.astype(jnp.bfloat16)
    r1 = f_t - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, hi, hi, mid, mid, lo], axis=0)


def _epilogue(raw, tt, margin: float = 0.0, det_eps: float = DET_EPS):
    """[BT, 4*TT] numerators -> u, v, t, valid ([BT, TT] each).

    `margin` epsilon-expands the barycentric validity window: the
    bf16x3 nearest scan uses it so its ~2^-16 dot error cannot reject a
    true edge hit (a false *positive* is harmless — the consumer
    re-tests the winner in exact f32 and clamps, classify_flash_hit).
    `det_eps` is an *angular* threshold (det is -cosθ after the packing
    normalization); split-dot scans raise it above their noise floor."""
    det = raw[:, 0 * tt : 1 * tt]
    u_num = raw[:, 1 * tt : 2 * tt]
    v_num = raw[:, 2 * tt : 3 * tt]
    t_num = raw[:, 3 * tt : 4 * tt]
    good = jnp.abs(det) >= det_eps
    inv = jnp.where(good, pl.reciprocal(jnp.where(good, det, 1.0)), 0.0)
    u = u_num * inv
    v = v_num * inv
    t = t_num * inv
    m = margin
    valid = (
        good
        & (u >= -m)
        & (u <= 1.0 + m)
        & (v >= -m)
        & (u + v <= 1.0 + m)
        & (t > EPS)
    )
    return u, v, t, valid


def _dot_default(a, b):
    return jax.lax.dot_general(
        a,
        b,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _dot_f32(f_tile, g_block):
    # HIGHEST = full-f32 passes on the MXU (Mosaic supports only
    # DEFAULT/HIGHEST; plain DEFAULT bf16 breaks EPS-scale geometry).
    return jax.lax.dot_general(
        f_tile,
        g_block,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# Transposed-lhs variants: the scan kernels take ray features as
# [16, BT] (B-minor), because that matches the layout XLA naturally
# assigns the [B, 16] feature arrays in the surrounding stages
# ({0,1}, i.e. physically [16, B]) — so the jit-boundary transpose into
# the Mosaic-required row-major layout is a free bitcast instead of a
# 118 MB-per-launch relayout copy (and the row-major [B, 16] form would
# additionally pad 16 -> 128 lanes, 8x the HBM footprint).
def _dotT_default(f_t, b):
    return jax.lax.dot_general(
        f_t,
        b,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _dotT_f32(f_t, g_block):
    return jax.lax.dot_general(
        f_t,
        g_block,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _dotT_split3(f_t, g_hi, g_lo):
    f_hi, f_lo = split_bf16_kernel(f_t)
    return _dotT_default(f_hi, g_hi) + (
        _dotT_default(f_hi, g_lo) + _dotT_default(f_lo, g_hi)
    )


class _DotPlan:
    """Which G-side operands a precision mode ships to VMEM and how the
    nearest / any-hit scans consume them (see module docstring)."""

    def __init__(self, precision: str, exact: bool = None):
        if precision == "f32p":
            # f32 HIGHEST dots everywhere + the fast packed epilogue
            # (see _plan_for). Exact dot, so no margins/det-eps raise.
            precision = "f32"
            exact = False if exact is None else exact
        self.precision = precision
        # "f32" is the oracle/debug mode: its scans keep the exact
        # division-based epilogue + dual min/argmin so flash == brute to
        # float rounding. The production modes ("mixed"/"bf16x3", and
        # the f32-dot nearest scan running under "mixed") use the
        # numerator-domain validity + packed single-reduction epilogue,
        # whose 14-bit-mantissa t floor can resolve near-tied silhouette
        # surfaces differently from brute (measured: one 4-spp pixel in
        # 64^2 VeachMIS off by 5e-2; mean |d| ~1e-5, energy 1.0000).
        self.exact = (precision == "f32") if exact is None else exact
        # inclusive validity margin for the nearest scan when any of its
        # window columns ride the ~2^-16 bf16 split (see _epilogue).
        # $RUSTIC_NEAR_MARGIN tunes it: the margin trades false edge
        # REJECTS (cracks, if below the split-dot noise) against the
        # clamp-shaded false-admit bias measured at +0.30% film energy
        # at 1e-3 (see resolve_precision) — the bias scales ~linearly
        # with the margin while the noise floor is ~5e-5.
        split_near = precision in ("bf16x1", "bf16x3", "mixed2", "near2")
        margin = float(os.environ.get("RUSTIC_NEAR_MARGIN", "2e-4"))
        self.near_margin = margin if split_near else 0.0
        # split-window scans also raise the det floor: every window
        # quantity scales with d while the split-dot noise is absolute,
        # so tiny-d pairs would otherwise drown in u/v noise
        self.near_det_eps = DET_EPS_SPLIT if split_near else DET_EPS
        # "x6" dot noise (~4e-7 of term scale, probe_k96.py) sits within
        # 2x of f32 HIGHEST's own, so it keeps the exact-grade floor.
        self.any_det_eps = (
            DET_EPS if precision in ("f32", "x6") else DET_EPS_SPLIT
        )
        # The bf16x3 nearest scan carries its TOP-2 candidates out of the
        # packed reduction: the consumer re-tests both in exact f32 and
        # keeps the nearest valid one (classify_flash_hit2), so a wrong
        # final winner needs THREE triangles inside the ~2^-16 dot noise
        # window along one ray instead of two — closing the
        # winner-misranking hole that kept bf16x3 opt-in.
        # ($RUSTIC_TOP2=0 disables the carry — perf experiments only.)
        self.top2 = (
            precision == "bf16x3"
            and os.environ.get("RUSTIC_TOP2", "1") == "1"
        )
        # per-operand G block widths in units of TT (the BlockSpec /
        # VMEM geometry). "near2" is the nearest-only collapse of
        # "mixed2" (see _plan_for): [det|t] f32 + [u|v] hi/lo. The full
        # "mixed2" additionally ships [det|t] hi/lo for the any-hit
        # side of merged kernels.
        widths = {
            "f32": [4],
            "bf16x1": [4],
            "bf16x3": [4, 4],
            "mixed": [4, 4, 4],
            "near2": [2, 2, 2],
            "mixed2": [2, 2, 2, 2, 2],
            "x6": [4],
        }
        if precision not in widths:
            raise ValueError(f"unknown flash dot precision: {precision!r}")
        self.g_widths = widths[precision]
        self.ng = len(self.g_widths)
        self.g0_tts = self.g_widths[0]
        # operand element sizes (f32 full / bf16 hi+lo), matching g_widths
        sizes = {
            "f32": [4],
            "bf16x1": [2],
            "bf16x3": [2, 2],
            "mixed": [4, 2, 2],
            "near2": [4, 2, 2],
            "mixed2": [4, 2, 2, 2, 2],
            "x6": [2],
        }
        self.g_itemsizes = sizes[precision]
        # operand ROW counts (the contraction dim): 16 ray features,
        # except the "x6" 6-cross-term concat at K=96 (see _prep_f_x6)
        self.g_rows = [96 if precision == "x6" else 16] * self.ng

    def prep_f(self, f_t):
        """Per-kernel-invocation F-side dot-operand prep (identity for
        every plan but "x6"). Kernel bodies call this ONCE and thread
        the result to every tile's dot, so multi-tile/resident loops
        never re-split; slab tests and SH_MAXT_COL reads keep using the
        raw f32 rows."""
        return _prep_f_x6(f_t) if self.precision == "x6" else f_t

    def g_operands(self, tri_feats16):
        if self.precision == "x6":
            return (_g_cat6(tri_feats16),)
        if self.precision in ("near2", "mixed2"):
            t_pad, tt, nt = _geometry(tri_feats16)
            g = tri_feats16.reshape(16, nt, 4, tt)
            dt = g[:, :, (0, 3), :].reshape(16, nt * 2 * tt)
            uv = g[:, :, (1, 2), :].reshape(16, nt * 2 * tt)
            uv_hi, uv_lo = split_bf16(uv)
            if self.precision == "near2":
                return (dt, uv_hi, uv_lo)
            dt_hi, dt_lo = split_bf16(dt)
            return (dt, uv_hi, uv_lo, dt_hi, dt_lo)
        if self.precision == "f32":
            return (tri_feats16,)
        hi, lo = split_bf16(tri_feats16)
        if self.precision == "bf16x1":
            # EXPERIMENTAL speed-ceiling probe: one raw bf16 pass per
            # role (~2^-9-relative dot noise — NOT production-safe
            # without a repair pass; see PERFORMANCE.md round-2c).
            return (hi,)
        if self.precision == "bf16x3":
            return (hi, lo)
        return (tri_feats16, hi, lo)

    def dot_near(self, f_t, g_blocks):
        # f_t is the prep_f() output: raw [16, BT] f32 rows for every
        # plan except "x6", whose prepped [96, BT] bf16 operand rides a
        # single DEFAULT-precision pass (see _prep_f_x6).
        if self.precision == "x6":
            return _dotT_default(f_t, g_blocks[0])
        if self.precision == "bf16x1":
            return _dotT_default(split_bf16_kernel(f_t)[0], g_blocks[0])
        if self.precision == "bf16x3":
            return _dotT_split3(f_t, g_blocks[0], g_blocks[1])
        return _dotT_f32(f_t, g_blocks[0])

    def dot_any(self, f_t, g_blocks):
        if self.precision == "x6":
            return _dotT_default(f_t, g_blocks[0])
        if self.precision == "f32":
            return _dotT_f32(f_t, g_blocks[0])
        if self.precision == "bf16x1":
            return _dotT_default(split_bf16_kernel(f_t)[0], g_blocks[0])
        return _dotT_split3(f_t, g_blocks[-2], g_blocks[-1])

    def near_scalars(self, f_t, g_blocks, tt):
        """Sign-folded (d, us, vs, ts) for the nearest scan."""
        if self.precision in ("near2", "mixed2"):
            raw_dt = _dotT_f32(f_t, g_blocks[0])  # [BT, 2tt]: [det | t]
            raw_uv = _dotT_split3(f_t, g_blocks[1], g_blocks[2])
            return _fold_dt_uv(raw_dt, raw_uv, tt)
        return _num_split(self.dot_near(f_t, g_blocks), tt)

    def any_scalars(self, f_t, g_blocks, tt):
        """Sign-folded (d, us, vs, ts) for the any-hit scan."""
        if self.precision == "mixed2":
            raw_dt = _dotT_split3(f_t, g_blocks[3], g_blocks[4])
            raw_uv = _dotT_split3(f_t, g_blocks[1], g_blocks[2])
            return _fold_dt_uv(raw_dt, raw_uv, tt)
        assert self.precision != "near2", "near2 plans have no any-hit side"
        return _num_split(self.dot_any(f_t, g_blocks), tt)


def _dot_split3(f_tile, g_hi, g_lo):
    """Row-major-lhs compensated dot — kept for the experimental fused
    bounce kernel, which still ships [BT, 16] feature blocks."""
    f_hi, f_lo = split_bf16_kernel(f_tile)
    return _dot_default(f_hi, g_hi) + (
        _dot_default(f_hi, g_lo) + _dot_default(f_lo, g_hi)
    )


# int bits of BIG (1e6f). Its low IDX_BITS are zero, so a floored
# packed winner unpacks to exactly BIG when a tile has no valid hit.
_BIG_BITS = 0x49742400
IDX_BITS = 9  # DEF_TT=512 local indices; tt > 512 would not fit
_IDX_MASK = (1 << IDX_BITS) - 1


def _num_split(raw, tt):
    """[BT, 4*TT] raw -> sign-folded numerators (d, us, vs, ts).

    The Möller–Trumbore window tests are evaluated in the NUMERATOR
    domain (multiply every inequality by |det| instead of dividing all
    four scalars by det): u >= 0 becomes us >= 0, u+v <= 1 becomes
    us+vs <= d, t > EPS becomes ts > EPS*d. This removes the per-pair
    reciprocal+3 muls from the epilogue — which is the kernels' real
    floor (measured: the 6-pass dot is 5.8 ms of a 16 ms nearest scan;
    the epilogue is the rest)."""
    det = raw[:, 0 * tt : 1 * tt]
    s = jnp.where(det < 0.0, -1.0, 1.0)
    d = det * s
    us = raw[:, 1 * tt : 2 * tt] * s
    vs = raw[:, 2 * tt : 3 * tt] * s
    ts = raw[:, 3 * tt : 4 * tt] * s
    return d, us, vs, ts


def _fold_dt_uv(raw_dt, raw_uv, tt):
    """Split-role raws ([BT, 2tt] [det|t], [BT, 2tt] [u|v]) ->
    sign-folded (d, us, vs, ts) — _num_split for the mixed2 layout."""
    det = raw_dt[:, :tt]
    s = jnp.where(det < 0.0, -1.0, 1.0)
    return det * s, raw_uv[:, :tt] * s, raw_uv[:, tt:] * s, raw_dt[:, tt:] * s


def _tile_minarg(plan, f_tile, g_blocks, tt):
    """Nearest valid candidate of one tile: (t_min, argmin).

    min+argmin ride ONE packed int reduction: t's sign bit is 0 for
    every valid candidate (t > EPS), so its f32 bits order like floats;
    the low IDX_BITS are replaced by the local triangle index. The
    winner's t is floored to a 14-bit mantissa — consumers re-derive
    the exact t from the winner triangle (classify_flash_hit), and the
    in-kernel uses (cross-tile compare, cull limit) only see the same
    consistently-floored values."""
    if plan.exact:
        _, _, t, valid = _epilogue(
            plan.dot_near(f_tile, g_blocks), tt,
            margin=plan.near_margin, det_eps=plan.near_det_eps,
        )
        tm = jnp.where(valid, t, BIG)
        return jnp.min(tm, axis=1), jnp.argmin(tm, axis=1).astype(jnp.int32)
    assert not plan.top2, "top2 plans use _tile_top2"
    d, us, vs, ts = plan.near_scalars(f_tile, g_blocks, tt)
    m = plan.near_margin
    # The whole validity window as ONE min-gate (the scans are VPU
    # issue-bound, so every elementwise pass counts): us>=0 & vs>=0 &
    # us+vs<=d & ts>EPS*d  <=>  min(us, vs, d-us-vs, ts-EPS*d) >= 0
    # (us<=d is implied by vs>=0 & us+vs<=d), and d>=det_eps rides in
    # as one more min term. Boundary (==0) pairs differ from the old
    # chained compares by at most 1 ulp of associativity — measure-zero
    # edge hits the consumer's exact winner re-test resolves anyway.
    if m == 0.0:
        gate = jnp.minimum(
            jnp.minimum(us, vs), jnp.minimum(d - us - vs, ts - EPS * d)
        )
    else:
        # margin mode (bf16x3 nearest): epsilon-expanded window; the
        # dropped us<=(1+m)d check only widens it further (safe — false
        # positives are killed by the exact re-test).
        md = m * d
        gate = jnp.minimum(
            jnp.minimum(us + md, vs + md),
            jnp.minimum(d + md - us - vs, ts - EPS * d),
        )
    valid = jnp.minimum(gate, d - plan.near_det_eps) >= 0.0
    # unguarded reciprocal: d == 0 yields inf/NaN whose int bits exceed
    # _BIG_BITS, and those pairs are masked invalid anyway
    t = ts * pl.reciprocal(d)
    bits = jax.lax.bitcast_convert_type(t, jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    packed = jnp.where(valid, (bits & ~_IDX_MASK) | iota, _BIG_BITS)
    win = jnp.min(packed, axis=1)
    tmin = jax.lax.bitcast_convert_type(win & ~_IDX_MASK, jnp.float32)
    return tmin, win & _IDX_MASK


def _unpack(win):
    return (
        jax.lax.bitcast_convert_type(win & ~_IDX_MASK, jnp.float32),
        win & _IDX_MASK,
    )


def _tile_top2(plan, f_tile, g_blocks, tt):
    """Top-2 valid candidates of one tile: (t1, i1, t2, i2), t1 <= t2.

    Same packed candidates as _tile_minarg, reduced by a fold-halves
    TOURNAMENT that carries (best, second) per position: per level,
    best = min(a1, b1) and second = min(max(a1, b1), min(a2, b2)).
    Measured on v5e at [1024, 512] i32: +1.2 ms over a single packed
    min — a winner-masked second jnp.min pass (broadcast compare +
    select + re-reduce) costs +5.8 ms. Packed values are distinct per
    column (the index rides in the low bits), so exact ties cannot
    duplicate one candidate into both slots. Rays with < 2 valid
    candidates read BIG/0 in the missing slots."""
    d, us, vs, ts = _num_split(plan.dot_near(f_tile, g_blocks), tt)
    md = plan.near_margin * d
    gate = jnp.minimum(
        jnp.minimum(us + md, vs + md),
        jnp.minimum(d + md - us - vs, ts - EPS * d),
    )
    valid = jnp.minimum(gate, d - plan.near_det_eps) >= 0.0
    t = ts * pl.reciprocal(d)
    bits = jax.lax.bitcast_convert_type(t, jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    m1 = jnp.where(valid, (bits & ~_IDX_MASK) | iota, _BIG_BITS)
    width = 1 << (tt - 1).bit_length()  # fold needs a power-of-two width
    if width != tt:
        m1 = jnp.pad(
            m1, ((0, 0), (0, width - tt)), constant_values=_BIG_BITS
        )
    m2 = jnp.full_like(m1, _BIG_BITS)
    while width > 1:
        h = width // 2
        a1, b1 = m1[:, :h], m1[:, h:width]
        a2, b2 = m2[:, :h], m2[:, h:width]
        m1 = jnp.minimum(a1, b1)
        m2 = jnp.minimum(jnp.maximum(a1, b1), jnp.minimum(a2, b2))
        width = h
    return _unpack(m1[:, 0]) + _unpack(m2[:, 0])


def _merge_top2(t1o, i1o, t2o, i2o, s1, b1, s2, b2):
    """Merge two per-ray sorted candidate pairs into the union's top-2.

    Candidates come from disjoint triangle tiles, so indices never
    collide. top1 = min(t1o, s1); top2 = min(max(t1o, s1),
    min(t2o, s2)) — the standard 2x2 bitonic merge. Ties break toward
    the accumulated pair (arbitrary but deterministic)."""
    c = s1 < t1o
    n1t = jnp.where(c, s1, t1o)
    n1i = jnp.where(c, b1, i1o)
    lt = jnp.where(c, t1o, s1)  # loser of the top-1 duel
    li = jnp.where(c, i1o, b1)
    d2 = s2 < t2o
    mt = jnp.where(d2, s2, t2o)
    mi = jnp.where(d2, b2, i2o)
    e = lt < mt
    return (
        n1t, n1i, jnp.where(e, lt, mt), jnp.where(e, li, mi)
    )


def _tile_anyhit(plan, f_raw, fd, g_blocks, tt):
    """Any valid hit within (EPS, max_t] (max_t from SH_MAXT_COL) -> [BT] i32.

    Pure numerator-domain: t <= max_t becomes ts <= max_t*d — the
    any-hit scan does no division at all. `f_raw` is the [16, BT] f32
    feature rows (max_t source); `fd` is plan.prep_f's dot operand."""
    if plan.exact:
        _, _, t, valid = _epilogue(
            plan.dot_any(fd, g_blocks), tt, det_eps=plan.any_det_eps
        )
        hit = valid & (t <= f_raw[SH_MAXT_COL, :][:, None])
        return jnp.any(hit, axis=1).astype(jnp.int32)
    d, us, vs, ts = plan.any_scalars(fd, g_blocks, tt)
    maxt = f_raw[SH_MAXT_COL, :][:, None]
    # Same single-min-gate trick as _tile_minarg, with the det threshold
    # and the max_t window folded in; "any valid" then reduces as one
    # max over columns instead of compare+and+any per pair.
    gate = jnp.minimum(
        jnp.minimum(us, vs), jnp.minimum(d - us - vs, ts - EPS * d)
    )
    gate = jnp.minimum(
        jnp.minimum(gate, maxt * d - ts), d - plan.any_det_eps
    )
    return (jnp.max(gate, axis=1) >= 0.0).astype(jnp.int32)


def _tile_possible(f_t, aabb_row, limit):
    """Can ANY ray in this block hit the tile AABB closer than its
    current limit? Scalar verdict for @pl.when tile culling. ~20 VPU ops
    per ray vs a full MXU tile step per skipped tile. f_t: [16, BT]."""
    rd = f_t[0:3, :]
    ro = f_t[6:9, :]
    inv = jnp.where(jnp.abs(rd) < 1e-12, jnp.where(rd < 0, -1e12, 1e12), 1.0 / rd)
    t1 = (aabb_row[0:3][:, None] - ro) * inv
    t2 = (aabb_row[4:7][:, None] - ro) * inv
    lo = jnp.minimum(t1, t2)
    hi = jnp.maximum(t1, t2)
    tmin = jnp.maximum(jnp.maximum(lo[0, :], lo[1, :]), lo[2, :])
    tmax = jnp.minimum(jnp.minimum(hi[0, :], hi[1, :]), hi[2, :])
    ok = (tmax >= tmin) & (tmax > 0.0) & (tmin < limit)
    return jnp.any(ok)


# ---------------------------------------------------------------------------
# kernel bodies (closures over the dot implementation)
# ---------------------------------------------------------------------------


def _winner_attrs(tile_arg, parts, tt):
    """The winner's packed shading row via three one-hot bf16 matmuls
    over the bit-exact hi/mid/lo attr split (scene/world.py:
    _split_rows_bf16x3). Each pass selects one exactly-representable
    part (a single nonzero product), and the f32 sum of the parts IS
    the original f32 value — so this equals the row gather bit-for-bit
    while costing ~0.5 ms of full-utilization MXU time at B=0.92M
    (vs ~5 ms for the XLA gather the consumer would otherwise do). The
    one-hot lives only in VMEM/VREGs — an XLA-level version loses the
    win to HBM round-trips of the [B, T] one-hot.

    Emitted TRANSPOSED ([W, BT], parts [W, tt]): the consumer stages'
    natural layout for a [B, W] attr table is {0,1} (physically
    [W, B]), so the transposed emission makes the jit-boundary
    transpose a free bitcast instead of a ~1 GB relayout copy."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (tt, tile_arg.shape[0]), 0)
    oh = (iota == tile_arg[None, :]).astype(jnp.bfloat16)
    return (
        _dot_default(parts[0], oh) + _dot_default(parts[1], oh)
    ) + _dot_default(parts[2], oh)


def _emit_near(plan, f, g_blocks, tt, near_refs):
    """Run the tile's nearest reduction and write it to the output rows.
    near_refs is (t, idx) or (t, idx, t2, idx2) for top-2 plans."""
    if plan.top2:
        t_ref, idx_ref, t2_ref, idx2_ref = near_refs
        t1, a1, t2, a2 = _tile_top2(plan, f, g_blocks, tt)
        t_ref[0, :] = t1
        idx_ref[0, :] = a1
        t2_ref[0, :] = t2
        idx2_ref[0, :] = a2
        return a1
    t_ref, idx_ref = near_refs
    tile_min, tile_arg = _tile_minarg(plan, f, g_blocks, tt)
    t_ref[0, :] = tile_min
    idx_ref[0, :] = tile_arg
    return tile_arg


def _merge_near(plan, f, g_blocks, tt, j, near_refs):
    """Multi-tile accumulate step: fold this tile's candidates into the
    running output rows (local winner indices offset by the tile base)."""
    if plan.top2:
        t_ref, idx_ref, t2_ref, idx2_ref = near_refs
        s1, b1, s2, b2 = _tile_top2(plan, f, g_blocks, tt)
        n1t, n1i, n2t, n2i = _merge_top2(
            t_ref[0, :], idx_ref[0, :], t2_ref[0, :], idx2_ref[0, :],
            s1, b1 + j * tt, s2, b2 + j * tt,
        )
        t_ref[0, :] = n1t
        idx_ref[0, :] = n1i
        t2_ref[0, :] = n2t
        idx2_ref[0, :] = n2i
        return
    t_ref, idx_ref = near_refs
    tile_min, tile_arg = _tile_minarg(plan, f, g_blocks, tt)
    better = tile_min < t_ref[0, :]
    t_ref[0, :] = jnp.where(better, tile_min, t_ref[0, :])
    idx_ref[0, :] = jnp.where(better, tile_arg + j * tt, idx_ref[0, :])


def _init_near(near_refs):
    for k, r in enumerate(near_refs):
        r[...] = jnp.full_like(r, BIG) if k % 2 == 0 else jnp.zeros_like(r)


def _cull_limit(plan, near_refs):
    """Tile-cull limit: top-2 plans must keep any tile that could still
    contribute a SECOND-best candidate, so they cull against t2."""
    return near_refs[2][0, :] if plan.top2 else near_refs[0][0, :]


def _n_near(plan):
    return 4 if plan.top2 else 2


def _nearest_single_attrs(plan):
    ng = plan.ng
    nn = _n_near(plan)

    def kernel(*refs):
        f_ref = refs[0]
        g_blocks = tuple(r[...] for r in refs[1 : 1 + ng])
        parts = tuple(r[...] for r in refs[1 + ng : 4 + ng])
        near_refs = refs[4 + ng : 4 + ng + nn]
        attr_refs = refs[4 + ng + nn :]
        tt = g_blocks[0].shape[-1] // plan.g0_tts
        _emit_near(plan, plan.prep_f(f_ref[...]), g_blocks, tt, near_refs)
        attr_refs[0][...] = _winner_attrs(near_refs[1][0, :], parts, tt)
        if plan.top2:
            attr_refs[1][...] = _winner_attrs(near_refs[3][0, :], parts, tt)

    return kernel


def _nearest_shadow_single_attrs(plan):
    ng = plan.ng
    nn = _n_near(plan)

    def kernel(*refs):
        f_ref, sh_ref = refs[0], refs[1]
        g_blocks = tuple(r[...] for r in refs[2 : 2 + ng])
        parts = tuple(r[...] for r in refs[2 + ng : 5 + ng])
        near_refs = refs[5 + ng : 5 + ng + nn]
        occ_ref = refs[5 + ng + nn]
        attr_refs = refs[6 + ng + nn :]
        tt = g_blocks[0].shape[-1] // plan.g0_tts
        _emit_near(plan, plan.prep_f(f_ref[...]), g_blocks, tt, near_refs)
        sh = sh_ref[...]
        occ_ref[0, :] = _tile_anyhit(plan, sh, plan.prep_f(sh), g_blocks, tt)
        attr_refs[0][...] = _winner_attrs(near_refs[1][0, :], parts, tt)
        if plan.top2:
            attr_refs[1][...] = _winner_attrs(near_refs[3][0, :], parts, tt)

    return kernel


def _nearest_single(plan):
    ng = plan.ng

    def kernel(*refs):
        f_ref = refs[0]
        g_blocks = tuple(r[...] for r in refs[1 : 1 + ng])
        near_refs = refs[1 + ng :]
        tt = g_blocks[0].shape[-1] // plan.g0_tts
        _emit_near(plan, plan.prep_f(f_ref[...]), g_blocks, tt, near_refs)

    return kernel


def _nearest_multi(plan):
    ng = plan.ng

    def kernel(*refs):
        f_ref = refs[0]
        g_refs = refs[1 : 1 + ng]
        aabb_ref = refs[1 + ng]
        near_refs = refs[2 + ng :]
        j = pl.program_id(1)
        tt = g_refs[0].shape[-1] // plan.g0_tts

        @pl.when(j == 0)
        def _():
            _init_near(near_refs)

        f = f_ref[...]
        aabb_row = aabb_ref[pl.ds(j, 1), :][0, :]

        @pl.when(_tile_possible(f, aabb_row, _cull_limit(plan, near_refs)))
        def _():
            g_blocks = tuple(r[...] for r in g_refs)
            _merge_near(plan, plan.prep_f(f), g_blocks, tt, j, near_refs)

    return kernel


def _g_tile(g_refs, nt, j):
    """Static per-tile slices of resident full-G refs."""
    return tuple(
        r[:, j * (r.shape[-1] // nt) : (j + 1) * (r.shape[-1] // nt)]
        for r in g_refs
    )


def _nearest_resident(plan, nt):
    """Multi-tile nearest with the WHOLE triangle table resident in VMEM
    and the tile loop unrolled in-kernel: one grid step per ray block,
    so fine tile granularity no longer pays the per-grid-step overhead
    that made small $RUSTIC_TT lose (PERFORMANCE.md). Tiles are visited
    in build order; each @pl.when body reads its slice only when the
    block-level slab test passes, with the running best-t as the cull
    limit exactly as in _nearest_multi."""
    ng = plan.ng

    def kernel(*refs):
        f_ref = refs[0]
        g_refs = refs[1 : 1 + ng]
        aabb_ref = refs[1 + ng]
        near_refs = refs[2 + ng :]
        tt = g_refs[0].shape[-1] // nt // plan.g0_tts
        _init_near(near_refs)
        f = f_ref[...]
        fd = plan.prep_f(f)
        for j in range(nt):
            aabb_row = aabb_ref[j, :]

            @pl.when(_tile_possible(f, aabb_row, _cull_limit(plan, near_refs)))
            def _(j=j):
                _merge_near(plan, fd, _g_tile(g_refs, nt, j), tt, j, near_refs)

    return kernel


def _nearest_shadow_resident(plan, nt):
    ng = plan.ng
    nn = _n_near(plan)

    def kernel(*refs):
        f_ref, sh_ref = refs[0], refs[1]
        g_refs = refs[2 : 2 + ng]
        aabb_ref = refs[2 + ng]
        near_refs = refs[3 + ng : 3 + ng + nn]
        occ_ref = refs[3 + ng + nn]
        tt = g_refs[0].shape[-1] // nt // plan.g0_tts
        _init_near(near_refs)
        occ_ref[...] = jnp.zeros_like(occ_ref)
        f = f_ref[...]
        sh = sh_ref[...]
        fd = plan.prep_f(f)
        shd = plan.prep_f(sh)
        for j in range(nt):
            aabb_row = aabb_ref[j, :]

            @pl.when(_tile_possible(f, aabb_row, _cull_limit(plan, near_refs)))
            def _(j=j):
                _merge_near(plan, fd, _g_tile(g_refs, nt, j), tt, j, near_refs)

            @pl.when(_tile_possible(sh, aabb_row, sh[SH_MAXT_COL, :]))
            def _(j=j):
                occ_ref[0, :] = occ_ref[0, :] | _tile_anyhit(
                    plan, sh, shd, _g_tile(g_refs, nt, j), tt
                )

    return kernel


def _occlude_resident(plan, nt):
    ng = plan.ng

    def kernel(*refs):
        f_ref = refs[0]
        g_refs = refs[1 : 1 + ng]
        aabb_ref = refs[1 + ng]
        occ_ref = refs[2 + ng]
        tt = g_refs[0].shape[-1] // nt // plan.g0_tts
        occ_ref[...] = jnp.zeros_like(occ_ref)
        f = f_ref[...]
        fd = plan.prep_f(f)
        for j in range(nt):
            aabb_row = aabb_ref[j, :]

            @pl.when(_tile_possible(f, aabb_row, f[SH_MAXT_COL, :]))
            def _(j=j):
                occ_ref[0, :] = occ_ref[0, :] | _tile_anyhit(
                    plan, f, fd, _g_tile(g_refs, nt, j), tt
                )

    return kernel


def _nearest_shadow_single(plan):
    ng = plan.ng
    nn = _n_near(plan)

    def kernel(*refs):
        f_ref, sh_ref = refs[0], refs[1]
        g_blocks = tuple(r[...] for r in refs[2 : 2 + ng])
        near_refs = refs[2 + ng : 2 + ng + nn]
        occ_ref = refs[2 + ng + nn]
        tt = g_blocks[0].shape[-1] // plan.g0_tts
        _emit_near(plan, plan.prep_f(f_ref[...]), g_blocks, tt, near_refs)
        sh = sh_ref[...]
        occ_ref[0, :] = _tile_anyhit(plan, sh, plan.prep_f(sh), g_blocks, tt)

    return kernel


def _nearest_shadow_multi(plan):
    ng = plan.ng
    nn = _n_near(plan)

    def kernel(*refs):
        f_ref, sh_ref = refs[0], refs[1]
        g_refs = refs[2 : 2 + ng]
        aabb_ref = refs[2 + ng]
        near_refs = refs[3 + ng : 3 + ng + nn]
        occ_ref = refs[3 + ng + nn]
        j = pl.program_id(1)
        tt = g_refs[0].shape[-1] // plan.g0_tts

        @pl.when(j == 0)
        def _():
            _init_near(near_refs)
            occ_ref[...] = jnp.zeros_like(occ_ref)

        f = f_ref[...]
        sh = sh_ref[...]
        aabb_row = aabb_ref[pl.ds(j, 1), :][0, :]

        @pl.when(_tile_possible(f, aabb_row, _cull_limit(plan, near_refs)))
        def _():
            g_blocks = tuple(r[...] for r in g_refs)
            _merge_near(plan, plan.prep_f(f), g_blocks, tt, j, near_refs)

        @pl.when(_tile_possible(sh, aabb_row, sh[SH_MAXT_COL, :]))
        def _():
            g_blocks = tuple(r[...] for r in g_refs)
            occ_ref[0, :] = occ_ref[0, :] | _tile_anyhit(
                plan, sh, plan.prep_f(sh), g_blocks, tt
            )

    return kernel


def _occlude_single(plan):
    ng = plan.ng

    def kernel(*refs):
        f_ref = refs[0]
        g_blocks = tuple(r[...] for r in refs[1 : 1 + ng])
        occ_ref = refs[1 + ng]
        tt = g_blocks[0].shape[-1] // plan.g0_tts
        f = f_ref[...]
        occ_ref[0, :] = _tile_anyhit(plan, f, plan.prep_f(f), g_blocks, tt)

    return kernel


def _occlude_multi(plan):
    ng = plan.ng

    def kernel(*refs):
        f_ref = refs[0]
        g_refs = refs[1 : 1 + ng]
        aabb_ref = refs[1 + ng]
        occ_ref = refs[2 + ng]
        j = pl.program_id(1)
        tt = g_refs[0].shape[-1] // plan.g0_tts

        @pl.when(j == 0)
        def _():
            occ_ref[...] = jnp.zeros_like(occ_ref)

        f = f_ref[...]
        aabb_row = aabb_ref[pl.ds(j, 1), :][0, :]

        @pl.when(_tile_possible(f, aabb_row, f[SH_MAXT_COL, :]))
        def _():
            g_blocks = tuple(r[...] for r in g_refs)
            occ_ref[0, :] = occ_ref[0, :] | _tile_anyhit(
                plan, f, plan.prep_f(f), g_blocks, tt
            )

    return kernel


# ---------------------------------------------------------------------------
# DMA-streamed multi-tile mode (cull-proportional G fetch)
# ---------------------------------------------------------------------------
# The streamed multi-tile kernels above pay one G-block DMA per
# (ray block, tile) GRID STEP even for tiles the slab test culls:
# Pallas prefetches operand blocks by index map, so @pl.when skips only
# the MXU work. At megabatch sizes that fetch IS the scan — PBRTest
# 1280x720 measures 358 ms/nearest dispatch (trace_exec, round 3),
# which is exactly its ~266 GB of per-step x6 G traffic at HBM rate,
# with wall time linear in tile count and the tt/resident knobs flat
# (tools/probe_multitile). These variants make the fetch
# cull-proportional, the TPU shape of the reference's hierarchical
# traversal (reference: kernels/src/intersection.rs:177-234 does
# O(log T) node fetches per ray; here each RAY BLOCK fetches only the
# tiles its slab tests admit):
#   grid = (ray blocks,) only. Each step slab-tests ALL tiles against
#   its block, compacts the admitted tile ids into SMEM, then
#   double-buffer-DMAs ONLY those tiles' G columns from HBM (ANY
#   memory space) and folds them into the running winner. DMA and MXU
#   work both drop to the visited-tile fraction, and the per-grid-step
#   machinery drops from nb*nt to nb steps.


def _g_dtypes(plan):
    return [jnp.float32 if s == 4 else jnp.bfloat16 for s in plan.g_itemsizes]


def _dma_scratch(plan, tt, nt, n_lists=1):
    """scratch_shapes for a DMA-streamed kernel: one (2, rows, w*tt)
    double buffer per G operand and an (ng, 2) DMA semaphore array.
    (The admitted-tile lists arrive as SMEM operands — see
    _block_tile_lists — so no list scratch remains.)"""
    return [
        pltpu.VMEM((2, r, w * tt), d)
        for r, w, d in zip(plan.g_rows, plan.g_widths, _g_dtypes(plan))
    ] + [pltpu.SemaphoreType.DMA((plan.ng, 2))]


def _interval_mul(a_lo, a_hi, b_lo, b_hi):
    """Interval product bounds: [a]*[b] via the four corner products."""
    p1 = a_lo * b_lo
    p2 = a_lo * b_hi
    p3 = a_hi * b_lo
    p4 = a_hi * b_hi
    return (
        jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
        jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)),
    )


def _block_admits(feats, tile_aabbs, bt, use_maxt: bool):
    """Conservative per-(ray-block, tile) slab admits [nb, nt] — the
    XLA twin of the kernels' per-ray _tile_possible, via interval
    arithmetic over each block's origin/inv-direction/max-t ranges.

    Sound over-approximation: any tile some ray in the block could hit
    is admitted (a superset keeps the kernels bit-exact — extra tiles
    only add candidates that lose the running min / any-hit OR). With
    the drivers' Morton-sorted, octant-pure, dead-last blocks the
    intervals are tight; fully-retired sentinel blocks (origin 1e7,
    max_t -1) admit nothing, so dead blocks cost one empty grid step.

    Why this lives in XLA and not the kernel: measured on v5e (PBRTest
    921k rays, 47 tiles), BOTH multi-tile kernel families spend
    ~1.7 us per (block, tile) on the in-kernel test machinery — the
    vector slab + cross-lane any() + scalar branch — which caps the
    whole scan at ~300 ms regardless of culling or block size. Here
    the same verdicts cost ~40 fused elementwise ops on [nb, nt]
    arrays (microseconds), and the kernels loop over exactly the
    admitted tiles."""
    b = feats.shape[-1]
    nb = b // bt
    f3 = feats.reshape(16, nb, bt)
    ro = f3[6:9]
    rd = f3[0:3]
    inv = jnp.where(
        jnp.abs(rd) < 1e-12, jnp.where(rd < 0, -1e12, 1e12), 1.0 / rd
    )
    o_lo, o_hi = ro.min(-1), ro.max(-1)  # [3, nb]
    iv_lo, iv_hi = inv.min(-1), inv.max(-1)
    if use_maxt:
        limit_hi = f3[SH_MAXT_COL].max(-1)  # [nb]
    else:
        limit_hi = jnp.full((nb,), BIG, jnp.float32)
    lo_t = tile_aabbs[:, 0:3]  # [nt, 3]
    hi_t = tile_aabbs[:, 4:7]
    tmin_lo = None
    tmax_hi = None
    for a in range(3):
        a_lo = lo_t[:, a][None, :] - o_hi[a][:, None]  # [nb, nt]
        a_hi = lo_t[:, a][None, :] - o_lo[a][:, None]
        t1_lo, t1_hi = _interval_mul(
            a_lo, a_hi, iv_lo[a][:, None], iv_hi[a][:, None]
        )
        b_lo = hi_t[:, a][None, :] - o_hi[a][:, None]
        b_hi = hi_t[:, a][None, :] - o_lo[a][:, None]
        t2_lo, t2_hi = _interval_mul(
            b_lo, b_hi, iv_lo[a][:, None], iv_hi[a][:, None]
        )
        slo_lo = jnp.minimum(t1_lo, t2_lo)  # lower bound of min(t1, t2)
        shi_hi = jnp.maximum(t1_hi, t2_hi)  # upper bound of max(t1, t2)
        tmin_lo = slo_lo if tmin_lo is None else jnp.maximum(tmin_lo, slo_lo)
        tmax_hi = shi_hi if tmax_hi is None else jnp.minimum(tmax_hi, shi_hi)
    return (
        (tmax_hi >= tmin_lo)
        & (tmax_hi > 0.0)
        & (tmin_lo < limit_hi[:, None])
    )


@functools.partial(jax.jit, static_argnames=("bt", "maxt_flags"))
def _block_tile_lists(tile_aabbs, bt: int, maxt_flags, *feats_sets):
    """Admitted-tile lists for the DMA-streamed kernels: for each ray
    block, the ascending tile ids any of the ray sets may hit, with
    per-set admit flags packed into bits 20+ (the _compact_possible
    convention). Returns TRANSPOSED (plist [nt, nb128] i32, pcount
    [1, nb128] i32), nb padded up to a multiple of 128: the kernels
    window these per 128 consecutive ray blocks (block (nt, 128) /
    (1, 128)) — Mosaic's lowering requires SMEM block dims divisible
    by (8, 128) or equal to the array dims, so per-single-block rows
    can't be windowed, but a 128-block column window can, keeping SMEM
    residency at (nt+1)*128 ints per grid step regardless of batch
    size (the old full-[nb, nt] operand capped B at ~1.4M lanes)."""
    nt = tile_aabbs.shape[0]
    admits = [
        _block_admits(f, tile_aabbs, bt, use_maxt)
        for f, use_maxt in zip(feats_sets, maxt_flags)
    ]
    nb = admits[0].shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (nb, nt), 1)
    packed = iota
    any_ok = admits[0]
    for i, m in enumerate(admits):
        packed = packed + jnp.where(m, jnp.int32(1 << (20 + i)), 0)
        if i:
            any_ok = any_ok | m
    # stable ascending compaction: admitted ids first, original order
    key = jnp.where(any_ok, iota, iota + nt)
    order = jnp.argsort(key, axis=1)
    plist = jnp.take_along_axis(packed, order, axis=1)
    pcount = any_ok.sum(axis=1, dtype=jnp.int32)[:, None]
    pad = (-nb) % 128
    if pad:
        plist = jnp.pad(plist, ((0, pad), (0, 0)))
        pcount = jnp.pad(pcount, ((0, pad), (0, 0)))
    return plist.T, pcount.T


def _stream_possible(plan, g_hbm, bufs, sems, tt, count, read, body):
    """Double-buffered streaming over the admitted-tile list (read(k)
    -> packed id, an SMEM row lookup): start tile k+1's G copies while
    folding tile k. The 2-step unroll keeps the buffer slot STATIC
    (Mosaic reads of a dynamically-indexed VMEM buffer would
    round-trip; @pl.when guards the odd tail)."""
    ng = plan.ng
    w = plan.g_widths

    def copies(k, slot):
        j = read(k) & _LIST_ID_MASK  # strip the per-test admit flags
        return [
            pltpu.make_async_copy(
                g_hbm[o].at[:, pl.ds(j * (w[o] * tt), w[o] * tt)],
                bufs[o].at[slot],
                sems.at[o, slot],
            )
            for o in range(ng)
        ]

    @pl.when(count > 0)
    def _():
        for c in copies(0, 0):
            c.start()

    def step(m, carry):
        for slot in (0, 1):  # static buffer slot
            k = 2 * m + slot

            @pl.when(k < count)
            def _(k=k, slot=slot):
                @pl.when(k + 1 < count)
                def _():
                    for c in copies(k + 1, 1 - slot):
                        c.start()

                for c in copies(k, slot):
                    c.wait()
                body(read(k), tuple(b[slot] for b in bufs), k)

        return carry

    jax.lax.fori_loop(0, (count + 1) // 2, step, jnp.int32(0))


_LIST_ID_MASK = (1 << 20) - 1


def _nearest_multi_dma(plan, nt):
    ng = plan.ng
    nn = _n_near(plan)

    def kernel(*refs):
        count_ref, list_ref = refs[0], refs[1]  # SMEM (1,128)/(nt,128)
        i = pl.program_id(0) % 128  # column inside this 128-block window
        f_ref = refs[2]
        g_hbm = refs[3 : 3 + ng]
        near_refs = refs[3 + ng : 3 + ng + nn]
        bufs = refs[3 + ng + nn : 3 + 2 * ng + nn]
        sems = refs[3 + 2 * ng + nn]
        tt = g_hbm[0].shape[-1] // (nt * plan.g0_tts)
        _init_near(near_refs)
        f = f_ref[...]
        fp = plan.prep_f(f)

        def body(packed, g_blocks, _k):
            j = packed & _LIST_ID_MASK
            _merge_near(plan, fp, g_blocks, tt, j, near_refs)

        _stream_possible(
            plan, g_hbm, bufs, sems, tt, count_ref[0, i],
            lambda k: list_ref[k, i], body,
        )

    return kernel


def _nearest_shadow_multi_dma(plan, nt):
    ng = plan.ng
    nn = _n_near(plan)

    def kernel(*refs):
        count_ref, list_ref = refs[0], refs[1]  # SMEM (1,128)/(nt,128)
        i = pl.program_id(0) % 128
        f_ref, sh_ref = refs[2], refs[3]
        g_hbm = refs[4 : 4 + ng]
        near_refs = refs[4 + ng : 4 + ng + nn]
        occ_ref = refs[4 + ng + nn]
        bufs = refs[5 + ng + nn : 5 + 2 * ng + nn]
        sems = refs[5 + 2 * ng + nn]
        tt = g_hbm[0].shape[-1] // (nt * plan.g0_tts)
        _init_near(near_refs)
        occ_ref[...] = jnp.zeros_like(occ_ref)
        f = f_ref[...]
        sh = sh_ref[...]
        fp = plan.prep_f(f)
        shp = plan.prep_f(sh)

        def body(packed, g_blocks, _k):
            j = packed & _LIST_ID_MASK

            @pl.when((packed & (1 << 20)) != 0)
            def _():
                _merge_near(plan, fp, g_blocks, tt, j, near_refs)

            @pl.when((packed & (1 << 21)) != 0)
            def _():
                occ_ref[0, :] = occ_ref[0, :] | _tile_anyhit(
                    plan, sh, shp, g_blocks, tt
                )

        _stream_possible(
            plan, g_hbm, bufs, sems, tt, count_ref[0, i],
            lambda k: list_ref[k, i], body,
        )

    return kernel


def _occlude_multi_dma(plan, nt):
    ng = plan.ng

    def kernel(*refs):
        count_ref, list_ref = refs[0], refs[1]  # SMEM (1,128)/(nt,128)
        i = pl.program_id(0) % 128
        f_ref = refs[2]
        g_hbm = refs[3 : 3 + ng]
        occ_ref = refs[3 + ng]
        bufs = refs[4 + ng : 4 + 2 * ng]
        sems = refs[4 + 2 * ng]
        tt = g_hbm[0].shape[-1] // (nt * plan.g0_tts)
        occ_ref[...] = jnp.zeros_like(occ_ref)
        f = f_ref[...]
        fp = plan.prep_f(f)

        def body(packed, g_blocks, _k):
            j = packed & _LIST_ID_MASK
            occ_ref[0, :] = occ_ref[0, :] | _tile_anyhit(
                plan, f, fp, g_blocks, tt
            )

        _stream_possible(
            plan, g_hbm, bufs, sems, tt, count_ref[0, i],
            lambda k: list_ref[k, i], body,
        )

    return kernel


# The per-block lists ride as TRANSPOSED [nt, nb128] SMEM operands
# windowed per 128 consecutive ray blocks (Mosaic requires SMEM block
# dims divisible by (8, 128) or equal to the array dims — a full-array
# operand capped the batch at ~1.4M lanes and silently disabled DMA
# streaming at megabatch sizes); kernels index column
# pl.program_id(0) % 128. Gated by _dma_lists_fit (batch-independent).
_COUNT_SPEC = lambda: pl.BlockSpec(  # noqa: E731
    (1, 128), lambda i: (0, i // 128), memory_space=pltpu.SMEM
)
_PLIST_SPEC = lambda nt: pl.BlockSpec(  # noqa: E731
    (nt, 128), lambda i: (0, i // 128), memory_space=pltpu.SMEM
)

_DMA_LIST_SMEM_MAX = 256 * 1024  # bytes of SMEM budget for the lists


def _dma_lists_fit(nt: int) -> bool:
    # Windowed per 128 ray blocks: residency is batch-size-independent.
    return (nt + 1) * 128 * 4 <= _DMA_LIST_SMEM_MAX


def use_dma_stream(interpret: bool, nt: int) -> bool:
    """DMA-streamed multi-tile kernels: DEFAULT ON for TPU multi-tile
    scenes (round-4 hardware session, 2026-08-21): PBRTest 1280x720x16
    1.70 -> 2.23 Mpaths/s (+31%, 3 reps), VeachMIS 2.32 -> 2.38 (tie —
    only 6 tiles, little to cull, and the slab-test/DMA machinery costs
    nothing), film_mean bit-identical on both scenes; the round-3 OOB
    fault is fixed and the interpret-mode bit-equality suite
    (tests/test_dma_stream.py) pins the kernels. $RUSTIC_DMA_STREAM=0
    opts out for A/B probes."""
    if interpret or nt < 2:
        return False
    return os.environ.get("RUSTIC_DMA_STREAM", "1") == "1"


def _g_any_specs(plan):
    return [pl.BlockSpec(memory_space=pltpu.ANY) for _ in range(plan.ng)]


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _pad_rays(feats, bt):
    """[B, 16] feature rows -> transposed [16, B_pad] kernel operand.

    The transpose is a free bitcast when the producer stage handed the
    array over in its natural {0,1} layout (see _dotT_default)."""
    b = feats.shape[0]
    pad = (-b) % bt
    if pad:
        feats = jnp.pad(feats, ((0, pad), (0, 0)))
    return feats.T, b, feats.shape[0] // bt


def _pad_rays_t(feats_t, bt):
    """Already-transposed [16, B] feature rows (the Mosaic shade
    kernel's native output, ops/shade_kernel.py) -> padded operand."""
    b = feats_t.shape[1]
    pad = (-b) % bt
    if pad:
        feats_t = jnp.pad(feats_t, ((0, 0), (0, pad)))
    return feats_t, b, feats_t.shape[1] // bt


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
    env = os.environ.get("RUSTIC_BT")
    if env:
        return int(env)
    _, _, nt = _geometry(tri_feats16)
    return DEF_BT if nt == 1 else 256


def _plan_for(precision: str, role: str) -> _DotPlan:
    """Collapse `mixed`/`mixed2` for single-role kernels so they ship
    only the G-side operands they actually consume. Only the user-level
    "f32" (oracle) mode gets exact reductions — a mixed-mode nearest
    scan collapses to the f32 dot but keeps the fast packed epilogue."""
    exact = precision == "f32"
    if precision == "mixed":
        if role == "near":
            precision = "f32"
        elif role == "any":
            precision = "bf16x3"
    elif precision == "mixed2":
        if role == "near":
            precision = "near2"
        elif role == "any":
            precision = "bf16x3"
    elif precision == "f32p":
        # exact f32 HIGHEST dots on EVERY role with the fast packed
        # epilogue. Was the round-2c default per tools/mxu_floor.py:
        # the scan dots are OUTPUT-bound, so HIGHEST's extra MXU passes
        # accumulate in-array at ~2.8x a single bf16 pass — cheaper
        # than the 3 separate output-materializing dots of a bf16x3
        # split, with none of the margin/bias bookkeeping.
        precision = "f32"
    # "x6" needs no role collapse: its single K=96 bf16 operand serves
    # the nearest and any-hit scans alike at f32-class accuracy
    # (_prep_f_x6), so every role runs the same plan.
    return _DotPlan(precision, exact=exact)


def _g_specs(plan, tt):
    return [
        pl.BlockSpec((r, w * tt), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        for r, w in zip(plan.g_rows, plan.g_widths)
    ]


# ---- resident-G mode (multi-tile, whole triangle table in VMEM) ----------
# One grid step per ray block; the tile loop is unrolled in-kernel, so
# fine $RUSTIC_TT granularity stops paying per-grid-step overhead.
RESIDENT_MAX_TILES = 32
RESIDENT_VMEM_BUDGET = 8 * 1024 * 1024


def use_resident(precision: str, tri_feats16, role: str = "near") -> bool:
    """Static choice (made OUTSIDE jit so env changes take effect per
    call): resident mode when the scene is multi-tile, the unroll stays
    compile-friendly, and every G operand fits the VMEM budget.

    Off by default since the 2026-08-19 roundup: resident measured a
    25% LOSS on FurnaceTest (1.21 -> 0.91 Mpaths/s warm) and a tie
    within tunnel noise on PBRTest/VeachMIS/BreakTime — the per-grid
    -step overhead it removes is no longer the multi-tile bottleneck
    (the sorted driver's permutes are). Opt back in per run with
    RUSTIC_RESIDENT=1."""
    if os.environ.get("RUSTIC_RESIDENT", "0") != "1":
        return False
    # "merged" = the nearest+shadow kernels, which take the full plan
    plan = _DotPlan(precision) if role == "merged" else _plan_for(precision, role)
    t_pad, tt, nt = _geometry(tri_feats16)
    if nt < 2 or nt > int(
        os.environ.get("RUSTIC_RESIDENT_MAX", RESIDENT_MAX_TILES)
    ):
        return False
    g_bytes = t_pad * sum(
        r * w * s
        for r, w, s in zip(plan.g_rows, plan.g_widths, plan.g_itemsizes)
    )
    return g_bytes <= RESIDENT_VMEM_BUDGET


def _g_specs_full(plan, tt, nt):
    return [
        pl.BlockSpec(
            (r, w * tt * nt), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        for r, w in zip(plan.g_rows, plan.g_widths)
    ]


_RAY_SPEC1 = lambda bt: pl.BlockSpec(  # noqa: E731
    (16, bt), lambda i: (0, i), memory_space=pltpu.VMEM
)
_ROW_SPEC1 = lambda bt: pl.BlockSpec(  # noqa: E731
    (1, bt), lambda i: (0, i), memory_space=pltpu.VMEM
)
_AABB_SPEC1 = lambda nt: pl.BlockSpec(  # noqa: E731
    (nt, 8), lambda i: (0, 0), memory_space=pltpu.VMEM
)


_RAY_SPEC = lambda bt: pl.BlockSpec(  # noqa: E731
    (16, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM
)
_ROW_SPEC = lambda bt: pl.BlockSpec(  # noqa: E731
    (1, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM
)
_AABB_SPEC = lambda nt: pl.BlockSpec(  # noqa: E731
    (nt, 8), lambda i, j: (0, 0), memory_space=pltpu.VMEM
)


def _params(interpret):
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _near_out(plan, bt, nb, row_spec=None):
    """(out_specs, out_shapes) for the nearest result rows — (t, idx)
    plus (t2, idx2) under a top-2 plan."""
    nn = _n_near(plan)
    specs = [(row_spec or _ROW_SPEC)(bt)] * nn
    shapes = [
        jax.ShapeDtypeStruct(
            (1, nb * bt), jnp.float32 if k % 2 == 0 else jnp.int32
        )
        for k in range(nn)
    ]
    return specs, shapes


def _near_rows(plan, outs, b):
    """Flatten kernel output rows to [:b] vectors; pad the non-top2 case
    with Nones so every flash_nearest* returns a uniform-arity tuple."""
    flat = tuple(o.reshape(-1)[:b] for o in outs)
    return flat if plan.top2 else flat + (None, None)


def flash_nearest(feats, tri_feats16, tile_aabbs, bt=DEF_BT,
                  interpret=False, precision="auto"):
    """Nearest hit -> (t [B] f32, BIG when missed; idx [B] i32;
    t2, idx2 — the second-best candidate under a top-2 plan, else None).

    The winner's u/v/backface are re-derived exactly by the consumer
    from one gathered attr row (ops/intersect.py:refine_from_attrs)."""
    # resolve OUTSIDE the jit so $RUSTIC_FLASH_DOT is re-read per call,
    # not frozen into the first trace's cache entry
    precision = resolve_precision(precision, interpret)
    t_pad, tt, nt = _geometry(tri_feats16)
    return _flash_nearest(
        feats, tri_feats16, tile_aabbs, bt=bt, interpret=interpret,
        precision=precision,
        resident=use_resident(precision, tri_feats16, "near"),
        dma=use_dma_stream(interpret, nt),
    )


@functools.partial(
    jax.jit,
    static_argnames=("bt", "interpret", "precision", "resident", "dma"),
)
def _flash_nearest(
    feats: jnp.ndarray,
    tri_feats16: jnp.ndarray,
    tile_aabbs: jnp.ndarray,
    bt: int,
    interpret: bool,
    precision: str,
    resident: bool = False,
    dma: bool = False,
):
    plan = _plan_for(precision, "near")
    feats, b, nb = _pad_rays(feats, bt)
    t_pad, tt, nt = _geometry(tri_feats16)
    g_ops = plan.g_operands(tri_feats16)
    if dma and nt > 1 and not plan.top2 and _dma_lists_fit(nt):
        plist, pcount = _block_tile_lists(
            tile_aabbs, bt, (False,), feats
        )
        out_specs, out_shapes = _near_out(plan, bt, nb, row_spec=_ROW_SPEC1)
        outs = pl.pallas_call(
            _nearest_multi_dma(plan, nt),
            grid=(nb,),
            in_specs=[_COUNT_SPEC(), _PLIST_SPEC(nt), _RAY_SPEC1(bt)]
            + _g_any_specs(plan),
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=_dma_scratch(plan, tt, nt),
            compiler_params=_params(interpret),
            interpret=interpret,
        )(pcount, plist, feats, *g_ops)
        return _near_rows(plan, outs, b)
    if resident and nt > 1:
        kernel = _nearest_resident(plan, nt)
        grid = (nb,)
        in_specs = (
            [_RAY_SPEC1(bt)] + _g_specs_full(plan, tt, nt) + [_AABB_SPEC1(nt)]
        )
        operands = [feats, *g_ops, tile_aabbs]
        out_specs, out_shapes = _near_out(plan, bt, nb, row_spec=_ROW_SPEC1)
    else:
        kernel = (_nearest_single if nt == 1 else _nearest_multi)(plan)
        grid = (nb, nt)
        in_specs = [_RAY_SPEC(bt)] + _g_specs(plan, tt)
        operands = [feats, *g_ops]
        if nt > 1:
            in_specs.append(_AABB_SPEC(nt))
            operands.append(tile_aabbs)
        out_specs, out_shapes = _near_out(plan, bt, nb)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=_params(interpret),
        interpret=interpret,
    )(*operands)
    return _near_rows(plan, outs, b)


def _attr_out(plan, w, bt, nb):
    n_attr = 2 if plan.top2 else 1
    specs = [
        pl.BlockSpec((w, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM)
        for _ in range(n_attr)
    ]
    shapes = [
        jax.ShapeDtypeStruct((w, nb * bt), jnp.float32) for _ in range(n_attr)
    ]
    return specs, shapes


def flash_nearest_attrs(feats, tri_feats16, tile_aabbs, attr_split,
                        bt=DEF_BT, interpret=False, precision="auto"):
    """Single-tile nearest hit that also emits the winner's packed attr
    row from inside the kernel (see _winner_attrs) ->
    (t [B], idx [B] i32, attrs [B, W], t2, idx2, attrs2 — the latter
    three None unless the plan carries top-2 candidates)."""
    precision = resolve_precision(precision, interpret)
    return _flash_nearest_attrs(
        feats, tri_feats16, tile_aabbs, attr_split, bt=bt,
        interpret=interpret, precision=precision,
    )


def flash_nearest_attrs_t(feats_t, tri_feats16, tile_aabbs, attr_split,
                          bt=DEF_BT, interpret=False, precision="auto"):
    """flash_nearest_attrs with TRANSPOSED ray/attr layout: takes
    [16, B] feature rows and returns the attr rows as [W, B] — the
    Mosaic shade kernel's native forms (ops/shade_kernel.py), chaining
    kernel-to-kernel with zero relayout."""
    precision = resolve_precision(precision, interpret)
    return _flash_nearest_attrs(
        feats_t, tri_feats16, tile_aabbs, attr_split, bt=bt,
        interpret=interpret, precision=precision, transposed=True,
    )


@functools.partial(
    jax.jit, static_argnames=("bt", "interpret", "precision", "transposed")
)
def _flash_nearest_attrs(
    feats, tri_feats16, tile_aabbs, attr_split, bt, interpret, precision,
    transposed: bool = False,
):
    plan = _plan_for(precision, "near")
    feats, b, nb = (_pad_rays_t if transposed else _pad_rays)(feats, bt)
    t_pad, tt, nt = _geometry(tri_feats16)
    assert nt == 1, "in-kernel attr emission is single-tile only"
    g_ops = plan.g_operands(tri_feats16)
    kernel = _nearest_single_attrs(plan)
    w = attr_split.shape[-1]
    parts = attr_split.transpose(0, 2, 1)  # [3, w, tt] (tiny)
    in_specs = (
        [_RAY_SPEC(bt)]
        + _g_specs(plan, tt)
        + [
            pl.BlockSpec((w, tt), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
            for _ in range(3)
        ]
    )
    near_specs, near_shapes = _near_out(plan, bt, nb)
    attr_specs, attr_shapes = _attr_out(plan, w, bt, nb)
    outs = pl.pallas_call(
        kernel,
        grid=(nb, 1),
        in_specs=in_specs,
        out_specs=near_specs + attr_specs,
        out_shape=near_shapes + attr_shapes,
        compiler_params=_params(interpret),
        interpret=interpret,
    )(feats, *g_ops, parts[0], parts[1], parts[2])
    nn = _n_near(plan)
    t1, i1, t2, i2 = _near_rows(plan, outs[:nn], b)
    if transposed:
        attrs = outs[nn][:, :b]
        attrs2 = outs[nn + 1][:, :b] if plan.top2 else None
    else:
        attrs = outs[nn][:, :b].T
        attrs2 = outs[nn + 1][:, :b].T if plan.top2 else None
    return t1, i1, attrs, t2, i2, attrs2


def flash_nearest_shadow_attrs(feats, shadow_feats, tri_feats16, tile_aabbs,
                               attr_split, bt=DEF_BT, interpret=False,
                               precision="auto"):
    """flash_nearest_shadow + in-kernel winner attr row (single-tile)
    -> (t, idx, occluded [B] bool, attrs [B, W], t2, idx2, attrs2)."""
    precision = resolve_precision(precision, interpret)
    return _flash_nearest_shadow_attrs(
        feats, shadow_feats, tri_feats16, tile_aabbs, attr_split, bt=bt,
        interpret=interpret, precision=precision,
    )


def flash_nearest_shadow_attrs_t(feats_t, shadow_feats_t, tri_feats16,
                                 tile_aabbs, attr_split, bt=DEF_BT,
                                 interpret=False, precision="auto"):
    """Transposed-layout twin of flash_nearest_shadow_attrs (see
    flash_nearest_attrs_t); also returns the occlusion row as raw i32
    so the shade kernel consumes it without an XLA conversion dispatch."""
    precision = resolve_precision(precision, interpret)
    return _flash_nearest_shadow_attrs(
        feats_t, shadow_feats_t, tri_feats16, tile_aabbs, attr_split,
        bt=bt, interpret=interpret, precision=precision, transposed=True,
    )


@functools.partial(
    jax.jit, static_argnames=("bt", "interpret", "precision", "transposed")
)
def _flash_nearest_shadow_attrs(
    feats, shadow_feats, tri_feats16, tile_aabbs, attr_split, bt,
    interpret, precision, transposed: bool = False,
):
    plan = _DotPlan(precision)
    pad_fn = _pad_rays_t if transposed else _pad_rays
    feats, b, nb = pad_fn(feats, bt)
    shadow_feats, _, _ = pad_fn(shadow_feats, bt)
    t_pad, tt, nt = _geometry(tri_feats16)
    assert nt == 1, "in-kernel attr emission is single-tile only"
    g_ops = plan.g_operands(tri_feats16)
    kernel = _nearest_shadow_single_attrs(plan)
    w = attr_split.shape[-1]
    parts = attr_split.transpose(0, 2, 1)  # [3, w, tt] (tiny)
    in_specs = (
        [_RAY_SPEC(bt), _RAY_SPEC(bt)]
        + _g_specs(plan, tt)
        + [
            pl.BlockSpec((w, tt), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
            for _ in range(3)
        ]
    )
    near_specs, near_shapes = _near_out(plan, bt, nb)
    attr_specs, attr_shapes = _attr_out(plan, w, bt, nb)
    outs = pl.pallas_call(
        kernel,
        grid=(nb, 1),
        in_specs=in_specs,
        out_specs=near_specs + [_ROW_SPEC(bt)] + attr_specs,
        out_shape=near_shapes
        + [jax.ShapeDtypeStruct((1, nb * bt), jnp.int32)]
        + attr_shapes,
        compiler_params=_params(interpret),
        interpret=interpret,
    )(feats, shadow_feats, *g_ops, parts[0], parts[1], parts[2])
    nn = _n_near(plan)
    t1, i1, t2, i2 = _near_rows(plan, outs[:nn], b)
    if transposed:
        occ = outs[nn].reshape(-1)[:b]  # raw i32
        attrs = outs[nn + 1][:, :b]
        attrs2 = outs[nn + 2][:, :b] if plan.top2 else None
    else:
        occ = outs[nn].reshape(-1)[:b] != 0
        attrs = outs[nn + 1][:, :b].T
        attrs2 = outs[nn + 2][:, :b].T if plan.top2 else None
    return t1, i1, occ, attrs, t2, i2, attrs2


def flash_nearest_shadow(feats, shadow_feats, tri_feats16, tile_aabbs,
                         bt=DEF_BT, interpret=False, precision="auto"):
    """Merged nearest(current rays) + any-hit(previous bounce's shadow
    rays, max_t packed in SH_MAXT_COL) — both ray sets stream the same
    triangle tiles. Returns (t, idx, occluded [B] bool, t2, idx2)."""
    precision = resolve_precision(precision, interpret)
    return _flash_nearest_shadow(
        feats, shadow_feats, tri_feats16, tile_aabbs, bt=bt,
        interpret=interpret, precision=precision,
        resident=use_resident(precision, tri_feats16, "merged"),
        dma=use_dma_stream(interpret, _geometry(tri_feats16)[2]),
    )


@functools.partial(
    jax.jit,
    static_argnames=("bt", "interpret", "precision", "resident", "dma"),
)
def _flash_nearest_shadow(
    feats: jnp.ndarray,
    shadow_feats: jnp.ndarray,
    tri_feats16: jnp.ndarray,
    tile_aabbs: jnp.ndarray,
    bt: int,
    interpret: bool,
    precision: str,
    resident: bool = False,
    dma: bool = False,
):
    plan = _DotPlan(precision)
    feats, b, nb = _pad_rays(feats, bt)
    shadow_feats, _, _ = _pad_rays(shadow_feats, bt)
    t_pad, tt, nt = _geometry(tri_feats16)
    g_ops = plan.g_operands(tri_feats16)
    if dma and nt > 1 and not plan.top2 and _dma_lists_fit(nt):
        plist, pcount = _block_tile_lists(
            tile_aabbs, bt, (False, True), feats, shadow_feats
        )
        near_specs, near_shapes = _near_out(plan, bt, nb, row_spec=_ROW_SPEC1)
        outs = pl.pallas_call(
            _nearest_shadow_multi_dma(plan, nt),
            grid=(nb,),
            in_specs=(
                [_COUNT_SPEC(), _PLIST_SPEC(nt), _RAY_SPEC1(bt),
                 _RAY_SPEC1(bt)]
                + _g_any_specs(plan)
            ),
            out_specs=near_specs + [_ROW_SPEC1(bt)],
            out_shape=near_shapes
            + [jax.ShapeDtypeStruct((1, nb * bt), jnp.int32)],
            scratch_shapes=_dma_scratch(plan, tt, nt),
            compiler_params=_params(interpret),
            interpret=interpret,
        )(pcount, plist, feats, shadow_feats, *g_ops)
        nn = _n_near(plan)
        t1, i1, t2, i2 = _near_rows(plan, outs[:nn], b)
        return t1, i1, outs[nn].reshape(-1)[:b] != 0, t2, i2
    if resident and nt > 1:
        kernel = _nearest_shadow_resident(plan, nt)
        grid = (nb,)
        in_specs = (
            [_RAY_SPEC1(bt), _RAY_SPEC1(bt)]
            + _g_specs_full(plan, tt, nt)
            + [_AABB_SPEC1(nt)]
        )
        operands = [feats, shadow_feats, *g_ops, tile_aabbs]
        near_specs, near_shapes = _near_out(plan, bt, nb, row_spec=_ROW_SPEC1)
        occ_spec = _ROW_SPEC1(bt)
    else:
        kernel = (_nearest_shadow_single if nt == 1 else _nearest_shadow_multi)(plan)
        grid = (nb, nt)
        in_specs = [_RAY_SPEC(bt), _RAY_SPEC(bt)] + _g_specs(plan, tt)
        operands = [feats, shadow_feats, *g_ops]
        if nt > 1:
            in_specs.append(_AABB_SPEC(nt))
            operands.append(tile_aabbs)
        near_specs, near_shapes = _near_out(plan, bt, nb)
        occ_spec = _ROW_SPEC(bt)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=near_specs + [occ_spec],
        out_shape=near_shapes
        + [jax.ShapeDtypeStruct((1, nb * bt), jnp.int32)],
        compiler_params=_params(interpret),
        interpret=interpret,
    )(*operands)
    nn = _n_near(plan)
    t1, i1, t2, i2 = _near_rows(plan, outs[:nn], b)
    return t1, i1, outs[nn].reshape(-1)[:b] != 0, t2, i2


def flash_occlude_packed(feats, tri_feats16, tile_aabbs, bt=DEF_BT,
                         interpret=False, precision="auto"):
    """Any-hit for packed shadow feature blocks (max_t in SH_MAXT_COL)
    -> [B] i32 (1 = occluded)."""
    precision = resolve_precision(precision, interpret)
    return _flash_occlude_packed(
        feats, tri_feats16, tile_aabbs, bt=bt, interpret=interpret,
        precision=precision,
        resident=use_resident(precision, tri_feats16, "any"),
        dma=use_dma_stream(interpret, _geometry(tri_feats16)[2]),
    )


def flash_occlude_packed_t(feats_t, tri_feats16, tile_aabbs, bt=DEF_BT,
                           interpret=False, precision="auto"):
    """Transposed-layout twin of flash_occlude_packed ([16, B] rows in,
    raw i32 out)."""
    precision = resolve_precision(precision, interpret)
    return _flash_occlude_packed(
        feats_t, tri_feats16, tile_aabbs, bt=bt, interpret=interpret,
        precision=precision, transposed=True,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "bt", "interpret", "precision", "resident", "transposed", "dma"
    ),
)
def _flash_occlude_packed(
    feats: jnp.ndarray,
    tri_feats16: jnp.ndarray,
    tile_aabbs: jnp.ndarray,
    bt: int,
    interpret: bool,
    precision: str,
    resident: bool = False,
    transposed: bool = False,
    dma: bool = False,
):
    plan = _plan_for(precision, "any")
    feats, b, nb = (_pad_rays_t if transposed else _pad_rays)(feats, bt)
    t_pad, tt, nt = _geometry(tri_feats16)
    g_ops = plan.g_operands(tri_feats16)
    if dma and nt > 1 and _dma_lists_fit(nt):
        plist, pcount = _block_tile_lists(tile_aabbs, bt, (True,), feats)
        occ = pl.pallas_call(
            _occlude_multi_dma(plan, nt),
            grid=(nb,),
            in_specs=[_COUNT_SPEC(), _PLIST_SPEC(nt), _RAY_SPEC1(bt)]
            + _g_any_specs(plan),
            out_specs=_ROW_SPEC1(bt),
            out_shape=jax.ShapeDtypeStruct((1, nb * bt), jnp.int32),
            scratch_shapes=_dma_scratch(plan, tt, nt),
            compiler_params=_params(interpret),
            interpret=interpret,
        )(pcount, plist, feats, *g_ops)
        return occ.reshape(-1)[:b]
    if resident and nt > 1:
        kernel = _occlude_resident(plan, nt)
        grid = (nb,)
        in_specs = (
            [_RAY_SPEC1(bt)] + _g_specs_full(plan, tt, nt) + [_AABB_SPEC1(nt)]
        )
        operands = [feats, *g_ops, tile_aabbs]
        occ_spec = _ROW_SPEC1(bt)
    else:
        kernel = (_occlude_single if nt == 1 else _occlude_multi)(plan)
        grid = (nb, nt)
        in_specs = [_RAY_SPEC(bt)] + _g_specs(plan, tt)
        operands = [feats, *g_ops]
        if nt > 1:
            in_specs.append(_AABB_SPEC(nt))
            operands.append(tile_aabbs)
        occ_spec = _ROW_SPEC(bt)
    occ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=occ_spec,
        out_shape=jax.ShapeDtypeStruct((1, nb * bt), jnp.int32),
        compiler_params=_params(interpret),
        interpret=interpret,
    )(*operands)
    return occ.reshape(-1)[:b]


def flash_occlude(
    feats: jnp.ndarray,
    max_t: jnp.ndarray,
    tri_feats16: jnp.ndarray,
    tile_aabbs: jnp.ndarray,
    bt: int = DEF_BT,
    interpret: bool = False,
    precision: str = "auto",
):
    """Any-hit within (EPS, max_t] -> [B] bool."""
    feats = feats.at[:, SH_MAXT_COL].set(max_t)
    return (
        flash_occlude_packed(
            feats,
            tri_feats16,
            tile_aabbs,
            bt=bt,
            interpret=interpret,
            precision=precision,
        )
        != 0
    )
