"""Mosaic shade kernel — one Pallas program for a bounce's whole
shading stage (bounce_post fold + exact winner re-test + bounce_pre).

Why: XLA compiles the shade stage into ~50 separate fusions whose
intermediates round-trip HBM; measured 28-31 ms per fold-4 dispatch at
3.7M lanes on v5e where one-read/one-write streaming costs ~3 ms. This
kernel streams lane blocks through VMEM exactly once.

Layout rule (the lesson of the retired fused-bounce kernel,
archive/fused_bounce/): every per-lane scalar is a [R, 128] tile
(R = block_lanes/128) — full 8-sublane x 128-lane VPU utilization.
Shaping per-lane data [bt, k] puts k = 3 on the 128-lane axis and
wastes 125/128 of every vector op, which is where the fused kernel's
3.4x shade-tail loss came from. Vectors are component TUPLES of tiles,
never a minor dim.

State crosses bounces as one packed [NST, B] f32 block (SK_* rows
below) viewed as [NST, B/128, 128]; rays as the [16, B] feature rows of
flash_intersect (so the flash kernels' transposed operands chain with
zero relayout); the winner's attr row arrives TRANSPOSED [W, B] exactly
as the kernel emits it.

Applicability (static, callers check via `supported`): untextured
scenes (slim attr rows), alias table <= 16 rows, no top-2 candidate
carry. HDR skyboxes are supported via an XLA miss-lane payoff after
the last bounce (pipeline._hdr_sky_payoff) — the in-kernel payoff
covers the procedural sky only. Everything else keeps the XLA shade stage
(runtime/pipeline.py _stages) — which also remains the CPU test twin.

Reference parity: the math mirrors ops/trace.py bounce_pre line for
line (itself cited against kernels/src/lib.rs:62-183); equality is
pinned by tests/test_shade_kernel.py against the XLA stage in
interpret mode.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rustic_tpu.config import StaticConfig
from rustic_tpu.ops.sampling import EPS, PI
from rustic_tpu.scene import world as W

BIG = 1e6
DET_EPS = 1e-6

# ---- packed path-state rows (f32) ------------------------------------------
SK_THR = slice(0, 3)
SK_RAD = slice(3, 6)
SK_ALIVE = 6
SK_MISSED = 7
SK_LASTDIFF = 8
SK_MIS_VEC = slice(9, 12)
SK_MIS_AC = 12
SK_MIS_PDF = 13
SK_MIS_TRI = 14
SK_PEND_CON = slice(15, 18)
SK_PEND_ELIG = 18
NST = 19

_DIMS_PER_BOUNCE = 8
_AA_DIMS = 2

# ---- pre-picked NEE rows (f32) ---------------------------------------------
# For scenes whose alias table exceeds the in-kernel select-sum width
# (supported() gate), ops/resolve.picked_light_rows_t performs the
# alias pick in XLA — with the SAME LDS draws this kernel would use —
# and hands the picked light's fields in as [NPICK, B] rows.
PICK_AREA = 0
PICK_PDF = 1
PICK_VA = slice(2, 5)
PICK_VB = slice(5, 8)
PICK_VC = slice(8, 11)
PICK_NRM = slice(11, 14)
PICK_EMI = slice(14, 17)
PICK_TRI = 17
NPICK = 18

# BSDF constants (ops/bsdf.py; reference kernels/src/bsdf.rs:178-183)
_DIELECTRIC_IOR = 1.5
_F0S = (_DIELECTRIC_IOR - 1.0) / (_DIELECTRIC_IOR + 1.0)
_DIELECTRIC_F0 = _F0S * _F0S

# atmosphere constants (ops/skybox.py; reference kernels/src/skybox.rs:8-16)
_RAY_COEFF = (58e-7, 135e-7, 331e-7)
_MIE_SCATTER = 2e-5
_MIE_EFFECTIVE = 2e-5 * 1.1
_EARTH_RADIUS = 6360e3
_ATMOSPHERE_RADIUS = 6380e3
_H_RAY = 8e3
_H_MIE = 12e2
_SKY_STEPS = 12


# ---- vec3 as component tuples of [R, 128] tiles ----------------------------


def _dot(a, b):
    return (a[0] * b[0] + a[1] * b[1]) + a[2] * b[2]


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _scale(v, s):
    return (v[0] * s, v[1] * s, v[2] * s)


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _mul(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def _where(m, a, b):
    return tuple(jnp.where(m, x, y) for x, y in zip(a, b))


def _normalize(v, eps: float = 1e-20):
    # same op sequence as sampling.normalize (sqrt + maximum + reciprocal)
    inv = jnp.reciprocal(jnp.maximum(jnp.sqrt(_dot(v, v)), eps))
    return _scale(v, inv)


def _mask_nan(v):
    finite = jnp.isfinite(v[0]) & jnp.isfinite(v[1]) & jnp.isfinite(v[2])
    zero = jnp.zeros_like(v[0])
    return _where(finite, v, (zero, zero, zero))


def _lerp(a, b, t):
    return a * (1.0 - t) + b * t


# ---- sampling / BSDF math on tiles (ports of ops/sampling.py, ops/bsdf.py) -


def _create_cartesian(up):
    ax, ay, az = 0.1, 0.5, 0.9
    temp = _normalize(
        (up[1] * az - up[2] * ay, up[2] * ax - up[0] * az,
         up[0] * ay - up[1] * ax)
    )
    right = _normalize(_cross(temp, up))
    forward = _normalize(_cross(up, right))
    return up, right, forward


def _local_to_world(local, up, right, forward):
    return _normalize(
        _add(
            _add(_scale(forward, local[0]), _scale(up, local[1])),
            _scale(right, local[2]),
        )
    )


def _cosine_sample_hemisphere(r1, r2):
    cos_theta = jnp.sqrt(jnp.maximum(r1, 0.0))
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - r1, 0.0))
    phi = 2.0 * PI * r2
    return (sin_theta * jnp.cos(phi), cos_theta, sin_theta * jnp.sin(phi))


def _reflect(i, n):
    return _sub(i, _scale(n, 2.0 * _dot(i, n)))


def _ggx_distribution(n, h, roughness):
    a2 = roughness * roughness
    n_dot_h = jnp.maximum(_dot(n, h), 0.0)
    denom = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    denom = jnp.maximum(PI * denom * denom, EPS)
    return a2 / denom


def _sample_ggx(r1, r2, refl, roughness):
    a = roughness * roughness
    phi = 2.0 * PI * r1
    cos_theta = jnp.sqrt(
        jnp.maximum((1.0 - r2) / (r2 * (a * a - 1.0) + 1.0), 0.0)
    )
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    h_local = (jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta)
    take_z = jnp.abs(refl[2]) < 0.999
    zero = jnp.zeros_like(refl[0])
    one = jnp.ones_like(refl[0])
    up = (jnp.where(take_z, 0.0, 1.0) * one, zero,
          jnp.where(take_z, 1.0, 0.0) * one)
    tangent = _normalize(_cross(up, refl))
    bitangent = _cross(refl, tangent)
    return _normalize(
        _add(
            _add(_scale(tangent, h_local[0]), _scale(bitangent, h_local[1])),
            _scale(refl, h_local[2]),
        )
    )


def _geometry_schlick_ggx(n, v, roughness):
    n_dot_v = jnp.maximum(_dot(n, v), 0.0)
    r = (roughness * roughness) / 8.0
    return n_dot_v / (n_dot_v * (1.0 - r) + r)


def _fresnel_schlick_scalar(in_ior, out_ior, cos_theta):
    f0 = ((in_ior - out_ior) / (in_ior + out_ior)) ** 2
    ct = jnp.clip(cos_theta, 0.0, 1.0)
    return f0 + (1.0 - f0) * (1.0 - ct) ** 5


def _power_heuristic(p1, p2):
    p1_2 = p1 * p1
    return p1_2 / jnp.maximum(p1_2 + p2 * p2, 1e-20)


def _specular_weight(metallic, clamp_lo, clamp_hi, n_dot_v):
    approx = _fresnel_schlick_scalar(
        1.0, _DIELECTRIC_IOR, jnp.maximum(n_dot_v, 0.0)
    )
    w = _lerp(approx, 1.0, metallic)
    clamped = jnp.clip(w, clamp_lo, clamp_hi)
    return jnp.where((w != 0.0) & (w != 1.0), clamped, w)


def _ks(albedo, metallic, h_dot_v):
    ct = jnp.clip(jnp.maximum(h_dot_v, 0.0), 0.0, 1.0)
    s5 = (1.0 - ct) ** 5
    return tuple(
        _lerp(_DIELECTRIC_F0, a, metallic) * (1.0 - s5) + s5
        for a in albedo
    )


def _eval_diffuse(albedo, metallic, cos_theta, specular_weight, ks):
    f = cos_theta / jnp.maximum(1.0 - specular_weight, 1e-8)
    return tuple(
        (1.0 - k) * (1.0 - metallic) * a / PI * f
        for k, a in zip(ks, albedo)
    )


def _eval_specular(roughness, view, normal, light, cos_theta, d_term,
                   specular_weight, ks):
    g = _geometry_schlick_ggx(normal, view, roughness) * \
        _geometry_schlick_ggx(normal, light, roughness)
    denom = jnp.maximum(
        4.0 * jnp.maximum(_dot(normal, view), 0.0) * cos_theta, EPS
    )
    f = cos_theta / jnp.maximum(specular_weight, 1e-8)
    return tuple((d_term * g) * k / denom * f for k in ks)


def _pbr_sample(albedo, roughness, metallic, clamp_lo, clamp_hi,
                view, normal, r1, r2, r3):
    """Port of bsdf.pbr_sample on tiles. Returns
    (pdf, sampled_diffuse mask, spectrum tuple, direction tuple)."""
    n_dot_v = _dot(normal, view)
    specular_weight = _specular_weight(metallic, clamp_lo, clamp_hi, n_dot_v)

    up, right, forward = _create_cartesian(normal)
    diff_dir = _local_to_world(
        _cosine_sample_hemisphere(r1, r2), up, right, forward
    )
    refl = _reflect(_scale(view, -1.0), normal)
    spec_dir = _sample_ggx(r1, r2, refl, roughness)

    take_spec = r3 < specular_weight
    direction = _where(take_spec, spec_dir, diff_dir)

    cos_theta = jnp.maximum(_dot(normal, direction), EPS)
    halfway = _normalize(_add(view, direction))
    ks = _ks(albedo, metallic, _dot(halfway, view))
    d_term = _ggx_distribution(normal, halfway, roughness)

    pdf_d = cos_theta / PI
    spec_d = _eval_diffuse(albedo, metallic, cos_theta, specular_weight, ks)
    pdf_s = (d_term * _dot(normal, halfway)) / (4.0 * _dot(view, halfway))
    spec_s = _eval_specular(
        roughness, view, normal, direction, cos_theta, d_term,
        specular_weight, ks,
    )
    pdf = jnp.where(take_spec, pdf_s, pdf_d)
    spectrum = _where(take_spec, spec_s, spec_d)
    return pdf, ~take_spec, spectrum, direction


def _pbr_eval_pdf_diffuse(albedo, roughness, metallic, clamp_lo, clamp_hi,
                          view, normal, light):
    """pbr_evaluate_lobe + pbr_pdf_lobe for the diffuse lobe (NEE path)."""
    n_dot_v = _dot(normal, view)
    specular_weight = _specular_weight(metallic, clamp_lo, clamp_hi, n_dot_v)
    cos_theta = jnp.maximum(_dot(normal, light), 0.0)
    halfway = _normalize(_add(view, light))
    ks = _ks(albedo, metallic, _dot(halfway, view))
    atten = _eval_diffuse(albedo, metallic, cos_theta, specular_weight, ks)
    pdf = jnp.maximum(_dot(normal, light), 0.0) / PI
    return atten, pdf


def _glass_sample(albedo, ior, roughness, view, normal, r1, r2, r3):
    """Port of bsdf.glass_sample (GGX microfacet dielectric). The
    microsurface-normal sample is written trig-free:
    theta = arctan(a*sqrt(r1)/sqrt(1-r1)) ->
    cos = 1/sqrt(1+q^2), sin = q/sqrt(1+q^2) with q = a*sqrt(r1)/sqrt(1-r1)
    (identical values to the XLA path up to float rounding — Mosaic has
    no arctan lowering)."""
    inside = _dot(normal, view) < 0.0
    n = _where(inside, _scale(normal, -1.0), normal)
    in_ior = jnp.where(inside, ior, 1.0)
    out_ior = jnp.where(inside, 1.0, ior)

    a_g = roughness * roughness
    q = (a_g * jnp.sqrt(jnp.maximum(r1, 0.0))) / jnp.sqrt(
        jnp.maximum(1.0 - r1, 1e-20)
    )
    inv_h = jnp.reciprocal(jnp.sqrt(1.0 + q * q))
    cos_t = inv_h
    sin_t = q * inv_h
    phi_m = 2.0 * PI * r2
    m_local = (sin_t * jnp.cos(phi_m), cos_t, sin_t * jnp.sin(phi_m))
    up, right, forward = _create_cartesian(n)
    m = _local_to_world(m_local, up, right, forward)

    fresnel = _fresnel_schlick_scalar(
        in_ior, out_ior, jnp.maximum(_dot(m, view), 0.0)
    )
    reflect_dir = _normalize(
        _sub(_scale(m, 2.0 * jnp.abs(_dot(view, m))), view)
    )
    eta = in_ior / out_ior
    c = _dot(view, m)
    k = 1.0 + eta * eta * (c * c - 1.0)
    sign_vn = jnp.sign(_dot(view, n))
    refr_scale = eta * c - sign_vn * jnp.sqrt(jnp.maximum(k, 0.0))
    refract_dir = _normalize(_sub(_scale(m, refr_scale), _scale(view, eta)))

    reflecting = r3 <= fresnel
    direction = _where(reflecting, reflect_dir, refract_dir)
    one = jnp.ones_like(albedo[0])
    spectrum = _where(reflecting, (one, one, one), albedo)
    pdf = jnp.ones_like(r3)
    return pdf, spectrum, direction, reflecting


def _procedural_sky(sun, intensity, ro, rd):
    """Port of skybox.procedural_sky on tiles. `sun` is a unit-dir
    3-tuple of scalars; intensity a scalar."""

    def escape(p, d_list, r):
        vx, vy, vz = p[0], p[1] + _EARTH_RADIUS, p[2]
        b = vx * d_list[0] + vy * d_list[1] + vz * d_list[2]
        det = b * b - (vx * vx + vy * vy + vz * vz) + r * r
        sq = jnp.sqrt(jnp.maximum(det, 0.0))
        t1 = -b - sq
        t2 = -b + sq
        t = jnp.where(t1 >= 0.0, t1, t2)
        return jnp.where(det < 0.0, -1.0, t)

    def densities(p):
        vx, vy, vz = p[0], p[1] + _EARTH_RADIUS, p[2]
        h = jnp.maximum(
            jnp.sqrt(vx * vx + vy * vy + vz * vz) - _EARTH_RADIUS, 0.0
        )
        return jnp.exp(-h / _H_RAY), jnp.exp(-h / _H_MIE)

    one = jnp.ones_like(ro[0])
    sundir = (sun[0] * one, sun[1] * one, sun[2] * one)
    depth = escape(ro, rd, _ATMOSPHERE_RADIUS) / _SKY_STEPS

    zero = jnp.zeros_like(ro[0])
    i_r = [zero, zero, zero]
    i_m = [zero, zero, zero]
    total_r = zero
    total_m = zero
    for i in range(_SKY_STEPS):
        p = _add(ro, _scale(rd, depth * i))
        r0, m0 = densities(p)
        dr = r0 * depth
        dm = m0 * depth
        total_r = total_r + dr
        total_m = total_m + dm
        l = escape(p, sundir, _ATMOSPHERE_RADIUS)
        r1_, m1_ = densities(_add(p, _scale(sundir, l)))
        sr = r0 * (l / 2.0) + r1_ * (l / 2.0)
        sm = m0 * (l / 2.0) + m1_ * (l / 2.0)
        depth_r = total_r + sr
        depth_m = total_m + sm
        for ch in range(3):
            a = jnp.exp(-_RAY_COEFF[ch] * depth_r - _MIE_EFFECTIVE * depth_m)
            i_r[ch] = i_r[ch] + a * dr
            i_m[ch] = i_m[ch] + a * dm

    mu = _dot(rd, sundir)
    ph = jnp.maximum(1.58 - 1.52 * mu, 1e-6)
    phase_mie = 0.0196 / (ph * jnp.sqrt(ph))
    scale = intensity * (1.0 + mu * mu)
    out = []
    for ch in range(3):
        res = scale * (
            i_r[ch] * _RAY_COEFF[ch] * 0.0597
            + i_m[ch] * _MIE_SCATTER * phase_mie
        )
        g = jnp.sqrt(jnp.maximum(res, 0.0))
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        safe = jnp.maximum(g, 1e-20)
        out.append(jnp.where(g > 0.0, jnp.exp(2.2 * jnp.log(safe)), 0.0))
    return tuple(out)


# ---- the kernel body --------------------------------------------------------


def _mt_retest(a, b, c, ro, rd):
    """Exact f32 Möller–Trumbore of the candidate (intersect._mt_single)."""
    e1 = _sub(b, a)
    e2 = _sub(c, a)
    pv = _cross(rd, e2)
    det = _dot(e1, pv)
    backface = det < 0.0
    good = jnp.abs(det) >= DET_EPS
    inv_det = jnp.where(good, jnp.reciprocal(jnp.where(good, det, 1.0)), 0.0)
    tv = _sub(ro, a)
    u = _dot(tv, pv) * inv_det
    qv = _cross(tv, e1)
    v = _dot(rd, qv) * inv_det
    t = _dot(e2, qv) * inv_det
    valid = (
        good & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > EPS)
    )
    return t, u, v, backface, valid


def _lds_tile(n, dimension: int, offset):
    """rng.lds on i32 tiles (Mosaic has no u32->f32 cast). The u32
    wraparound product is identical in two's-complement i32; the
    unsigned bits -> f32 conversion goes through exact 16-bit halves
    (each half is cast exactly, the final fma rounds once) — bit-equal
    to the XLA path's direct u32 cast."""
    from rustic_tpu.ops.rng import LDS_MAX_DIMENSIONS, _LDS_PRIMES

    prime_u = int(_LDS_PRIMES[dimension % LDS_MAX_DIMENSIONS])
    prime = jnp.int32(prime_u - (1 << 32) if prime_u >= (1 << 31) else prime_u)
    bits = prime * (n + offset)  # i32 wraparound == u32 wraparound
    hi = jax.lax.shift_right_logical(bits, 16).astype(jnp.float32)
    lo = (bits & jnp.int32(0xFFFF)).astype(jnp.float32)
    return (hi * 65536.0 + lo) * jnp.float32(1.0 / 4294967296.0)


def _alias_select(entry_ref, n_alias: int, n_u32, dim0: int, offs, zero,
                  zero3):
    """In-kernel alias pick for SMALL tables: per-field select-sum
    against the static entry rows (the tile twin of
    nee.resolve_entry_fields). Big tables use the XLA pre-pick instead
    (prepicked mode; ops/resolve.picked_light_rows_t)."""
    n1 = _lds_tile(n_u32, dim0 + 3, offs)
    n2 = _lds_tile(n_u32, dim0 + 4, offs)
    entry = jnp.clip((n1 * n_alias).astype(jnp.int32), 0, n_alias - 1)
    l_area = zero
    l_pdf = zero
    l_va = zero3
    l_vb = zero3
    l_vc = zero3
    l_nrm = zero3
    l_emi = zero3
    l_tri = zero
    for k in range(n_alias):
        use = entry == k
        take = use & (n2 < entry_ref[k, W.ENTRY_RATIO])

        def sca(ca, cb):
            return jnp.where(
                use, jnp.where(take, entry_ref[k, ca], entry_ref[k, cb]),
                0.0,
            )

        def vec(sa, sb):
            return tuple(
                jnp.where(
                    use,
                    jnp.where(take, entry_ref[k, sa.start + d],
                              entry_ref[k, sb.start + d]),
                    0.0,
                )
                for d in range(3)
            )

        l_area = l_area + sca(W.ENTRY_AREA_A, W.ENTRY_AREA_B)
        l_pdf = l_pdf + sca(W.ENTRY_PDF_A, W.ENTRY_PDF_B)
        va = W.ENTRY_A_VERTS.start
        vb = W.ENTRY_B_VERTS.start
        l_va = _add(l_va, vec(slice(va, va + 3), slice(vb, vb + 3)))
        l_vb = _add(
            l_vb, vec(slice(va + 3, va + 6), slice(vb + 3, vb + 6))
        )
        l_vc = _add(
            l_vc, vec(slice(va + 6, va + 9), slice(vb + 6, vb + 9))
        )
        l_nrm = _add(l_nrm, vec(W.ENTRY_A_NORMAL, W.ENTRY_B_NORMAL))
        l_emi = _add(l_emi, vec(W.ENTRY_A_EMISSION, W.ENTRY_B_EMISSION))
        l_tri = l_tri + sca(W.ENTRY_A_TRI, W.ENTRY_B_TRI)
    return l_area, l_pdf, l_va, l_vb, l_vc, l_nrm, l_emi, l_tri


def _build_kernel(cfg: StaticConfig, bounce: int, has_lights: bool,
                  has_glass: bool, n_alias: int, edge_margin: float,
                  has_occ: bool, prepicked: bool = False):
    nee = cfg.nee
    uses_nee = nee.uses_nee and has_lights
    last = bounce == cfg.max_bounces - 1
    A = W.SLIM_ALBEDO
    margin = edge_margin

    def kernel(*refs):
        it = iter(refs)
        params_ref = next(it)  # [1, 8]: sun(0:4), clamp(4:6)
        entry_ref = next(it) if uses_nee and not prepicked else None
        picked_ref = next(it) if uses_nee and prepicked else None
        st_ref = next(it)  # [NST, R, L]
        feats_ref = next(it)  # [16, R, L]
        t_ref = next(it)  # [R, L]
        idx_ref = next(it)  # [R, L] i32
        attrs_ref = next(it)  # [SLIM_WIDTH, R, L]
        occ_ref = next(it) if has_occ else None  # [R, L] i32
        sidx_ref = next(it)  # [R, L] u32
        off_ref = next(it)  # [R, L] u32
        st_out = next(it)
        nf_out = None if last else next(it)
        sf_out = next(it) if uses_nee else None

        clamp_lo = params_ref[0, 4]
        clamp_hi = params_ref[0, 5]

        rd = (feats_ref[0], feats_ref[1], feats_ref[2])
        ro = (feats_ref[6], feats_ref[7], feats_ref[8])
        throughput = (st_ref[0], st_ref[1], st_ref[2])
        radiance = (st_ref[3], st_ref[4], st_ref[5])
        alive = st_ref[SK_ALIVE] > 0.5
        missed_in = st_ref[SK_MISSED] > 0.5
        last_diffuse = st_ref[SK_LASTDIFF] > 0.5
        mis_vec = (st_ref[9], st_ref[10], st_ref[11])
        mis_ac = st_ref[SK_MIS_AC]
        mis_pdf = st_ref[SK_MIS_PDF]
        mis_tri = st_ref[SK_MIS_TRI]

        # ---- fold the previous bounce's shadow result (bounce_post) -------
        if has_occ:
            pend_con = (st_ref[15], st_ref[16], st_ref[17])
            lit = (st_ref[SK_PEND_ELIG] > 0.5) & (occ_ref[...] == 0)
            add = _mask_nan(pend_con)
            zero3 = (jnp.zeros_like(add[0]),) * 3
            radiance = _add(radiance, _where(lit, add, zero3))

        # ---- exact winner re-test (classify_flash_hit) ---------------------
        t_k = t_ref[...]
        a3 = (attrs_ref[0], attrs_ref[1], attrs_ref[2])
        b3 = (attrs_ref[3], attrs_ref[4], attrs_ref[5])
        c3 = (attrs_ref[6], attrs_ref[7], attrs_ref[8])
        t2, u, v, backface, valid = _mt_retest(a3, b3, c3, ro, rd)
        if margin > 0.0:
            near_edge = (
                (u >= -margin) & (v >= -margin) & (u + v <= 1.0 + margin)
                & (t2 > EPS)
            )
            valid = valid | near_edge
            u = jnp.clip(u, 0.0, 1.0)
            v = jnp.clip(v, 0.0, 1.0 - u)
        hit = (t_k < BIG) & valid
        t_hit = jnp.where(hit, t2, BIG)
        backface = backface & hit

        hit_pos = _add(ro, _scale(rd, t_hit))

        # ---- miss flag (sky deferred to the last bounce) --------------------
        miss = alive & ~hit
        missed = missed_in | miss

        hit_alive = alive & hit
        emissive = (attrs_ref[18], attrs_ref[19], attrs_ref[20])
        is_emissive = (
            (emissive[0] != 0.0) | (emissive[1] != 0.0) | (emissive[2] != 0.0)
        )
        emis_hit = hit_alive & is_emissive
        front_emis = emis_hit & ~backface

        # ---- emissive handling (kernels/src/lib.rs:85-109) ------------------
        # (no bool-constant tiles: Mosaic rejects i1 materialization)
        if not nee.uses_nee:
            add_direct = front_emis
            die_emis = emis_hit
        elif bounce == 0:  # first_or_nondiffuse is identically True
            add_direct = front_emis
            die_emis = emis_hit
        else:
            first_or_nondiffuse = ~last_diffuse
            add_direct = front_emis & first_or_nondiffuse
            if nee.uses_mis:
                die_emis = emis_hit
            else:
                die_emis = emis_hit & (backface | first_or_nondiffuse)
        zero = jnp.zeros_like(t_k)
        zero3 = (zero, zero, zero)
        radiance = _add(
            radiance,
            _where(add_direct, _mask_nan(_mul(throughput, emissive)), zero3),
        )
        if nee.uses_mis:
            mis_mask = front_emis & ~add_direct & last_diffuse
            same_light = idx_ref[...] == mis_tri.astype(jnp.int32)
            light_pdf = t_hit * t_hit / jnp.maximum(mis_ac, 1e-20)
            weight = _power_heuristic(mis_pdf, light_pdf)
            ok = same_light & (mis_ac > 0.0)
            contrib = _mask_nan(_scale(mis_vec, weight))
            radiance = _add(
                radiance, _where(mis_mask & ok, contrib, zero3)
            )

        shade = hit_alive & ~die_emis

        # ---- normal interpolation (slim rows have no uv consumers) ---------
        w_b = u
        w_c = v
        w_a = 1.0 - w_b - w_c
        normal = (
            w_a * attrs_ref[9] + w_b * attrs_ref[12] + w_c * attrs_ref[15],
            w_a * attrs_ref[10] + w_b * attrs_ref[13] + w_c * attrs_ref[16],
            w_a * attrs_ref[11] + w_b * attrs_ref[14] + w_c * attrs_ref[17],
        )

        # ---- BSDF sample -----------------------------------------------------
        albedo = (attrs_ref[A.start], attrs_ref[A.start + 1],
                  attrs_ref[A.start + 2])
        roughness = jnp.maximum(attrs_ref[W.SLIM_ROUGH], EPS)
        metallic = jnp.minimum(attrs_ref[W.SLIM_METAL], 1.0 - EPS)
        n_u32 = sidx_ref[...]
        offs = off_ref[...]
        dim0 = _AA_DIMS + bounce * _DIMS_PER_BOUNCE + 1
        r1 = _lds_tile(n_u32, dim0 + 0, offs)
        r2 = _lds_tile(n_u32, dim0 + 1, offs)
        r3 = _lds_tile(n_u32, dim0 + 2, offs)
        view = _scale(rd, -1.0)
        pdf, samp_diff, spectrum, direction = _pbr_sample(
            albedo, roughness, metallic, clamp_lo, clamp_hi, view, normal,
            r1, r2, r3,
        )
        if has_glass:
            is_glass = attrs_ref[W.SLIM_TRANSMISSION] > 0.0
            gpdf, gspec, gdir, _refl = _glass_sample(
                albedo, attrs_ref[W.SLIM_IOR], roughness, view, normal,
                r1, r2, r3,
            )
            pdf = jnp.where(is_glass, gpdf, pdf)
            samp_diff = samp_diff & ~is_glass
            spectrum = _where(is_glass, gspec, spectrum)
            direction = _where(is_glass, gdir, direction)

        # ---- NEE candidate ---------------------------------------------------
        new_pend_con = zero3
        new_pend_elig = zero > 1.0  # all-false without an i1 constant
        shadow_ro = shadow_rd = None
        shadow_maxt = zero
        if uses_nee:
            n3 = _lds_tile(n_u32, dim0 + 5, offs)
            n4 = _lds_tile(n_u32, dim0 + 6, offs)
            if prepicked:
                l_area = picked_ref[PICK_AREA]
                l_pdf = picked_ref[PICK_PDF]
                l_va = (picked_ref[2], picked_ref[3], picked_ref[4])
                l_vb = (picked_ref[5], picked_ref[6], picked_ref[7])
                l_vc = (picked_ref[8], picked_ref[9], picked_ref[10])
                l_nrm = (picked_ref[11], picked_ref[12], picked_ref[13])
                l_emi = (picked_ref[14], picked_ref[15], picked_ref[16])
                l_tri = picked_ref[PICK_TRI]
            else:
                l_area, l_pdf, l_va, l_vb, l_vc, l_nrm, l_emi, l_tri = (
                    _alias_select(
                        entry_ref, n_alias, n_u32, dim0, offs, zero, zero3
                    )
                )

            r1s = jnp.sqrt(jnp.maximum(n3, 0.0))
            light_point = tuple(
                (1.0 - r1s) * a_ + (r1s * (1.0 - n4)) * b_ + (r1s * n4) * c_
                for a_, b_, c_ in zip(l_va, l_vb, l_vc)
            )
            delta = _sub(light_point, hit_pos)
            light_distance = jnp.sqrt(_dot(delta, delta))
            light_dir = _scale(
                delta, jnp.reciprocal(jnp.maximum(light_distance, 1e-12))
            )
            cos_l = _dot(l_nrm, _scale(light_dir, -1.0))
            light_pdf = (light_distance * light_distance) / jnp.maximum(
                l_area * cos_l, 1e-20
            )
            light_pdf = jnp.where(cos_l > 0.0, light_pdf, 0.0)
            atten, bsdf_pdf = _pbr_eval_pdf_diffuse(
                albedo, roughness, metallic, clamp_lo, clamp_hi, view,
                normal, light_dir,
            )
            if nee.uses_mis:
                weight = _power_heuristic(light_pdf, bsdf_pdf)
            else:
                weight = jnp.ones_like(light_pdf)
            wfac = (
                weight
                / jnp.maximum(light_pdf, 1e-20)
                / jnp.maximum(l_pdf, 1e-20)
            )
            geom_ok = (light_pdf > 0.0) & (bsdf_pdf > 0.0)
            direct = tuple(
                jnp.where(geom_ok, a_ * e_ * wfac, 0.0)
                for a_, e_ in zip(atten, l_emi)
            )
            contribution = _mul(throughput, direct)
            eligible = shade & samp_diff

            # MIS carry update (make_mis_carry under the eligible mask)
            c_vec = tuple(
                tp * sp * em
                / (jnp.maximum(pdf, 1e-20) * jnp.maximum(l_pdf, 1e-20))
                for tp, sp, em in zip(throughput, spectrum, l_emi)
            )
            c_ac = l_area * _dot(l_nrm, _scale(direction, -1.0))
            mis_vec = _where(eligible, c_vec, mis_vec)
            mis_ac = jnp.where(eligible, c_ac, mis_ac)
            mis_pdf = jnp.where(eligible, pdf, mis_pdf)
            mis_tri = jnp.where(eligible, l_tri, mis_tri)

            shadow_ro = _add(hit_pos, _scale(light_dir, EPS))
            shadow_rd = light_dir
            shadow_maxt = light_distance - EPS * 2.0
            new_pend_con = contribution
            new_pend_elig = eligible & geom_ok

        # ---- throughput & ray update ----------------------------------------
        pdf_safe = jnp.where(jnp.abs(pdf) < 1e-20, 1e-20, pdf)
        new_tp = _mask_nan(
            tuple(tp * sp / pdf_safe for tp, sp in zip(throughput, spectrum))
        )
        throughput = _where(shade, new_tp, throughput)
        ro_new = _add(hit_pos, _scale(direction, EPS))
        ro = _where(shade, ro_new, ro)
        rd = _where(shade, direction, rd)
        alive_out = shade

        # ---- russian roulette -------------------------------------------------
        if bounce > cfg.min_bounces:
            prob = jnp.minimum(
                jnp.maximum(jnp.maximum(throughput[0], throughput[1]),
                            throughput[2]),
                1.0,
            )
            roll = _lds_tile(n_u32, dim0 + 7, offs)
            killed = alive_out & (roll > prob)
            alive_out = alive_out & ~killed
            inv_p = jnp.reciprocal(jnp.maximum(prob, 1e-20))
            throughput = _where(
                alive_out, _scale(throughput, inv_p), throughput
            )

        # ---- deferred sky payoff (last bounce; block-predicated) --------------
        # HDR-skybox configs skip the in-kernel payoff: the equirect
        # image gather has no Mosaic path, so the driver evaluates
        # image_sky in XLA on the missed lanes after the last bounce
        # (pipeline._hdr_sky_payoff) — rd stays frozen at its miss-time
        # value in the stationary featsT, exactly what the payoff needs
        # (reference: kernels/src/lib.rs:66-79).
        if last and cfg.has_skybox:
            for d in range(3):
                st_out[3 + d] = radiance[d]
        elif last:
            any_missed = jnp.any(missed)

            @pl.when(any_missed)
            def _():
                sun = (params_ref[0, 0], params_ref[0, 1], params_ref[0, 2])
                sky = _procedural_sky(sun, params_ref[0, 3], ro, rd)
                term = _where(missed, _mul(throughput, sky), zero3)
                for d in range(3):
                    st_out[3 + d] = radiance[d] + term[d]

            @pl.when(~any_missed)
            def _():
                for d in range(3):
                    st_out[3 + d] = radiance[d]
        else:
            for d in range(3):
                st_out[3 + d] = radiance[d]

        # ---- write state ------------------------------------------------------
        for d in range(3):
            st_out[0 + d] = throughput[d]
        # bool -> f32 via select (Mosaic has no i1 -> f32 cast)
        st_out[SK_ALIVE] = jnp.where(alive_out, 1.0, 0.0)
        st_out[SK_MISSED] = jnp.where(missed, 1.0, 0.0)
        # boolean algebra, not select-of-bools (Mosaic materializes
        # i1 selects through i8 and fails the i8->i1 truncation)
        ld_new = (shade & samp_diff) | (~shade & last_diffuse)
        st_out[SK_LASTDIFF] = jnp.where(ld_new, 1.0, 0.0)
        for d in range(3):
            st_out[9 + d] = mis_vec[d]
        st_out[SK_MIS_AC] = mis_ac
        st_out[SK_MIS_PDF] = mis_pdf
        st_out[SK_MIS_TRI] = mis_tri
        for d in range(3):
            st_out[15 + d] = new_pend_con[d]
        st_out[SK_PEND_ELIG] = jnp.where(new_pend_elig, 1.0, 0.0)

        # ---- next / shadow ray feature rows ------------------------------------
        one = jnp.ones_like(zero)
        if nf_out is not None:
            cr = _cross(ro, rd)
            for d in range(3):
                nf_out[0 + d] = rd[d]
                nf_out[3 + d] = cr[d]
                nf_out[6 + d] = ro[d]
            nf_out[9] = one
            for d in range(10, 16):
                nf_out[d] = zero
        if sf_out is not None:
            scr = _cross(shadow_ro, shadow_rd)
            for d in range(3):
                sf_out[0 + d] = shadow_rd[d]
                sf_out[3 + d] = scr[d]
                sf_out[6 + d] = shadow_ro[d]
            sf_out[9] = one
            sf_out[10] = shadow_maxt
            for d in range(11, 16):
                sf_out[d] = zero

    return kernel


# ---- pallas_call wrapper -----------------------------------------------------


def pick_bs(batch: int) -> int:
    """Largest lane-block size that divides the batch (128-multiples).
    $RUSTIC_SHADE_BS caps/raises the preference order's head (probe knob;
    per-process — the jit cache does not see env changes)."""
    head = int(os.environ.get("RUSTIC_SHADE_BS", "8192"))
    sizes = sorted(
        {head, 8192, 4096, 2048, 1024, 512, 256, 128}, reverse=True
    )
    for bs in sizes:
        if bs <= head and batch % bs == 0:
            return bs
    return 0


def supported(scene, cfg: StaticConfig, plan_top2: bool, batch: int) -> bool:
    """Static applicability check (see module docstring)."""
    return (
        not scene.has_textures
        and scene.tri_attrs_split is not None
        and scene.tri_attrs_split.shape[-1] == W.SLIM_WIDTH
        # the single-tile driver has no pre-pick stage, so the alias
        # table must fit the in-kernel select-sum
        and scene.n_alias_entries <= 16
        and supported_mt(scene, cfg, plan_top2, batch)
    )


def supported_mt(scene, cfg: StaticConfig, plan_top2: bool,
                 batch: int) -> bool:
    """Applicability for the MULTI-TILE kernel-shade driver: the
    resolve stage (ops/resolve.py) supplies slim winner rows for any
    scene — textured or not — wide alias tables go through the XLA
    pre-pick (picked_light_rows_t), and HDR skyboxes through the XLA
    miss-lane payoff (pipeline._hdr_sky_payoff), so only the
    kernel-intrinsic gates remain: no top-2 candidate carry and the
    block-size floor."""
    return (
        not plan_top2
        and pick_bs(batch) >= 512
    )


def init_state_packed(batch: int) -> jnp.ndarray:
    st = jnp.zeros((NST, batch), jnp.float32)
    st = st.at[SK_THR].set(1.0)
    st = st.at[SK_ALIVE].set(1.0)
    return st


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "bounce", "has_glass", "n_alias", "edge_margin", "interpret",
    ),
)
def shade_bounce(
    cfg: StaticConfig,
    bounce: int,
    params,  # [1, 8] f32: sun_direction(0:4), specular clamp(4:6)
    entry_table,  # [n_pad, 48] f32 or None (no lights / NEE off)
    st,  # [NST, B] f32 packed state
    featsT,  # [16, B] f32 current rays (transposed rows)
    t,  # [B] f32 kernel winner t
    idx,  # [B] i32 winner triangle
    attrsT,  # [SLIM_WIDTH, B] f32 winner rows, transposed
    occ,  # [B] i32 previous bounce's shadow occlusion, or None
    sidx,  # [B] u32 per-lane sample index
    offsets,  # [B] u32 per-pixel LDS offsets
    has_glass: bool = False,
    n_alias: int = 0,
    edge_margin: float = 0.0,
    interpret: bool = False,
    pickedT=None,  # [NPICK, B] f32 pre-picked NEE rows, or None
):
    """Run one bounce's shading stage as a single Pallas kernel.

    pickedT switches the kernel to prepicked-NEE mode: the alias pick
    already happened in XLA (ops/resolve.picked_light_rows_t) and
    entry_table is ignored — the path for alias tables too wide for the
    in-kernel select-sum.

    Returns (st_out [NST, B], next_featsT [16, B] or None,
    shadow_featsT [16, B] or None)."""
    nee = cfg.nee
    uses_nee = nee.uses_nee and n_alias > 0
    prepicked = pickedT is not None
    last = bounce == cfg.max_bounces - 1
    B = st.shape[-1]
    bs = pick_bs(B)
    R = bs // 128
    nb = B // bs
    L = 128
    n_l = B // L

    def v3(a):  # [B] -> [B/128, 128] view
        return a.reshape(n_l, L)

    def vrows(a, rows):  # [rows, B] -> [rows, B/128, 128] view
        return a.reshape(rows, n_l, L)

    kernel = _build_kernel(
        cfg, bounce, uses_nee, has_glass, n_alias, edge_margin,
        occ is not None, prepicked=prepicked,
    )

    row_spec = lambda r: pl.BlockSpec(  # noqa: E731
        (r, R, L), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    tile_spec = pl.BlockSpec((R, L), lambda i: (i, 0), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [params]
    if uses_nee and prepicked:
        in_specs.append(row_spec(NPICK))
        operands.append(vrows(pickedT, NPICK))
    elif uses_nee:
        in_specs.append(
            pl.BlockSpec(
                entry_table.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(entry_table)
    in_specs += [
        row_spec(NST), row_spec(16), tile_spec, tile_spec,
        row_spec(W.SLIM_WIDTH),
    ]
    operands += [
        vrows(st, NST), vrows(featsT, 16), v3(t), v3(idx),
        vrows(attrsT, W.SLIM_WIDTH),
    ]
    if occ is not None:
        in_specs.append(tile_spec)
        operands.append(v3(occ))
    in_specs += [tile_spec, tile_spec]
    # u32 -> i32 bitcast (free): Mosaic has no u32 arithmetic/casts; the
    # LDS wraparound product is identical in two's-complement i32
    operands += [
        v3(jax.lax.bitcast_convert_type(sidx, jnp.int32)),
        v3(jax.lax.bitcast_convert_type(offsets, jnp.int32)),
    ]

    out_specs = [row_spec(NST)]
    out_shapes = [jax.ShapeDtypeStruct((NST, n_l, L), jnp.float32)]
    if not last:
        out_specs.append(row_spec(16))
        out_shapes.append(jax.ShapeDtypeStruct((16, n_l, L), jnp.float32))
    if uses_nee:
        out_specs.append(row_spec(16))
        out_shapes.append(jax.ShapeDtypeStruct((16, n_l, L), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=(
            None if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
        ),
        interpret=interpret,
        debug=os.environ.get("RUSTIC_SHADE_DEBUG", "0") == "1",
    )(*operands)

    st_out = outs[0].reshape(NST, B)
    k = 1
    nf = None
    if not last:
        nf = outs[k].reshape(16, B)
        k += 1
    sf = outs[k].reshape(16, B) if uses_nee else None
    return st_out, nf, sf
