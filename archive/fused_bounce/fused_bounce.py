"""Fused bounce kernel: one Pallas program per bounce.

The endgame of the wavefront design: nearest-hit scan (MXU), attribute
fetch (one-hot MXU), the *entire shading stage* (sky, emissive/MIS
logic, BSDF sampling, NEE light pick via tiled one-hot matmuls,
roulette), and the previous bounce's shadow-test resolution all execute
inside a single kernel. Per bounce only two executables run: this one
and the packed shadow-ray occlusion kernel — no XLA glue, no gathers,
no HBM round trips for intermediate shading state.

Path state crosses bounces as one packed [B, 32] f32 block (ST_*),
rays as the [B, 16] feature layout of flash_intersect (shadow rays
carry their max_t in spare column 10), and the LDS draws ride in a
[B, 8*max_bounces] block sliced statically per bounce.

Applicability (checked by the driver): procedural sky only and no
texture maps — image lookups need gathers the kernel cannot do. Scenes
outside that envelope use the staged pipeline (runtime/pipeline.py).
`shade_tile` is plain jnp shared with an equality test against
ops/trace.py's bounce_pre/bounce_post stages.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rustic_tpu.config import StaticConfig
from rustic_tpu.ops import bsdf as bsdf_mod
from rustic_tpu.ops import nee as nee_mod
from rustic_tpu.ops import sampling as s
from rustic_tpu.ops.flash_intersect import (
    BIG,
    DEF_BT,
    _epilogue,
    _geometry,
    _make_pair_dot,
)

# this experimental kernel keeps the bit-conservative f32 pair dot
_pair_dot = _make_pair_dot(False)[1]
from rustic_tpu.ops.skybox import procedural_sky
from rustic_tpu.scene import world as W

# ---- packed path-state layout (f32 columns) --------------------------------
# The MIS bookkeeping rides as the pre-reduced 6-column carry
# (ops/nee.py MISCarry) instead of the full 22-column light+BSDF pair —
# see ops/trace.py TraceState.
ST_THROUGHPUT = slice(0, 3)
ST_RADIANCE = slice(3, 6)
ST_ALIVE = 6
ST_LAST_DIFFUSE = 7
ST_MIS_PDF = 8
ST_MIS_VEC = slice(9, 12)
ST_MIS_AC = 12
ST_MIS_TRI = 13
ST_PEND_CONTRIB = slice(14, 17)
ST_PEND_ELIGIBLE = 17
STATE_WIDTH = 24  # 18 used + pad to a sublane multiple

SH_MAXT_COL = 10  # shadow-ray max_t rides in a spare feature column

_ENTRY_CHUNK = 512


def feats_from(ro, rd):
    ones = jnp.ones(ro.shape[:-1] + (1,), ro.dtype)
    zeros = jnp.zeros(ro.shape[:-1] + (6,), ro.dtype)
    return jnp.concatenate([rd, s.cross(ro, rd), ro, ones, zeros], axis=-1)


def init_packed_state(batch: int) -> jnp.ndarray:
    out = jnp.zeros((batch, STATE_WIDTH), jnp.float32)
    out = out.at[:, ST_THROUGHPUT].set(1.0)
    out = out.at[:, ST_ALIVE].set(1.0)
    return out


def _one_hot_rows(idx, table, n_rows):
    """table[idx] for a [bt] index vector via chunked one-hot matmuls —
    the in-kernel substitute for a gather."""
    bt = idx.shape[0]
    width = table.shape[-1]
    out = jnp.zeros((bt, width), jnp.float32)
    for base in range(0, n_rows, _ENTRY_CHUNK):
        hi = min(base + _ENTRY_CHUNK, n_rows)
        iota = base + jax.lax.broadcasted_iota(jnp.int32, (bt, hi - base), 1)
        oh = (iota == idx[:, None]).astype(jnp.float32)
        out = out + jax.lax.dot_general(
            oh,
            table[base:hi],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return out


def shade_tile(
    cfg: StaticConfig,
    bounce: int,
    has_lights: bool,
    has_glass: bool,
    n_alias_entries: int,
    params,  # [16]: sun_direction(0:4), specular clamp(4:6)
    feats,  # [bt, 16] current rays
    state,  # [bt, 32]
    prev_occ,  # [bt] i32 (nonzero = occluded)
    draws,  # [bt, 8] this bounce's LDS draws
    t,
    idx,  # [bt] i32 hit triangle
    u,
    v,
    det,
    attrs,  # [bt, 64] winning shading rows
    entry_table,  # [La_pad, 48] NEE entry rows
):
    """The complete shading stage on plain arrays. Mirrors
    ops/trace.py::bounce_post + bounce_pre exactly (equality-tested);
    returns (new_state [bt,32], new_feats [bt,16], shadow_feats [bt,16])."""
    nee = cfg.nee
    uses_nee = nee.uses_nee and has_lights
    batch = feats.shape[0]
    spec_clamp = params[4:6]

    rd = feats[:, 0:3]
    ro = feats[:, 6:9]
    throughput = state[:, ST_THROUGHPUT]
    radiance = state[:, ST_RADIANCE]
    alive = state[:, ST_ALIVE] > 0.5
    last_diffuse = state[:, ST_LAST_DIFFUSE] > 0.5

    # ---- resolve previous shadow rays (== bounce_post) --------------------
    lit = (state[:, ST_PEND_ELIGIBLE] > 0.5) & (prev_occ == 0)
    radiance = radiance + jnp.where(
        s.expand_mask(lit), s.mask_nan(state[:, ST_PEND_CONTRIB]), 0.0
    )

    hit = t < BIG
    backface = (det < 0.0) & hit
    hit_pos = ro + rd * t[:, None]

    # ---- sky (procedural only in the fused path) --------------------------
    miss = alive & ~hit
    sky = procedural_sky(params[0:4], ro, rd)
    radiance = radiance + jnp.where(s.expand_mask(miss), throughput * sky, 0.0)

    # ---- emissive handling ------------------------------------------------
    hit_alive = alive & hit
    emissive = attrs[:, W.ATTR_EMISSIVE]
    is_emissive = jnp.any(emissive != 0.0, axis=-1)
    emis_hit = hit_alive & is_emissive
    front_emis = emis_hit & ~backface

    if not nee.uses_nee:
        add_direct = front_emis
        die_emis = emis_hit
    else:
        first_or_nondiffuse = jnp.full(batch, bounce == 0) | ~last_diffuse
        add_direct = front_emis & first_or_nondiffuse
        if nee.uses_mis:
            die_emis = emis_hit
        else:
            die_emis = emis_hit & (backface | first_or_nondiffuse)
    radiance = radiance + jnp.where(
        s.expand_mask(add_direct), s.mask_nan(throughput * emissive), 0.0
    )
    if nee.uses_mis:
        mis_mask = front_emis & ~add_direct & last_diffuse
        mis_contrib = nee_mod.mis_carry_contribution(
            idx,
            t,
            nee_mod.MISCarry(
                vec=state[:, ST_MIS_VEC],
                area_cos=state[:, ST_MIS_AC],
                pdf=state[:, ST_MIS_PDF],
                tri=state[:, ST_MIS_TRI].astype(jnp.int32),
            ),
        )
        radiance = radiance + jnp.where(
            s.expand_mask(mis_mask), s.mask_nan(mis_contrib), 0.0
        )

    shade = hit_alive & ~die_emis

    # ---- attribute interpolation ------------------------------------------
    w_b = u[:, None]
    w_c = v[:, None]
    w_a = 1.0 - w_b - w_c
    nrm = attrs[:, W.ATTR_NRM]
    normal = w_a * nrm[:, 0:3] + w_b * nrm[:, 3:6] + w_c * nrm[:, 6:9]
    uvs = attrs[:, W.ATTR_UV]
    uv = w_a * uvs[:, 0:2] + w_b * uvs[:, 2:4] + w_c * uvs[:, 4:6]
    # (no texture maps in the fused path — normal mapping is skipped)

    # ---- BSDF sample -------------------------------------------------------
    albedo = attrs[:, W.ATTR_ALBEDO][:, :3]
    roughness = jnp.maximum(attrs[:, W.ATTR_ROUGH][:, 0], s.EPS)
    metallic = jnp.minimum(attrs[:, W.ATTR_METAL][:, 0], 1.0 - s.EPS)
    mat = bsdf_mod.PBRMaterial(
        albedo=albedo,
        roughness=roughness,
        metallic=metallic,
        specular_weight_clamp=spec_clamp,
    )
    r1, r2, r3 = draws[:, 0], draws[:, 1], draws[:, 2]
    bs = bsdf_mod.pbr_sample(mat, -rd, normal, r1, r2, r3)
    if has_glass:
        is_glass = attrs[:, W.ATTR_TRANSMISSION] > 0.0
        gs = bsdf_mod.glass_sample(
            mat.albedo, attrs[:, W.ATTR_IOR], mat.roughness, -rd, normal,
            r1, r2, r3,
        )
        bs = bsdf_mod.BSDFSample(
            pdf=jnp.where(is_glass, gs.pdf, bs.pdf),
            lobe=jnp.where(is_glass, gs.lobe, bs.lobe),
            spectrum=jnp.where(s.expand_mask(is_glass), gs.spectrum, bs.spectrum),
            direction=jnp.where(s.expand_mask(is_glass), gs.direction, bs.direction),
        )
    sampled_diffuse = bs.lobe == bsdf_mod.LOBE_DIFFUSE

    # ---- NEE candidate ------------------------------------------------------
    mis_pdf = state[:, ST_MIS_PDF]
    mis_vec = state[:, ST_MIS_VEC]
    mis_ac = state[:, ST_MIS_AC]
    mis_tri = state[:, ST_MIS_TRI]
    pend_contrib = jnp.zeros((batch, 3), jnp.float32)
    pend_eligible = jnp.zeros(batch, jnp.float32)
    shadow_feats = jnp.zeros((batch, 16), jnp.float32)
    if uses_nee:
        n1, n2, n3, n4 = (draws[:, 3 + k] for k in range(4))
        entry = jnp.clip(
            (n1 * n_alias_entries).astype(jnp.int32), 0, n_alias_entries - 1
        )
        row = _one_hot_rows(entry, entry_table, entry_table.shape[0])
        light = nee_mod.resolve_entry(row, n2)

        light_point = nee_mod.pick_triangle_point(
            light["va"], light["vb"], light["vc"], n3, n4
        )
        delta = light_point - hit_pos
        light_distance = s.length(delta)
        light_dir = delta / jnp.maximum(light_distance, 1e-12)[:, None]
        light_pdf = nee_mod.light_pdf_area_to_solid_angle(
            light["area"], light_distance, light["normal"], light_dir
        )
        bsdf_attenuation = bsdf_mod.pbr_evaluate_lobe(
            mat, -rd, normal, light_dir, lobe_is_specular=False
        )
        bsdf_pdf = bsdf_mod.pbr_pdf_lobe(
            mat, -rd, normal, light_dir, lobe_is_specular=False
        )
        weight = (
            s.power_heuristic(light_pdf, bsdf_pdf)
            if nee.uses_mis
            else jnp.ones_like(light_pdf)
        )
        direct = (
            bsdf_attenuation
            * light["emission"]
            * (
                weight
                / jnp.maximum(light_pdf, 1e-20)
                / jnp.maximum(light["pdf"], 1e-20)
            )[:, None]
        )
        geom_ok = (light_pdf > 0.0) & (bsdf_pdf > 0.0)
        direct = jnp.where(s.expand_mask(geom_ok), direct, 0.0)
        eligible = shade & sampled_diffuse

        # carry for next-bounce MIS (recorded regardless of visibility)
        sel = s.expand_mask(eligible)
        carry = nee_mod.make_mis_carry(
            throughput, bs.pdf, bs.spectrum, bs.direction,
            light["area"], light["normal"], light["pdf"],
            light["emission"], light["tri_idx"],
        )
        mis_pdf = jnp.where(eligible, carry.pdf, mis_pdf)
        mis_vec = jnp.where(sel, carry.vec, mis_vec)
        mis_ac = jnp.where(eligible, carry.area_cos, mis_ac)
        mis_tri = jnp.where(
            eligible, carry.tri.astype(jnp.float32), mis_tri
        )
        pend_contrib = throughput * direct
        pend_eligible = (eligible & geom_ok).astype(jnp.float32)
        sh_ro = hit_pos + light_dir * s.EPS
        sh_maxt = (light_distance - s.EPS * 2.0)[:, None]
        shadow_feats = jnp.concatenate(
            [
                light_dir,
                s.cross(sh_ro, light_dir),
                sh_ro,
                jnp.ones((batch, 1), jnp.float32),
                sh_maxt,
                jnp.zeros((batch, 5), jnp.float32),
            ],
            axis=-1,
        )

    # ---- throughput & ray update -------------------------------------------
    pdf_safe = jnp.where(jnp.abs(bs.pdf) < 1e-20, 1e-20, bs.pdf)
    new_tp = s.mask_nan(throughput * bs.spectrum / pdf_safe[:, None])
    throughput = jnp.where(s.expand_mask(shade), new_tp, throughput)
    rd_new = jnp.where(s.expand_mask(shade), bs.direction, rd)
    ro_new = jnp.where(s.expand_mask(shade), hit_pos + bs.direction * s.EPS, ro)
    alive_new = shade

    # ---- russian roulette ---------------------------------------------------
    if bounce > cfg.min_bounces:
        # clamped to 1 (matches ops/trace.py — the reference's unclamped
        # form loses energy when max(throughput) > 1)
        prob = jnp.minimum(jnp.max(throughput, axis=-1), 1.0)
        killed = alive_new & (draws[:, 7] > prob)
        alive_new = alive_new & ~killed
        throughput = jnp.where(
            s.expand_mask(alive_new),
            throughput / jnp.maximum(prob, 1e-20)[:, None],
            throughput,
        )

    # pack the next-bounce state (columns in ST_* order)
    new_state = jnp.concatenate(
        [
            throughput,  # 0:3
            radiance,  # 3:6
            alive_new.astype(jnp.float32)[:, None],  # 6
            jnp.where(  # 7 (select on floats: Mosaic lacks i1 selects)
                shade,
                sampled_diffuse.astype(jnp.float32),
                last_diffuse.astype(jnp.float32),
            )[:, None],
            mis_pdf[:, None],  # 8
            mis_vec,  # 9:12
            mis_ac[:, None],  # 12
            mis_tri[:, None],  # 13
            pend_contrib,  # 14:17
            pend_eligible[:, None],  # 17 (already float)
            jnp.zeros((batch, STATE_WIDTH - 18), jnp.float32),  # pad
        ],
        axis=-1,
    )
    new_feats = feats_from(ro_new, rd_new)
    return new_state, new_feats, shadow_feats


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _scan_tile(f_tile, g_block, attr_block, tt):
    """One triangle tile's winner (same math as flash_intersect)."""
    raw = _pair_dot(f_tile, g_block)
    det = raw[:, 0 * tt : 1 * tt]
    uu, vv, t, valid = _epilogue(raw, tt)
    tm = jnp.where(valid, t, BIG)
    tile_min = jnp.min(tm, axis=1)
    tile_arg = jnp.argmin(tm, axis=1).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 1)
    one_hot = (iota == tile_arg[:, None]).astype(jnp.float32)
    u_best = jnp.sum(one_hot * uu, axis=1)
    v_best = jnp.sum(one_hot * vv, axis=1)
    d_best = jnp.sum(one_hot * det, axis=1)
    attr_best = jax.lax.dot_general(
        one_hot,
        attr_block,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return tile_min, tile_arg, u_best, v_best, d_best, attr_best


def _build_kernel(cfg, bounce, has_lights, has_glass, n_alias_entries, nt):
    def kernel(
        f_ref,
        st_ref,
        occ_ref,
        draws_ref,
        params_ref,
        g_ref,
        attr_ref,
        entry_ref,
        out_st_ref,
        out_f_ref,
        out_sh_ref,
        sc_best,
        sc_attr,
    ):
        tt = attr_ref.shape[0]
        j = pl.program_id(1) if nt > 1 else 0

        if nt > 1:

            @pl.when(j == 0)
            def _():
                sc_best[0, :] = jnp.full_like(sc_best[0, :], BIG)
                sc_best[1, :] = jnp.zeros_like(sc_best[1, :])
                sc_best[2, :] = jnp.zeros_like(sc_best[2, :])
                sc_best[3, :] = jnp.zeros_like(sc_best[3, :])
                sc_best[4, :] = jnp.zeros_like(sc_best[4, :])
                sc_attr[...] = jnp.zeros_like(sc_attr)

        tile_min, tile_arg, u_b, v_b, d_b, attr_b = _scan_tile(
            f_ref[...], g_ref[...], attr_ref[...], tt
        )
        if nt > 1:
            better = tile_min < sc_best[0, :]
            sc_best[0, :] = jnp.where(better, tile_min, sc_best[0, :])
            sc_best[1, :] = jnp.where(
                better, (tile_arg + j * tt).astype(jnp.float32), sc_best[1, :]
            )
            sc_best[2, :] = jnp.where(better, u_b, sc_best[2, :])
            sc_best[3, :] = jnp.where(better, v_b, sc_best[3, :])
            sc_best[4, :] = jnp.where(better, d_b, sc_best[4, :])
            sc_attr[...] = jnp.where(better[:, None], attr_b, sc_attr[...])
        else:
            sc_best[0, :] = tile_min
            sc_best[1, :] = tile_arg.astype(jnp.float32)
            sc_best[2, :] = u_b
            sc_best[3, :] = v_b
            sc_best[4, :] = d_b
            sc_attr[...] = attr_b

        def _shade():
            new_state, new_feats, shadow_feats = shade_tile(
                cfg,
                bounce,
                has_lights,
                has_glass,
                n_alias_entries,
                params_ref[0, :],
                f_ref[...],
                st_ref[...],
                occ_ref[0, :],
                draws_ref[...][:, bounce * 8 : bounce * 8 + 8],
                sc_best[0, :],
                sc_best[1, :].astype(jnp.int32),
                sc_best[2, :],
                sc_best[3, :],
                sc_best[4, :],
                sc_attr[...],
                entry_ref[...],
            )
            out_st_ref[...] = new_state
            out_f_ref[...] = new_feats
            out_sh_ref[...] = shadow_feats

        if nt == 1:
            _shade()
        else:
            pl.when(j == nt - 1)(_shade)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "bounce", "scene_statics_key", "bt", "interpret"),
)
def fused_bounce(
    cfg: StaticConfig,
    bounce: int,
    feats,  # [B, 16]
    state,  # [B, 32]
    prev_occ,  # [B] i32
    draws,  # [B, 8*max_bounces]
    params,  # [16]
    tri_feats16,
    tri_attrs,
    entry_rows,
    scene_statics_key,  # (has_lights, has_glass, n_alias_entries)
    bt: int = DEF_BT,
    interpret: bool = False,
):
    has_lights, has_glass, n_alias_entries = scene_statics_key
    b = feats.shape[0]
    # this kernel keeps the row-major [B, 16] feature convention (the
    # flash scan kernels moved to transposed [16, B] blocks)
    pad = (-b) % bt
    feats_p = jnp.pad(feats, ((0, pad), (0, 0))) if pad else feats
    nb = feats_p.shape[0] // bt
    state_p = jnp.pad(state, ((0, pad), (0, 0)))
    occ_p = jnp.pad(prev_occ, (0, pad), constant_values=1)
    draws_p = jnp.pad(draws, ((0, pad), (0, 0)))
    t_pad, tt, nt = _geometry(tri_feats16)
    dwidth = draws.shape[-1]
    la_pad = entry_rows.shape[0]

    kernel = _build_kernel(cfg, bounce, has_lights, has_glass, n_alias_entries, nt)

    outs = pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((bt, 16), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bt, STATE_WIDTH), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, bt), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, dwidth), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 4 * tt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, W.ATTR_WIDTH), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (la_pad, W.ENTRY_WIDTH), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (bt, STATE_WIDTH), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((bt, 16), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 16), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb * bt, STATE_WIDTH), jnp.float32),
            jax.ShapeDtypeStruct((nb * bt, 16), jnp.float32),
            jax.ShapeDtypeStruct((nb * bt, 16), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, bt), jnp.float32),
            pltpu.VMEM((bt, W.ATTR_WIDTH), jnp.float32),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(feats_p, state_p, occ_p.reshape(1, nb * bt), draws_p, params.reshape(1, 16), tri_feats16, tri_attrs, entry_rows)
    new_state, new_feats, shadow_feats = outs
    return new_state[:b], new_feats[:b], shadow_feats[:b]
