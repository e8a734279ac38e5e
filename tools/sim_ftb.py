"""Host-side simulation of front-to-back per-block tile culling.

Answers, before any kernel is written: if the flash kernels visited a
scene's triangle tiles in per-ray-block front-to-back order (by the
block's min slab-entry distance) with the per-ray running-best-t cull,
how many tile scans would actually run — for primary rays, for
secondary (diffuse-bounce) rays with and without Morton sorting, and
for NEE shadow rays?  Prints visited-tile fractions per ray class, the
go/no-go number for the FTB kernel design.

Usage: RUSTIC_TT=32 python tools/sim_ftb.py [scene] [--bt 1024]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def slab_entry(lo, hi, ro, rd):
    """[B,3] rays vs one AABB -> entry t (inf when missed)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / np.where(np.abs(rd) < 1e-12, np.where(rd < 0, -1e-12, 1e-12), rd)
    t1 = (lo - ro) * inv
    t2 = (hi - ro) * inv
    tmin = np.minimum(t1, t2).max(-1)
    tmax = np.maximum(t1, t2).min(-1)
    ok = (tmax >= tmin) & (tmax > 0)
    return np.where(ok, np.maximum(tmin, 0.0), np.inf)


def mt_all(v0, e1, e2, ro, rd):
    """Brute Möller–Trumbore [B] rays x [T] tris -> t matrix [B,T]."""
    pv = np.cross(rd[:, None, :], e2[None, :, :])
    det = np.einsum("tk,btk->bt", e1, pv)
    good = np.abs(det) >= 1e-6
    inv = np.where(good, 1.0 / np.where(good, det, 1.0), 0.0)
    tv = ro[:, None, :] - v0[None, :, :]
    u = np.einsum("btk,btk->bt", tv, pv) * inv
    qv = np.cross(tv, e1[None, :, :])
    v = np.einsum("bk,btk->bt", rd, qv) * inv
    t = np.einsum("tk,btk->bt", e2, qv) * inv
    valid = good & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 1e-3)
    return np.where(valid, t, np.inf)


def simulate(name, ro, rd, tiles, v0, e1, e2, bt):
    nt = len(tiles)
    n = (len(ro) // bt) * bt
    ro, rd = ro[:n], rd[:n]
    visited_ftb = visited_fix = 0
    blocks = n // bt
    for b in range(blocks):
        r0, r1 = b * bt, (b + 1) * bt
        bro, brd = ro[r0:r1], rd[r0:r1]
        tmat = mt_all(v0, e1, e2, bro, brd)  # [bt, T]
        entries = np.stack(
            [slab_entry(lo, hi, bro, brd) for lo, hi, sl in tiles], 1
        )  # [bt, nt]
        # per-tile nearest-hit t within the tile
        tile_t = np.stack([tmat[:, sl].min(1) for _, _, sl in tiles], 1)

        for order, counter in (
            (np.argsort(entries.min(0)), "ftb"),
            (np.arange(nt), "fix"),
        ):
            best = np.full(bt, np.inf)
            vis = 0
            for j in order:
                if not (entries[:, j] < best).any():
                    continue
                vis += 1
                best = np.minimum(best, tile_t[:, j])
            if counter == "ftb":
                visited_ftb += vis
            else:
                visited_fix += vis
    print(
        f"{name:28s} blocks={blocks:5d} tiles={nt:3d} "
        f"visited ftb={visited_ftb/blocks:6.2f} ({100*visited_ftb/blocks/nt:4.0f}%) "
        f"fixed={visited_fix/blocks:6.2f} ({100*visited_fix/blocks/nt:4.0f}%)"
    )
    return tmat  # last block (unused)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="assets/scenes/DarkCornell.glb")
    ap.add_argument("--bt", type=int, default=1024)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax.numpy as jnp

    from rustic_tpu.config import TracingConfig
    from rustic_tpu.ops.trace import camera_rays
    from rustic_tpu.runtime.render import pixel_offsets
    from rustic_tpu.scene.world import World

    world = World.from_path(args.scene)
    scene = world.to_device()
    aabbs = np.asarray(scene.tile_aabbs)  # [nt, 8] lo(3) pad hi(3) pad
    attrs = np.asarray(scene.tri_attrs)
    t_pad = attrs.shape[0]
    tt = t_pad // len(aabbs)
    tiles = [
        (aabbs[j, 0:3], aabbs[j, 4:7], slice(j * tt, (j + 1) * tt))
        for j in range(len(aabbs))
    ]
    v0 = attrs[:, 0:3]
    e1 = attrs[:, 3:6] - v0
    e2 = attrs[:, 6:9] - v0
    print(f"scene={args.scene} T_pad={t_pad} tt={tt} nt={len(tiles)} bt={args.bt}")

    config = TracingConfig(width=args.width, height=args.height)
    cfg = config.static_part()
    cam = config.dynamic_part()
    y, x = np.mgrid[0 : args.height, 0 : args.width]
    px = jnp.asarray(x.reshape(-1).astype(np.int32))
    py = jnp.asarray(y.reshape(-1).astype(np.int32))
    offs = jnp.asarray(pixel_offsets(args.width, args.height, True))
    # CONTIGUOUS scanline-order pixels: the kernels' blocks are
    # consecutive lanes, so the simulation must preserve that locality.
    take = min(args.width * args.height, 96 * args.bt)
    px, py, offs = px[:take], py[:take], offs[:take]
    ro, rd = camera_rays(cfg, cam, px, py, jnp.uint32(0), offs)
    ro, rd = np.asarray(ro), np.asarray(rd)
    simulate("camera (pixel-coherent)", ro, rd, tiles, v0, e1, e2, args.bt)

    # secondary rays: cosine bounce at the camera hits
    tmat = mt_all(v0, e1, e2, ro, rd)
    t = tmat.min(1)
    idx = tmat.argmin(1)
    hit = np.isfinite(t)
    hp = ro[hit] + rd[hit] * t[hit][:, None]
    n_geo = np.cross(e1[idx[hit]], e2[idx[hit]])
    n_geo /= np.maximum(np.linalg.norm(n_geo, axis=1, keepdims=True), 1e-12)
    n_geo *= -np.sign((n_geo * rd[hit]).sum(1))[:, None]
    rng = np.random.default_rng(0)
    u1, u2 = rng.random(len(hp)), rng.random(len(hp))
    ct = np.sqrt(u1)
    st_ = np.sqrt(1 - u1)
    phi = 2 * np.pi * u2
    a = np.where(np.abs(n_geo[:, 0:1]) < 0.9, np.array([[1.0, 0, 0]]), np.array([[0, 1.0, 0]]))
    tx = np.cross(n_geo, a)
    tx /= np.linalg.norm(tx, axis=1, keepdims=True)
    ty = np.cross(n_geo, tx)
    sd = (
        tx * (st_ * np.cos(phi))[:, None]
        + ty * (st_ * np.sin(phi))[:, None]
        + n_geo * ct[:, None]
    )
    so = hp + sd * 1e-3
    simulate("bounce-1 (pixel order)", so, sd, tiles, v0, e1, e2, args.bt)

    # Morton-sorted secondary rays (the sorted drivers' order)
    lo = so.min(0)
    span = np.maximum(so.max(0) - lo, 1e-6)
    q = np.clip(((so - lo) / span * 16).astype(np.int64), 0, 15)

    def spread(v):
        return ((v & 8) << 6) | ((v & 4) << 4) | ((v & 2) << 2) | (v & 1)

    morton = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    octant = (
        ((sd[:, 0] > 0).astype(np.int64) << 2)
        | ((sd[:, 1] > 0).astype(np.int64) << 1)
        | (sd[:, 2] > 0)
    )
    perm = np.argsort((morton << 3) | octant, kind="stable")
    simulate("bounce-1 (morton sorted)", so[perm], sd[perm], tiles, v0, e1, e2, args.bt)

    # shadow rays: hit points toward the emissive triangles' centroid
    emis = np.asarray(world.emissive_mask if hasattr(world, "emissive_mask") else [])
    em_rows = attrs[np.any(attrs[:, 33:36] != 0, axis=1)]
    if len(em_rows):
        centroid = (em_rows[:, 0:3] + em_rows[:, 3:6] + em_rows[:, 6:9]).mean(0) / 3.0
        sdel = centroid[None, :] - hp
        sdist = np.linalg.norm(sdel, axis=1, keepdims=True)
        sdir = sdel / np.maximum(sdist, 1e-12)
        simulate("shadow (pixel order)", hp + sdir * 1e-3, sdir, tiles, v0, e1, e2, args.bt)


if __name__ == "__main__":
    main()
