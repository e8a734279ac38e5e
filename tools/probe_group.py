"""Per-dispatch timing of every stage in the staged DarkCornell group.

Times each executable of one fold-4 sample group (init, bounce-0
nearest+attrs kernel, merged nearest+shadow kernel, mid/last shade
stages, finish) with async-queued repeats and a single hard sync,
subtracting the measured sync floor (a tunnel readback costs ~30 ms on
axon regardless of size — tools/boundary_probe.py). Prints one JSON
line per stage plus the reconstructed group/sample totals, so kernel-
and shade-stage changes get clean before/after numbers without a full
render.

Usage: python tools/probe_group.py [--spp-fold 4] [--reps 5] [--queue 8]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fold", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--queue", type=int, default=8)
    ap.add_argument("--scene", default="assets/scenes/DarkCornell.glb")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rustic_tpu.config import NextEventEstimation, TracingConfig
    from rustic_tpu.ops.flash_intersect import (
        near_edge_margin, pick_bt, resolve_precision,
    )
    from rustic_tpu.runtime import pipeline as P
    from rustic_tpu.runtime.render import pixel_offsets
    from rustic_tpu.scene.world import World

    world = World.from_path(args.scene)
    scene = world.to_device()
    config = TracingConfig(
        width=args.width, height=args.height, nee=NextEventEstimation.MIS
    )
    cfg = config.static_part()
    cam = config.dynamic_part()
    y, x = np.mgrid[0 : args.height, 0 : args.width]
    px = x.reshape(-1).astype(np.int32)
    py = y.reshape(-1).astype(np.int32)
    offsets = pixel_offsets(args.width, args.height, True)
    fold = args.fold
    pxg, pyg, offg = P._tile_inputs(
        (jnp.asarray(px), jnp.asarray(py), jnp.asarray(offsets)), fold
    )
    lanes = int(pxg.shape[0])
    print(
        json.dumps({"backend": jax.default_backend(), "lanes": lanes,
                    "fold": fold}),
        flush=True,
    )

    interpret = jax.default_backend() != "tpu"
    prec = resolve_precision("auto", interpret)
    g16 = scene.tri_feats16
    bt = pick_bt(g16)
    K = P._Kernels(bt, interpret, prec)
    kattrs = scene.tri_attrs_split
    init, pres, finish = P._stages(
        cfg, fold=fold, edge_margin=near_edge_margin(prec)
    )

    # ---- build one group's real intermediate operands --------------------
    sample_idx = jnp.uint32(0)
    st0, feats0, sidx = init(cam, pxg, pyg, sample_idx, offg)
    t0, i0, a0, t20, i20, a20 = K.nearest_attrs(
        feats0, g16, scene.tile_aabbs, kattrs
    )
    st1, feats1, nee1 = pres[0](
        scene, cam, st0, feats0, None, None, t0, i0, a0, t20, i20, a20,
        sidx, offg,
    )
    prev_nee1, sh1 = nee1
    t1, i1, occ1, a1, t21, i21, a21 = K.nearest_shadow_attrs(
        feats1, sh1, g16, scene.tile_aabbs, kattrs
    )
    st2, feats2, nee2 = pres[1](
        scene, cam, st1, feats1, prev_nee1, occ1, t1, i1, a1, t21, i21,
        a21, sidx, offg,
    )
    prev_nee2, sh2 = nee2
    # last-bounce operands: reuse bounce-1 style kernel outputs
    film = jnp.zeros((lanes // fold, 3), jnp.float32)
    rad3, _, nee3 = pres[cfg.max_bounces - 1](
        scene, cam, st2, feats2, prev_nee2, occ1, t1, i1, a1, t21, i21,
        a21, sidx, offg,
    )
    prev_nee3, sh3 = nee3
    occ3 = K.occlude_packed(sh3, g16, scene.tile_aabbs) != 0
    for x in (rad3, occ3):
        np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]

    # ---- timing helpers ---------------------------------------------------
    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf).ravel()[:1]

    @jax.jit
    def noop(x):
        return x + 1.0

    tiny = jnp.zeros((8, 8), jnp.float32)
    sync(noop(tiny))

    def sync_floor():
        best = 1e9
        for _ in range(args.reps):
            t0_ = time.perf_counter()
            sync(noop(tiny))
            best = min(best, time.perf_counter() - t0_)
        return best

    floor = sync_floor()

    results = {}

    def timeit(name, fn):
        out = fn()
        sync(out)  # ensure compiled
        best = 1e9
        for _ in range(args.reps):
            t0_ = time.perf_counter()
            for _ in range(args.queue):
                out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0_)
        ms = (best - floor) / args.queue * 1e3
        results[name] = ms
        print(json.dumps({"stage": name, "ms": round(ms, 2)}), flush=True)

    timeit("init", lambda: init(cam, pxg, pyg, sample_idx, offg))
    timeit(
        "k_nearest_attrs",
        lambda: K.nearest_attrs(feats0, g16, scene.tile_aabbs, kattrs),
    )
    timeit(
        "k_nearest_shadow_attrs",
        lambda: K.nearest_shadow_attrs(
            feats1, sh1, g16, scene.tile_aabbs, kattrs
        ),
    )
    timeit(
        "k_occlude",
        lambda: K.occlude_packed(sh3, g16, scene.tile_aabbs),
    )
    timeit(
        "pre0",
        lambda: pres[0](
            scene, cam, st0, feats0, None, None, t0, i0, a0, t20, i20,
            a20, sidx, offg,
        ),
    )
    timeit(
        "pre_mid",
        lambda: pres[1](
            scene, cam, st1, feats1, prev_nee1, occ1, t1, i1, a1, t21,
            i21, a21, sidx, offg,
        ),
    )
    timeit(
        "pre_last",
        lambda: pres[cfg.max_bounces - 1](
            scene, cam, st2, feats2, prev_nee2, occ1, t1, i1, a1, t21,
            i21, a21, sidx, offg,
        ),
    )
    timeit("finish", lambda: finish(rad3, prev_nee3, occ3, film))

    nb = cfg.max_bounces
    group_ms = (
        results["init"]
        + results["k_nearest_attrs"]
        + (nb - 1) * results["k_nearest_shadow_attrs"]
        + results["pre0"]
        + (nb - 2) * results["pre_mid"]
        + results["pre_last"]
        + results["finish"]
    )
    per_sample = group_ms / fold
    mpaths = (lanes / fold) / per_sample / 1e3
    print(
        json.dumps(
            {
                "group_ms": round(group_ms, 1),
                "per_sample_ms": round(per_sample, 2),
                "implied_mpaths_per_s": round(mpaths, 2),
                "sync_floor_ms": round(floor * 1e3, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
