"""Micro-probe: Mosaic shade-kernel dispatch time vs lane-block size.

PERFORMANCE.md round-3 item "shade kernel floor": 10.15 ms/dispatch at
3.7M lanes vs a ~4.5 ms DMA+VPU estimate, with bs=16384+ untested. This
times ONE mid-bounce shade_bounce dispatch (the shape the headline
DarkCornell bench runs 3x per fold group) on REAL driver inputs — a
real initk state and a real flash_nearest_attrs_t result — across
$RUSTIC_SHADE_BS values, hard-synced in queued batches exactly like
tools/bench_kernels.py.

Usage: python tools/probe_shade_bs.py [--b 3686400] [--bs 8192,16384,32768]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1280 * 720 * 4)
    ap.add_argument("--bs", default="8192,16384,32768,65536")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--queue", type=int, default=8)
    ap.add_argument("--scene", default="DarkCornell")
    args = ap.parse_args()

    import jax.numpy as jnp

    from rustic_tpu.config import NextEventEstimation, TracingConfig
    from rustic_tpu.ops import shade_kernel as SK
    from rustic_tpu.ops.flash_intersect import (
        flash_nearest_attrs_t,
        pick_bt,
    )
    from rustic_tpu.runtime.pipeline import _stages_kernelshade
    from rustic_tpu.runtime.render import pixel_offsets
    from rustic_tpu.scene.world import World

    scene = World.from_path(
        os.path.join("assets", "scenes", f"{args.scene}.glb")
    ).to_device()
    w, h = 1280, 720
    fold = max(args.b // (w * h), 1)
    B = w * h * fold
    config = TracingConfig(width=w, height=h, nee=NextEventEstimation.MIS)
    cfg, cam = config.static_part(), config.dynamic_part()

    y, x = np.mgrid[0:h, 0:w]
    px = np.tile(x.reshape(-1).astype(np.int32), fold)
    py = np.tile(y.reshape(-1).astype(np.int32), fold)
    off = np.tile(np.asarray(pixel_offsets(w, h)), fold)

    initk, _fin = _stages_kernelshade(cfg, fold=fold)
    st, featsT, sidx, params = initk(
        cam, jnp.asarray(px), jnp.asarray(py), jnp.uint32(0), jnp.asarray(off)
    )
    g16 = scene.tri_feats16
    bt = pick_bt(g16)
    t, i, attrsT, t2, i2, _a2 = flash_nearest_attrs_t(
        featsT, g16, scene.tile_aabbs, scene.tri_attrs_split, bt=bt
    )
    occ = jnp.zeros((B,), jnp.int32)
    offs_u = jnp.asarray(off, jnp.uint32)
    skw = dict(
        has_glass=scene.has_glass,
        n_alias=scene.n_alias_entries,
        edge_margin=0.0,
    )
    print(f"B={B} fold={fold} bt={bt} n_alias={skw['n_alias']}", flush=True)

    def dispatch():
        return SK.shade_bounce(
            cfg, 1, params, scene.entry_rows, st, featsT, t, i,
            attrsT, occ, sidx, offs_u, **skw,
        )

    for bs in (int(v) for v in args.bs.split(",")):
        os.environ["RUSTIC_SHADE_BS"] = str(bs)
        try:
            outs = dispatch()  # compile
            np.asarray(outs[0].reshape(-1)[:1])
        except Exception as e:  # noqa: BLE001
            print(f"bs={bs}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.queue):
                o = dispatch()
            np.asarray(o[0].reshape(-1)[:1])
            ts.append((time.perf_counter() - t0) * 1e3 / args.queue)
        print(
            f"bs={bs:6d}: median {np.median(ts):7.2f} ms  min {min(ts):7.2f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
