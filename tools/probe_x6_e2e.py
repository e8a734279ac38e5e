"""Interleaved end-to-end probe: x6 vs f32p on the staged fast path.

Renders DarkCornell at 1280x720 x N spp through render_pixels (the
real driver) with RUSTIC_FLASH_DOT alternating between plans in ONE
process, warm, best-of-R — the only timing methodology the +-20% axon
tunnel variance permits (PERFORMANCE.md). Also reports film means so a
plan change that loses energy is caught on the spot.

Usage: python tools/probe_x6_e2e.py [--spp 40] [--reps 3]
       [--plans x6,f32p] [--scene DarkCornell]
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
    ap.add_argument("--spp", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default="x6,f32p")
    ap.add_argument("--scene", default="DarkCornell")
    ap.add_argument("--size", default="1280x720")
    args = ap.parse_args()

    from rustic_tpu.config import NextEventEstimation, TracingConfig
    from rustic_tpu.runtime.render import pixel_offsets, render_pixels
    from rustic_tpu.scene.world import load_scene

    w, h = (int(v) for v in args.size.split("x"))
    scene = load_scene(
        os.path.join("assets", "scenes", f"{args.scene}.glb")
    )
    config = TracingConfig(width=w, height=h, nee=NextEventEstimation.MIS)
    y, x = np.mgrid[0:h, 0:w]
    px = x.reshape(-1).astype(np.int32)
    py = y.reshape(-1).astype(np.int32)
    offsets = pixel_offsets(w, h)
    plans = args.plans.split(",")

    def run(plan):
        os.environ["RUSTIC_FLASH_DOT"] = plan
        film = render_pixels(scene, config, px, py, args.spp,
                             offsets=offsets)
        return float(np.asarray(film).mean())  # hard sync

    # warm every plan first (compiles), then interleave timed reps
    for p in plans:
        t0 = time.perf_counter()
        mean = run(p)
        print(f"warm {p}: {time.perf_counter()-t0:.1f}s film_mean={mean:.6f}",
              flush=True)
    results = {p: [] for p in plans}
    for r in range(args.reps):
        for p in plans:
            t0 = time.perf_counter()
            mean = run(p)
            dt = time.perf_counter() - t0
            mp = w * h * args.spp / dt / 1e6
            results[p].append(mp)
            print(f"rep{r} {p}: {dt:.2f}s {mp:.2f} Mpaths/s "
                  f"film_mean={mean:.6f}", flush=True)
    for p in plans:
        print(f"BEST {p}: {max(results[p]):.2f} Mpaths/s "
              f"(all: {[round(v,2) for v in results[p]]})")


if __name__ == "__main__":
    main()
