"""E2E A/B: the round-3 multi-tile levers through the real driver.

Renders --scene at --size x --spp through render_pixels for each
(RUSTIC_DMA_STREAM, RUSTIC_SHADE_KERNEL_MT) combo (both flags are read
per render call, so one process covers all combos with one packed
scene). Film mean printed per run so an energy regression is caught on
the spot; interleaved reps, best-of quoted.

Usage: python tools/probe_mt_combo.py [--scene PBRTest] [--spp 16]
       [--combos 0:0,1:0,0:1,1:1] [--tt 512] [--reps 2]
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
    ap.add_argument("--scene", default="PBRTest")
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--combos", default="0:0,1:0,0:1,1:1")
    ap.add_argument("--tt", type=int, default=0, help="0 = default pack")
    ap.add_argument("--size", default="1280x720")
    args = ap.parse_args()
    if args.tt:
        os.environ["RUSTIC_TT"] = str(args.tt)

    from rustic_tpu.config import NextEventEstimation, TracingConfig
    from rustic_tpu.runtime.render import pixel_offsets, render_pixels
    from rustic_tpu.scene.world import World

    w, h = (int(v) for v in args.size.split("x"))
    config = TracingConfig(width=w, height=h, nee=NextEventEstimation.MIS)
    y, x = np.mgrid[0:h, 0:w]
    px = x.reshape(-1).astype(np.int32)
    py = y.reshape(-1).astype(np.int32)
    offsets = pixel_offsets(w, h)
    combos = [c.split(":") for c in args.combos.split(",")]
    scene = World.from_path(
        os.path.join("assets", "scenes", f"{args.scene}.glb")
    ).to_device()
    print(
        f"scene={args.scene} {w}x{h}x{args.spp} "
        f"nt={scene.tile_aabbs.shape[0] if scene.tile_aabbs is not None else 1}",
        flush=True,
    )

    def run(dma, mt):
        os.environ["RUSTIC_DMA_STREAM"] = str(dma)
        os.environ["RUSTIC_SHADE_KERNEL_MT"] = str(mt)
        film = render_pixels(scene, config, px, py, args.spp, offsets=offsets)
        return float(np.asarray(film).mean())

    ref_mean = None  # first combo's film mean = the energy reference
    bad_energy = []

    def check(dma, mt, mean):
        nonlocal ref_mean
        if ref_mean is None:
            ref_mean = mean
        elif abs(mean - ref_mean) > 2e-3 * max(abs(ref_mean), 1e-6):
            bad_energy.append((dma, mt, mean))
            print(
                f"WARNING: energy regression dma={dma} mt={mt}: "
                f"film_mean={mean:.6f} vs reference {ref_mean:.6f}",
                flush=True,
            )

    for dma, mt in combos:
        t0 = time.perf_counter()
        mean = run(dma, mt)
        check(dma, mt, mean)
        print(
            f"warm dma={dma} mt={mt}: {time.perf_counter()-t0:.1f}s "
            f"film_mean={mean:.6f}", flush=True,
        )
    results = {}
    for r in range(args.reps):
        for dma, mt in combos:
            t0 = time.perf_counter()
            mean = run(dma, mt)
            dt = time.perf_counter() - t0
            check(dma, mt, mean)
            mp = w * h * args.spp / dt / 1e6
            results.setdefault((dma, mt), []).append(mp)
            print(
                f"rep{r} dma={dma} mt={mt}: {dt:.2f}s {mp:.2f} Mpaths/s "
                f"film_mean={mean:.6f}", flush=True,
            )
    for (dma, mt), v in results.items():
        print(f"BEST dma={dma} mt={mt}: {max(v):.2f} Mpaths/s "
              f"(all: {[round(x, 2) for x in v]})")
    if bad_energy:
        print(f"FAIL: {len(bad_energy)} combo runs deviated in film mean")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
