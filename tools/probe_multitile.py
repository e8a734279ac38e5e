"""E2E probe: multi-tile scan levers at the megabatch bench shape.

trace_exec (round 3) shows PBRTest 1280x720 spends 72% of device time
in the sorted driver's nearest kernel (358 ms/dispatch at fold 4) —
the multi-tile scan, not shading, bounds real scenes. The scan cost is
(visited tiles) x (4*tt outputs)/ray; finer tiles cut the second
factor ~linearly while block culling bounds the first, and resident-G
mode removes the per-grid-step overhead finer tiles multiply. Both
were measured losers at 256x144 bench sizes pre-x6 (PERFORMANCE.md);
this re-probes them at the megabatch shape with the x6 dot.

Renders --scene at 1280x720 x --spp through render_pixels for each
(RUSTIC_TT, RUSTIC_RESIDENT) combo, repacking the scene per TT (tile
width is a pack-time choice), interleaved reps, film-mean printed so a
combo that loses energy is caught on the spot.

Usage: python tools/probe_multitile.py [--spp 16] [--reps 2]
       [--combos 512:0,256:0,128:0,128:1] [--scene PBRTest]

Each combo is tt:resident[:dma] — the optional third field toggles
$RUSTIC_DMA_STREAM per run (round 4: the DarkCornell fine-tile repack
only pays off if the DMA-streamed kernels make culling skip the fetch).
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
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--combos", default="512:0,256:0,128:0,128:1")
    ap.add_argument("--scene", default="PBRTest")
    ap.add_argument("--size", default="1280x720")
    args = ap.parse_args()

    from rustic_tpu.config import NextEventEstimation, TracingConfig
    from rustic_tpu.runtime.render import pixel_offsets, render_pixels
    from rustic_tpu.scene.world import World

    w, h = (int(v) for v in args.size.split("x"))
    config = TracingConfig(width=w, height=h, nee=NextEventEstimation.MIS)
    y, x = np.mgrid[0:h, 0:w]
    px = x.reshape(-1).astype(np.int32)
    py = y.reshape(-1).astype(np.int32)
    offsets = pixel_offsets(w, h)
    # Omitted :dma field defaults to "1" — DMA streaming is the shipping
    # default since round 4, so a bare "512:0" combo measures the real
    # default config rather than silently forcing DMA off.
    combos = [(c.split(":") + ["1"])[:3] for c in args.combos.split(",")]

    scenes = {}  # tt -> packed device scene

    def get_scene(tt):
        if tt not in scenes:
            os.environ["RUSTIC_TT"] = str(tt)
            scenes[tt] = World.from_path(
                os.path.join("assets", "scenes", f"{args.scene}.glb")
            ).to_device()
        return scenes[tt]

    def run(tt, res, dma):
        os.environ["RUSTIC_TT"] = str(tt)
        os.environ["RUSTIC_RESIDENT"] = str(res)
        os.environ["RUSTIC_DMA_STREAM"] = str(dma)
        film = render_pixels(
            get_scene(int(tt)), config, px, py, args.spp, offsets=offsets
        )
        return float(np.asarray(film).mean())

    for tt, res, dma in combos:
        t0 = time.perf_counter()
        mean = run(tt, res, dma)
        print(
            f"warm tt={tt} res={res} dma={dma}: "
            f"{time.perf_counter()-t0:.1f}s film_mean={mean:.6f}",
            flush=True,
        )
    results = {}
    for r in range(args.reps):
        for tt, res, dma in combos:
            t0 = time.perf_counter()
            mean = run(tt, res, dma)
            dt = time.perf_counter() - t0
            mp = w * h * args.spp / dt / 1e6
            results.setdefault((tt, res, dma), []).append(mp)
            print(
                f"rep{r} tt={tt} res={res} dma={dma}: {dt:.2f}s "
                f"{mp:.2f} Mpaths/s film_mean={mean:.6f}", flush=True,
            )
    for (tt, res, dma), v in results.items():
        print(f"BEST tt={tt} res={res} dma={dma}: {max(v):.2f} Mpaths/s "
              f"(all: {[round(x, 2) for x in v]})")


if __name__ == "__main__":
    sys.exit(main())
