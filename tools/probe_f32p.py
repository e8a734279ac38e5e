"""Interleaved A/B of flash dot plans on the headline scene.

tools/mxu_floor.py measured the scan dots OUTPUT-bound (time flat in K
up to 128; f32 HIGHEST = 2.75x one bf16 pass, not 6x), which predicts
"f32p" (exact f32 HIGHEST dots + the fast packed epilogue) beats the
bf16-split plans while removing all margin/bias bookkeeping. This
probe settles it end-to-end.

Usage: python tools/probe_f32p.py [--spp 40] [--dots mixed2,f32p,...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

SCENES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "assets", "scenes")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=40)
    ap.add_argument("--dots", default="mixed2,f32p,mixed,f32p,mixed2")
    ap.add_argument("--scene", default="DarkCornell.glb")
    ap.add_argument("--size", default="1280x720")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    from rustic_tpu.config import RenderSettings, TracingConfig
    from rustic_tpu.runtime.render import render_image
    from rustic_tpu.scene.world import World

    world = World.from_path(os.path.join(SCENES, args.scene))
    scene = world.to_device(None)
    config = TracingConfig(width=w, height=h)

    for dot in args.dots.split(","):
        os.environ["RUSTIC_FLASH_DOT"] = dot
        try:
            film = render_image(scene, config, RenderSettings(samples=2))
            np.asarray(film[:1])
            t0 = time.time()
            film = render_image(scene, config,
                                RenderSettings(samples=args.spp))
            np.asarray(film[:1])
            wall = time.time() - t0
            print(json.dumps({
                "dot": dot,
                "mpaths": round(w * h * args.spp / wall / 1e6, 2),
                "wall_s": round(wall, 2),
                "mean": round(float(np.asarray(film).mean()), 6),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"dot": dot, "error": str(e)}), flush=True)
    os.environ.pop("RUSTIC_FLASH_DOT", None)


if __name__ == "__main__":
    main()
