"""Measure mixed2's edge-margin bias against the f32 oracle.

Renders DarkCornell at small resolution / high spp with the f32 dot
plan (oracle) and with mixed2 at several $RUSTIC_NEAR_MARGIN values,
reporting relative film-energy deltas and max pixel |d|. The margin is
a subprocess env var because the dot plan and the margin are baked into
the compiled kernels at trace time.

Usage: python tools/probe_margin.py [--res 64] [--spp 256]
"""

import argparse
import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys
import numpy as np
sys.path.insert(0, %(repo)r)
from rustic_tpu.config import NextEventEstimation, RenderSettings, TracingConfig
from rustic_tpu.runtime.render import render_image
from rustic_tpu.scene.world import World
scene = World.from_path(%(repo)r + "/assets/scenes/DarkCornell.glb").to_device()
config = TracingConfig(width=%(res)d, height=%(res)d, nee=NextEventEstimation.MIS)
film = render_image(scene, config, RenderSettings(samples=%(spp)d))
np.save(%(out)r, film)
print(json.dumps({"mean": float(film.mean())}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--margins", default="1e-3,3e-4,1e-4")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(tag, env_extra):
        out = f"/tmp/margin_{tag}.npy"
        env = dict(os.environ, **env_extra)
        code = CHILD % dict(repo=repo, res=args.res, spp=args.spp, out=out)
        r = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=900,
        )
        if r.returncode != 0:
            print(f"{tag}: FAILED\n{r.stderr[-2000:]}")
            return None
        import numpy as np

        return np.load(out)

    oracle = run("f32", {"RUSTIC_FLASH_DOT": "f32"})
    if oracle is None:
        return 1
    print(json.dumps({"plan": "f32", "mean": float(oracle.mean())}), flush=True)
    import numpy as np

    for m in args.margins.split(","):
        film = run(f"mixed2_{m}", {
            "RUSTIC_FLASH_DOT": "mixed2", "RUSTIC_NEAR_MARGIN": m,
        })
        if film is None:
            continue
        d = film - oracle
        print(
            json.dumps({
                "plan": f"mixed2 margin={m}",
                "mean": float(film.mean()),
                "energy_delta_pct": 100 * float(
                    (film.mean() - oracle.mean()) / oracle.mean()
                ),
                "max_abs_d": float(np.abs(d).max()),
                "rmse": float(np.sqrt((d * d).mean())),
            }),
            flush=True,
        )


if __name__ == "__main__":
    main()
