"""Localize the VeachMIS flash-vs-oracle RMSE divergence (round 5).

QUALITY_r5 found VeachMIS 256x144@1024spp RMSE 4.4e-3 vs the committed
bvh-oracle film — 4.4x the 1e-3 gate — identical under f32 dots, so it
is an ENGINE difference (flash staged pipeline vs lockstep-BVH oracle),
not precision noise. This renders the production film once, then maps
|d| spatially: edge-concentrated error (winner flips on the thin plate
silhouettes, where t-ties between engines legitimately differ) vs
region error (systematic integrator divergence — a bug).

Writes /tmp/r5/veach_diff.png (gamma |d| heatmap) and prints stats:
what fraction of total squared error the worst 0.1% pixels carry, and
the RMSE with those pixels excluded.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np


def main():
    from rustic_tpu.config import (
        NextEventEstimation,
        RenderSettings,
        TracingConfig,
    )
    from rustic_tpu.runtime.render import render_image
    from rustic_tpu.scene.world import World

    ref = np.load("assets/reference/veachmis_256x144_1024spp.npy")
    scene = World.from_path("assets/scenes/VeachMIS.glb").to_device()
    config = TracingConfig(
        width=256, height=144, nee=NextEventEstimation.MIS,
        cam_position=(5.0, 3.0, -10.0), cam_rotation=(0.25, 0.05),
    )
    film = np.asarray(
        render_image(scene, config, RenderSettings(samples=1024))
    )
    d = np.abs(film - ref).max(axis=-1)  # [H, W]
    sq = ((film - ref) ** 2).mean(axis=-1)
    rmse = float(np.sqrt(sq.mean()))

    flat = np.argsort(sq.reshape(-1))[::-1]
    n = sq.size
    worst = flat[: max(n // 1000, 8)]  # worst 0.1%
    frac = float(sq.reshape(-1)[worst].sum() / sq.sum())
    keep = np.ones(n, bool)
    keep[worst] = False
    rmse_rest = float(np.sqrt(sq.reshape(-1)[keep].mean()))
    ys, xs = np.unravel_index(worst[:10], sq.shape)

    print(json.dumps({
        "rmse": round(rmse, 6),
        "worst_0.1pct_error_fraction": round(frac, 4),
        "rmse_excluding_worst_0.1pct": round(rmse_rest, 6),
        "worst_pixels_yx": [[int(y), int(x)] for y, x in zip(ys, xs)],
        "worst_|d|": [round(float(d[y, x]), 4) for y, x in zip(ys, xs)],
    }), flush=True)

    try:
        from PIL import Image

        img = (np.clip(d / max(d.max(), 1e-9), 0, 1) ** 0.4545 * 255)
        Image.fromarray(img.astype(np.uint8)).save("/tmp/r5/veach_diff.png")
        ref_img = (np.clip(ref, 0, 1) ** 0.4545 * 255).astype(np.uint8)
        Image.fromarray(ref_img).save("/tmp/r5/veach_ref.png")
        print("wrote /tmp/r5/veach_diff.png /tmp/r5/veach_ref.png")
    except Exception as e:
        print("no PNG:", e)


if __name__ == "__main__":
    main()
