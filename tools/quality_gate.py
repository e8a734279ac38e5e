"""The BASELINE quality gate, demonstrated end-to-end on hardware.

Two parts, each one JSON line per case:

1. Furnace matrix at HIGH spp on the current backend with the DEFAULT
   precision plan: pixel (65,75) of FurnaceTest at 128^2 must equal the
   0.8 albedo within the reference's own +-0.02 after gamma decode
   (reference: tests/correctness_tests.rs:14-33) — the round-1 verdict
   asked for exactly this bias-vs-noise settle (VERDICT item 4).

2. RMSE vs the committed ground-truth films (assets/reference/,
   rendered by the f32-dot bvh-oracle engine at 1024-2048 spp): each
   film's config re-renders at the SAME spp with the DEFAULT plan and
   engine. The sampler is a pure function of (pixel, sample), so both
   renders integrate the identical sample set and the RMSE measures
   ENGINE divergence, not Monte-Carlo noise — this is how the
   BASELINE.md "RMSE < 1e-3 vs the 1024-spp reference" target is
   meaningful at finite spp (VERDICT item 3).

Usage: python tools/quality_gate.py [--furnace-spp 512] [--cases all]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENES = os.path.join(REPO, "assets", "scenes")
REF = os.path.join(REPO, "assets", "reference")


RESULTS = []
OUT_PATH = None  # set from --out; emit() then persists incrementally


def emit(**kw):
    print(json.dumps(kw), flush=True)
    RESULTS.append(kw)
    if OUT_PATH:
        _write_out(OUT_PATH)


def _write_out(path):
    """Persist every emitted line as one committable artifact (the
    QUALITY_rN.json record the round-4 verdict asks for), rewritten
    after every case so partial runs stay on the record."""
    import subprocess

    try:
        git = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        git = None
    with open(path, "w") as f:
        json.dump({
            "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "git": git,
            "results": RESULTS,
        }, f, indent=1)


def furnace_matrix(spp):
    from rustic_tpu.config import NextEventEstimation, TracingConfig
    from rustic_tpu.runtime.render import render_pixels
    from rustic_tpu.scene.world import World

    scene = World.from_path(os.path.join(SCENES, "FurnaceTest.glb")).to_device()
    for nee, label in (
        (NextEventEstimation.NONE, "off"),
        (NextEventEstimation.MIS, "mis"),
    ):
        config = TracingConfig(width=128, height=128, nee=nee)
        film = render_pixels(
            scene, config, np.array([65], np.int32), np.array([75], np.int32),
            spp,
        )
        probe = float((np.asarray(film)[0, 0] / spp) ** (1 / 2.2))
        emit(
            gate="furnace", nee=label, spp=spp, probe=round(probe, 4),
            ok=bool(abs(probe - 0.8) < 0.02),
        )


FILM_CASES = [
    ("DarkCornell.glb", None, "darkcornell_256x144_2048spp.npy", 2048, {}),
    ("FurnaceTest.glb", None, "furnacetest_256x144_1024spp.npy", 1024,
     dict(nee="none")),
    ("VeachMIS.glb", None, "veachmis_256x144_1024spp.npy", 1024,
     dict(cam_position=(5.0, 3.0, -10.0), cam_rotation=(0.25, 0.05))),
    ("GlassTest.glb", None, "glasstest_256x144_1024spp.npy", 1024,
     dict(cam_position=(0.0, 2.2, -6.5), cam_rotation=(0.15, 0.0))),
    ("BreakTime.glb", "BreakTimeSky.npy", "breaktime_256x144_1024spp.npy",
     1024, dict(cam_position=(0.0, 1.8, -3.2), has_skybox=True)),
    # At-SPEC-resolution ground truths (tools/make_reference_films.py,
    # BVH-oracle engine; round-4 verdict weakness 7 — BASELINE.md's
    # gate is defined at the config resolutions). Film size is parsed
    # from the filename; cases whose film is absent emit
    # "reference film missing" and are skipped.
    ("DarkCornell.glb", None, "darkcornell_512x512_256spp.npy", 256, {}),
    ("GlassTest.glb", None, "glasstest_512x512_256spp.npy", 256,
     dict(cam_position=(0.0, 2.2, -6.5), cam_rotation=(0.15, 0.0))),
    ("VeachMIS.glb", None, "veachmis_1024x1024_128spp.npy", 128,
     dict(cam_position=(5.0, 3.0, -10.0), cam_rotation=(0.25, 0.05))),
    ("BreakTime.glb", "BreakTimeSky.npy", "breaktime_1920x1080_64spp.npy",
     64, dict(cam_position=(0.0, 1.8, -3.2), has_skybox=True)),
]


def film_rmse(cases):
    from rustic_tpu.config import (
        NextEventEstimation,
        RenderSettings,
        TracingConfig,
    )
    from rustic_tpu.runtime.render import render_image
    from rustic_tpu.scene.world import World, load_skybox_image

    for name, sky, ref_file, spp, cfg_kw in cases:
        path = os.path.join(REF, ref_file)
        if not os.path.exists(path):
            emit(gate="rmse", scene=name, error="reference film missing")
            continue
        ref = np.load(path)
        kw = dict(cfg_kw)
        nee = (
            NextEventEstimation.NONE
            if kw.pop("nee", None) == "none"
            else NextEventEstimation.MIS
        )
        skybox = (
            load_skybox_image(os.path.join(SCENES, sky)) if sky else None
        )
        scene = World.from_path(os.path.join(SCENES, name)).to_device(skybox)
        w, h = (int(v) for v in ref_file.split("_")[1].split("x"))
        config = TracingConfig(width=w, height=h, nee=nee, **kw)
        t0 = time.time()
        film = np.asarray(
            render_image(scene, config, RenderSettings(samples=spp))
        )
        wall = time.time() - t0
        d = film - ref
        rmse = float(np.sqrt((d * d).mean()))
        emit(
            gate="rmse", scene=name, size=f"{w}x{h}", spp=spp,
            wall_s=round(wall, 1),
            rmse=round(rmse, 6), target="<1e-3", ok=bool(rmse < 1e-3),
            rel_energy=round(
                float(abs(film.mean() - ref.mean()) / max(ref.mean(), 1e-9)),
                6,
            ),
            max_abs_d=round(float(np.abs(d).max()), 5),
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--furnace-spp", type=int, default=512)
    ap.add_argument("--cases", default="all")
    ap.add_argument("--skip-furnace", action="store_true")
    ap.add_argument("--out", default=None,
                    help="write all emitted results as a JSON artifact")
    args = ap.parse_args()

    global OUT_PATH
    OUT_PATH = args.out

    import jax

    emit(backend=jax.default_backend())
    if not args.skip_furnace:
        furnace_matrix(args.furnace_spp)
    cases = FILM_CASES
    if args.cases != "all":
        keep = set(args.cases.lower().split(","))
        cases = [c for c in cases if c[0].lower().split(".")[0] in keep]
    film_rmse(cases)


if __name__ == "__main__":
    main()
