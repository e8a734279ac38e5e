"""One-shot TPU measurement roundup for the pending round-3 work.

Runs, in one process (so compile caches and the tunnel warm once):
  1. headline DarkCornell bench under dot=mixed vs mixed2
  2. DarkCornell repacked at fine tile sizes (RUSTIC_TT) — resident
     kernels vs streamed grid
  3. multi-tile scenes (FurnaceTest / VeachMIS / PBRTest / BreakTime)
     resident vs streamed at their default packing
  4. furnace correctness probe under mixed2

Each measurement prints one JSON line; the script never aborts a
section on failure (prints the error and moves on). Timings hard-sync
through np.asarray (block_until_ready can return early on axon).

Usage: python tools/tpu_roundup.py [--spp 40] [--sections 1,2,3,4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCENES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "scenes",
)


def _render_rate(scene, w, h, spp, nee="mis", warm_spp=2, skybox=None,
                 cam=None):
    """Mpaths/s for one timed render (after a warmup at the same shapes)."""
    from rustic_tpu.config import (
        NextEventEstimation,
        RenderSettings,
        TracingConfig,
    )
    from rustic_tpu.runtime.render import render_image

    nee_v = {
        "mis": NextEventEstimation.MIS,
        "off": NextEventEstimation.NONE,
    }[nee]
    kwargs = dict(width=w, height=h, nee=nee_v)
    if skybox is not None:
        kwargs["has_skybox"] = True
    if cam is not None:
        kwargs["cam_position"] = cam
    config = TracingConfig(**kwargs)
    film = render_image(scene, config, RenderSettings(samples=warm_spp))
    np.asarray(film[:1])
    t0 = time.time()
    film = render_image(scene, config, RenderSettings(samples=spp))
    np.asarray(film[:1])
    wall = time.time() - t0
    return w * h * spp / wall / 1e6, wall


def _load(name, skybox=None):
    from rustic_tpu.scene.world import World, load_skybox_image

    world = World.from_path(os.path.join(SCENES, name))
    sb = load_skybox_image(os.path.join(SCENES, skybox)) if skybox else None
    return world.to_device(sb)


def emit(**kv):
    print(json.dumps(kv), flush=True)


def section_1(spp):
    scene = _load("DarkCornell.glb")
    for dot in ("mixed", "mixed2", "mixed", "mixed2"):  # interleaved
        os.environ["RUSTIC_FLASH_DOT"] = dot
        try:
            rate, wall = _render_rate(scene, 1280, 720, spp)
            emit(section=1, dot=dot, mpaths=round(rate, 2),
                 wall_s=round(wall, 2))
        except Exception as e:
            emit(section=1, dot=dot, error=str(e))
    os.environ.pop("RUSTIC_FLASH_DOT", None)


def section_2(spp):
    for tt in (512, 128, 64):
        os.environ["RUSTIC_TT"] = str(tt)
        try:
            scene = _load("DarkCornell.glb")  # repacks at this TT
            for resident in ("1", "0") if tt != 512 else ("1",):
                os.environ["RUSTIC_RESIDENT"] = resident
                rate, wall = _render_rate(scene, 1280, 720, spp)
                emit(section=2, tt=tt, resident=resident,
                     mpaths=round(rate, 2), wall_s=round(wall, 2))
        except Exception as e:
            emit(section=2, tt=tt, error=str(e))
    os.environ.pop("RUSTIC_TT", None)
    os.environ.pop("RUSTIC_RESIDENT", None)


def section_3(spp):
    cases = [
        ("FurnaceTest.glb", None, None),
        ("VeachMIS.glb", None, None),
        ("PBRTest.glb", None, None),
        ("BreakTime.glb", "BreakTimeSky.npy", (0.0, 1.8, -3.2)),
    ]
    for name, sky, cam in cases:
        try:
            scene = _load(name, sky)
            for resident, bt in (
                ("0", ""), ("1", ""), ("1", "512"), ("0", ""), ("1", ""),
            ):
                os.environ["RUSTIC_RESIDENT"] = resident
                if bt:
                    os.environ["RUSTIC_BT"] = bt
                else:
                    os.environ.pop("RUSTIC_BT", None)
                rate, wall = _render_rate(
                    scene, 256, 144, max(spp // 4, 4), skybox=sky, cam=cam
                )
                emit(section=3, scene=name, resident=resident,
                     bt=bt or "auto", mpaths=round(rate, 3),
                     wall_s=round(wall, 2))
        except Exception as e:
            emit(section=3, scene=name, error=str(e))
    os.environ.pop("RUSTIC_RESIDENT", None)
    os.environ.pop("RUSTIC_BT", None)


def section_4(_spp):
    from rustic_tpu.config import NextEventEstimation, TracingConfig
    from rustic_tpu.runtime.render import render_pixels

    scene = _load("FurnaceTest.glb")
    for dot in ("mixed", "mixed2"):
        os.environ["RUSTIC_FLASH_DOT"] = dot
        try:
            for nee, label in (
                (NextEventEstimation.NONE, "off"),
                (NextEventEstimation.MIS, "mis"),
            ):
                config = TracingConfig(width=128, height=128, nee=nee)
                film = render_pixels(
                    scene, config, np.array([65]), np.array([75]), 32
                )
                probe = float((np.asarray(film)[0, 0] / 32.0) ** (1 / 2.2))
                emit(section=4, dot=dot, nee=label, probe=round(probe, 4),
                     gate="0.8+-0.02")
        except Exception as e:
            emit(section=4, dot=dot, error=str(e))
    os.environ.pop("RUSTIC_FLASH_DOT", None)


def section_5(_spp, refresh=False):
    """Ground-truth films for assets/reference/ (f32 dot, bvh oracle
    engine, 256x144 — the protocol of tests/test_reference_films.py).
    With --refresh-films every film re-renders even if present (use
    after sampler changes: the pre-2026-08-18 films predate the LDS
    mod-32 collision fix, so their bounce-3 direct lighting carries a
    tiny systematic bias)."""
    from rustic_tpu.config import (
        NextEventEstimation,
        RenderSettings,
        TracingConfig,
    )
    from rustic_tpu.runtime.render import render_image

    ref_dir = os.path.join(os.path.dirname(SCENES), "reference")
    mis = dict(nee=NextEventEstimation.MIS)
    cases = [
        ("DarkCornell.glb", None, "darkcornell_256x144_2048spp.npy",
         2048, mis),
        ("FurnaceTest.glb", None, "furnacetest_256x144_1024spp.npy",
         1024, {}),
        ("VeachMIS.glb", None, "veachmis_256x144_1024spp.npy", 1024,
         dict(cam_position=(5.0, 3.0, -10.0), cam_rotation=(0.25, 0.05),
              **mis)),
        ("GlassTest.glb", None, "glasstest_256x144_1024spp.npy", 1024,
         dict(cam_position=(0.0, 2.2, -6.5), cam_rotation=(0.15, 0.0),
              **mis)),
        ("BreakTime.glb", "BreakTimeSky.npy",
         "breaktime_256x144_1024spp.npy", 1024,
         dict(cam_position=(0.0, 1.8, -3.2), has_skybox=True, **mis)),
    ]
    os.environ["RUSTIC_FLASH_DOT"] = "f32"
    for name, sky, out, spp, cfg_kw in cases:
        path = os.path.join(ref_dir, out)
        if os.path.exists(path) and not refresh:
            emit(section=5, film=out, skipped="already present")
            continue
        try:
            scene = _load(name, sky)
            config = TracingConfig(width=256, height=144, **cfg_kw)
            t0 = time.time()
            film = np.asarray(
                render_image(scene, config, RenderSettings(samples=spp),
                             engine="bvh")
            )
            with open(path, "wb") as f:
                np.save(f, film)
            emit(section=5, film=out, wall_s=round(time.time() - t0, 1),
                 mean=round(float(film.mean()), 5))
        except Exception as e:
            emit(section=5, film=out, error=str(e))
    os.environ.pop("RUSTIC_FLASH_DOT", None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=40)
    ap.add_argument("--sections", default="1,2,3,4")
    ap.add_argument(
        "--films", action="store_true",
        help="also render missing assets/reference/ ground-truth films",
    )
    ap.add_argument(
        "--refresh-films", action="store_true",
        help="re-render ALL ground-truth films (after sampler changes)",
    )
    args = ap.parse_args()
    import jax

    emit(backend=jax.default_backend(), devices=len(jax.devices()))
    for s in (int(v) for v in args.sections.split(",")):
        {1: section_1, 2: section_2, 3: section_3, 4: section_4}[s](args.spp)
    if args.films or args.refresh_films:
        section_5(args.spp, refresh=args.refresh_films)


if __name__ == "__main__":
    main()
