"""Image-quality comparison harness.

The BASELINE quality gate is per-pixel RMSE against a high-spp CPU
reference (BASELINE.md: RMSE < 1e-3 at 1024 spp). This module provides
the measurement tools: RMSE/MAE between films, engine-vs-engine
comparison on the same backend, and on-disk reference handling so a CPU
reference rendered once can gate later TPU runs
(`python -m rustic_tpu.cli compare ...`).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from rustic_tpu.config import RenderSettings, TracingConfig


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def mae(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))


def compare_engines(
    scene,
    config: TracingConfig,
    samples: int,
    engines=("brute", "bvh", "flash"),
) -> Dict[str, float]:
    """Pairwise RMSE between intersection engines on the current backend.

    With the shared deterministic sampler, engines must agree to float
    tolerance — any geometric disagreement shows up directly."""
    from rustic_tpu.runtime.render import render_image

    settings = RenderSettings(samples=samples)
    films = {e: render_image(scene, config, settings, engine=e) for e in engines}
    out = {}
    names = list(engines)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            out[f"{a}_vs_{b}"] = rmse(films[a], films[b])
    return out


def reference_compare(
    scene,
    config: TracingConfig,
    samples: int,
    reference_path: str,
    reference_samples: Optional[int] = None,
    save_if_missing: bool = True,
) -> Optional[Dict[str, float]]:
    """Render and compare against (or create) an on-disk reference film.

    Typical flow: run once on the CPU backend with high spp to create
    the reference .npy, then run on TPU to measure RMSE against it."""
    from rustic_tpu.runtime.render import render_image

    film = render_image(
        scene, config, RenderSettings(samples=samples)
    )
    if not os.path.exists(reference_path):
        if save_if_missing:
            ref = render_image(
                scene,
                config,
                RenderSettings(samples=reference_samples or samples * 4),
            )
            # file object: np.save appends '.npy' to bare string paths,
            # which would break the np.load right below
            with open(reference_path, "wb") as f:
                np.save(f, ref)
        else:
            return None
    ref = np.load(reference_path)
    return {
        "rmse": rmse(film, ref),
        "mae": mae(film, ref),
        "mean": float(np.asarray(film).mean()),
        "ref_mean": float(ref.mean()),
    }
