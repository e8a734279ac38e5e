"""Micro-benchmark the flash intersection kernels on DarkCornell shapes.

Times each kernel entry point at megabatch lane counts with hard
per-dispatch syncing (tiny-slice readback), printing median ms — the
fast loop for epilogue/dot iteration without full renders.

Usage: python tools/bench_kernels.py [B] [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    import jax.numpy as jnp

    from rustic_tpu.ops.flash_intersect import (
        flash_nearest,
        flash_nearest_attrs,
        flash_nearest_shadow_attrs,
        flash_occlude_packed,
        pick_bt,
    )
    from rustic_tpu.ops.intersect import _ray_features16
    from rustic_tpu.scene.world import World

    scene = World.from_path("assets/scenes/DarkCornell.glb").to_device()
    g16 = scene.tri_feats16
    bt = pick_bt(g16)
    print(f"B={b} bt={bt} tris16={g16.shape} reps={reps}", flush=True)

    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.normal(0, 0.8, (b, 3)).astype(np.float32))
    rd = rng.normal(0, 1, (b, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rd = jnp.asarray(rd)
    feats = _ray_features16(ro, rd)
    shadow = feats.at[:, 10].set(2.0)

    QUEUE = 10

    def timeit(name, fn):
        outs = fn()  # compile
        first = outs[0] if isinstance(outs, (tuple, list)) else outs
        np.asarray(first.reshape(-1)[:1])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(QUEUE):
                o = fn()
            f = o[0] if isinstance(o, (tuple, list)) else o
            np.asarray(f.reshape(-1)[:1])
            ts.append((time.perf_counter() - t0) * 1e3 / QUEUE)
        print(f"{name:30s} median {np.median(ts):7.2f} ms  min {min(ts):7.2f}",
              flush=True)

    timeit("nearest", lambda: flash_nearest(feats, g16, scene.tile_aabbs, bt=bt))
    if scene.tri_attrs_split is not None:
        timeit(
            "nearest_attrs",
            lambda: flash_nearest_attrs(
                feats, g16, scene.tile_aabbs, scene.tri_attrs_split, bt=bt
            ),
        )
        timeit(
            "nearest_shadow_attrs",
            lambda: flash_nearest_shadow_attrs(
                feats, shadow, g16, scene.tile_aabbs, scene.tri_attrs_split,
                bt=bt,
            ),
        )
    timeit(
        "occlude_packed",
        lambda: flash_occlude_packed(shadow, g16, scene.tile_aabbs, bt=bt),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
