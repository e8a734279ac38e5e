"""Micro-probe: resolve-stage cost — field-wise gathers vs row gather.

Round-4 hypothesis for the MT-kernel-shade driver's 2.4x loss on
PBRTest (probe_mt_combo): resolve_attrs_t's field-wise transposed
gathers issue ~50 independent [B] gathers per bounce; at the measured
~5 ms per million gathered rows (per-row latency, width-free — see
PERFORMANCE.md round-2 findings) that is ~0.9 s/bounce at megabatch,
dwarfing the 10 ms shade kernel it feeds. A single [B, W] ROW gather
pays the per-row latency ONCE (width rides free) and one [B, W] ->
[W, B] relayout (~470 MB of HBM traffic, ~1-2 ms at v5e bandwidth).

Times both at --b lanes on the current backend, hard-synced.

Usage: python tools/probe_resolve.py [--b 3686400] [--scene PBRTest]
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
    ap.add_argument("--b", type=int, default=1280 * 720 * 4)
    ap.add_argument("--scene", default="PBRTest")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--queue", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rustic_tpu.ops.resolve import resolve_attrs_t, resolve_attrs_rowT
    from rustic_tpu.scene.world import World

    scene = World.from_path(
        os.path.join("assets", "scenes", f"{args.scene}.glb")
    ).to_device()
    B = args.b
    T = scene.tri_attrs.shape[0]
    rng = np.random.default_rng(7)
    idx = jnp.asarray(rng.integers(0, T, B), jnp.int32)
    featsT = jnp.asarray(rng.standard_normal((16, B)), jnp.float32)

    def timed(name, fn):
        out = fn()  # compile
        jax.block_until_ready(out)
        np.asarray(out[0, :1])  # hard sync
        best = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(args.queue)]
            for o in outs:
                np.asarray(o[0, :1])
            best.append((time.perf_counter() - t0) / args.queue * 1e3)
        print(f"{name}: {min(best):.2f} ms/dispatch "
              f"(all: {[round(v, 2) for v in best]})", flush=True)
        return np.asarray(out)

    a = timed("fieldwise resolve_attrs_t", lambda: resolve_attrs_t(
        scene, featsT, idx, 0.0))
    b = timed("rowgather resolve_attrs_rowT", lambda: resolve_attrs_rowT(
        scene, featsT, idx, 0.0))
    d = np.max(np.abs(a - b))
    print(f"max|fieldwise - rowgather| = {d:.3e}")


if __name__ == "__main__":
    sys.exit(main())
