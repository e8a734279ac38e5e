"""A/B: DMA-streamed vs prefetch-streamed multi-tile nearest kernel.

Calls _flash_nearest directly with dma=False/True (bypassing the
$RUSTIC_DMA_STREAM gate so engagement is unambiguous) on real camera
rays at the megabatch bench shape, interleaved reps, and checks output
equality. Primary rays in pixel order are the BEST case for block
culling; --shuffle permutes them for the worst case.

Usage: python tools/probe_dma_ab.py [--scene PBRTest] [--tt 512]
       [--bt 256] [--reps 3] [--shuffle]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="PBRTest")
    ap.add_argument("--tt", type=int, default=512)
    ap.add_argument("--bt", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--shuffle", action="store_true")
    args = ap.parse_args()
    os.environ["RUSTIC_TT"] = str(args.tt)

    import numpy as np
    import jax.numpy as jnp

    from rustic_tpu.config import TracingConfig
    from rustic_tpu.ops import flash_intersect as FI
    from rustic_tpu.ops.trace import camera_rays
    from rustic_tpu.runtime.render import pixel_offsets
    from rustic_tpu.scene.world import World

    w, h = (int(v) for v in args.size.split("x"))
    world = World.from_path(os.path.join("assets", "scenes", f"{args.scene}.glb"))
    scene = world.to_device()
    tcfg = TracingConfig(width=w, height=h)
    cfg = tcfg.static_part()
    cam = tcfg.dynamic_part()
    y, x = np.mgrid[0:h, 0:w]
    px = jnp.asarray(x.reshape(-1), jnp.int32)
    py = jnp.asarray(y.reshape(-1), jnp.int32)
    offsets = jnp.asarray(pixel_offsets(w, h), jnp.uint32)
    sidx = jnp.zeros((px.shape[0],), jnp.uint32)
    ro, rd = camera_rays(cfg, cam, px, py, sidx, offsets)
    if args.shuffle:
        p = np.random.default_rng(0).permutation(px.shape[0])
        ro, rd = ro[p], rd[p]
    from rustic_tpu.ops.intersect import _ray_features16
    feats = _ray_features16(ro, rd)

    g16 = scene.tri_feats16
    t_pad, tt, nt = FI._geometry(g16)
    prec = FI.resolve_precision("auto", False)
    print(f"scene={args.scene} tris->{t_pad} tt={tt} nt={nt} "
          f"bt={args.bt} B={px.shape[0]} prec={prec}", flush=True)

    def run(dma):
        return FI._flash_nearest(
            feats, g16, scene.tile_aabbs, bt=args.bt, interpret=False,
            precision=prec, resident=False, dma=dma,
        )

    def host(out):
        return tuple(np.asarray(o) for o in out if o is not None)

    # warm both
    for dma in (False, True):
        t0 = time.perf_counter()
        host(run(dma))
        print(f"warm dma={dma}: {time.perf_counter()-t0:.1f}s", flush=True)
    a, b = host(run(False)), host(run(True))
    hit_a = a[0] < 1e6
    eq_t = np.array_equal(a[0], b[0])
    eq_i = np.array_equal(np.where(hit_a, a[1], -1), np.where(hit_a, b[1], -1))
    print(f"equal: t={eq_t} idx(hit)={eq_i} hits={hit_a.mean():.4f}")
    # Device-side timing: the axon tunnel moves full outputs at
    # ~25 MB/s, so per-call np.asarray would hide any kernel delta
    # behind ~300 ms of transfer. Queue `iters` dependent calls and
    # sync ONE scalar: per-call time = drain / iters.
    iters = 4
    times = {False: [], True: []}
    for r in range(args.reps):
        for dma in (False, True):
            t0 = time.perf_counter()
            s_acc = None
            for _ in range(iters):
                out = run(dma)
                t_sum = out[0].sum()
                s_acc = t_sum if s_acc is None else s_acc + t_sum
            float(s_acc)
            times[dma].append((time.perf_counter() - t0) / iters)
    for dma in (False, True):
        ts = sorted(times[dma])
        print(f"dma={dma}: min {ts[0]*1e3:.1f} ms/call  all "
              f"{[round(t*1e3, 1) for t in times[dma]]}")


if __name__ == "__main__":
    sys.exit(main())
