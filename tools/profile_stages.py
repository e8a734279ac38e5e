"""Capture a JAX profiler trace of the staged DarkCornell pipeline and
print the top device ops by total duration.

Usage: python tools/profile_stages.py [spp] [outdir]

Renders a warmup pass first so the timed capture sees steady-state
executables only, then parses the chrome-trace JSON the profiler wrote
and aggregates op durations on the TPU device track.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/rustic_profile"

    import jax

    from rustic_tpu.config import NextEventEstimation, RenderSettings, TracingConfig
    from rustic_tpu.runtime.render import render_image
    from rustic_tpu.scene.world import World

    world = World.from_path("assets/scenes/DarkCornell.glb")
    scene = world.to_device()
    config = TracingConfig(width=1280, height=720, nee=NextEventEstimation.MIS)

    # warm/compile
    render_image(scene, config, RenderSettings(samples=2))

    settings = RenderSettings(samples=spp)
    with jax.profiler.trace(outdir):
        film = render_image(scene, config, settings)
        np.asarray(film[:1])

    # newest trace.json.gz under outdir
    paths = sorted(
        glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no trace written", file=sys.stderr)
        return 1
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    events = trace.get("traceEvents", [])
    # device tracks: pid names containing "TPU" and thread names "XLA Ops"
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")

    device_pids = {p for p, n in pid_names.items() if "TPU" in n or "tpu" in n}
    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "step" in tname.lower():
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # ms
        agg[name][0] += dur
        agg[name][1] += 1
        total += dur

    print(f"trace: {paths[-1]}")
    print(f"{'op':70s} {'total_ms':>9s} {'count':>6s} {'mean_ms':>8s}")
    for name, (t, c) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:45]:
        print(f"{name[:70]:70s} {t:9.2f} {c:6d} {t / c:8.3f}")
    print(f"\nsum of op durations: {total:.1f} ms over {spp} spp "
          f"(per-sample {total / spp:.1f} ms)")

    # leaf-op time attributed to source lines (skips the module-level
    # jit_* wrapper rows, which double-count their children)
    by_src = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_") or "args" not in e:
            continue
        src = e["args"].get("source", "")
        if src:
            by_src[src] += e.get("dur", 0) / 1e3
    print(f"\n{'source line':70s} {'total_ms':>9s}")
    for src, t in sorted(by_src.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{src[-70:]:70s} {t:9.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
