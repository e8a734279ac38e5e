"""Per-executable device timing from a JAX profiler trace of the real
staged render.

Renders DarkCornell 1280x720 at --spp through the staged pipeline,
captures a profiler trace, and aggregates the TPU device track by
EXECUTABLE (the jit_* parent spans), with event counts and mean ms per
dispatch — plus the interval-union device-busy time, so orchestration
gaps are visible as (wall - busy). This is the honest per-stage cost
breakdown; hard-synced probes overstate by the ~30 ms tunnel sync and
same-executable queueing inflates allocator churn.

Usage: python tools/trace_exec.py [--spp 8] [--scene ...]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--scene", default="assets/scenes/DarkCornell.glb")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--outdir", default="/tmp/rustic_trace")
    ap.add_argument("--skybox", default=None,
                    help="HDR sky .npy path (sets has_skybox)")
    ap.add_argument("--inside", default="jit_pre",
                    help="executable to break down at op level ('' = skip)")
    args = ap.parse_args()

    import jax

    from rustic_tpu.config import NextEventEstimation, RenderSettings, TracingConfig
    from rustic_tpu.runtime.render import render_image
    from rustic_tpu.scene.world import World

    world = World.from_path(args.scene)
    skybox = None
    if args.skybox:
        from rustic_tpu.scene.world import load_skybox_image

        skybox = load_skybox_image(args.skybox)
    scene = world.to_device(skybox)
    config = TracingConfig(
        width=args.width, height=args.height, nee=NextEventEstimation.MIS,
        has_skybox=skybox is not None,
    )
    render_image(scene, config, RenderSettings(samples=args.spp))  # warm

    t0 = time.perf_counter()
    with jax.profiler.trace(args.outdir):
        render_image(scene, config, RenderSettings(samples=args.spp))
    wall = time.perf_counter() - t0

    paths = sorted(
        glob.glob(os.path.join(args.outdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items() if "TPU" in n or "tpu" in n}

    # Executable-level spans live on the "XLA Modules" thread; op-level
    # on "XLA Ops". Fall back to name-prefix matching if threads differ.
    mod_events, op_events = [], []
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "").lower()
        if "module" in tname:
            mod_events.append(e)
        elif "ops" in tname:
            op_events.append(e)

    src = mod_events if mod_events else [
        e for e in op_events if e.get("name", "").startswith("jit")
    ]
    agg = defaultdict(lambda: [0.0, 0])
    intervals = []
    for e in src:
        name = e["name"].split("(")[0]
        dur = e.get("dur", 0) / 1e3
        agg[name][0] += dur
        agg[name][1] += 1
        intervals.append((e["ts"], e["ts"] + e.get("dur", 0)))

    intervals.sort()
    busy = 0.0
    cur_s = cur_e = None
    for s_, e_ in intervals:
        if cur_e is None or s_ > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s_, e_
        else:
            cur_e = max(cur_e, e_)
    if cur_e is not None:
        busy += cur_e - cur_s
    busy_ms = busy / 1e3

    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"wall {wall*1e3:.0f} ms, device busy {busy_ms:.0f} ms "
          f"({100*busy_ms/(wall*1e3):.0f}%), spp {args.spp}")
    print(f"{'executable':58s} {'total':>8s} {'n':>4s} {'mean':>8s}")
    for name, (tot, n) in rows[:25]:
        print(f"{name[:58]:58s} {tot:8.1f} {n:4d} {tot/n:8.2f}")

    # op-level anatomy of one executable (--inside)
    if args.inside:
        spans = [
            (e["ts"], e["ts"] + e["dur"])
            for e in src
            if e["name"].split("(")[0] == args.inside
        ]
        inner = defaultdict(lambda: [0.0, 0])
        for e in op_events:
            t = e["ts"]
            if any(s <= t < en for s, en in spans):
                meta = e.get("args", {}) or {}
                line = meta.get("source", "") or meta.get("tf_op", "")
                key = f'{e["name"].split("(")[0][:40]:40s} {line[-50:]}'
                inner[key][0] += e.get("dur", 0) / 1e3
                inner[key][1] += 1
        n_spans = max(len(spans), 1)
        print(f"\n-- ops inside {args.inside} (per dispatch, n={n_spans}) --")
        for key, (tot, n) in sorted(inner.items(), key=lambda kv: -kv[1][0])[:30]:
            print(f"{key} {tot/n_spans:8.3f} ms")


if __name__ == "__main__":
    main()
