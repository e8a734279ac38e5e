"""Probe: emulated-f32 dot as ONE bf16 pass at K=96 ("x6" plan).

tools/mxu_floor.py measured the flash-scan dot shapes OUTPUT-bound:
time is flat in K from 8 to 128, an f32 HIGHEST K=16 dot costs 2.75x
one bf16 pass, and a compensated bf16x3 split costs 3.0x (three
output-materializing dots). Consequence nobody cashed in round 2: the
systolic depth a K=16 dot wastes can carry an f32-accuracy EMULATION
in a single bf16 pass. Split every f32 operand into three bf16 parts
(hi/mid/lo, 8 fresh mantissa bits each, exactly reconstructing the
f32 value — scene/world.py:_split_rows_bf16x3's trick), then
concatenate SIX cross-term blocks along the contraction dim:

    a.b = (ha+ma+la).(hb+mb+lb)
        = ha.hb + ha.mb + ma.hb + ha.lb + ma.mb + la.hb   (kept, K=6x16)
        + ma.lb + la.mb + la.lb                           (dropped, <=2^-24)

Every kept bf16xbf16 product is EXACT in the f32 accumulator (8x8
mantissa bits), so the error vs a true f32 dot is only the dropped
tail (~1.5 * 2^-24 of the term magnitudes) plus accumulation rounding
— f32-HIGHEST-class — while the MXU cost is ONE output-materializing
pass at K=96, which the flat-K measurement prices at ~1.0x.

This probe verifies both claims on hardware:
  1. speed: bf16 K=96 (pre-split and with in-kernel F splitting)
     vs bf16 K=16 vs f32 HIGHEST K=16, on the scan shape
     [16,1024]^T @ [16,1024] with the packed-min epilogue;
  2. accuracy: max relative error of the 6-term emulation vs a float64
     oracle on real DarkCornell Moller-Trumbore features (which have
     the ~10x term cancellation that killed single-pass bf16 in
     round 1), compared against f32 HIGHEST's own error.

Usage: python tools/probe_k96.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = jax.lax.Precision.DEFAULT
H = jax.lax.Precision.HIGHEST


def split3_np(a):
    import ml_dtypes

    bf = ml_dtypes.bfloat16
    a = np.asarray(a, np.float32)
    hi = a.astype(bf)
    r1 = a - hi.astype(np.float32)
    mid = r1.astype(bf)
    lo = (r1 - mid.astype(np.float32)).astype(bf)
    return hi, mid, lo


def cat6_g(g):
    """[16, N] f32 -> [96, N] bf16 G-side blocks [hb mb lb hb mb hb]."""
    hb, mb, lb = split3_np(g)
    return np.concatenate([hb, mb, lb, hb, mb, hb], axis=0)


def cat6_f_np(f):
    """[16, B] f32 -> [96, B] bf16 F-side blocks [ha ha ha ma ma la],
    pairing with cat6_g's [hb mb lb hb mb hb] to give the six kept
    cross terms ha.hb ha.mb ha.lb ma.hb ma.mb la.hb."""
    ha, ma, la = split3_np(f)
    return np.concatenate([ha, ha, ha, ma, ma, la], axis=0)


def _kernel(n, reps, precision, k_in, split_in_kernel):
    def kernel(f_ref, g_ref, o_ref):
        f = f_ref[...]
        if split_in_kernel:
            # [16, M] f32 -> [96, M] bf16 on the VPU (the real kernel's
            # cost: ray features change per bounce, G is pre-split)
            hi = f.astype(jnp.bfloat16)
            r1 = f - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            f = jnp.concatenate([hi, hi, hi, mid, mid, lo], axis=0)
        acc = None
        for r in range(reps):
            g = g_ref[:, r * n : (r + 1) * n]
            d = jax.lax.dot_general(
                f, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            red = jnp.min(d, axis=1)
            acc = red if acc is None else jnp.minimum(acc, red)
        o_ref[0, :] = acc

    return kernel


def bench(name, b, m, k_in, k_g, n, reps, f, g, precision,
          split_in_kernel=False, iters=5):
    call = pl.pallas_call(
        _kernel(n, reps, precision, k_in, split_in_kernel),
        grid=(b // m,),
        in_specs=[
            pl.BlockSpec((k_in, m), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_g, n * reps), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    fn = jax.jit(call)
    np.asarray(fn(f, g))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(f, g)[0, :8])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    outputs = b * n * reps
    print(f"{name:34s} {dt*1e3:9.3f} ms   "
          f"{128 * dt / outputs * 1e9:8.4f} ns/128out")
    return dt


def accuracy():
    """6-term emulation vs f32 HIGHEST vs f64 on real MT features."""
    from rustic_tpu.ops.intersect import _ray_features16
    from rustic_tpu.scene.world import World

    w = World.from_path("assets/scenes/DarkCornell.glb")
    g = np.asarray(w.tri_feats16, np.float32)  # [16, 1024]
    rng = np.random.default_rng(0)
    ro = rng.uniform(-2, 2, (4096, 3)).astype(np.float32)
    rd = rng.normal(size=(4096, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    f = np.asarray(
        _ray_features16(jnp.asarray(ro), jnp.asarray(rd))
    ).T.astype(np.float32)  # [16, B]

    ref = np.asarray(f, np.float64).T @ np.asarray(g, np.float64)
    f32h = np.asarray(
        jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=H))(f, g)
    ).astype(np.float64)
    e6 = np.asarray(
        jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=D))(
            jnp.asarray(cat6_f_np(f)), jnp.asarray(cat6_g(g)))
    ).astype(np.float64)
    # scale: the summed |term| magnitude per output (the cancellation-
    # aware yardstick round 1's failure taught us to use)
    scale = np.abs(f, dtype=np.float64).T @ np.abs(g, dtype=np.float64)
    scale = np.maximum(scale, 1e-30)
    for name, got in (("f32 HIGHEST", f32h), ("bf16 K=96 x6", e6)):
        rel = np.abs(got - ref) / scale
        print(f"{name:14s} max_rel_vs_terms={rel.max():.3e}  "
              f"p999={np.percentile(rel, 99.9):.3e}  "
              f"mean={rel.mean():.3e}")


def main():
    print(jax.devices())
    if "--accuracy-only" in sys.argv:
        accuracy()
        return
    b = 1 << 20
    m, n, reps = 1024, 1024, 8
    rng = np.random.default_rng(0)
    f32 = rng.normal(size=(16, b)).astype(np.float32)
    g32 = rng.normal(size=(16, n * reps)).astype(np.float32)
    fbf = jnp.asarray(f32, jnp.bfloat16)
    gbf = jnp.asarray(g32, jnp.bfloat16)
    f96 = jnp.asarray(cat6_f_np(f32))
    g96 = jnp.asarray(cat6_g(g32))
    bench("bf16 k16", b, m, 16, 16, n, reps, fbf, gbf, D)
    bench("f32H k16", b, m, 16, 16, n, reps,
          jnp.asarray(f32), jnp.asarray(g32), H)
    bench("bf16 k96 presplit", b, m, 96, 96, n, reps, f96, g96, D)
    bench("bf16 k96 in-kernel F split", b, m, 16, 96, n, reps,
          jnp.asarray(f32), g96, D, split_in_kernel=True)
    bench("bf16 k48 (x3: hh+hm+mh)", b, m, 48, 48, n, reps,
          f96[:48], g96[:48], D)
    print()
    accuracy()


if __name__ == "__main__":
    main()
