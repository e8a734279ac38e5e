"""MXU floor probe for the flash-scan dot shapes.

The intersection kernels are chains of [16, BT]^T @ [16, N] dots
(M=BT rays, K=16 features, N=triangle columns). PERFORMANCE.md's
cost model claims they run AT the hardware floor for their
single-pass-equivalent count. This probe measures that floor from
first principles, answering three questions the model assumed:

  1. Is a K=16 dot output-bound (time flat in K up to 128) or
     MAC-bound (time ~ K)? If flat, raising K buys nothing and the
     only levers are N columns and pass count. If ~K, the MXU has
     idle depth that a different factorization could exploit.
  2. What is the achieved output rate (elements/cycle) per dtype /
     precision, and how far is it from the chip's peak MAC rate?
  3. Do bigger ray blocks (M) or wider column tiles (N) change the
     per-element rate (grid/DMA overhead amortization)?

Each case runs a Pallas kernel whose body is `reps` independent dots
(different N slices so they cannot fuse), reduced to one output row
(jnp.min) so nothing is DCE'd. Timing is hard-synced via np.asarray.

Usage: python tools/mxu_floor.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _case_kernel(k, n, reps, precision, acc_min, out_dtype=jnp.float32):
    def kernel(f_ref, g_ref, o_ref):
        f = f_ref[...]
        acc = None
        for r in range(reps):
            g = g_ref[:, r * n : (r + 1) * n]
            d = jax.lax.dot_general(
                f, g, (((0,), (0,)), ((), ())),
                preferred_element_type=out_dtype,
                precision=precision,
            )
            red = jnp.min(d, axis=1) if acc_min else d[:, 0]
            acc = red if acc is None else jnp.minimum(acc, red)
        o_ref[0, :] = acc.astype(jnp.float32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("m", "k", "n", "reps", "precision", "acc_min", "out_dtype"),
)
def _run_case(f, g, m, k, n, reps, precision, acc_min, out_dtype=jnp.float32):
    b = f.shape[1]
    return pl.pallas_call(
        _case_kernel(k, n, reps, precision, acc_min, out_dtype),
        grid=(b // m,),
        in_specs=[
            pl.BlockSpec((k, m), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n * reps), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(f, g)


def bench(b, m, k, n, reps, dtype, precision, acc_min=True, iters=5,
          out_dtype=jnp.float32):
    key = jax.random.PRNGKey(0)
    f = jax.random.normal(key, (k, b), jnp.float32).astype(dtype)
    g = jax.random.normal(key, (k, n * reps), jnp.float32).astype(dtype)
    out = _run_case(f, g, m, k, n, reps, precision, acc_min, out_dtype)
    np.asarray(out)  # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = _run_case(f, g, m, k, n, reps, precision, acc_min, out_dtype)
        np.asarray(out[0, :8])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    outputs = b * n * reps
    macs = outputs * k
    return {
        "dt_ms": round(dt * 1e3, 3),
        "out_per_s": outputs / dt,
        "ns_per_128out": round(128 * dt / outputs * 1e9, 4),
        "tmacs": round(macs / dt / 1e12, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    print(jax.devices())
    b = 1 << 20  # 1M rays
    H = jax.lax.Precision.HIGHEST
    HI = jax.lax.Precision.HIGH
    D = jax.lax.Precision.DEFAULT
    cases = [
        # name, m, k, n, reps, dtype, precision
        ("bf16 k16 n1024 m1024", 1024, 16, 1024, 8, jnp.bfloat16, D),
        ("bf16 k32 n1024 m1024", 1024, 32, 1024, 8, jnp.bfloat16, D),
        ("bf16 k64 n1024 m1024", 1024, 64, 1024, 8, jnp.bfloat16, D),
        ("bf16 k128 n1024 m1024", 1024, 128, 1024, 8, jnp.bfloat16, D),
        ("bf16 k8 n1024 m1024", 1024, 8, 1024, 8, jnp.bfloat16, D),
        ("f32H k16 n1024 m1024", 1024, 16, 1024, 8, jnp.float32, H),
        ("f32HI k16 n1024 m1024", 1024, 16, 1024, 8, jnp.float32, HI),
        ("f32D k16 n1024 m1024", 1024, 16, 1024, 8, jnp.float32, D),
        ("bf16 k16 n128 m1024", 1024, 16, 128, 8, jnp.bfloat16, D),
        ("bf16 k16 n256 m1024", 1024, 16, 256, 8, jnp.bfloat16, D),
        ("bf16 k16 n512 m1024", 1024, 16, 512, 8, jnp.bfloat16, D),
        ("bf16 k16 n2048 m1024", 1024, 16, 2048, 4, jnp.bfloat16, D),
        ("bf16 k16 n1024 m256", 256, 16, 1024, 8, jnp.bfloat16, D),
        ("bf16 k16 n1024 m2048", 2048, 16, 1024, 8, jnp.bfloat16, D),
        ("bf16 k16 n1024 m4096", 4096, 16, 1024, 8, jnp.bfloat16, D),
        ("bf16 k128 n1024 m4096", 4096, 128, 1024, 8, jnp.bfloat16, D),
        ("bf16 k16 n1024 nored", 1024, 16, 1024, 8, jnp.bfloat16, "nored"),
        ("bf16 k16 n1024 outbf16", 1024, 16, 1024, 8, jnp.bfloat16, "obf16"),
        ("f32HI k16 n1024 outbf16", 1024, 16, 1024, 8, jnp.float32, "hibf16"),
    ]
    if args.quick:
        cases = cases[:6]
    for name, m, k, n, reps, dtype, prec in cases:
        acc_min = prec != "nored"
        out_dtype = jnp.bfloat16 if prec in ("obf16", "hibf16") else jnp.float32
        p = {"nored": D, "obf16": D, "hibf16": HI}.get(prec, prec)
        try:
            r = bench(b, m, k, n, reps, dtype, p, acc_min=acc_min,
                      out_dtype=out_dtype)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}")
            continue
        print(
            f"{name:28s} {r['dt_ms']:9.3f} ms   "
            f"{r['ns_per_128out']:8.4f} ns/128out   {r['tmacs']:7.2f} TMAC/s"
        )

    # int8 support probe (separate: needs int operands + int32 acc)
    try:
        def k8(f_ref, g_ref, o_ref):
            d = jax.lax.dot_general(
                f_ref[...], g_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            o_ref[0, :] = jnp.min(d, axis=1)

        fi = jnp.ones((16, b), jnp.int8)
        gi = jnp.ones((16, 1024), jnp.int8)
        call = pl.pallas_call(
            k8,
            grid=(b // 1024,),
            in_specs=[
                pl.BlockSpec((16, 1024), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, 1024), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1024), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, b), jnp.int32),
        )
        out = jax.jit(call)(fi, gi)
        np.asarray(out)
        t0 = time.perf_counter()
        np.asarray(jax.jit(call)(fi, gi)[0, :8])
        dt = time.perf_counter() - t0
        print(f"{'int8 k16 n1024 m1024':28s} {dt*1e3:9.3f} ms   "
              f"{128 * dt / (b * 1024) * 1e9:8.4f} ns/128out")
    except Exception as e:  # noqa: BLE001
        print(f"int8 probe FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
