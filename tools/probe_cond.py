"""Isolate the cost of the deferred-sky lax.cond in pre_last.

DarkCornell is airtight (zero missed lanes ever — verified by brute
host intersection), yet the profiler attributes ~22 ms per last-bounce
dispatch to the cond. This times, at fold-4 headline shapes:
  a. radiance update alone (no sky term)
  b. + lax.cond(any(missed), march, zeros)   [pred false at runtime]
  c. + march unconditionally under the where mask
  d. + cond with a precomputed scalar pred    [no reduce in this exe]

Usage: python tools/probe_cond.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    from rustic_tpu.ops.skybox import procedural_sky

    B = 3686400
    ro = jnp.zeros((B, 3), jnp.float32)
    rd = jnp.concatenate(
        [jnp.ones((B, 1)), jnp.zeros((B, 2))], axis=1
    )
    throughput = jnp.ones((B, 3), jnp.float32)
    radiance = jnp.zeros((B, 3), jnp.float32)
    missed = jnp.zeros((B,), bool)
    sun = jnp.asarray([0.5, 0.8, 0.2, 15.0], jnp.float32)
    pred = jnp.zeros((), bool)

    @jax.jit
    def base(radiance, throughput, missed, ro, rd):
        return radiance + jnp.where(missed[:, None], throughput, 0.0)

    @jax.jit
    def with_cond(radiance, throughput, missed, ro, rd):
        sky = jax.lax.cond(
            jnp.any(missed),
            lambda: procedural_sky(sun, ro, rd),
            lambda: jnp.zeros_like(ro),
        )
        return radiance + jnp.where(missed[:, None], throughput * sky, 0.0)

    @jax.jit
    def no_cond(radiance, throughput, missed, ro, rd):
        sky = procedural_sky(sun, ro, rd)
        return radiance + jnp.where(missed[:, None], throughput * sky, 0.0)

    @jax.jit
    def scalar_pred(radiance, throughput, missed, ro, rd, pred):
        sky = jax.lax.cond(
            pred,
            lambda: procedural_sky(sun, ro, rd),
            lambda: jnp.zeros_like(ro),
        )
        return radiance + jnp.where(missed[:, None], throughput * sky, 0.0)

    def timeit(name, fn, *args):
        out = fn(*args)
        np.asarray(out.ravel()[:1])
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(6):
                out = fn(*args)
            np.asarray(out.ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {(best - 0.0293) / 6 * 1e3:.2f} ms", flush=True)

    timeit("a_base         ", base, radiance, throughput, missed, ro, rd)
    timeit("b_cond_false   ", with_cond, radiance, throughput, missed, ro, rd)
    timeit("c_march_always ", no_cond, radiance, throughput, missed, ro, rd)
    timeit("d_scalar_pred  ", scalar_pred, radiance, throughput, missed, ro,
           rd, pred)


if __name__ == "__main__":
    main()
