"""Measure per-executable boundary cost on the current backend.

Hypothesis under test (PERFORMANCE.md "dispatch residual"): the staged
pipeline pays a data-proportional tax at every executable boundary that
is NOT explained by HBM read+write bandwidth — e.g. inter-stage buffers
detouring through the axon relay instead of staying device-resident.

For each array size this times, hard-synced, K=16 chained dispatches of:
  a. `x + 1` as ONE jitted executable called K times (K boundaries)
  b. same, with donate_argnums=0 (K boundaries, donated)
  c. a single executable containing K chained adds (1 boundary)
The (a|b) - c gap per dispatch, minus the HBM r/w floor (2*bytes/819GB/s
on v5e), is the boundary tax. If it scales with bytes, stage-merging /
layout work beats kernel work; if it is flat, it is launch overhead and
sample folding already amortizes it.

Usage: python tools/boundary_probe.py [--cols 32] [--reps 5]
"""

import argparse
import json
import time

import numpy as np


def _timeit(fn, sync, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        sync()
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cols", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument(
        "--sizes", default="65536,262144,1048576,4194304",
        help="comma-separated row counts to probe",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    K = args.k

    @jax.jit
    def step(x):
        return x + 1.0

    step_donated = jax.jit(lambda x: x + 1.0, donate_argnums=0)

    @jax.jit
    def fused(x):
        for _ in range(K):
            x = x + 1.0
        return x

    for n in (int(v) for v in args.sizes.split(",")):
        x0 = jnp.zeros((n, args.cols), jnp.float32)
        nbytes = n * args.cols * 4

        # warm all three programs
        np.asarray(step(x0)[0, 0])
        np.asarray(step_donated(jnp.zeros_like(x0))[0, 0])
        np.asarray(fused(x0)[0, 0])

        def run_chain():
            x = x0
            for _ in range(K):
                x = step(x)
            run_chain.out = x

        def run_chain_donated():
            x = jnp.zeros_like(x0)
            np.asarray(x[0, 0])  # make the fresh buffer's cost visible
            for _ in range(K):
                x = step_donated(x)
            run_chain_donated.out = x

        def run_fused():
            run_fused.out = fused(x0)

        t_chain = _timeit(
            run_chain, lambda: np.asarray(run_chain.out[0, 0]), args.reps
        )
        t_donated = _timeit(
            run_chain_donated,
            lambda: np.asarray(run_chain_donated.out[0, 0]),
            args.reps,
        )
        t_fused = _timeit(
            run_fused, lambda: np.asarray(run_fused.out[0, 0]), args.reps
        )

        hbm_floor_ms = 2 * nbytes / 819e9 * 1e3  # v5e read+write
        per_dispatch_ms = (t_chain - t_fused) / max(K - 1, 1) * 1e3
        per_dispatch_donated_ms = (t_donated - t_fused) / max(K - 1, 1) * 1e3
        print(
            json.dumps(
                {
                    "n": n,
                    "mb": round(nbytes / 1e6, 1),
                    "chain_ms": round(t_chain * 1e3, 2),
                    "donated_ms": round(t_donated * 1e3, 2),
                    "fused_ms": round(t_fused * 1e3, 2),
                    "boundary_tax_ms_per_dispatch": round(per_dispatch_ms, 3),
                    "boundary_tax_donated": round(per_dispatch_donated_ms, 3),
                    "hbm_rw_floor_ms": round(hbm_floor_ms, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
