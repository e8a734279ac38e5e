"""Generate a blue-noise seed texture by void-and-cluster (Ulichney '93).

The reference decorrelates per-pixel LDS sequences by seeding each
pixel's Cranley-Patterson offset from an optimized blue-noise texture
(reference: src/trace.rs:149-160, src/resources/bluenoise.png). Round 1
substituted interleaved-gradient noise; this produces the real thing —
a toroidal void-and-cluster rank matrix whose normalized ranks are a
permutation of [0,1) with blue (high-frequency) spectral distribution —
and writes it as a uint32 offset table consumed by
runtime/render.py:pixel_offsets.

Usage: python tools/make_bluenoise.py [--size 128] [--sigma 1.9]
Writes assets/bluenoise_{size}.npy (uint32 [size, size]).
"""

import argparse
import os

import numpy as np


def _wrap_kernel(size: int, sigma: float) -> np.ndarray:
    """Toroidal Gaussian energy splat centred at (0, 0)."""
    ax = np.arange(size)
    d = np.minimum(ax, size - ax).astype(np.float64)
    d2 = d[:, None] ** 2 + d[None, :] ** 2
    return np.exp(-d2 / (2.0 * sigma * sigma))


def _splat(energy: np.ndarray, kernel: np.ndarray, y: int, x: int, sign: float):
    energy += sign * np.roll(np.roll(kernel, y, axis=0), x, axis=1)


def _tightest_cluster(energy, mask):
    """Index of the minority pixel with the highest energy."""
    e = np.where(mask, energy, -np.inf)
    return np.unravel_index(np.argmax(e), e.shape)


def _largest_void(energy, mask):
    """Index of the background pixel with the lowest energy."""
    e = np.where(mask, np.inf, energy)
    return np.unravel_index(np.argmin(e), e.shape)


def void_and_cluster(size: int = 128, sigma: float = 1.9, seed: int = 7):
    """Returns an int rank matrix [size, size]; ranks are a permutation
    of 0..size*size-1 with blue-noise ordering."""
    rng = np.random.default_rng(seed)
    n = size * size
    n_minority = n // 10
    kernel = _wrap_kernel(size, sigma)

    # initial binary pattern: random minority points
    mask = np.zeros((size, size), bool)
    idx = rng.choice(n, n_minority, replace=False)
    mask.reshape(-1)[idx] = True
    energy = np.zeros((size, size), np.float64)
    for y, x in zip(*np.nonzero(mask)):
        _splat(energy, kernel, y, x, +1.0)

    # relax to equilibrium: move tightest cluster into largest void
    for _ in range(10 * n):
        cy, cx = _tightest_cluster(energy, mask)
        mask[cy, cx] = False
        _splat(energy, kernel, cy, cx, -1.0)
        vy, vx = _largest_void(energy, mask)
        mask[vy, vx] = True
        _splat(energy, kernel, vy, vx, +1.0)
        if (vy, vx) == (cy, cx):  # moved back -> converged
            break

    rank = np.full((size, size), -1, np.int64)

    # phase 1: remove minority points tightest-first -> ranks n_min-1..0
    m = mask.copy()
    e = energy.copy()
    for r in range(n_minority - 1, -1, -1):
        cy, cx = _tightest_cluster(e, m)
        m[cy, cx] = False
        _splat(e, kernel, cy, cx, -1.0)
        rank[cy, cx] = r

    # phase 2: fill voids -> ranks n_min..n/2-1 (minority = filled)
    m = mask.copy()
    e = energy.copy()
    for r in range(n_minority, n // 2):
        vy, vx = _largest_void(e, m)
        m[vy, vx] = True
        _splat(e, kernel, vy, vx, +1.0)
        rank[vy, vx] = r

    # phase 3: majority points are now "minority 0s"; keep inserting
    # into the largest void of the *unfilled* set
    for r in range(n // 2, n):
        vy, vx = _largest_void(e, m)
        m[vy, vx] = True
        _splat(e, kernel, vy, vx, +1.0)
        rank[vy, vx] = r

    assert (rank >= 0).all()
    return rank


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--sigma", type=float, default=1.9)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    rank = void_and_cluster(args.size, args.sigma, args.seed)
    n = args.size * args.size
    # normalized rank in [0,1) scaled to the full u32 range — exactly
    # the reference's bluenoise-value * 2^32 Cranley-Patterson offset
    offsets = (rank.astype(np.float64) / n * 4294967296.0).astype(np.uint32)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", f"bluenoise_{args.size}.npy",
    )
    np.save(out, offsets)
    print(f"wrote {out}: {offsets.shape} uint32, {n} unique ranks")


if __name__ == "__main__":
    main()
