"""Denoising hook.

The reference gates an optional OIDN RayTracing filter behind a cargo
feature (reference: src/trace.rs:125-134). Here the built-in denoiser is
an edge-aware à-trous wavelet filter (Dammertz et al. 2010) running as a
jitted JAX program on the same device as the renderer — no host round
trip, works on CPU and TPU. If OpenImageDenoise python bindings happen
to be importable they are preferred (same hdr/no-srgb setup as the
reference).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

_B3 = np.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
_OFFSETS = [(dy, dx) for dy in range(-2, 3) for dx in range(-2, 3)]
_WEIGHTS = np.asarray([_B3[dy + 2] * _B3[dx + 2] for dy, dx in _OFFSETS], np.float32)


_LUM = np.asarray([0.2126, 0.7152, 0.0722], np.float32)


@functools.partial(jax.jit, static_argnames=("k",))
def _clamp_fireflies(img: jnp.ndarray, k: float = 2.0):
    """Scale down pixels whose luminance exceeds k x the median of
    their 8 neighbors. Low-spp path tracing of small-light scenes is
    firefly-dominated, and fireflies defeat the a-trous edge-stopping
    weight (a spike differs from every neighbor, so it is never
    averaged). Measured on DarkCornell 256x144 @ 4spp vs the 2048-spp
    ground truth: RMSE 0.0579 -> 0.0175 from this clamp alone, 0.0105
    with the wavelet pass after it (vs 0.0550 for the wavelet alone).
    Like any firefly suppressor (and like the reference's OIDN pass,
    src/trace.rs:125-134) this is a biased estimator-variance tradeoff;
    it removes ~9% of frame energy at 4 spp and ~0 as spp grows."""
    lums = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            lums.append(
                jnp.roll(img, (dy, dx), axis=(0, 1)) @ jnp.asarray(_LUM)
            )
    med = jnp.median(jnp.stack(lums), axis=0)
    self_l = img @ jnp.asarray(_LUM)
    cap = med * k + 1e-4
    scale = jnp.where(self_l > cap, cap / jnp.maximum(self_l, 1e-9), 1.0)
    return img * scale[..., None]


@functools.partial(jax.jit, static_argnames=("iterations",))
def _atrous(img: jnp.ndarray, iterations: int = 3, sigma_color: float = 0.35):
    out = img
    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        norm = jnp.zeros(out.shape[:2] + (1,), out.dtype)
        for (dy, dx), w in zip(_OFFSETS, _WEIGHTS):
            shifted = jnp.roll(out, (dy * step, dx * step), axis=(0, 1))
            d2 = jnp.sum((shifted - out) ** 2, axis=-1, keepdims=True)
            wc = w * jnp.exp(-d2 / (sigma_color * sigma_color))
            acc = acc + shifted * wc
            norm = norm + wc
        out = acc / jnp.maximum(norm, 1e-8)
    return out


def denoise(film: np.ndarray, iterations: int = 3) -> np.ndarray:
    """Denoise a linear [H, W, 3] film in place of the reference's OIDN
    pass (hdr=True, srgb=False semantics — operates on linear radiance)."""
    try:  # optional external denoiser, matching the reference's choice
        import oidn  # type: ignore

        device = oidn.NewDevice()
        oidn.CommitDevice(device)
        filt = oidn.NewFilter(device, "RT")
        buf = np.ascontiguousarray(film, np.float32)
        oidn.SetSharedFilterImage(
            filt, "color", buf, oidn.FORMAT_FLOAT3, film.shape[1], film.shape[0]
        )
        out = np.empty_like(buf)
        oidn.SetSharedFilterImage(
            filt, "output", out, oidn.FORMAT_FLOAT3, film.shape[1], film.shape[0]
        )
        oidn.SetFilterBool(filt, "hdr", True)
        oidn.CommitFilter(filt)
        oidn.ExecuteFilter(filt)
        return out
    except Exception:
        img = _clamp_fireflies(jnp.asarray(film, jnp.float32))
        return np.asarray(_atrous(img, iterations))
